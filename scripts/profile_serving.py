#!/usr/bin/env python
"""Serving benchmark: sustained QPS + latency percentiles under HTTP load.

Unlike the direct ``search_batch`` numbers in bench.py, this drives the
full serving stack — HTTP parse -> MicroBatcher admission -> window
coalescing -> device dispatch -> two-deep resolution -> JSON response —
with concurrent keep-alive clients, and reports:

* sustained QPS at each client concurrency level,
* p50/p95/p99 request latency (client-observed, ms),
* mean coalesced batch size and shed (429) counts from ``/healthz``.

Usage:
  python scripts/profile_serving.py --n-docs 100000 --clients 4,16,64
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_clients(port: int, dim: int, n_clients: int, seconds: float,
                k: int) -> dict:
    """Closed-loop keep-alive clients; returns latency/QPS stats."""
    stop = time.perf_counter() + seconds
    lats: list = []
    shed = [0]
    lock = threading.Lock()
    rng = np.random.default_rng(0)
    bodies = [
        json.dumps({"vector": rng.normal(size=dim).astype(float).tolist(),
                    "k": k}).encode()
        for _ in range(64)
    ]

    def client(ci: int) -> None:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        my_lats = []
        my_shed = 0
        i = ci
        while time.perf_counter() < stop:
            t0 = time.perf_counter()
            try:
                conn.request("POST", "/search", body=bodies[i % 64],
                             headers={"Content-Type": "application/json"})
                resp = conn.getresponse()
                resp.read()
                if resp.status == 429:
                    my_shed += 1
                    continue
                assert resp.status == 200, resp.status
            except Exception:  # noqa: BLE001 — reconnect and continue
                conn.close()
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=60)
                continue
            my_lats.append((time.perf_counter() - t0) * 1e3)
            i += 1
        conn.close()
        with lock:
            lats.extend(my_lats)
            shed[0] += my_shed

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    arr = np.asarray(lats)
    return {
        "clients": n_clients,
        "requests": int(arr.size),
        "qps": round(arr.size / wall, 1),
        "p50_ms": round(float(np.percentile(arr, 50)), 2) if arr.size else None,
        "p95_ms": round(float(np.percentile(arr, 95)), 2) if arr.size else None,
        "p99_ms": round(float(np.percentile(arr, 99)), 2) if arr.size else None,
        "shed_429": int(shed[0]),
    }


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
    ap.add_argument("--output", default="serving_metrics.json")
    args = ap.parse_args()

    from dewi_tpu.index.facade import DewiIndex
    from dewi_tpu.serve import SearchServer
    from dewi_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(args.n_docs, args.dim)).astype(np.float32)
    pay = rng.gamma(2.0, 1.0, size=(args.n_docs, 8)).astype(np.float32)
    idx = DewiIndex(dim=args.dim, backend=args.backend)
    idx.add_batch([f"d{i}" for i in range(args.n_docs)], emb, pay)
    idx.build()
    srv = SearchServer(idx, window_ms=args.window_ms,
                       max_batch=args.max_batch)
    # Pre-compile every power-of-2 batch bucket the MicroBatcher can emit
    # (a production server warms the same way at startup; measuring client
    # latency through multi-minute tunnel compiles would be meaningless).
    # AFTER server construction, so any backend adjustments the serving
    # layer makes (e.g. the axon nested-Pallas thread guard) are reflected
    # in the traces being warmed.
    import jax

    from dewi_tpu.utils.platform import apply_platform_override

    apply_platform_override()

    b = 1
    while b <= args.max_batch:
        q = rng.normal(size=(b, args.dim)).astype(np.float32)
        jax.block_until_ready(
            idx.search_batch(q, k=args.k, eta=idx.rerank_eta,
                             entropy_pref=idx.entropy_pref)[0]
        )
        b *= 2
    print("bucket traces warm")
    srv.start()
    print(f"serving {args.n_docs:,} docs ({args.backend}) on port {srv.port}")

    # Warm every power-of-2 batch bucket once so measurement excludes
    # compiles (production servers warm at startup the same way).
    import urllib.request

    def one(v):
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/search",
            data=json.dumps({"vector": v.tolist(), "k": args.k}).encode(),
            headers={"Content-Type": "application/json"},
        )
        urllib.request.urlopen(req, timeout=600).read()

    one(rng.normal(size=args.dim).astype(np.float32))
    run_clients(srv.port, args.dim, 8, 3.0, args.k)  # warm buckets

    results = []
    for nc in [int(x) for x in args.clients.split(",")]:
        r = run_clients(srv.port, args.dim, nc, args.seconds, args.k)
        health = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/healthz", timeout=30
        ).read())
        r["mean_batch"] = health["mean_batch"]
        results.append(r)
        print(json.dumps(r))
    srv.shutdown()

    out = {
        "n_docs": args.n_docs,
        "dim": args.dim,
        "backend": args.backend,
        "window_ms": args.window_ms,
        "levels": results,
        "note": "Closed-loop keep-alive HTTP clients against SearchServer; "
                "client-observed latency. Host RTT to the tunneled dev TPU "
                "(~30 ms) sits inside every request; production hosts see "
                "device-local dispatch instead.",
    }
    Path(args.output).write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
