#!/usr/bin/env python
"""DEWI-TPU benchmark: 1M-doc build, all index tiers, recall, and signals.

Protocol follows the reference's measurement script defaults
(reference scripts/profile_index.py:241-254: dim=256, n_queries=1000, k=10)
at the 1M-doc headline scale (reference README.md:163: 2.1 hr build, 22 ms
query on 16-core CPU + V100).

Latency methodology: the development TPU is reached through a tunnel whose
host round-trip (~25-35 ms) dwarfs device time, so per-query p50s are
measured with a chained on-device loop — R sequential searches inside ONE
jitted program (each query perturbed by the previous result so XLA cannot
batch or elide them), total time / R.  Raw single-dispatch latency
(including host RTT) and fully-batched QPS are reported as extras.

Sections (DEWI_BENCH_SECTIONS=comma list; default all at 1M scale,
"core,recall" below 100k so the CI smoke stays fast):
  core    — build + f32/bf16 chained p50 + batched QPS
  int8    — quantized-tier chained p50
  int4    — int4-packed two-stage tier (half the stage-1 HBM bytes)
  recall  — 1000-query recall vs f32 exact at k=10 and k=100 (bf16, int8)
  ivf     — device-side 1M IVF build, batched latency + recall (random and
            clustered corpora; random is IVF's worst case)
  pallas  — the in-VMEM-top-k reference kernels vs XLA (opt-in; the
            production Pallas scores kernel is measured in the int8 section)
  signals — small-preset signal backbones (device-resident docs/sec) + the
            combined full-signal 1M single-chip estimate

Emission protocol (VERDICT r4 #1 — a driver timeout must never erase the
run): the result JSON line is (re)printed after EVERY completed section,
each time with everything measured so far; the LAST line printed is
authoritative.  A SIGTERM/SIGALRM triggers a final best-effort emission.
DEWI_BENCH_TIME_BUDGET_S (default 1140 s) is a soft deadline: once
exceeded, remaining sections are skipped and recorded in
extras.skipped_sections.  Sections run headline-first (core chained p50 →
int8 variants → recall k=10, which gates the headline) so even a severely
truncated run still contains the headline number and its recall gate.

Line format:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N, ...extras}
vs_baseline is the speedup over the reference's 22 ms 1M-doc query latency.
"""

import json
import os
import signal
import sys
import time

import numpy as np

# Env overrides keep the benchmark CI-smokeable (tiny shapes on CPU);
# the driver runs the defaults on the real chip.
N_DOCS = int(os.environ.get("DEWI_BENCH_N_DOCS", 1_000_000))
DIM = int(os.environ.get("DEWI_BENCH_DIM", 256))
N_QUERIES = int(os.environ.get("DEWI_BENCH_N_QUERIES", 1_000))
K = 10
CHAIN = int(os.environ.get("DEWI_BENCH_CHAIN", 128))
BASELINE_QUERY_MS = 22.0         # reference README.md:163
BASELINE_BUILD_S = 2.1 * 3600.0  # reference README.md:163

# "pallas" (the in-VMEM-top-k reference kernels, a documented dead end —
# docs/DESIGN.md) is opt-in: the production Pallas path is measured every
# round via the int8 tier's int8_pallas_cap row.
_default_sections = (
    "core,int8,int4,recall,ivf,signals" if N_DOCS >= 100_000
    else "core,recall"
)
SECTIONS = set(
    os.environ.get("DEWI_BENCH_SECTIONS", _default_sections).split(",")
)


def main() -> None:
    import jax

    # Platform override for CI smoke runs (must precede backend init; the
    # axon site hook ignores the JAX_PLATFORMS env var).
    plat = os.environ.get("DEWI_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    # Persistent compile cache: repeated bench runs on one machine skip the
    # (tunnel-dominated) jit compiles; a genuinely fresh machine still pays
    # them once.  DEWI_COMPILE_CACHE=0 restores always-cold behavior.
    from dewi_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from dewi_tpu.index import ExactIndex
    from dewi_tpu.metrics import recall_matrix
    from dewi_tpu.ops.quantized import quantize_rows, quantized_search
    from dewi_tpu.ops.similarity import fused_search
    from dewi_tpu.scorer import DewiScorer
    from dewi_tpu.types import PAYLOAD_FIELDS

    # The dev tunnel wedges in waves (minutes-long silent stalls inside
    # array setup — see docs/DESIGN.md).  Probe with a tiny op from a
    # daemon thread; while it stalls, wait and re-probe for up to
    # DEWI_BENCH_TUNNEL_WAIT_S (default 300, 0 disables) before starting
    # the real setup, so a wave passing at bench time doesn't eat the run.
    # Healthy-path cost: one ~ms device call.
    max_wait = float(os.environ.get("DEWI_BENCH_TUNNEL_WAIT_S", 300))
    if max_wait > 0:
        import threading

        deadline = time.perf_counter() + max_wait
        while True:
            ok = threading.Event()

            def _probe() -> None:
                jnp.zeros(4).block_until_ready()
                ok.set()

            t = threading.Thread(target=_probe, daemon=True)
            t.start()
            t.join(timeout=45.0)
            if ok.is_set():
                break
            if not t.is_alive():
                # Probe DIED (raised) rather than stalled — a real backend
                # error; don't burn the wait budget, let the run surface it.
                print("bench: device probe errored; proceeding",
                      file=sys.stderr)
                break
            if time.perf_counter() >= deadline:
                print("bench: device probe still stalled after "
                      f"{max_wait:.0f}s; proceeding anyway", file=sys.stderr)
                break
            print("bench: device probe stalled; waiting for the tunnel",
                  file=sys.stderr)
            # A stuck probe blocks on the in-flight call; give the wave
            # time to pass before probing again from a fresh thread.
            time.sleep(30.0)

    extras: dict = {}
    extras["latency_method"] = (
        f"chained on-device loop ({CHAIN} serialized searches per dispatch)"
    )
    extras["n_docs"] = N_DOCS
    extras["dim"] = DIM
    extras["device"] = str(jax.devices()[0])

    # ---- incremental-emission machinery (VERDICT r4 #1) ------------------
    # The headline is the fastest tier whose measured recall vs f32 exact
    # over the full query set meets BASELINE.md's >=0.99 gate (BASELINE.md:29).
    # Candidates register as (label, p50_ms, recall_extras_key); a None key
    # means exact-by-construction (recall 1.0).  emit() recomputes the
    # headline from whatever has been measured so far and prints the full
    # JSON line — called after every section, so the last printed line is
    # always a complete, honest snapshot.
    t_start = time.perf_counter()
    budget_s = float(os.environ.get("DEWI_BENCH_TIME_BUDGET_S", 1140))
    skipped: list = []
    sect_s: dict = {}
    cands: list = []

    def elapsed() -> float:
        return time.perf_counter() - t_start

    def over_budget(margin: float = 0.0) -> bool:
        return budget_s > 0 and elapsed() + margin >= budget_s

    def emit() -> None:
        pool = []
        for label, p50, rkey in cands:
            rec = 1.0 if rkey is None else extras.get(rkey)
            if rec is not None and float(rec) >= 0.99:
                pool.append((p50, float(rec), label))
        if not pool:
            return  # nothing measured yet — keep whatever was last printed
        headline, head_recall, head_tier = min(pool, key=lambda c: c[0])
        extras["headline_tier"] = head_tier
        extras["recall_vs_exact"] = round(head_recall, 6)
        extras["elapsed_s"] = round(elapsed(), 1)
        extras["skipped_sections"] = list(skipped)
        extras["section_seconds"] = {k: round(v, 1) for k, v in
                                     sect_s.items()}
        print(
            json.dumps(
                {
                    "metric": "p50_query_latency_1M_docs_k10",
                    "value": round(headline, 4),
                    "unit": "ms",
                    "vs_baseline": round(BASELINE_QUERY_MS / headline, 2),
                    "extras": extras,
                }
            ),
            flush=True,
        )

    def _on_signal(signum: int, frame: object) -> None:
        skipped.append(f"interrupted_by_signal_{signum}")
        emit()
        os._exit(124)

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGALRM, _on_signal)
    if budget_s > 0:
        # Last-resort alarm: if a section wedges past the soft deadline
        # (e.g. a tunnel stall mid-call), emit what we have and bail.
        signal.alarm(int(budget_s + 120))

    key = jax.random.PRNGKey(0)
    k_emb, k_sig, k_q = jax.random.split(key, 3)

    # Synthetic corpus generated on device (gamma-ish signal marginals like
    # reference profile_index.py:34-72).
    emb = jax.random.normal(k_emb, (N_DOCS, DIM), dtype=jnp.float32)
    sig = jax.random.gamma(k_sig, 2.0, (N_DOCS, 7), dtype=jnp.float32)
    queries = jax.random.normal(k_q, (N_QUERIES, DIM), dtype=jnp.float32)
    jax.block_until_ready((emb, sig, queries))
    queries_h = np.asarray(queries)
    doc_ids = [str(i) for i in range(N_DOCS)]

    # ---- build: robust-stat fit + DEWI scoring + index build -------------
    # Everything stays device-resident: fused fit+score, payload assembly,
    # and index attach never round-trip the 1 GB corpus through host RAM.
    t0 = time.perf_counter()
    scorer = DewiScorer()
    dewi = scorer.fit_and_score(sig)             # fused fit+score on device
    pay = jnp.concatenate([dewi[:, None], sig], axis=1)
    assert pay.shape[1] == len(PAYLOAD_FIELDS)

    index = ExactIndex(dim=DIM)
    index.store.attach_device(doc_ids, emb, pay)
    index.build()
    # sync via value fetch (block_until_ready can return early through the
    # tunnel); fetching one element waits for the producing program.
    float(index.store.device_arrays()[0][0, 0])
    build_s = time.perf_counter() - t0
    extras["index_score_build_s"] = round(build_s, 2)
    extras["index_docs_per_sec"] = round(N_DOCS / build_s, 1)
    extras["build_vs_baseline"] = round(BASELINE_BUILD_S / build_s, 1)
    sect_s["build"] = build_s

    emb_d, sqn_d, pay_d, n_d = index.store.device_arrays()
    eta = jnp.float32(0.25)
    ep = jnp.float32(0.1)

    # ---- device-side latency: chained searches in one dispatch -----------
    # Arrays are explicit arguments (closing over them would embed the 1 GB
    # corpus as a compile-time constant).
    @jax.jit
    def chained(emb_a, sqn_a, pay_a, n_a, q0):
        def body(_, carry):
            q, acc = carry
            scores, _ = fused_search(
                emb_a, sqn_a, pay_a, q, n_a, eta, ep, k=K, normalize=True
            )
            # Data dependency: next query is perturbed by this result, so
            # the loop is truly sequential on device.
            q = q + 1e-12 * scores[0, 0]
            return q, acc + scores[0, 0]

        q, acc = jax.lax.fori_loop(0, CHAIN, body, (q0, jnp.float32(0.0)))
        return acc

    # Sync by FETCHING the scalar result, never block_until_ready: through
    # the dev tunnel block_until_ready can return without waiting for
    # execution (measured: 0.012 ms "block" then a 7.2 s value fetch), and
    # the chained total includes one full host round trip which at
    # CHAIN=128 silently inflates every per-iteration number by
    # ~RTT/CHAIN (~0.3 ms here — ~45% of the round-2 headline).  The null
    # round trip is measured and subtracted.
    @jax.jit
    def _null(s):
        return s * 2.0

    float(_null(np.float32(0.0)))
    _floor = []
    for i in range(8):
        t = time.perf_counter()
        float(_null(np.float32(i + 1.0)))
        _floor.append(time.perf_counter() - t)
    sync_floor_s = float(np.median(_floor))
    extras["sync_floor_ms"] = round(sync_floor_s * 1e3, 3)

    def vsync(x) -> float:
        """Sync by fetching one scalar element of (the first leaf of) x."""
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(jnp.ravel(leaf)[0])

    def chained_p50(fn, *args, reps: int = 6) -> float:
        float(fn(*args, queries_h[:1]))  # compile + settle
        ms = []
        for i in range(min(reps, N_QUERIES)):
            t = time.perf_counter()
            float(fn(*args, queries_h[i : i + 1]))
            dt = time.perf_counter() - t - sync_floor_s
            ms.append(max(dt, 0.0) * 1e3 / CHAIN)
        return float(np.percentile(ms, 50))

    t_sec = time.perf_counter()
    p50_device = chained_p50(chained, emb_d, sqn_d, pay_d, n_d)
    extras["f32_p50_ms"] = round(p50_device, 4)
    cands.append(("f32 exact", p50_device, None))
    emit()  # first complete headline snapshot: f32 exact, recall 1.0

    # Blockmax selection — the ExactIndex DEFAULT since round 3: value-
    # exact hierarchical select replacing the flat [Q, cap] lax.top_k
    # (scan_breakdown: Q=1 within noise of flat, Q=128 batched 76x).
    @jax.jit
    def chained_bm(emb_a, sqn_a, pay_a, n_a, q0):
        def body(_, carry):
            q, acc = carry
            scores, _ = fused_search(
                emb_a, sqn_a, pay_a, q, n_a, eta, ep, k=K, normalize=True,
                blockmax_select=True,
            )
            q = q + 1e-12 * scores[0, 0]
            return q, acc + scores[0, 0]

        _, acc = jax.lax.fori_loop(0, CHAIN, body, (q0, jnp.float32(0.0)))
        return acc

    p50_f32_bm = chained_p50(chained_bm, emb_d, sqn_d, pay_d, n_d)
    extras["f32_blockmax_p50_ms"] = round(p50_f32_bm, 4)
    p50_device = min(p50_device, p50_f32_bm)  # same values; best route
    cands.append(("f32 exact", p50_f32_bm, None))

    # ---- bf16 storage variant (the recommended serving config) -----------
    emb16 = emb_d.astype(jnp.bfloat16)
    p50_bf16 = chained_p50(chained, emb16, sqn_d, pay_d, n_d)
    extras["bf16_store_p50_ms"] = round(p50_bf16, 4)
    p50_bf16_bm = chained_p50(chained_bm, emb16, sqn_d, pay_d, n_d)
    extras["bf16_blockmax_p50_ms"] = round(p50_bf16_bm, 4)
    if p50_bf16_bm < p50_bf16:
        p50_bf16 = p50_bf16_bm
    cands.append(("bf16-store exact", p50_bf16, "bf16_recall_vs_f32_at_k10"))

    # bf16 exact via the streaming Pallas scores kernel (ExactIndex's
    # default route for bf16 stores): identical results, epilogue rides
    # the corpus stream.  Measured 0.986 vs 1.026 XLA at 1M x 256.
    from dewi_tpu.ops.pallas_search import SCORES_BLOCK as _SB, \
        pallas_available as _pa

    if _pa() and emb16.shape[0] % _SB == 0:
        @jax.jit
        def chained_bf16_pallas(emb_a, sqn_a, pay_a, n_a, q0):
            def body(_, carry):
                q, acc = carry
                scores, _ = fused_search(
                    emb_a, sqn_a, pay_a, q, n_a, eta, ep, k=K,
                    normalize=True, pallas_scores=True,
                )
                q = q + 1e-12 * scores[0, 0]
                return q, acc + scores[0, 0]

            _, acc = jax.lax.fori_loop(0, CHAIN, body,
                                       (q0, jnp.float32(0.0)))
            return acc

        try:
            p50_bf16_pl = chained_p50(
                chained_bf16_pallas, emb16, sqn_d, pay_d, n_d
            )
            extras["bf16_pallas_p50_ms"] = round(p50_bf16_pl, 4)
            if p50_bf16_pl < p50_bf16:
                p50_bf16 = p50_bf16_pl  # same results; candidate uses best
                cands.append(("bf16-store exact", p50_bf16,
                              "bf16_recall_vs_f32_at_k10"))
        except Exception as e:  # noqa: BLE001
            extras["bf16_pallas_error"] = str(e)[:200]
    sect_s["core_chained"] = time.perf_counter() - t_sec
    emit()

    # ---- int8 quantized tier ----------------------------------------------
    p50_int8 = p50_int8_pallas = p50_int8_s8 = p50_int8_pallas_s8 = None
    p50_int8_pallas_s8_bm = None
    p50_int8_pallas_s8_bmf = None
    q_emb = q_scales = None
    embp = sqnp = payp = qep = qsp = q4_emb = q4_scales = None
    if "int8" in SECTIONS and over_budget(margin=60.0):
        skipped.append("int8")
        SECTIONS.discard("int8")
    if "int8" in SECTIONS:
        t_sec = time.perf_counter()
        q_emb, q_scales = quantize_rows(emb_d)
        jax.block_until_ready(q_emb)
        m = min(max(K * 8, 32), N_DOCS)

        @jax.jit
        def chained_int8(qe, qs, emb_a, sqn_a, pay_a, n_a, q0):
            def body(_, carry):
                q, acc = carry
                scores, _ = quantized_search(
                    qe, qs, emb_a, sqn_a, pay_a, q, n_a, eta, ep,
                    k=K, m=m, normalize=True, approx_select=True,
                )
                q = q + 1e-12 * scores[0, 0]
                return q, acc + scores[0, 0]

            _, acc = jax.lax.fori_loop(0, CHAIN, body, (q0, jnp.float32(0.0)))
            return acc

        p50_int8 = chained_p50(
            chained_int8, q_emb, q_scales, emb_d, sqn_d, pay_d, n_d
        )
        extras["int8_p50_ms"] = round(p50_int8, 4)
        cands.append(("int8 two-stage refined", p50_int8,
                      "int8_recall_vs_f32_at_k10"))

        # s8xs8 stage-1: quantize the query too — native int8 MXU dot (2x
        # int8 throughput on v5e, no int8->bf16 convert on the corpus
        # stream).  Stage-2 f32 refinement absorbs the extra rounding;
        # recall is measured below and gates headline candidacy.
        @jax.jit
        def chained_int8_s8(qe, qs, emb_a, sqn_a, pay_a, n_a, q0):
            def body(_, carry):
                q, acc = carry
                scores, _ = quantized_search(
                    qe, qs, emb_a, sqn_a, pay_a, q, n_a, eta, ep,
                    k=K, m=m, normalize=True, approx_select=True,
                    int8_queries=True,
                )
                q = q + 1e-12 * scores[0, 0]
                return q, acc + scores[0, 0]

            _, acc = jax.lax.fori_loop(0, CHAIN, body, (q0, jnp.float32(0.0)))
            return acc

        p50_int8_s8 = chained_p50(
            chained_int8_s8, q_emb, q_scales, emb_d, sqn_d, pay_d, n_d
        )
        extras["int8_s8_p50_ms"] = round(p50_int8_s8, 4)
        cands.append(("int8 two-stage refined (s8xs8 stage-1)", p50_int8_s8,
                      "int8_s8_recall_vs_f32_at_k10"))

        # Pallas-stage-1 variant at DocStore capacity (power-of-two padding —
        # the production QuantizedIndex layout, which auto-routes here).
        # Paired with the XLA path at the SAME padded capacity for a fair
        # comparison; measured 0.706 vs 0.960 ms at 1M x 256 on one v5e.
        from dewi_tpu.ops.pallas_search import SCORES_BLOCK, pallas_available

        # emb_d is already store-capacity-sized (power of 2); round up to a
        # SCORES_BLOCK multiple (no-op at 1M: 2^20 = 128 * 8192).
        rows = emb_d.shape[0]
        cap = ((rows + SCORES_BLOCK - 1) // SCORES_BLOCK) * SCORES_BLOCK
        if pallas_available() and cap >= SCORES_BLOCK:
            padn = cap - rows
            if padn == 0:
                embp, sqnp, payp = emb_d, sqn_d, pay_d
                qep, qsp = q_emb, q_scales
            else:
                embp = jnp.pad(emb_d, ((0, padn), (0, 0)))
                sqnp = jnp.pad(sqn_d, (0, padn))
                payp = jnp.pad(pay_d, ((0, padn), (0, 0)))
                qep, qsp = quantize_rows(embp)
            jax.block_until_ready(qep)
            # (use_pallas, int8_queries, row name).  The s8 variant streams
            # BOTH operands into the MXU as int8 (pallas_scores_matrix_s8):
            # no per-element int8->bf16 convert on the corpus read — the
            # strongest remaining lever on the 0.596 ms Pallas scan.
            variants = [(True, False, False, False, "int8_pallas_cap_p50_ms"),
                        (True, True, False, False, "int8_pallas_s8_p50_ms"),
                        # blockmax: hierarchical sub-block-max selection,
                        # exact w.r.t. stage-1 scores — measured 0.434 vs
                        # 0.477 ms paired vs approx_max_k (scan_breakdown).
                        (True, True, True, False,
                         "int8_pallas_s8_blockmax_p50_ms")]
            # Fused stage-1+blockmax kernel: the sub-block max-reduce rides
            # the streaming s8 kernel, so the [1, cap] scores matrix never
            # touches HBM and selection is a top-k over [1, cap/128] maxima.
            from dewi_tpu.ops.pallas_search import (
                BMAX_BLOCK,
                bmax_kernel_supported,
            )

            if cap % BMAX_BLOCK == 0 and bmax_kernel_supported(True):
                variants.append((True, True, True, True,
                                 "int8_pallas_s8_bmfused_p50_ms"))
            if padn == 0:
                # Same arrays as the int8 row above — alias, don't re-measure.
                extras["int8_cap_p50_ms"] = extras["int8_p50_ms"]
            else:
                variants.insert(0, (False, False, False, False,
                                    "int8_cap_p50_ms"))
            _cand_info = {
                "int8_pallas_cap_p50_ms": (
                    "int8 two-stage refined (Pallas stage-1)",
                    "int8_pallas_recall_vs_f32_at_k10"),
                "int8_pallas_s8_p50_ms": (
                    "int8 two-stage refined (s8xs8 Pallas stage-1)",
                    "int8_pallas_s8_recall_vs_f32_at_k10"),
                "int8_pallas_s8_blockmax_p50_ms": (
                    "int8 two-stage refined (s8xs8 Pallas stage-1, "
                    "blockmax select)",
                    "int8_pallas_s8_blockmax_recall_vs_f32_at_k10"),
                "int8_pallas_s8_bmfused_p50_ms": (
                    "int8 two-stage refined (fused s8 stage-1+blockmax "
                    "kernel)",
                    "int8_pallas_s8_bmfused_recall_vs_f32_at_k10"),
            }
            for use_pl, s8, bm, fz, name in variants:
                if over_budget(margin=30.0):
                    skipped.append(f"int8_variant:{name}")
                    continue
                @jax.jit
                def chained_int8_cap(qe, qs, emb_a, sqn_a, pay_a, n_a, q0,
                                     _pl=use_pl, _s8=s8, _bm=bm, _fz=fz):
                    def body(_, carry):
                        q, acc = carry
                        scores, _ = quantized_search(
                            qe, qs, emb_a, sqn_a, pay_a, q, n_a, eta, ep,
                            k=K, m=m, normalize=True, approx_select=True,
                            pallas_stage1=_pl, int8_queries=_s8,
                            blockmax_select=_bm, fused_bmax=_fz,
                        )
                        q = q + 1e-12 * scores[0, 0]
                        return q, acc + scores[0, 0]

                    _, acc = jax.lax.fori_loop(
                        0, CHAIN, body, (q0, jnp.float32(0.0))
                    )
                    return acc

                try:
                    p50 = chained_p50(
                        chained_int8_cap, qep, qsp, embp, sqnp, payp, n_d
                    )
                    extras[name] = round(p50, 4)
                    if name in _cand_info:
                        _lbl, _rk = _cand_info[name]
                        cands.append((_lbl, p50, _rk))
                    if use_pl and s8 and bm and fz:
                        p50_int8_pallas_s8_bmf = p50
                    elif use_pl and s8 and bm:
                        p50_int8_pallas_s8_bm = p50
                    elif use_pl and s8:
                        p50_int8_pallas_s8 = p50
                    elif use_pl:
                        p50_int8_pallas = p50
                except Exception as e:  # noqa: BLE001 — Pallas is opt-in;
                    # a per-variant failure (e.g. Mosaic can't legalize the
                    # s8 dot) must not take down the other rows.
                    extras[name.replace("_p50_ms", "_error")] = str(e)[:200]

            # 8-query packed chained loop (VERDICT r2 #3a): a [1, D] matvec
            # under-fills MXU rows, so stage-1 HBM bandwidth is shared by 8
            # data-dependent queries per step at ~no extra cost.  Reported
            # per query; same kernel/recall as the Q<=32 Pallas serving
            # config — this is the per-query latency of an 8-deep stream.
            if "int8_pallas_cap_p50_ms" in extras:
                @jax.jit
                def chained_int8_packed8(qe, qs, emb_a, sqn_a, pay_a, n_a,
                                         q0):
                    def body(_, carry):
                        q, acc = carry  # [8, D]
                        scores, _ = quantized_search(
                            qe, qs, emb_a, sqn_a, pay_a, q, n_a, eta, ep,
                            k=K, m=m, normalize=True, approx_select=True,
                            pallas_stage1=True,
                        )
                        q = q + 1e-12 * scores[:, :1]
                        return q, acc + scores[0, 0]

                    _, acc = jax.lax.fori_loop(
                        0, CHAIN, body, (q0, jnp.float32(0.0))
                    )
                    return acc

                try:
                    float(chained_int8_packed8(
                        qep, qsp, embp, sqnp, payp, n_d, queries_h[:8]
                    ))
                    ms = []
                    for i in range(6):
                        t = time.perf_counter()
                        float(chained_int8_packed8(
                            qep, qsp, embp, sqnp, payp, n_d,
                            queries_h[8 * i : 8 * i + 8],
                        ))
                        dt = time.perf_counter() - t - sync_floor_s
                        ms.append(max(dt, 0.0) * 1e3 / (CHAIN * 8))
                    extras["int8_pallas_packed8_per_query_p50_ms"] = round(
                        float(np.percentile(ms, 50)), 4
                    )
                except Exception as e:  # noqa: BLE001
                    extras["int8_packed8_error"] = str(e)[:200]
            # padded arrays stay alive for the recall section (the Pallas
            # tier's recall must be measured on the exact config benched).

        # Batched serving on the int8 tier: 4x less stage-1 HBM read than
        # the bf16 exact scan; 128-query blocks keep the [Q, cap] adjusted
        # matrix at 512 MB.  Runs AFTER the chained (headline) variants so
        # a budget cut loses throughput rows, never the headline.
        if not over_budget(margin=45.0):
            def int8_batched_pass():
                outs = []
                for s in range(0, N_QUERIES, 128):
                    v, _ = quantized_search(
                        q_emb, q_scales, emb_d, sqn_d, pay_d,
                        queries_h[s : s + 128], n_d, eta, ep,
                        k=K, m=m, normalize=True, approx_select=True,
                    )
                    outs.append(v)
                float(outs[-1][0, 0])  # value-fetch sync

            int8_batched_pass()  # compile
            t0 = time.perf_counter()
            int8_batched_pass()
            int8_b = (time.perf_counter() - t0) / N_QUERIES * 1e3
            extras["int8_batched_ms_per_query"] = round(int8_b, 4)
            extras["int8_batched_qps"] = round(1e3 / int8_b, 1)
        else:
            skipped.append("int8_batched")

        # Fused-bmax batched route (round 4): the transposed corpus-major
        # kernel emits [nb, Q] maxima — no [Q, cap] matrix in HBM — and
        # candidate stage-1 scores are recomputed from gathered int8
        # blocks.  Recall measured in the recall section (qblock=128).
        from dewi_tpu.ops.pallas_search import (
            bmax_kernel_supported as _bmk,
            pallas_available as _pav,
        )

        if (_pav() and emb_d.shape[0] % 4096 == 0
                and _bmk(True, transposed=True)
                and not over_budget(margin=45.0)):
            def int8_batched_fused_pass():
                outs = []
                for s_ in range(0, N_QUERIES, 128):
                    v, _ = quantized_search(
                        q_emb, q_scales, emb_d, sqn_d, pay_d,
                        queries_h[s_ : s_ + 128], n_d, eta, ep,
                        k=K, m=m, normalize=True, blockmax_select=True,
                        int8_queries=True, pallas_stage1=True,
                        fused_bmax=True,
                    )
                    outs.append(v)
                float(outs[-1][0, 0])  # value-fetch sync

            try:
                int8_batched_fused_pass()  # compile
                t0 = time.perf_counter()
                int8_batched_fused_pass()
                int8_bf = (time.perf_counter() - t0) / N_QUERIES * 1e3
                extras["int8_batched_fused_ms_per_query"] = round(int8_bf, 4)
            except Exception as e:  # noqa: BLE001
                extras["int8_batched_fused_error"] = str(e)[:200]

        sect_s["int8"] = time.perf_counter() - t_sec
        emit()

    # ---- int4 tier: nibble-packed corpus, half the stage-1 HBM stream -----
    # The stage-1 scan is HBM-bound (~750 GB/s effective on the 256 MB int8
    # read, docs/perf/scan_breakdown.json), so int4 storage halves the
    # latency floor.  Chained p50 + batched route; recall (with the 4x
    # refine margin + doubled block margin) gates headline candidacy in
    # the recall section like every tier.
    if "int4" in SECTIONS and over_budget(margin=60.0):
        skipped.append("int4")
        SECTIONS.discard("int4")
    if "int4" in SECTIONS and embp is None:
        # The int4 tier reuses the int8 section's capacity-padded arrays;
        # without them (int8 skipped/budget-cut, or Pallas unavailable)
        # the section cannot run — record WHY so the artifact never shows
        # a silent hole (emission-protocol contract).
        skipped.append("int4")
        extras["int4_skipped_reason"] = (
            "int8 section did not build padded arrays "
            "(pallas unavailable, or int8 skipped/cut)"
        )
        SECTIONS.discard("int4")
    if "int4" in SECTIONS and embp is not None:
        from dewi_tpu.ops.pallas_search import (
            BMAX_BLOCK as _BMB,
            s4_kernel_supported,
        )
        from dewi_tpu.ops.quantized import quantize_rows_int4

        cap4 = embp.shape[0]
        if cap4 % _BMB == 0 and s4_kernel_supported(fused=True):
            t_sec = time.perf_counter()
            q4_emb, q4_scales = quantize_rows_int4(embp)
            jax.block_until_ready(q4_emb)
            m4 = min(max(K * 32, 32), N_DOCS)  # 4x the int8 tier's margin
            # Small-Q stream block: 2x BMAX_BLOCK halves grid steps
            # (measured 0.2549 vs 0.2673 ms at 1M) — same choice
            # QuantizedIndex._fused_bmax_block makes at Q<=8.
            blk4 = (
                2 * _BMB
                if cap4 % (2 * _BMB) == 0
                and s4_kernel_supported(fused=True, block=2 * _BMB)
                else 0
            )

            @jax.jit
            def chained_int4(qe, qs, emb_a, sqn_a, pay_a, n_a, q0):
                def body(_, carry):
                    q, acc = carry
                    scores, _ = quantized_search(
                        qe, qs, emb_a, sqn_a, pay_a, q, n_a, eta, ep,
                        k=K, m=m4, normalize=True, pallas_stage1=True,
                        int8_queries=True, blockmax_select=True,
                        fused_bmax=True, int4_packed=True,
                        pallas_block=blk4,
                    )
                    q = q + 1e-12 * scores[0, 0]
                    return q, acc + scores[0, 0]

                _, acc = jax.lax.fori_loop(
                    0, CHAIN, body, (q0, jnp.float32(0.0))
                )
                return acc

            try:
                p50_int4 = chained_p50(
                    chained_int4, q4_emb, q4_scales, embp, sqnp, payp, n_d
                )
                extras["int4_pallas_s4_bmfused_p50_ms"] = round(p50_int4, 4)
                cands.append((
                    "int4 two-stage refined (fused s4 stage-1+blockmax "
                    "kernel)", p50_int4, "int4_bmfused_recall_vs_f32_at_k10",
                ))
            except Exception as e:  # noqa: BLE001 — per-tier failures must
                # not take down the rest of the run (Mosaic regression etc.)
                extras["int4_error"] = str(e)[:200]

            if ("int4_pallas_s4_bmfused_p50_ms" in extras
                    and not over_budget(margin=45.0)):
                def int4_batched_pass():
                    outs = []
                    for s_ in range(0, N_QUERIES, 128):
                        v, _ = quantized_search(
                            q4_emb, q4_scales, embp, sqnp, payp,
                            queries_h[s_ : s_ + 128], n_d, eta, ep,
                            k=K, m=m4, normalize=True, blockmax_select=True,
                            int8_queries=True, pallas_stage1=True,
                            fused_bmax=True, int4_packed=True,
                        )
                        outs.append(v)
                    float(outs[-1][0, 0])  # value-fetch sync

                try:
                    int4_batched_pass()  # compile
                    t0 = time.perf_counter()
                    int4_batched_pass()
                    int4_b = (time.perf_counter() - t0) / N_QUERIES * 1e3
                    extras["int4_batched_fused_ms_per_query"] = round(
                        int4_b, 4)
                except Exception as e:  # noqa: BLE001
                    extras["int4_batched_fused_error"] = str(e)[:200]
            sect_s["int4"] = time.perf_counter() - t_sec
            emit()
        else:
            extras["int4_skipped_reason"] = (
                "s4 kernel unsupported or capacity misaligned"
            )

    # ---- recall vs f32 exact: full query set, k=10 and k=100 ---------------
    # Queries run in blocks: a single [1000, 1M] f32 score matrix is 4 GB of
    # HBM; 128-query blocks keep the intermediate at 512 MB.
    def blocked_idx(search_fn, kk, qblock=128):
        outs = []
        for s in range(0, N_QUERIES, qblock):
            _, idx = search_fn(queries_h[s : s + qblock], kk)
            outs.append(np.asarray(idx))
        return np.concatenate(outs)

    bf16_recall = None  # unmeasured unless the recall section runs
    int8_pallas_recall = 0.0
    int8_s8_recall = 0.0
    int8_pallas_s8_recall = 0.0
    int8_pallas_s8_bm_recall = 0.0
    int8_pallas_s8_bmf_recall = 0.0
    if "recall" in SECTIONS and over_budget():
        skipped.append("recall")
        SECTIONS.discard("recall")
    if "recall" in SECTIONS:
        t_sec = time.perf_counter()
        for kk in (10, min(100, N_DOCS)):
            if kk != 10 and over_budget(margin=60.0):
                skipped.append(f"recall_k{kk}")
                continue
            idx_f32 = blocked_idx(
                lambda q, k: fused_search(emb_d, sqn_d, pay_d, q, n_d, eta,
                                          ep, k=k, normalize=True), kk
            )
            idx_bf16 = blocked_idx(
                lambda q, k: fused_search(emb16, sqn_d, pay_d, q, n_d, eta,
                                          ep, k=k, normalize=True), kk
            )
            r = recall_matrix(idx_bf16, idx_f32)
            extras[f"bf16_recall_vs_f32_at_k{kk}"] = round(float(r), 6)
            if kk == 10:
                bf16_recall = float(r)
            if q_emb is not None:
                m = min(max(kk * 8, 32), N_DOCS)
                idx_i8 = blocked_idx(
                    lambda q, k: quantized_search(
                        q_emb, q_scales, emb_d, sqn_d, pay_d, q, n_d,
                        eta, ep, k=k, m=m, normalize=True,
                        approx_select=True), kk
                )
                extras[f"int8_recall_vs_f32_at_k{kk}"] = round(
                    float(recall_matrix(idx_i8, idx_f32)), 6
                )
                if kk == 10 and p50_int8_s8 is not None:
                    idx_s8 = blocked_idx(
                        lambda q, k: quantized_search(
                            q_emb, q_scales, emb_d, sqn_d, pay_d, q, n_d,
                            eta, ep, k=k, m=m, normalize=True,
                            approx_select=True, int8_queries=True), kk
                    )
                    int8_s8_recall = float(recall_matrix(idx_s8, idx_f32))
                    extras["int8_s8_recall_vs_f32_at_k10"] = round(
                        int8_s8_recall, 6
                    )
            if qep is not None and "int8_pallas_cap_p50_ms" in extras:
                m = min(max(kk * 8, 32), N_DOCS)
                idx_i8p = blocked_idx(
                    lambda q, k: quantized_search(
                        qep, qsp, embp, sqnp, payp, q, n_d,
                        eta, ep, k=k, m=m, normalize=True,
                        approx_select=True, pallas_stage1=True), kk,
                    qblock=32,
                )
                r = float(recall_matrix(idx_i8p, idx_f32))
                extras[f"int8_pallas_recall_vs_f32_at_k{kk}"] = round(r, 6)
                if kk == 10:
                    int8_pallas_recall = r
            if qep is not None:
                m = min(max(kk * 8, 32), N_DOCS)
                # Independent of the bf16-Pallas variant's success: the s8
                # row must gate its own headline candidacy on its own
                # measured recall even if the sibling variant errored.
                if kk == 10 and "int8_pallas_s8_p50_ms" in extras:
                    idx_s8p = blocked_idx(
                        lambda q, k: quantized_search(
                            qep, qsp, embp, sqnp, payp, q, n_d,
                            eta, ep, k=k, m=m, normalize=True,
                            approx_select=True, pallas_stage1=True,
                            int8_queries=True), kk,
                        qblock=32,
                    )
                    int8_pallas_s8_recall = float(
                        recall_matrix(idx_s8p, idx_f32)
                    )
                    extras["int8_pallas_s8_recall_vs_f32_at_k10"] = round(
                        int8_pallas_s8_recall, 6
                    )
                if kk == 10 and "int8_pallas_s8_blockmax_p50_ms" in extras:
                    idx_s8bm = blocked_idx(
                        lambda q, k: quantized_search(
                            qep, qsp, embp, sqnp, payp, q, n_d,
                            eta, ep, k=k, m=m, normalize=True,
                            pallas_stage1=True, int8_queries=True,
                            blockmax_select=True), kk,
                        qblock=32,
                    )
                    int8_pallas_s8_bm_recall = float(
                        recall_matrix(idx_s8bm, idx_f32)
                    )
                    extras["int8_pallas_s8_blockmax_recall_vs_f32_at_k10"] = (
                        round(int8_pallas_s8_bm_recall, 6)
                    )
                if kk == 10 and "int8_batched_fused_ms_per_query" in \
                        extras:
                    # Large-batch fused route recall (the path the batched
                    # row above measured: transposed kernel + int8-block
                    # score recompute).
                    idx_bfq = blocked_idx(
                        lambda q, k: quantized_search(
                            qep, qsp, embp, sqnp, payp, q, n_d,
                            eta, ep, k=k, m=m, normalize=True,
                            pallas_stage1=True, int8_queries=True,
                            blockmax_select=True, fused_bmax=True), kk,
                        qblock=128,
                    )
                    extras["int8_batched_fused_recall_vs_f32_at_k10"] = (
                        round(float(recall_matrix(idx_bfq, idx_f32)), 6)
                    )
                if kk == 10 and "int8_pallas_s8_bmfused_p50_ms" in extras:
                    # Same selection math as the two-pass blockmax row, but
                    # the tier's recall is measured on its own fused kernel
                    # (Mosaic vs XLA f32 fma ordering can differ in ulps).
                    idx_s8bf = blocked_idx(
                        lambda q, k: quantized_search(
                            qep, qsp, embp, sqnp, payp, q, n_d,
                            eta, ep, k=k, m=m, normalize=True,
                            pallas_stage1=True, int8_queries=True,
                            blockmax_select=True, fused_bmax=True), kk,
                        qblock=32,
                    )
                    int8_pallas_s8_bmf_recall = float(
                        recall_matrix(idx_s8bf, idx_f32)
                    )
                    extras["int8_pallas_s8_bmfused_recall_vs_f32_at_k10"] = (
                        round(int8_pallas_s8_bmf_recall, 6)
                    )
                if (kk == 10 and q4_emb is not None
                        and "int4_pallas_s4_bmfused_p50_ms" in extras):
                    # int4 tier recall: 4x refine margin (m4) + the doubled
                    # block margin inside quantized_search.  One row covers
                    # both the chained and batched routes — the chunked
                    # large-batch dispatch re-runs the identical small-Q
                    # fused pipeline per 32-query group.
                    m4 = min(max(kk * 32, 32), N_DOCS)
                    idx_i4 = blocked_idx(
                        lambda q, k: quantized_search(
                            q4_emb, q4_scales, embp, sqnp, payp, q, n_d,
                            eta, ep, k=k, m=m4, normalize=True,
                            pallas_stage1=True, int8_queries=True,
                            blockmax_select=True, fused_bmax=True,
                            int4_packed=True), kk,
                        qblock=32,
                    )
                    extras["int4_bmfused_recall_vs_f32_at_k10"] = round(
                        float(recall_matrix(idx_i4, idx_f32)), 6
                    )
            if kk == 10:
                extras["recall_queries"] = N_QUERIES
                sect_s["recall_k10"] = time.perf_counter() - t_sec
                emit()  # headline now recall-gated on the full query set
        extras["recall_queries"] = N_QUERIES
        sect_s["recall"] = time.perf_counter() - t_sec
        emit()
    if embp is not None:
        del embp, sqnp, payp, qep, qsp, q4_emb, q4_scales

    # ---- raw single-dispatch latency (includes host<->device RTT) --------
    if not over_budget(margin=30.0):
        q0 = queries_h[:1]
        float(index.search_batch(q0, k=K, eta=0.25,
                                 entropy_pref=0.1)[0][0, 0])
        raw_ms = []
        for i in range(min(50, N_QUERIES)):
            t = time.perf_counter()
            s, _ = index.search_batch(queries_h[i : i + 1], k=K, eta=0.25,
                                      entropy_pref=0.1)
            float(s[0, 0])
            raw_ms.append((time.perf_counter() - t) * 1e3)
        extras["raw_dispatch_p50_ms_incl_host_rtt"] = round(
            float(np.percentile(raw_ms, 50)), 4
        )
    else:
        skipped.append("raw_dispatch")

    # ---- batched QPS (all queries in one fused call) -----------------------
    if not over_budget(margin=30.0):
        s, _ = index.search_batch(queries_h, k=K, eta=0.25, entropy_pref=0.1)
        float(s[0, 0])  # compile the [Q, D] shape
        batch_s = []
        for _ in range(3):
            t = time.perf_counter()
            s, _ = index.search_batch(queries_h, k=K, eta=0.25,
                                      entropy_pref=0.1)
            float(s[0, 0])
            batch_s.append(max(time.perf_counter() - t - sync_floor_s, 0.0))
        batch_s = min(batch_s)
        extras["batched_qps"] = round(N_QUERIES / batch_s, 1)
        extras["batched_ms_per_query"] = round(batch_s / N_QUERIES * 1e3, 4)
    else:
        skipped.append("batched_qps")

    # ---- memory footprint ---------------------------------------------------
    extras["index_hbm_gb_f32"] = round(
        (emb_d.nbytes + sqn_d.nbytes + pay_d.nbytes) / 2**30, 3
    )
    extras["index_hbm_gb_bf16"] = round(
        (emb16.nbytes + sqn_d.nbytes + pay_d.nbytes) / 2**30, 3
    )

    emit()

    # ---- IVF tier -------------------------------------------------------------
    if "ivf" in SECTIONS and over_budget(margin=90.0):
        skipped.append("ivf")
        SECTIONS.discard("ivf")
    if "ivf" in SECTIONS:
        t_sec = time.perf_counter()
        from dewi_tpu.index.ivf import IVFIndex

        ivf = IVFIndex(dim=DIM, nlist=1024, nprobe=32, dewi_tier=1024,
                       kmeans_iters=8)
        ivf.store.attach_device(doc_ids, emb, pay)  # exact-length arrays
        t0 = time.perf_counter()
        ivf.build()
        vsync(ivf._dev[1])
        extras["ivf_build_s_device_side"] = round(time.perf_counter() - t0, 1)
        # Warm rebuild: same shapes, traces cached — the steady-state build
        # cost (the cold number above is dominated by jit compiles, which a
        # production process pays once).
        t0 = time.perf_counter()
        ivf.build()
        vsync(ivf._dev[1])
        extras["ivf_build_warm_s_device_side"] = round(
            time.perf_counter() - t0, 2
        )

        vi, ii = ivf.search_batch(queries_h, k=K, eta=0.25, entropy_pref=0.1)
        vsync(vi)
        t0 = time.perf_counter()
        vi, ii = ivf.search_batch(queries_h, k=K, eta=0.25, entropy_pref=0.1)
        vsync(vi)
        extras["ivf_batched_ms_per_query"] = round(
            max(time.perf_counter() - t0 - sync_floor_s, 0.0)
            / N_QUERIES * 1e3, 4
        )
        idx_f32 = blocked_idx(
            lambda q, k: fused_search(emb_d, sqn_d, pay_d, q, n_d, eta, ep,
                                      k=k, normalize=True), K
        )
        extras["ivf_recall_at_k10_random_corpus"] = round(
            float(recall_matrix(np.asarray(ii), idx_f32)), 4
        )
        del ivf  # free bucket arrays before the clustered run
        if over_budget(margin=60.0):
            skipped.append("ivf_clustered")
            sect_s["ivf"] = time.perf_counter() - t_sec
            emit()
            SECTIONS.discard("ivf")
    if "ivf" in SECTIONS:
        # Clustered corpus (the realistic case for IVF): 512 Gaussian modes.
        nc, n_sub = 512, min(200_000, N_DOCS)
        kc1, kc2, kc3 = jax.random.split(jax.random.PRNGKey(7), 3)
        centers = jax.random.normal(kc1, (nc, DIM), jnp.float32) * 3.0
        labels = jax.random.randint(kc2, (n_sub,), 0, nc)
        cemb = centers[labels] + jax.random.normal(
            kc3, (n_sub, DIM), jnp.float32
        )
        cpay = pay_d[:n_sub]
        ids_sub = doc_ids[:n_sub]
        civf = IVFIndex(dim=DIM, nlist=512, nprobe=32, dewi_tier=1024,
                        kmeans_iters=8)
        civf.store.attach_device(ids_sub, cemb, cpay)
        civf.build()
        cexact = ExactIndex(dim=DIM)
        cexact.store.attach_device(ids_sub, cemb, cpay)
        cexact.build()
        cq = np.asarray(
            centers[jax.random.randint(kc1, (N_QUERIES,), 0, nc)]
            + jax.random.normal(kc2, (N_QUERIES, DIM), jnp.float32)
        )
        _, ci = civf.search_batch(cq, k=K, eta=0.25, entropy_pref=0.1)
        _, ce = cexact.search_batch(cq, k=K, eta=0.25, entropy_pref=0.1)
        extras["ivf_recall_at_k10_clustered_200k"] = round(
            float(recall_matrix(np.asarray(ci), np.asarray(ce))), 4
        )
        del civf, cexact, cemb
        sect_s["ivf"] = time.perf_counter() - t_sec
        emit()

    # ---- Pallas streaming kernels vs the XLA fused path ---------------------
    if "pallas" in SECTIONS and over_budget(margin=60.0):
        skipped.append("pallas")
        SECTIONS.discard("pallas")
    if "pallas" in SECTIONS:
        try:
            from dewi_tpu.ops.pallas_search import (
                pallas_fused_search, pallas_int8_search,
            )
            from dewi_tpu.ops.similarity import l2_normalize

            emb_n = l2_normalize(emb_d)
            block = 8192 if N_DOCS % 8192 == 0 else 1024
            qn = np.asarray(l2_normalize(jnp.asarray(queries_h[:8])))

            def rate_ms(fn, reps=4):
                jax.block_until_ready(fn())
                t0 = time.perf_counter()
                for _ in range(reps):
                    out = fn()
                jax.block_until_ready(out)
                return (time.perf_counter() - t0) / reps * 1e3

            for nq in (1, 8):
                qx = qn[:nq]
                pal = rate_ms(lambda: pallas_fused_search(
                    emb_n, pay_d, qx, n_d, eta, ep, k=K, block=block))
                xla = rate_ms(lambda: fused_search(
                    emb_n, sqn_d, pay_d, qx, n_d, eta, ep, k=K,
                    normalize=False))
                extras[f"pallas_f32_ms_q{nq}"] = round(pal, 3)
                extras[f"xla_f32_ms_q{nq}"] = round(xla, 3)
            if q_emb is not None:
                pal = rate_ms(lambda: pallas_int8_search(
                    q_emb, q_scales, pay_d, qn, n_d, eta, ep, k=K,
                    block=block))
                extras["pallas_int8_ms_q8"] = round(pal, 3)
        except Exception as e:  # noqa: BLE001 — Pallas is an opt-in path
            extras["pallas_error"] = str(e)[:200]

    # ---- signal backbones (device-resident throughput, small preset) --------
    if "signals" in SECTIONS and over_budget(margin=90.0):
        skipped.append("signals")
        SECTIONS.discard("signals")
    if "signals" in SECTIONS:
        t_sec = time.perf_counter()
        del emb16
        if q_emb is not None:
            del q_emb, q_scales
        from dewi_tpu.signals import TextEntropyEstimator
        from dewi_tpu.signals.image_entropy import ImageEntropyEstimator
        from dewi_tpu.signals.redundancy import max_offdiag_similarity

        per_doc = 0.0
        est = TextEntropyEstimator(model_name="small", batch_size=512)
        S, bs = est.superbatch, est.batch_size
        ids0 = np.full((bs, 256), 65, np.int32)
        mask0 = np.ones((bs, 256), np.float32)
        ids3 = jnp.asarray(np.broadcast_to(ids0, (S,) + ids0.shape))
        mask3 = jnp.asarray(np.broadcast_to(mask0, (S,) + mask0.shape))
        vsync(est._score_super(est.params, ids3, mask3))
        t0 = time.perf_counter()
        for _ in range(4):
            out = est._score_super(est.params, ids3, mask3)
        vsync(out)
        dps = S * bs * 4 / max(time.perf_counter() - t0 - sync_floor_s, 1e-9)
        extras["signals_text_docs_per_sec_device"] = round(dps, 1)
        per_doc += 1.0 / dps

        ie = ImageEntropyEstimator(model_name="small", batch_size=64)
        img4 = jnp.zeros((ie.superbatch, 64, 224, 224, 3), jnp.float32)
        rngs = jax.random.split(jax.random.PRNGKey(0), ie.superbatch)
        vsync(ie._stats_super(ie.params, img4, rngs))
        t0 = time.perf_counter()
        for _ in range(4):
            out = ie._stats_super(ie.params, img4, rngs)
        vsync(out)
        dps = ie.superbatch * 64 * 4 / max(
            time.perf_counter() - t0 - sync_floor_s, 1e-9
        )
        extras["signals_image_docs_per_sec_device"] = round(dps, 1)
        per_doc += 2.0 / dps  # MAE + ~CLIP-image-tower-equivalent cost

        t0 = time.perf_counter()
        max_offdiag_similarity(emb_d, block=4096)
        red_s = (time.perf_counter() - t0) * (1_000_000 / N_DOCS) ** 2
        extras["signals_redundancy_1M_s"] = round(red_s, 1)
        per_doc += red_s / 1_000_000

        extras["full_signals_1M_min_single_chip_est"] = round(
            per_doc * 1_000_000 / 60, 2
        )
        extras["full_signals_detail"] = "see docs/perf/signals_{small,base}.json"
        sect_s["signals"] = time.perf_counter() - t_sec

    # Final authoritative emission (the same line emit() printed after each
    # section, now with every completed section's rows).
    signal.alarm(0)
    emit()


if __name__ == "__main__":
    sys.exit(main())
