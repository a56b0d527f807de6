#!/usr/bin/env python
"""DEWI-TPU benchmark: 1M-doc index+score build and k=10 query latency.

Protocol follows the reference's measurement script defaults
(reference scripts/profile_index.py:241-254: dim=256, n_queries=1000, k=10)
at the 1M-doc headline scale (reference README.md:163: 2.1 hr build, 22 ms
query on 16-core CPU + V100).

Latency methodology: the development TPU is reached through a tunnel whose
host round-trip (~25-35 ms) dwarfs device time, so the headline p50 is
measured with a chained on-device loop — R sequential searches inside ONE
jitted program (each query perturbed by the previous result so XLA cannot
batch or elide them), total time / R.  Raw single-dispatch latency
(including host RTT) and fully-batched QPS are reported as extras.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N, ...extras}
vs_baseline is the speedup over the reference's 22 ms 1M-doc query latency.
"""

import json
import os
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


def main() -> None:
    import jax

    # Platform override for CI smoke runs (must precede backend init; the
    # axon site hook ignores the JAX_PLATFORMS env var).
    plat = os.environ.get("DEWI_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    from dewi_tpu.index import ExactIndex
    from dewi_tpu.ops.similarity import fused_search
    from dewi_tpu.scorer import DewiScorer
    from dewi_tpu.types import PAYLOAD_FIELDS

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
    jax.block_until_ready(index.store.device_arrays()[0])
    build_s = time.perf_counter() - t0
    docs_per_sec = N_DOCS / build_s

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

    q0 = queries_h[:1]
    jax.block_until_ready(chained(emb_d, sqn_d, pay_d, n_d, q0))  # compile
    chain_ms = []
    for i in range(min(8, N_QUERIES)):
        t = time.perf_counter()
        jax.block_until_ready(
            chained(emb_d, sqn_d, pay_d, n_d, queries_h[i : i + 1])
        )
        chain_ms.append((time.perf_counter() - t) * 1e3 / CHAIN)
    p50_device = float(np.percentile(chain_ms, 50))

    # ---- bf16 storage variant (the recommended serving config) -----------
    emb16 = emb_d.astype(jnp.bfloat16)
    jax.block_until_ready(chained(emb16, sqn_d, pay_d, n_d, q0))
    bf16_ms = []
    for i in range(min(6, N_QUERIES)):
        t = time.perf_counter()
        jax.block_until_ready(
            chained(emb16, sqn_d, pay_d, n_d, queries_h[i : i + 1])
        )
        bf16_ms.append((time.perf_counter() - t) * 1e3 / CHAIN)
    p50_bf16 = float(np.percentile(bf16_ms, 50))

    # Measured (not assumed) recall of the bf16 tier against f32 exact.
    from dewi_tpu.metrics import recall_matrix

    _, idx_f32 = fused_search(
        emb_d, sqn_d, pay_d, queries_h[: min(64, N_QUERIES)], n_d, eta, ep, k=K, normalize=True
    )
    _, idx_bf16 = fused_search(
        emb16, sqn_d, pay_d, queries_h[: min(64, N_QUERIES)], n_d, eta, ep, k=K, normalize=True
    )
    bf16_recall = recall_matrix(np.asarray(idx_bf16), np.asarray(idx_f32))

    # ---- raw single-dispatch latency (includes host<->device RTT) --------
    jax.block_until_ready(
        index.search_batch(q0, k=K, eta=0.25, entropy_pref=0.1)[0]
    )
    raw_ms = []
    for i in range(min(50, N_QUERIES)):
        t = time.perf_counter()
        s, _ = index.search_batch(queries_h[i : i + 1], k=K, eta=0.25,
                                  entropy_pref=0.1)
        jax.block_until_ready(s)
        raw_ms.append((time.perf_counter() - t) * 1e3)

    # ---- batched QPS (all 1000 queries in one fused call) -----------------
    s, _ = index.search_batch(queries_h, k=K, eta=0.25, entropy_pref=0.1)
    jax.block_until_ready(s)  # compile the [1000, D] shape
    batch_s = []
    for _ in range(3):
        t = time.perf_counter()
        s, _ = index.search_batch(queries_h, k=K, eta=0.25, entropy_pref=0.1)
        jax.block_until_ready(s)
        batch_s.append(time.perf_counter() - t)
    batch_s = min(batch_s)
    qps = N_QUERIES / batch_s

    # Headline: the recommended serving config (bf16 storage) when its
    # measured recall vs f32 exact is perfect; otherwise the f32 tier.
    headline = p50_bf16 if bf16_recall >= 1.0 else p50_device
    print(
        json.dumps(
            {
                "metric": "p50_query_latency_1M_docs_k10",
                "value": round(headline, 4),
                "unit": "ms",
                "vs_baseline": round(BASELINE_QUERY_MS / headline, 2),
                "extras": {
                    "latency_method": "chained on-device loop (128 serialized "
                                      "searches per dispatch)",
                    "headline_tier": "bf16-store exact"
                                     if headline == p50_bf16 else "f32 exact",
                    "f32_p50_ms": round(p50_device, 4),
                    "bf16_store_p50_ms": round(p50_bf16, 4),
                    "bf16_recall_vs_f32_at_k10": round(bf16_recall, 6),
                    "raw_dispatch_p50_ms_incl_host_rtt": round(
                        float(np.percentile(raw_ms, 50)), 4
                    ),
                    "batched_qps": round(qps, 1),
                    "batched_ms_per_query": round(batch_s / N_QUERIES * 1e3, 4),
                    "index_score_build_s": round(build_s, 2),
                    "index_docs_per_sec": round(docs_per_sec, 1),
                    "build_vs_baseline": round(BASELINE_BUILD_S / build_s, 1),
                    "recall_vs_exact": 1.0,  # the index IS exact
                    # Device memory for the live index arrays (the
                    # reference's table reports 12.4 GB host RSS at 1M docs).
                    "index_hbm_gb_f32": round(
                        (emb_d.nbytes + sqn_d.nbytes + pay_d.nbytes) / 2**30, 3
                    ),
                    "index_hbm_gb_bf16": round(
                        (emb16.nbytes + sqn_d.nbytes + pay_d.nbytes) / 2**30, 3
                    ),
                    "n_docs": N_DOCS,
                    "dim": DIM,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
