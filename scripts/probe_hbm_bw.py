#!/usr/bin/env python
"""Measure the device's practically achievable HBM bandwidth.

Establishes the real roofline for the stage-1 corpus scan: nominal v5e HBM
is 819 GB/s, but the achievable fraction on a given part (and through the
axon dev tunnel) is an empirical question.  Uses bench.py's chained
methodology — a fori_loop of iterations inside one dispatch where each
iteration's scalar input is perturbed by the previous result, so XLA can
neither hoist the body out of the loop nor batch iterations — over read
patterns on a 256 MB int8 array:

  reduce_sum_f32   — read + per-element convert + full reduce
  copy_rw          — read + write a same-size int8 array (2x bytes)
  matvec_bf16_xla  — the actual stage-1 shape: [1,D] x [D,N] via XLA

Usage: python scripts/probe_hbm_bw.py [--mb 256] [--chain 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--chain", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--output", default="docs/perf/hbm_bw.json")
    args = ap.parse_args()

    from dewi_tpu.utils.compile_cache import enable_compilation_cache
    from dewi_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    n_bytes = args.mb * (1 << 20)
    d = args.dim
    n_rows = n_bytes // d
    x = jnp.asarray(
        np.random.default_rng(0).integers(-127, 128, (n_rows, d), np.int8)
    )
    q = jnp.asarray(np.random.default_rng(1).normal(size=(1, d)), jnp.float32)
    jax.block_until_ready((x, q))
    chain = args.chain

    # Null round trip: dispatch + fetch of a trivial scalar computation.
    @jax.jit
    def _null(seed):
        return seed * 2.0

    float(_null(np.float32(0.0)))
    _rtts = []
    for i in range(args.reps):
        t0 = time.perf_counter()
        float(_null(np.float32(i + 1.0)))
        _rtts.append(time.perf_counter() - t0)
    rtt_floor_s = float(np.median(_rtts))

    def chained_ms(fn, *operands, chain=None):
        """Median per-iteration ms of `chain` serialized body evals.

        fn(carry_scalar, *operands) -> f32 scalar; the next iteration's
        carry is that result, and fn must mix carry into work that touches
        every operand byte (otherwise XLA hoists the body).

        Timing is by FETCHING the scalar result (float(out)), not
        block_until_ready: through the axon tunnel block_until_ready can
        return without waiting for execution (measured: 0.012 ms "block"
        followed by a 7.2 s value fetch), which made the first version of
        this probe report 174 TB/s.  Only the value fetch provably waits.
        The tunnel RTT floor (a fetch of a trivial computation) is
        measured separately and subtracted."""
        if chain is None:
            chain = args.chain

        @jax.jit
        def run(seed, *ops):
            def body(_, carry):
                return fn(carry, *ops)

            return jax.lax.fori_loop(0, chain, body, seed)

        float(run(np.float32(0.0), *operands))  # compile + settle
        times = []
        for i in range(args.reps):
            seed = np.float32(1e-9 * (i + 1))
            t0 = time.perf_counter()
            float(run(seed, *operands))
            times.append(time.perf_counter() - t0)
        total = float(np.median(times))
        return max(total - rtt_floor_s, 0.0) / chain

    results = {}

    # read-only full reduce.  The carry must enter through a NONLINEAR op:
    # sum(a + c) = sum(a) + N*c and dot(q+c, A) = dot(q,A) + c*(1@A) are
    # identities XLA's algebraic simplifier applies, after which the heavy
    # term is loop-invariant and gets hoisted (measured: a "256 MB reduce"
    # at 0.0013 ms).  maximum() with an always-smaller scalar defeats it.
    def r_sum(carry, a):
        return jnp.sum(jnp.maximum(a.astype(jnp.float32), carry * 1e-12 - 1e6))

    t = chained_ms(r_sum, x)
    results["reduce_sum_f32"] = {
        "ms": round(t * 1e3, 4), "gbps": round(n_bytes / t / 1e9, 1)
    }
    # sanity: doubling the chain must leave per-iteration time ~flat.  If
    # the 2x run is much faster per iteration, the measurement is being
    # served from a cache / the loop body was hoisted — refuse to publish.
    t2 = chained_ms(r_sum, x, chain=2 * args.chain)
    results["sanity_chain2x_per_iter_ratio"] = round(t2 / t, 3)
    if t2 / t < 0.5:
        print("SANITY FAILED: chain-2x per-iter time halved; not publishing",
              file=sys.stderr)
        print(json.dumps(results, indent=2))
        return 1

    # read + write: materialize a full-size int8 output each iteration.
    # The scalar probe reads only y[:1024]; without a barrier XLA fuses
    # max+slice+sum and never writes the other rows (measured: total ==
    # RTT floor).  optimization_barrier forces y to exist in HBM.
    def r_copy(carry, a):
        y = jnp.maximum(a, carry.astype(jnp.int8) - jnp.int8(127))
        y = jax.lax.optimization_barrier(y)
        return jnp.sum(y[:1024].astype(jnp.int32)).astype(jnp.float32)

    t = chained_ms(r_copy, x)
    results["copy_rw"] = {
        "ms": round(t * 1e3, 4),
        "gbps": round(2 * n_bytes / t / 1e9, 1) if t > 0 else None,
    }

    # the stage-1 shape via plain XLA: [1,D] bf16 x int8->bf16 corpus
    def r_matvec(carry, a, qq):
        qp = qq + carry * 1e-12
        qp = qp / jnp.linalg.norm(qp)  # nonlinear: blocks dot factoring
        s = jax.lax.dot_general(
            qp.astype(jnp.bfloat16),
            a.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.max(s)

    t = chained_ms(r_matvec, x, q)
    results["matvec_bf16_xla"] = {
        "ms": round(t * 1e3, 4), "gbps": round(n_bytes / t / 1e9, 1)
    }

    # wide matmul: Q=128 queries fill MXU rows — if this is much faster
    # per-byte than Q=1, arithmetic (not HBM) limits the matvec.
    q128 = jnp.asarray(
        np.random.default_rng(2).normal(size=(128, d)), jnp.float32
    )

    def r_mm(carry, a, qq):
        qp = qq + carry * 1e-12
        qp = qp / jnp.linalg.norm(qp, axis=1, keepdims=True)
        s = jax.lax.dot_general(
            qp.astype(jnp.bfloat16),
            a.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.max(s)

    t = chained_ms(r_mm, x, q128)
    results["matmul128_bf16_xla"] = {
        "ms": round(t * 1e3, 4), "gbps": round(n_bytes / t / 1e9, 1)
    }

    out = {
        "device": str(jax.devices()[0]),
        "bytes": n_bytes,
        "chain": chain,
        "rtt_floor_ms": round(rtt_floor_s * 1e3, 3),
        "nominal_v5e_gbps": 819,
        "results": results,
    }
    print(json.dumps(out, indent=2))
    Path(args.output).write_text(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
