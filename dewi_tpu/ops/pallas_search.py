"""Pallas TPU kernel: streaming fused search with in-VMEM running top-k.

The XLA path (ops/similarity.fused_search) materializes the ``[Q, cap]``
adjusted-score matrix in HBM and runs ``lax.top_k`` over it — a full-width
sort network over the corpus axis.  This kernel streams the corpus through
VMEM in blocks instead: per block it computes the similarity matmul on the
MXU, fuses the DEWI re-rank and validity mask on the VPU, reduces the block
to its local top-k by iterative max-and-mask, and merges into a running
``[Q, k]`` candidate buffer held in VMEM scratch across grid steps.  Nothing
of size ``[Q, cap]`` ever touches HBM, and the top-k cost is
``O(k · cap / BLOCK)`` VPU maxes rather than a corpus-wide sort.

Design notes (see /opt/skills/guides/pallas_guide.md):
* grid iterates corpus blocks; the embeddings/payloads BlockSpecs stream
  ``[BLOCK, D]`` / ``[BLOCK, 8]`` tiles HBM->VMEM with pipelined double
  buffering handled by the Pallas runtime;
* scratch (running scores/indices) persists across grid steps; outputs are
  written once at the final step under ``@pl.when``;
* block size 1024 rows keeps the tile f32-aligned ((8,128) min tile) and
  the VMEM footprint ~1–2 MB at D=256.
"""

from __future__ import annotations

from typing import Any

import functools

import jax
import jax.numpy as jnp

try:  # Pallas TPU lowering is unavailable on some hosts; gate imports.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    pl = None  # type: ignore
    pltpu = None  # type: ignore
    _HAS_PALLAS = False

NEG_INF = -3.4e38  # plain float: jnp scalars would be captured tracers
BLOCK = 1024


def _topk_via_max(adj: jax.Array, base_idx: jax.Array,
                  k: int) -> Any:
    """Top-k of ``adj [Q, B]`` by k unrolled rounds of max+mask.

    ``base_idx [Q, B]`` carries the global row index of each column.
    Mosaic-friendly: no sort network, no scatter, no gather — winner
    indices are extracted with a select + max reduction, winners are
    knocked out with a select.  k is small and static, so the unroll is
    cheap.  Returns ([Q, k] scores, [Q, k] int32 indices).
    """
    cols = jax.lax.broadcasted_iota(jnp.int32, adj.shape, 1)  # [Q, B]
    cur = adj
    scores, idxs = [], []
    for _ in range(k):
        best = jnp.max(cur, axis=1)                        # [Q]
        pos = jnp.argmax(cur, axis=1)                      # [Q]
        hit = cols == pos[:, None]                         # [Q, B]
        idx = jnp.max(jnp.where(hit, base_idx, -1), axis=1)
        cur = jnp.where(hit, NEG_INF, cur)
        scores.append(best)
        idxs.append(idx)
    return jnp.stack(scores, axis=1), jnp.stack(idxs, axis=1)


def _search_kernel(
    n_valid_ref: Any,      # SMEM [1, 1] int32
    eta_ref: Any,          # SMEM [1, 1] f32
    ep_ref: Any,           # SMEM [1, 1] f32
    q_ref: Any,            # VMEM [Q, D] (whole array each step)
    emb_ref: Any,          # VMEM [BLOCK, D] tile
    pay_ref: Any,          # VMEM [BLOCK, 8] tile
    out_scores_ref: Any,   # VMEM [Q, k]
    out_idx_ref: Any,      # VMEM [Q, k]
    run_scores: Any,       # scratch VMEM [Q, k]
    run_idx: Any,          # scratch VMEM [Q, k]
    *,
    k: int,
) -> None:
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init() -> None:
        run_scores[:] = jnp.full_like(run_scores, NEG_INF)
        run_idx[:] = jnp.zeros_like(run_idx)

    q = q_ref[:]                                            # [Q, D]
    emb = emb_ref[:]                                        # [B, D]
    sim = jax.lax.dot_general(
        q, emb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # [Q, B]
    pay = pay_ref[:]
    eta = eta_ref[0, 0]
    ep = ep_ref[0, 0]
    adj = (
        (1.0 - eta) * sim
        + eta * pay[:, 0][None, :]
        + ep * 0.5 * (pay[:, 1] + pay[:, 3])[None, :]
    )
    # Mask rows beyond the live count (capacity slack).
    row0 = step * emb.shape[0]
    col = row0 + jax.lax.broadcasted_iota(jnp.int32, adj.shape, 1)
    adj = jnp.where(col < n_valid_ref[0, 0], adj, NEG_INF)

    b_scores, b_idx = _topk_via_max(adj, col, k)            # [Q, k] each

    # Merge block candidates with the running buffer (gather-free: the
    # doc indices ride through _topk_via_max as base_idx).
    cat_s = jnp.concatenate([run_scores[:], b_scores], axis=1)   # [Q, 2k]
    cat_i = jnp.concatenate([run_idx[:], b_idx], axis=1)
    m_scores, m_idx = _topk_via_max(cat_s, cat_i, k)
    run_scores[:] = m_scores
    run_idx[:] = m_idx

    @pl.when(step == n_steps - 1)
    def _emit() -> None:
        out_scores_ref[:] = run_scores[:]
        out_idx_ref[:] = run_idx[:]


@functools.partial(jax.jit, static_argnames=("k", "block", "interpret"))
def pallas_fused_search(
    embeddings: jax.Array,   # [cap, D] pre-normalized f32, cap % block == 0
    payloads: jax.Array,     # [cap, 8]
    queries: jax.Array,      # [Q, D] pre-normalized f32
    n_valid: jax.Array,      # scalar int32
    eta: jax.Array,
    entropy_pref: jax.Array,
    k: int = 10,
    block: int = BLOCK,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Streaming exact DEWI search; returns ([Q, k] scores, [Q, k] idx)."""
    cap, d = embeddings.shape
    nq = queries.shape[0]
    assert cap % block == 0, f"capacity {cap} must be a multiple of {block}"
    grid = (cap // block,)

    kernel = functools.partial(_search_kernel, k=k)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, k), jnp.float32),
            jax.ShapeDtypeStruct((nq, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((nq, k), jnp.float32),
            pltpu.VMEM((nq, k), jnp.int32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(n_valid, jnp.int32).reshape(1, 1),
        jnp.asarray(eta, jnp.float32).reshape(1, 1),
        jnp.asarray(entropy_pref, jnp.float32).reshape(1, 1),
        queries.astype(jnp.float32),
        embeddings,
        payloads,
    )


def _int8_search_kernel(
    n_valid_ref: Any,      # SMEM [1, 1] int32
    eta_ref: Any,          # SMEM [1, 1] f32
    ep_ref: Any,           # SMEM [1, 1] f32
    q_ref: Any,            # VMEM [Q, D] bf16 (whole array each step)
    emb_ref: Any,          # VMEM [BLOCK, D] int8 tile
    scale_ref: Any,        # VMEM [BLOCK] f32 tile (as [BLOCK, 1])
    pay_ref: Any,          # VMEM [BLOCK, 8] tile
    out_scores_ref: Any,   # VMEM [Q, k]
    out_idx_ref: Any,      # VMEM [Q, k]
    run_scores: Any,       # scratch VMEM [Q, k]
    run_idx: Any,          # scratch VMEM [Q, k]
    *,
    k: int,
) -> None:
    """int8 streaming variant: tiles move HBM->VMEM at a quarter of the f32
    traffic; dequant happens in-register (int8 -> bf16 before the MXU dot)."""
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init() -> None:
        run_scores[:] = jnp.full_like(run_scores, NEG_INF)
        run_idx[:] = jnp.zeros_like(run_idx)

    q = q_ref[:]                                            # [Q, D] bf16
    emb = emb_ref[:].astype(jnp.bfloat16)                   # [B, D]
    sim = jax.lax.dot_general(
        q, emb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale_ref[:][:, 0][None, :]                         # [Q, B]
    pay = pay_ref[:]
    eta = eta_ref[0, 0]
    ep = ep_ref[0, 0]
    adj = (
        (1.0 - eta) * sim
        + eta * pay[:, 0][None, :]
        + ep * 0.5 * (pay[:, 1] + pay[:, 3])[None, :]
    )
    row0 = step * emb.shape[0]
    col = row0 + jax.lax.broadcasted_iota(jnp.int32, adj.shape, 1)
    adj = jnp.where(col < n_valid_ref[0, 0], adj, NEG_INF)

    b_scores, b_idx = _topk_via_max(adj, col, k)
    cat_s = jnp.concatenate([run_scores[:], b_scores], axis=1)
    cat_i = jnp.concatenate([run_idx[:], b_idx], axis=1)
    m_scores, m_idx = _topk_via_max(cat_s, cat_i, k)
    run_scores[:] = m_scores
    run_idx[:] = m_idx

    @pl.when(step == n_steps - 1)
    def _emit() -> None:
        out_scores_ref[:] = run_scores[:]
        out_idx_ref[:] = run_idx[:]


@functools.partial(jax.jit, static_argnames=("k", "block", "interpret"))
def pallas_int8_search(
    emb_i8: jax.Array,       # [cap, D] int8, cap % block == 0
    scales: jax.Array,       # [cap] f32 per-row scales
    payloads: jax.Array,     # [cap, 8]
    queries: jax.Array,      # [Q, D] pre-normalized f32
    n_valid: jax.Array,
    eta: jax.Array,
    entropy_pref: jax.Array,
    k: int = 10,
    block: int = 2048,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Streaming int8 DEWI search (approximate sim; pair with f32 refine)."""
    cap, d = emb_i8.shape
    nq = queries.shape[0]
    assert cap % block == 0, f"capacity {cap} must be a multiple of {block}"
    grid = (cap // block,)
    kernel = functools.partial(_int8_search_kernel, k=k)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, k), jnp.float32),
            jax.ShapeDtypeStruct((nq, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((nq, k), jnp.float32),
            pltpu.VMEM((nq, k), jnp.int32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(n_valid, jnp.int32).reshape(1, 1),
        jnp.asarray(eta, jnp.float32).reshape(1, 1),
        jnp.asarray(entropy_pref, jnp.float32).reshape(1, 1),
        queries.astype(jnp.bfloat16),
        emb_i8,
        scales.reshape(-1, 1).astype(jnp.float32),
        payloads,
    )


SCORES_BLOCK = 8192  # measured optimum on v5e at 1M x 256 (0.596 ms chained)


def _scores_kernel(q_ref: Any, emb_ref: Any, mult_ref: Any,
                   add_ref: Any, out_ref: Any) -> None:
    acc = jax.lax.dot_general(
        q_ref[...].astype(jnp.bfloat16), emb_ref[...].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # [Q, BLOCK]
    out_ref[...] = (acc * mult_ref[...] + add_ref[...]).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block", "interpret", "out_dtype")
)
def pallas_scores_matrix(
    emb_i8: jax.Array,    # [cap, D] int8, cap % block == 0
    mult: jax.Array,      # [cap] f32 per-row multiplier (dequant scale fold)
    add: jax.Array,       # [cap] f32 per-row addend (re-rank + mask fold)
    queries: jax.Array,   # [Q, D] f32, pre-normalized if cosine
    block: int = SCORES_BLOCK,
    interpret: bool = False,
    out_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Streaming int8 stage-1: ``[Q, cap]`` adjusted scores, selection outside.

    Unlike :func:`pallas_int8_search`, this kernel does NO in-VMEM top-k —
    the round-1 lesson was that the per-block max-and-mask reduction, not
    the streaming dot, is what loses to XLA.  Here each grid step computes
    the bf16 matvec on the MXU and the folded mult/add epilogue on the VPU
    while the next corpus block streams in; ``lax.approx_max_k`` runs on
    the result outside.  Measured 0.596 ms vs 0.62-0.66 ms for the
    equivalent XLA stage-1 at 1M x 256, Q=1 (chained, one v5e chip).  The
    [Q, cap] f32 writeback (4 MB/query at 1M) is ~2%% of the 256 MB corpus
    read, so the scores-only shape stays bandwidth-optimal.

    ``out_dtype=jnp.bfloat16`` halves the scores writeback AND the
    selection pass's read — irrelevant at Q=1 but material for batched Q,
    where the [Q, cap] matrix is Q·cap·4 bytes (512 MB at Q=128, 1M docs).
    Selection consumes only the candidate *indices*; stage 2 re-ranks the
    candidates exactly in f32, so bf16 score rounding only perturbs which
    candidates make the top-m (recall-gated in bench).
    """
    cap, d = emb_i8.shape
    nq = queries.shape[0]
    assert cap % block == 0, f"capacity {cap} must be a multiple of {block}"
    grid = (cap // block,)
    return pl.pallas_call(
        _scores_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq, cap), out_dtype),
        interpret=interpret,
    )(
        queries.astype(jnp.float32),
        emb_i8,
        mult.reshape(1, -1).astype(jnp.float32),
        add.reshape(1, -1).astype(jnp.float32),
    )


def _scores_kernel_s8(q_ref: Any, emb_ref: Any, qscale_ref: Any,
                      mult_ref: Any, add_ref: Any, out_ref: Any) -> None:
    acc = jax.lax.dot_general(
        q_ref[...], emb_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                      # [Q, BLOCK] i32
    out_ref[...] = (
        acc.astype(jnp.float32) * (qscale_ref[...] * mult_ref[...])
        + add_ref[...]
    ).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block", "interpret", "out_dtype")
)
def pallas_scores_matrix_s8(
    emb_i8: jax.Array,    # [cap, D] int8, cap % block == 0
    mult: jax.Array,      # [cap] f32 per-row multiplier (dequant scale fold)
    add: jax.Array,       # [cap] f32 per-row addend (re-rank + mask fold)
    q_i8: jax.Array,      # [Q, D] int8 quantized queries
    q_scale: jax.Array,   # [Q] f32 per-query dequant scales
    block: int = SCORES_BLOCK,
    interpret: bool = False,
    out_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Native s8xs8 streaming stage-1: ``[Q, cap]`` adjusted scores.

    Same streaming shape as :func:`pallas_scores_matrix`, but both operands
    enter the MXU as int8 (s32 accumulate) — v5e runs int8 matmuls at 2x
    bf16 throughput AND the corpus stream skips the per-element int8->bf16
    VPU convert the bf16 kernel pays on every block.  The query's symmetric
    quantization scale rides the epilogue as a per-query column factor
    (``acc * (q_scale·mult) + add``), so this matches the XLA
    ``int8_queries`` path of ops/quantized.quantized_search bit-for-bit up
    to f32 multiply-add ordering.  Stage-1 error = int8 storage + int8
    query rounding; downstream f32 refinement re-ranks exactly.
    """
    cap, d = emb_i8.shape
    nq = q_i8.shape[0]
    assert cap % block == 0, f"capacity {cap} must be a multiple of {block}"
    grid = (cap // block,)
    return pl.pallas_call(
        _scores_kernel_s8,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq, cap), out_dtype),
        interpret=interpret,
    )(
        q_i8,
        emb_i8,
        q_scale.reshape(-1, 1).astype(jnp.float32),
        mult.reshape(1, -1).astype(jnp.float32),
        add.reshape(1, -1).astype(jnp.float32),
    )


def _s4_acc(q: jax.Array, packed: jax.Array) -> jax.Array:
    """In-kernel int4 dot: ``[Q, D] i8 x [B, D/2] packed -> [Q, B] i32``.

    Packing contract (ops/quantized.quantize_rows_int4): byte j = hi*16 +
    (lo+8) with hi = dim j (signed nibble) and lo = dim j + D/2.  The
    arithmetic shift recovers hi because the low bits are non-negative;
    the widen-to-i32 round-trip is for Mosaic, whose bitwise/shift
    legalization on native i8 vectors is backend-dependent.

    Deliberately TWO plane dots (query halves against the hi/lo nibble
    planes) rather than unpack-concat-dot: the lane-axis concatenate both
    materializes a second [B, D] i8 tile in VMEM and legalizes poorly —
    measured 0.99 ms/query on the Q=32 batched route vs 0.275 ms chained
    at Q=1 (VMEM spill thrash).  The plane split was chosen so each dot's
    operands are contiguous halves of the query.
    """
    pi = packed.astype(jnp.int32)
    hi = (pi >> 4).astype(jnp.int8)
    lo = ((pi & 15) - 8).astype(jnp.int8)
    d2 = packed.shape[1]
    dn = (((1,), (1,)), ((), ()))
    return jax.lax.dot_general(
        q[:, :d2], hi, dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    ) + jax.lax.dot_general(
        q[:, d2:], lo, dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )


def _scores_kernel_s4(q_ref: Any, emb_ref: Any, qscale_ref: Any,
                      mult_ref: Any, add_ref: Any, out_ref: Any) -> None:
    acc = _s4_acc(q_ref[...], emb_ref[...])                # [Q, BLOCK] i32
    out_ref[...] = (
        acc.astype(jnp.float32) * (qscale_ref[...] * mult_ref[...])
        + add_ref[...]
    ).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block", "interpret", "out_dtype")
)
def pallas_scores_matrix_s4(
    emb_s4: jax.Array,    # [cap, D/2] nibble-packed int4, cap % block == 0
    mult: jax.Array,      # [cap] f32 per-row multiplier (dequant scale fold)
    add: jax.Array,       # [cap] f32 per-row addend (re-rank + mask fold)
    q_i8: jax.Array,      # [Q, D] int8 quantized queries
    q_scale: jax.Array,   # [Q] f32 per-query dequant scales
    block: int = SCORES_BLOCK,
    interpret: bool = False,
    out_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """int4-storage streaming stage-1: ``[Q, cap]`` adjusted scores.

    Same streaming shape as :func:`pallas_scores_matrix_s8` but the corpus
    tile is HALF the bytes: ``[block, D/2]`` packed nibbles stream from
    HBM, unpack on the VPU inside the kernel, and feed the MXU as int8
    (the s8 dot is exact for nibble values).  The stage-1 scan is
    HBM-bound (docs/perf/scan_breakdown.json), so halving the stream is
    the single biggest remaining lever on the headline; stage-1 rounding
    grows from int8 to int4 and is absorbed by a wider refine margin
    downstream (recall-gated in bench/tests).
    """
    cap = emb_s4.shape[0]
    d = q_i8.shape[1]
    nq = q_i8.shape[0]
    assert emb_s4.shape[1] * 2 == d, "packed dim must be D/2"
    assert cap % block == 0, f"capacity {cap} must be a multiple of {block}"
    grid = (cap // block,)
    return pl.pallas_call(
        _scores_kernel_s4,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d // 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq, cap), out_dtype),
        interpret=interpret,
    )(
        q_i8,
        emb_s4,
        q_scale.reshape(-1, 1).astype(jnp.float32),
        mult.reshape(1, -1).astype(jnp.float32),
        add.reshape(1, -1).astype(jnp.float32),
    )


BLOCK_SUB_ALIGN = 128  # lane-aligned sub-block width (== ops.quantized.BLOCKMAX_SUB)
BMAX_BLOCK = 16384  # corpus rows per grid step for the fused bmax kernels:
# the [Q, block/128] out tile must stay lane-aligned (128 sub-block maxima
# per step), which pins block = 128 * 128.  Measured cost of the larger
# stream block vs 8192 is +7 us at 1M x 256 (docs/perf/scan_breakdown.json
# scores_pallas_s8_b16384) — bought back several times over by skipping the
# [Q, cap] scores writeback AND the separate select max-reduce pass.


def _bmax_epilogue(adj: jax.Array, sub: int) -> jax.Array:
    nq, blk = adj.shape
    return jnp.max(adj.reshape(nq, blk // sub, sub), axis=-1)


def _bmax_kernel(q_ref: Any, emb_ref: Any, mult_ref: Any, add_ref: Any,
                 out_ref: Any, *, sub: int) -> None:
    acc = jax.lax.dot_general(
        q_ref[...].astype(jnp.bfloat16), emb_ref[...].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # [Q, BLOCK]
    out_ref[...] = _bmax_epilogue(acc * mult_ref[...] + add_ref[...], sub)


def _bmax_kernel_s8(q_ref: Any, emb_ref: Any, qscale_ref: Any,
                    mult_ref: Any, add_ref: Any, out_ref: Any,
                    *, sub: int) -> None:
    acc = jax.lax.dot_general(
        q_ref[...], emb_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                      # [Q, BLOCK] i32
    adj = (acc.astype(jnp.float32) * (qscale_ref[...] * mult_ref[...])
           + add_ref[...])
    out_ref[...] = _bmax_epilogue(adj, sub)


@functools.partial(jax.jit, static_argnames=("sub", "block", "interpret"))
def pallas_bmax(
    emb_i8: jax.Array,    # [cap, D] int8, cap % block == 0
    mult: jax.Array,      # [cap] f32 per-row multiplier (dequant scale fold)
    add: jax.Array,       # [cap] f32 per-row addend (re-rank + mask fold)
    queries: jax.Array,   # [Q, D] f32, pre-normalized if cosine
    sub: int = 128,
    block: int = BMAX_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    """Fused stage-1 + sub-block max: ``[Q, cap/sub]`` block maxima only.

    The blockmax selection path (ops/quantized.quantized_search,
    ``blockmax_select=True``) discards stage-1 score *values* — stage 2
    re-ranks the winning blocks exactly in f32 — so materializing the
    ``[Q, cap]`` scores matrix in HBM and re-reading it for the max-reduce
    is pure waste.  This kernel reduces each 128-wide sub-block to its max
    in VMEM while the next corpus tile streams in; only the ``[Q, cap/128]``
    maxima (8 KB/query at 1M docs vs 4 MB of scores) ever reach HBM.
    Selection downstream is an exact ``lax.top_k`` over the maxima.
    """
    cap, d = emb_i8.shape
    nq = queries.shape[0]
    assert cap % block == 0, f"capacity {cap} must be a multiple of {block}"
    assert block % sub == 0
    grid = (cap // block,)
    kernel = functools.partial(_bmax_kernel, sub=sub)
    nb_step = block // sub
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq, nb_step), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq, cap // sub), jnp.float32),
        interpret=interpret,
    )(
        queries.astype(jnp.float32),
        emb_i8,
        mult.reshape(1, -1).astype(jnp.float32),
        add.reshape(1, -1).astype(jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("sub", "block", "interpret"))
def pallas_bmax_s8(
    emb_i8: jax.Array,    # [cap, D] int8, cap % block == 0
    mult: jax.Array,      # [cap] f32 per-row multiplier (dequant scale fold)
    add: jax.Array,       # [cap] f32 per-row addend (re-rank + mask fold)
    q_i8: jax.Array,      # [Q, D] int8 quantized queries
    q_scale: jax.Array,   # [Q] f32 per-query dequant scales
    sub: int = 128,
    block: int = BMAX_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    """s8×s8 variant of :func:`pallas_bmax` (native int8 MXU stage-1)."""
    cap, d = emb_i8.shape
    nq = q_i8.shape[0]
    assert cap % block == 0, f"capacity {cap} must be a multiple of {block}"
    assert block % sub == 0
    grid = (cap // block,)
    kernel = functools.partial(_bmax_kernel_s8, sub=sub)
    nb_step = block // sub
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq, nb_step), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq, cap // sub), jnp.float32),
        interpret=interpret,
    )(
        q_i8,
        emb_i8,
        q_scale.reshape(-1, 1).astype(jnp.float32),
        mult.reshape(1, -1).astype(jnp.float32),
        add.reshape(1, -1).astype(jnp.float32),
    )


def _bmax_kernel_s4(q_ref: Any, emb_ref: Any, qscale_ref: Any,
                    mult_ref: Any, add_ref: Any, out_ref: Any,
                    *, sub: int) -> None:
    acc = _s4_acc(q_ref[...], emb_ref[...])                # [Q, BLOCK] i32
    adj = (acc.astype(jnp.float32) * (qscale_ref[...] * mult_ref[...])
           + add_ref[...])
    out_ref[...] = _bmax_epilogue(adj, sub)


@functools.partial(jax.jit, static_argnames=("sub", "block", "interpret"))
def pallas_bmax_s4(
    emb_s4: jax.Array,    # [cap, D/2] nibble-packed int4, cap % block == 0
    mult: jax.Array,      # [cap] f32 per-row multiplier (dequant scale fold)
    add: jax.Array,       # [cap] f32 per-row addend (re-rank + mask fold)
    q_i8: jax.Array,      # [Q, D] int8 quantized queries
    q_scale: jax.Array,   # [Q] f32 per-query dequant scales
    sub: int = 128,
    block: int = BMAX_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    """int4-storage variant of :func:`pallas_bmax_s8`: fused stage-1 +
    sub-block max over a HALF-byte corpus stream.

    Combines the two strongest stage-1 levers: nothing of size ``[Q, cap]``
    touches HBM (only the ``[Q, cap/128]`` maxima leave the kernel) and the
    corpus read itself is 128 MB instead of 256 MB at 1M x 256.  The
    nibble unpack (``_unpack_s4_tile``) runs on the VPU while the next
    packed tile streams in.
    """
    cap = emb_s4.shape[0]
    d = q_i8.shape[1]
    nq = q_i8.shape[0]
    assert emb_s4.shape[1] * 2 == d, "packed dim must be D/2"
    assert cap % block == 0, f"capacity {cap} must be a multiple of {block}"
    assert block % sub == 0
    grid = (cap // block,)
    kernel = functools.partial(_bmax_kernel_s4, sub=sub)
    nb_step = block // sub
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d // 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nq, nb_step), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq, cap // sub), jnp.float32),
        interpret=interpret,
    )(
        q_i8,
        emb_s4,
        q_scale.reshape(-1, 1).astype(jnp.float32),
        mult.reshape(1, -1).astype(jnp.float32),
        add.reshape(1, -1).astype(jnp.float32),
    )


def _bmax_kernel_t(q_ref: Any, emb_ref: Any, mult_ref: Any, add_ref: Any,
                   out_ref: Any, *, sub: int) -> None:
    acc = jax.lax.dot_general(
        emb_ref[...].astype(jnp.bfloat16), q_ref[...].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # [BLOCK, Q]
    adj = acc * mult_ref[...] + add_ref[...]               # col vectors bcast
    blk, nq = adj.shape
    out_ref[...] = jnp.max(adj.reshape(blk // sub, sub, nq), axis=1)


def _bmax_kernel_s8_t(q_ref: Any, emb_ref: Any, qscale_ref: Any,
                      mult_ref: Any, add_ref: Any, out_ref: Any,
                      *, sub: int) -> None:
    acc = jax.lax.dot_general(
        emb_ref[...], q_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                      # [BLOCK, Q] i32
    adj = (acc.astype(jnp.float32) * (mult_ref[...] * qscale_ref[...])
           + add_ref[...])
    blk, nq = adj.shape
    out_ref[...] = jnp.max(adj.reshape(blk // sub, sub, nq), axis=1)


@functools.partial(jax.jit, static_argnames=("sub", "block", "interpret"))
def pallas_bmax_t(
    emb_i8: jax.Array,    # [cap, D] int8, cap % block == 0
    mult: jax.Array,      # [cap] f32 per-row multiplier
    add: jax.Array,       # [cap] f32 per-row addend (re-rank + mask fold)
    queries: jax.Array,   # [Q, D] f32, pre-normalized if cosine
    sub: int = 128,
    block: int = 4096,
    interpret: bool = False,
) -> jax.Array:
    """Transposed fused stage-1 + sub-block max: ``[cap/sub, Q]`` maxima.

    The large-batch variant of :func:`pallas_bmax`: the dot runs corpus-
    major (``emb @ q.T``), so the sub-block max is a SUBLANE-axis reduce and
    the out tile's lane dimension is the full query batch — which satisfies
    Mosaic's lane-divisibility rule at any stream block, letting the block
    shrink with Q to keep the ``[block, Q]`` accumulator inside VMEM
    (``pallas_bmax``'s ``[Q, block/128]`` out tile pins ``block = 16384``,
    whose accumulator at Q=128 would be 8 MB).  Callers transpose the
    ``[nb, Q]`` result once (4 MB at 1M docs, Q=128) — nothing of size
    ``[Q, cap]`` ever exists.
    """
    cap, d = emb_i8.shape
    nq = queries.shape[0]
    assert cap % block == 0, f"capacity {cap} must be a multiple of {block}"
    assert block % sub == 0 and (block // sub) % 8 == 0
    grid = (cap // block,)
    kernel = functools.partial(_bmax_kernel_t, sub=sub)
    nb_step = block // sub
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb_step, nq), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cap // sub, nq), jnp.float32),
        interpret=interpret,
    )(
        queries.astype(jnp.float32),
        emb_i8,
        mult.reshape(-1, 1).astype(jnp.float32),
        add.reshape(-1, 1).astype(jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("sub", "block", "interpret"))
def pallas_bmax_s8_t(
    emb_i8: jax.Array,    # [cap, D] int8, cap % block == 0
    mult: jax.Array,      # [cap] f32 per-row multiplier
    add: jax.Array,       # [cap] f32 per-row addend (re-rank + mask fold)
    q_i8: jax.Array,      # [Q, D] int8 quantized queries
    q_scale: jax.Array,   # [Q] f32 per-query dequant scales
    sub: int = 128,
    block: int = 4096,
    interpret: bool = False,
) -> jax.Array:
    """s8xs8 variant of :func:`pallas_bmax_t` (native int8 MXU stage-1)."""
    cap, d = emb_i8.shape
    nq = q_i8.shape[0]
    assert cap % block == 0, f"capacity {cap} must be a multiple of {block}"
    assert block % sub == 0 and (block // sub) % 8 == 0
    grid = (cap // block,)
    kernel = functools.partial(_bmax_kernel_s8_t, sub=sub)
    nb_step = block // sub
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb_step, nq), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cap // sub, nq), jnp.float32),
        interpret=interpret,
    )(
        q_i8,
        emb_i8,
        q_scale.reshape(1, -1).astype(jnp.float32),
        mult.reshape(-1, 1).astype(jnp.float32),
        add.reshape(-1, 1).astype(jnp.float32),
    )


_BMAX_SUPPORTED: dict[tuple, bool] = {}


def bmax_kernel_supported(int8_queries: bool,
                          transposed: bool = False) -> bool:
    """True when Mosaic compiles the fused bmax kernel on this backend.

    Probed once per variant (the in-kernel reshape + max is the
    legalization risk, on top of the s8 dot for the int8-queries variant);
    cached per process and cheap across processes via the persistent XLA
    compile cache.  ``transposed`` probes the corpus-major large-batch
    variant (``pallas_bmax*_t``)."""
    key = (bool(int8_queries), bool(transposed))
    if key in _BMAX_SUPPORTED:
        return _BMAX_SUPPORTED[key]
    if not pallas_available():
        _BMAX_SUPPORTED[key] = False
        return False
    try:
        if transposed:
            e8 = jnp.zeros((4096, 128), jnp.int8)
            z = jnp.zeros((4096,), jnp.float32)
            if int8_queries:
                q8 = jnp.zeros((8, 128), jnp.int8)
                pallas_bmax_s8_t.lower(
                    e8, z, z, q8, jnp.ones((8,), jnp.float32), block=1024
                ).compile()
            else:
                q = jnp.zeros((8, 128), jnp.float32)
                pallas_bmax_t.lower(e8, z, z, q, block=1024).compile()
        elif int8_queries:
            e8 = jnp.zeros((BMAX_BLOCK, 128), jnp.int8)
            z = jnp.zeros((BMAX_BLOCK,), jnp.float32)
            q8 = jnp.zeros((1, 128), jnp.int8)
            pallas_bmax_s8.lower(
                e8, z, z, q8, jnp.ones((1,), jnp.float32)
            ).compile()
        else:
            e8 = jnp.zeros((BMAX_BLOCK, 128), jnp.int8)
            z = jnp.zeros((BMAX_BLOCK,), jnp.float32)
            q = jnp.zeros((1, 128), jnp.float32)
            pallas_bmax.lower(e8, z, z, q).compile()
        _BMAX_SUPPORTED[key] = True
    except Exception as e:  # noqa: BLE001 — any lowering/compile failure
        import logging

        logging.getLogger(__name__).warning(
            "fused bmax Pallas kernel unsupported on this backend (%s); "
            "blockmax selection uses the two-pass scores path.", str(e)[:200]
        )
        _BMAX_SUPPORTED[key] = False
    return _BMAX_SUPPORTED[key]


_S4_SUPPORTED: dict[tuple[bool, int], bool] = {}


def s4_kernel_supported(fused: bool = True, block: int = 0) -> bool:
    """True when Mosaic compiles the int4 nibble-unpack kernels here.

    The legalization risks on top of the s8 dot: i8->i32 widen, vector
    shift/mask, i32->i8 narrow — all inside a streamed kernel.  Probed
    once per (fused, block) variant; cheap across processes via the
    persistent XLA compile cache.  ``block`` probes a specific stream
    block (0 = the default BMAX_BLOCK): the 2x block halves grid steps
    and measured 0.2549 vs 0.2673 ms on the 1M Q=1 chained search, but
    its VMEM footprint only closes at small Q — callers gate on both
    the probe and their query count.
    """
    key = (bool(fused), int(block))
    if key in _S4_SUPPORTED:
        return _S4_SUPPORTED[key]
    if not pallas_available():
        _S4_SUPPORTED[key] = False
        return False
    try:
        q8 = jnp.zeros((1, 128), jnp.int8)
        qs = jnp.ones((1,), jnp.float32)
        if fused:
            blk = int(block) or BMAX_BLOCK
            e4 = jnp.zeros((blk, 64), jnp.int8)
            z = jnp.zeros((blk,), jnp.float32)
            pallas_bmax_s4.lower(e4, z, z, q8, qs, block=blk).compile()
        else:
            e4 = jnp.zeros((256, 64), jnp.int8)
            z = jnp.zeros((256,), jnp.float32)
            pallas_scores_matrix_s4.lower(e4, z, z, q8, qs,
                                          block=256).compile()
        _S4_SUPPORTED[key] = True
    except Exception as e:  # noqa: BLE001 — any lowering/compile failure
        import logging

        logging.getLogger(__name__).warning(
            "s4 Pallas kernel unsupported on this backend (%s); "
            "int4 searches use the XLA unpack path.", str(e)[:200]
        )
        _S4_SUPPORTED[key] = False
    return _S4_SUPPORTED[key]


_S8_SUPPORTED: bool | None = None


def s8_kernel_supported() -> bool:
    """True when Mosaic compiles the s8xs8 dot on this backend (probed once).

    The s8 kernel relies on Mosaic legalizing an int8xint8->int32
    ``dot_general``; rather than let a production search discover a
    legalization failure at dispatch time, callers gate on this tiny
    one-time compile probe (cached per process, and cheap again across
    processes via the persistent XLA compile cache)."""
    global _S8_SUPPORTED
    if _S8_SUPPORTED is not None:
        return _S8_SUPPORTED
    if not pallas_available():
        _S8_SUPPORTED = False
        return False
    try:
        e8 = jnp.zeros((256, 128), jnp.int8)
        z = jnp.zeros((256,), jnp.float32)
        q8 = jnp.zeros((1, 128), jnp.int8)
        pallas_scores_matrix_s8.lower(
            e8, z, z, q8, jnp.ones((1,), jnp.float32), block=256
        ).compile()
        _S8_SUPPORTED = True
    except Exception as e:  # noqa: BLE001 — any lowering/compile failure
        import logging

        logging.getLogger(__name__).warning(
            "s8 Pallas kernel unsupported on this backend (%s); "
            "int8_queries searches use the XLA s8 path.", str(e)[:200]
        )
        _S8_SUPPORTED = False
    return _S8_SUPPORTED


def pallas_available() -> bool:
    """True when the Pallas TPU lowering can be used on this backend."""
    if not _HAS_PALLAS:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


__all__ = [
    "pallas_fused_search",
    "pallas_int8_search",
    "pallas_scores_matrix",
    "pallas_scores_matrix_s8",
    "pallas_scores_matrix_s4",
    "pallas_bmax",
    "pallas_bmax_s8",
    "pallas_bmax_s4",
    "pallas_bmax_t",
    "pallas_bmax_s8_t",
    "pallas_available",
    "s8_kernel_supported",
    "s4_kernel_supported",
    "bmax_kernel_supported",
    "BLOCK",
    "SCORES_BLOCK",
    "BMAX_BLOCK",
    "BLOCK_SUB_ALIGN",
]
