"""Int8 quantized scoring: ScaNN-style two-stage exact search.

No reference counterpart — the reference's ANN tiers are hnswlib graphs and
FAISS IVF (backends.py:166-383).  On TPU the binding constraint for
brute-force search is HBM bandwidth (reading the ``[N, D]`` corpus), so the
idiomatic accelerator design is quantization, not graphs:

* stage 1 — int8×int8 matmul over the whole corpus (4× less HBM traffic than
  f32 and the MXU's highest-throughput path), fused DEWI re-rank, take a
  top-``m`` candidate set (``m = refine_factor·k``);
* stage 2 — gather the ``m`` f32 rows, exact similarity, re-rank, top-k.

With refinement the result matches full-precision exact search except when
a true top-k member falls outside the int8 top-``m`` — at refine_factor≥4
measured recall is ~1.0 (see tests/test_quantized.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .similarity import l2_normalize

NEG_INF = float("-inf")  # python float: no backend init at import time

BLOCKMAX_SUB = 128  # sub-block width for blockmax_select (one VPU lane row)
# Above this query count the blockmax tier switches refine strategy: the
# block-granular gather (s*128 docs/query) outgrows the flat path's m rows,
# so large batches gather candidate stage-1 SCORES from the winning blocks
# (s*128 f32/query — cheap), take top-m within them, and row-gather only m
# docs — selection quality >= approx_max_k's 0.95 target at the same
# refine traffic.
BLOCKMAX_REFINE_MAX_Q = 32
# approx_max_k only engages above this capacity: below it, exact top_k is
# ~free and approx's coarse reduction can dip under the 0.99 recall gate.
APPROX_SELECT_MIN_CAP = 1 << 17


@jax.jit
def quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization: returns (int8 values, f32 scales).

    ``x ≈ values * scales[:, None]``; zero rows get scale 0 and quantize to 0.
    """
    x = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x), axis=-1)
    scale = absmax / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(x / safe[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


@jax.jit
def quantize_rows_int4(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric int4 quantization, nibble-packed 2-per-byte.

    Returns ``(packed [N, D/2] int8, scales [N] f32)``.  Values live in
    [-7, 7] (scale = absmax/7; the -8 code is unused so the grid is
    symmetric).  Byte ``j`` packs dimension ``j`` in its HIGH nibble
    (signed) and dimension ``j + D/2`` in its LOW nibble (biased by +8 so
    the unpack needs no sign propagation across the nibble boundary):

        byte_j = hi_j * 16 + (lo_j + 8),  hi_j = q(x[:, j]),
                                          lo_j = q(x[:, j + D/2])

    so ``hi = byte >> 4`` (arithmetic — floor division recovers the signed
    high nibble exactly because the low bits are non-negative) and
    ``lo = (byte & 15) - 8``.  The plane split (first half of dims in high
    nibbles, second half in low) means unpacking yields two ``[N, D/2]``
    tensors whose axis-1 concatenation restores the ORIGINAL dimension
    order — the query needs no permutation.  D must be even.

    Why int4: stage-1 of the two-stage search is HBM-bound — the corpus
    read is the whole cost (docs/perf/scan_breakdown.json: ~750 GB/s
    effective on the 256 MB int8 stream).  Halving the bytes halves the
    stage-1 floor; the extra rounding error is absorbed by a wider
    refine margin (larger ``m``) in the exact f32 stage 2, recall-gated
    in bench like every other tier.
    """
    x = x.astype(jnp.float32)
    d = x.shape[-1]
    assert d % 2 == 0, f"int4 packing needs even dim, got {d}"
    absmax = jnp.max(jnp.abs(x), axis=-1)
    scale = absmax / 7.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(x / safe[:, None]), -7, 7).astype(jnp.int8)
    hi = q[:, : d // 2]
    lo = q[:, d // 2 :]
    packed = (hi * 16 + (lo + 8)).astype(jnp.int8)
    return packed, scale


@jax.jit
def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of :func:`quantize_rows_int4`'s packing: ``[N, D] int8``.

    XLA reference implementation (also the fallback stage-1 path on
    backends without the Pallas s4 kernel); the Pallas kernels inline the
    same two-op unpack per tile so the packed bytes are what streams from
    HBM.
    """
    # int8 arithmetic shift keeps the sign; & 15 isolates the biased low.
    hi = packed >> 4
    lo = (packed & 15) - 8
    return jnp.concatenate([hi, lo], axis=-1).astype(jnp.int8)


@partial(
    jax.jit,
    static_argnames=(
        "k", "m", "normalize", "approx_select", "pallas_stage1",
        "pallas_block", "interpret", "int8_queries", "bf16_scores",
        "blockmax_select", "fused_bmax", "int4_packed", "int4_values",
    ),
)
def quantized_search(
    emb_i8: jax.Array,    # [cap, D] int8 corpus ([cap, D/2] if int4_packed)
    scales: jax.Array,    # [cap] f32 row scales
    emb_f32: jax.Array,   # [cap, D] f32 corpus (refinement gather source)
    sqnorms: jax.Array,   # [cap] f32 row squared norms (L2 path)
    payloads: jax.Array,  # [cap, 8]
    queries: jax.Array,   # [Q, D]
    n_valid: jax.Array,   # scalar int32
    eta: jax.Array,
    entropy_pref: jax.Array,
    k: int,
    m: int,
    normalize: bool = True,
    approx_select: bool = True,
    pallas_stage1: bool = False,
    pallas_block: int = 0,
    interpret: bool = False,
    int8_queries: bool = False,
    bf16_scores: bool = False,
    blockmax_select: bool = False,
    fused_bmax: bool = False,
    int4_packed: bool = False,
    int4_values: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Two-stage int8 -> f32 exact search; returns ([Q, k] scores, [Q, k] idx).

    ``approx_select=True`` picks stage-1 candidates with TPU-optimized
    ``lax.approx_max_k`` (unaggregated) instead of exact ``top_k`` — measured
    0.93 vs 1.59 ms at 1M docs (the exact top-m dominates the two-stage path)
    at 0.995 recall@10 vs f32 exact; ``False`` restores exact selection
    (recall 1.0 within int8 stage-1 resolution).

    ``bf16_scores=True`` materializes the stage-1 ``[Q, cap]`` score matrix
    in bf16 — halving its HBM writeback and the selection pass's read.
    Irrelevant at Q=1 (4 MB at 1M docs, ~2% of the corpus stream) but
    material for batched Q: at Q=128 x 1M the f32 matrix is 512 MB
    (write + re-read) vs 256 MB in bf16.  Selection consumes only the
    candidate *indices* and stage 2 re-ranks the candidates exactly in
    f32, so bf16 rounding only perturbs which candidates make the
    top-``m`` — recall-gated in tests/bench like the int8 tiers.

    ``blockmax_select=True`` replaces the candidate select with a
    hierarchical sub-block max: reshape the ``[Q, cap]`` scores to
    ``[Q, cap/128, 128]``, max-reduce (bandwidth-bound, vs
    ``approx_max_k``'s structure-bound pass — measured 0.137 ms at
    [1, 1M], ~20x its 4 MB read floor), exact top-``s`` over the
    ``[Q, cap/128]`` maxima (``s = max(k, ceil(m/128))``), and refine
    every doc in the winning sub-blocks (``s·128`` candidates).
    Correctness: a sub-block containing a true stage-1 top-``s`` doc has
    max >= the s-th best score, so the top-``s`` sub-blocks contain ALL
    stage-1 top-``s`` >= top-``k`` docs — selection is exact w.r.t.
    stage-1 scores (recall can only beat ``approx_max_k``'s 0.95
    target); residual error is int8 stage-1 rounding, as before.
    Above ``BLOCKMAX_REFINE_MAX_Q`` queries the refine switches to a
    two-step gather (winning blocks' *scores* -> top-``m`` -> ``m``-row
    refine) so batched refine traffic matches the flat path instead of
    growing ``s*128`` rows per query.

    ``fused_bmax=True`` (with ``blockmax_select`` + ``pallas_stage1``)
    fuses the sub-block max-reduce INTO the streaming stage-1 kernel
    (ops/pallas_search.pallas_bmax{,_s8}): the ``[Q, cap]`` scores matrix
    is never written to HBM and the selection pass never re-reads it —
    only the ``[Q, cap/128]`` maxima leave the kernel.  Selection math is
    identical to the two-pass blockmax path; callers gate on
    ``bmax_kernel_supported()`` (Mosaic legalization probe).

    ``int4_packed=True`` reads ``emb_i8`` as the ``[cap, D/2]``
    nibble-packed int4 corpus from :func:`quantize_rows_int4` — HALF the
    stage-1 HBM stream of int8, the binding resource of the whole scan.
    The Pallas int4 kernels (``pallas_{bmax,scores_matrix}_s4``) unpack
    in-VMEM and need ``int8_queries=True`` (the MXU dot runs s8xs8);
    other configurations transparently unpack via XLA first (correct, but
    reads the unpacked bytes — use for tests/CPU).  int4's larger stage-1
    rounding needs a wider refine margin: callers should raise ``m``
    (the index layer uses 4x the int8 tier's), and the blockmax margin
    doubles automatically (measured on TPU at 131k x 256, k=10: 12 blocks
    -> recall 0.944, 24 blocks -> 0.997, plateau thereafter — the
    15-level grid displaces true top-k docs past int8's k+2-block
    margin); recall-gate as usual.

    ``int4_values=True`` declares that ``emb_i8`` holds int4-GRID values
    in the plain unpacked ``[cap, D]`` int8 layout (the index layer
    caches the unpack at BUILD time on backends without the s4 kernels,
    instead of re-unpacking the whole corpus inside every dispatch): no
    packed handling, but the int4 selection margins still apply — the
    rounding lives in the VALUES, not the layout."""
    # The 15-level grid's wider selection margin applies whether stage 1
    # reads packed nibbles or unpacked int4-grid values (the rounding is
    # in the VALUES); snapshot before the layout normalization below.
    int4_grid = int4_packed or int4_values
    q = queries.astype(jnp.float32)
    if normalize:
        q = l2_normalize(q)

    # Algebraic fold: dequant scale, DEWI re-rank, and the validity mask
    # collapse into per-row mult/add vectors, so the [Q, cap] epilogue is
    # ONE fused multiply-add over the score matrix instead of separate
    # scale / re-rank / mask passes (each an extra [cap]-wide kernel —
    # measured 1.04 -> ~0.7 ms chained at 1M docs).  Cosine:
    #   adj = (1-eta)*(acc*scale) + eta*dewi + ep*ent
    #       = acc * [(1-eta)*scale] + [eta*dewi + ep*ent - inf_pad]
    # L2 (sim = 2*e.q - |e|^2 - |q|^2 with e.q = acc*scale):
    #   adj = acc * [2(1-eta)*scale]
    #       + [-(1-eta)*|e|^2 + eta*dewi + ep*ent - inf_pad]
    #       - (1-eta)*|q|^2   (per-query constant — omitted: see NOTE below)
    ent = 0.5 * (payloads[:, 1] + payloads[:, 3])
    one_m_eta = 1.0 - eta
    add = eta * payloads[:, 0] + entropy_pref * ent
    if normalize:
        mult = one_m_eta * scales
    else:
        mult = 2.0 * one_m_eta * scales
        add = add - one_m_eta * sqnorms
    nq, cap = q.shape[0], emb_i8.shape[0]
    blockmax_ok = (
        blockmax_select and cap % BLOCKMAX_SUB == 0
        and cap >= 4 * BLOCKMAX_SUB
    )
    # Fused stage-1+max kernel: engaged only when the caller vouches for
    # Mosaic support (fused_bmax) AND the shapes line up; otherwise the
    # two-pass blockmax path below stays bit-identical.  All static.
    use_fused = False
    bmax_block = 0
    if fused_bmax and blockmax_ok and pallas_stage1:
        from .pallas_search import BMAX_BLOCK

        bmax_block = pallas_block or BMAX_BLOCK
        use_fused = (
            cap % bmax_block == 0 and bmax_block % BLOCKMAX_SUB == 0
            and (bmax_block // BLOCKMAX_SUB) % 8 == 0
        )

    if int4_packed:
        # The Pallas s4 kernels are s8-query, query-major only.  Any other
        # configuration transparently unpacks the nibbles via XLA and rides
        # the int8 code paths below — values land in [-7, 7] and the scales
        # are already absmax/7, so the dequant algebra is unchanged; only
        # the HBM-stream saving is forfeited.
        s4_t_layout = (
            use_fused
            and (bmax_block // BLOCKMAX_SUB) % BLOCKMAX_SUB != 0
            and bmax_block != cap
        )
        if not int8_queries or s4_t_layout:
            use_fused = False
        if not (pallas_stage1 and int8_queries) or s4_t_layout:
            emb_i8 = unpack_int4(emb_i8)
            int4_packed = False

    # Large batches through the fused kernel: CHUNK the queries and re-run
    # the whole small-Q fused pipeline per 32-query group under lax.map —
    # the corpus is re-read once per group (G x 256 MB at 1M docs), which
    # measured CHEAPER than any path that materializes/roundtrips [Q, cap]
    # scores (the group's kernel pass runs at the streaming-scan rate, and
    # selection + block-granular refine stay smallQ-shaped).  The
    # alternative single-pass designs both lose at Q=128 x 1M on one v5e:
    # materialized score-gather 31.5 us/query (512 MB f32 written+re-read),
    # transposed fused kernel + int8 block re-score 52.9 us/query
    # (scan_breakdown batched128_* rows).
    if use_fused and nq > BLOCKMAX_REFINE_MAX_Q:
        g = BLOCKMAX_REFINE_MAX_Q
        n_groups = -(-nq // g)
        pad_rows = n_groups * g - nq
        qpad = (
            jnp.concatenate(
                [q, jnp.broadcast_to(q[:1], (pad_rows, q.shape[1]))]
            )
            if pad_rows else q
        )

        def one(qc: jax.Array) -> tuple[jax.Array, jax.Array]:
            # normalize passes through unchanged — it selects the METRIC
            # (cosine fold vs L2 fold), not just the unit-norm step; q is
            # already normalized so the inner re-normalize is an
            # idempotent no-op under cosine.
            return quantized_search(
                emb_i8, scales, emb_f32, sqnorms, payloads, qc, n_valid,
                eta, entropy_pref, k=k, m=m, normalize=normalize,
                approx_select=approx_select, pallas_stage1=True,
                pallas_block=pallas_block, interpret=interpret,
                int8_queries=int8_queries, bf16_scores=bf16_scores,
                blockmax_select=True, fused_bmax=True,
                int4_packed=int4_packed, int4_values=int4_values,
            )

        s_g, i_g = jax.lax.map(one, qpad.reshape(n_groups, g, q.shape[1]))
        return (
            s_g.reshape(n_groups * g, k)[:nq],
            i_g.reshape(n_groups * g, k)[:nq],
        )

    valid = jnp.arange(emb_i8.shape[0], dtype=jnp.int32) < n_valid
    if bf16_scores and not use_fused:
        # Center the fold's additive term on its valid-row mean (a scalar
        # shift, identical across docs, so per-query ranking is invariant).
        # Under L2 ``add`` carries -(1-eta)*|e|^2 — large common magnitude
        # that bf16 would round away from the tiny score *differences*
        # that decide the top-m (measured: recall 0.9896 uncentered vs
        # 0.9990 centered at 20k x 128, refine 8, real TPU).
        denom = jnp.maximum(n_valid.astype(jnp.float32), 1.0)
        add = add - jnp.sum(jnp.where(valid, add, 0.0)) / denom
    add = jnp.where(valid, add, NEG_INF)

    # Stage 1: int8 corpus read with the dequant fused into the dot's
    # operand load (int8 -> bf16 convert; int8 values are exact in bf16).
    # Measured faster than bf16 storage (4x less HBM read): the raw int8
    # matvec runs 0.58 ms vs 0.89 bf16 / 1.58 f32 at 1M x 256.  The query
    # stays unquantized (bf16 cast only), so stage-1 error is bf16
    # rounding, not query quantization.  ``pallas_stage1`` swaps the XLA
    # dot+epilogue for the streaming Pallas scores kernel (measured 0.596
    # vs 0.62-0.66 ms at 1M x 256 — the epilogue rides the corpus stream).
    adj1: jax.Array | None = None
    bmax: jax.Array | None = None
    if use_fused:
        from .pallas_search import (
            pallas_bmax, pallas_bmax_s8, pallas_bmax_s8_t, pallas_bmax_t,
        )

        # Layout choice: the query-major kernel's [Q, block/128] out tile
        # needs its lane dim %128 (block %16384); smaller stream blocks
        # (large Q shrinks them to keep the accumulator in VMEM) use the
        # corpus-major transposed kernel, whose out tile's lane dim is the
        # full query batch.  One [nb, Q] -> [Q, nb] transpose follows (4 MB
        # at 1M docs, Q=128) — still nothing of size [Q, cap].
        nb_step = bmax_block // BLOCKMAX_SUB
        t_layout = nb_step % BLOCKMAX_SUB != 0 and bmax_block != cap
        if int4_packed:
            # int4 fused: query-major s4 kernel (the normalization above
            # already rerouted any t_layout shape to the unpacked path).
            from .pallas_search import pallas_bmax_s4

            q_i8, q_scale = quantize_rows(q)
            bmax = pallas_bmax_s4(
                emb_i8, mult, add, q_i8, q_scale,
                sub=BLOCKMAX_SUB, block=bmax_block, interpret=interpret,
            )
        elif int8_queries:
            q_i8, q_scale = quantize_rows(q)
            if t_layout:
                bmax = pallas_bmax_s8_t(
                    emb_i8, mult, add, q_i8, q_scale,
                    sub=BLOCKMAX_SUB, block=bmax_block, interpret=interpret,
                ).T
            else:
                bmax = pallas_bmax_s8(
                    emb_i8, mult, add, q_i8, q_scale,
                    sub=BLOCKMAX_SUB, block=bmax_block, interpret=interpret,
                )
        elif t_layout:
            bmax = pallas_bmax_t(
                emb_i8, mult, add, q,
                sub=BLOCKMAX_SUB, block=bmax_block, interpret=interpret,
            ).T
        else:
            bmax = pallas_bmax(
                emb_i8, mult, add, q,
                sub=BLOCKMAX_SUB, block=bmax_block, interpret=interpret,
            )
    elif pallas_stage1 and int8_queries:
        # Native s8xs8 MXU streaming kernel: int8 corpus AND int8 query on
        # the MXU (s32 accumulate), no per-element int8->bf16 convert on
        # the corpus stream; query scale folded into the epilogue.  The
        # int4_packed variant streams half the bytes and unpacks in-VMEM.
        from .pallas_search import (
            SCORES_BLOCK, pallas_scores_matrix_s4, pallas_scores_matrix_s8,
        )

        q_i8, q_scale = quantize_rows(q)
        if int4_packed:
            adj1 = pallas_scores_matrix_s4(
                emb_i8, mult, add, q_i8, q_scale,
                block=pallas_block or SCORES_BLOCK, interpret=interpret,
                out_dtype=jnp.bfloat16 if bf16_scores else jnp.float32,
            )
        else:
            adj1 = pallas_scores_matrix_s8(
                emb_i8, mult, add, q_i8, q_scale,
                block=pallas_block or SCORES_BLOCK, interpret=interpret,
                out_dtype=jnp.bfloat16 if bf16_scores else jnp.float32,
            )
    elif pallas_stage1:
        from .pallas_search import SCORES_BLOCK, pallas_scores_matrix

        adj1 = pallas_scores_matrix(
            emb_i8, mult, add, q,
            block=pallas_block or SCORES_BLOCK, interpret=interpret,
            out_dtype=jnp.bfloat16 if bf16_scores else jnp.float32,
        )
    elif int8_queries:
        # Native s8xs8->s32 MXU path (v5e runs int8 matmuls at 2x bf16
        # throughput, and the corpus operand skips the int8->bf16 convert
        # that can bottleneck the scan on the VPU).  The query is
        # per-row symmetrically quantized; its scale folds into the
        # epilogue as a per-query column factor, so stage-1 adds query-
        # quantization error on TOP of int8 storage error — acceptable
        # because stage 2 re-ranks the m candidates exactly in f32.
        q_i8, q_scale = quantize_rows(q)
        acc = jax.lax.dot_general(
            q_i8, emb_i8,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)                          # [Q, cap]
        adj1 = acc * (q_scale[:, None] * mult[None, :]) + add[None, :]
    else:
        acc = jax.lax.dot_general(
            q.astype(jnp.bfloat16), emb_i8.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # [Q, cap]
        adj1 = acc * mult[None, :] + add[None, :]
    if bf16_scores and adj1 is not None and adj1.dtype != jnp.bfloat16:
        # XLA paths: the cast fuses into the matmul epilogue, so only the
        # bf16 matrix ever hits HBM.
        adj1 = adj1.astype(jnp.bfloat16)
    # NOTE: the L2 identity also carries a -(1-eta)*|q|^2 per-query column.
    # Stage-1 *values* are discarded below (both selection branches keep
    # only candidate indices, and stage 2 recomputes scores exactly), and a
    # per-query constant can't change within-query ranking — so the column
    # correction is deliberately omitted: one less [Q, cap] pass, and under
    # bf16 it would only push scores away from zero, costing mantissa.
    if blockmax_ok:
        # Hierarchical select (see docstring): [Q, cap] -> [Q, nb, 128]
        # max-reduce -> exact top-s over the [Q, nb] maxima -> expand each
        # winning sub-block to its 128 doc ids.  Padded rows carry NEG_INF
        # from the `add` fold, and stage 2 re-masks cand >= n_valid.
        nb = cap // BLOCKMAX_SUB
        # +2 margin blocks over the exact top-k guarantee absorb int8
        # stage-1 rank displacement past rank k (measured at 1M x 256,
        # k=10: s=10 -> recall 0.993, s=12 -> 0.999 = the approx path).
        # int4's coarser grid needs double the margin (131k x 256, k=10:
        # 12 blocks -> 0.944, 24 -> 0.997, flat beyond — see docstring).
        margin = 2 * (k + 2) if int4_grid else k + 2
        s = min(nb, max(margin, -(-m // BLOCKMAX_SUB)))
        if bmax is None:
            assert adj1 is not None  # not use_fused => stage-1 materialized
            bmax = jnp.max(adj1.reshape(nq, nb, BLOCKMAX_SUB), axis=-1)
        _, bid = jax.lax.top_k(bmax, s)                 # [Q, s]
        cand = (
            bid[:, :, None] * BLOCKMAX_SUB
            + jnp.arange(BLOCKMAX_SUB, dtype=bid.dtype)[None, None, :]
        ).reshape(nq, s * BLOCKMAX_SUB)                 # [Q, s*128]
        if nq > BLOCKMAX_REFINE_MAX_Q:
            # Large batches: block-granular refine traffic (s*128 D-dim
            # rows/query) outgrows the flat path's m rows.  Gather the
            # winning blocks' stage-1 SCORES (s*128 scalars/query — cheap),
            # take top-m within them, and row-gather only m docs — the
            # same refine traffic as the approx/flat paths, with selection
            # that still provably covers the stage-1 top-(k+2) margin.
            # (The fused kernel never reaches here: large fused batches
            # return through the chunked lax.map dispatch above.)
            assert adj1 is not None
            cs = jnp.take_along_axis(
                adj1.reshape(nq, nb, BLOCKMAX_SUB), bid[:, :, None],
                axis=1,
            ).reshape(nq, s * BLOCKMAX_SUB).astype(jnp.float32)
            _, pos1 = jax.lax.top_k(cs, m)              # [Q, m]
            cand = jnp.take_along_axis(cand, pos1, axis=1)
            ce, cp, csq = emb_f32[cand], payloads[cand], sqnorms[cand]
        else:
            # Block-granular refine gather: the candidates are s CONTIGUOUS
            # 128-doc blocks, so index the [nb, 128, D] view with the s
            # block ids — s sequential 128-row reads instead of s*128
            # arbitrary-row gathers (measured: the row-granular gather made
            # s=16 cost +80 us, erasing the selection win).
            ce = emb_f32.reshape(nb, BLOCKMAX_SUB, emb_f32.shape[1])[bid]
            ce = ce.reshape(nq, s * BLOCKMAX_SUB, emb_f32.shape[1])
            cp = payloads.reshape(nb, BLOCKMAX_SUB, payloads.shape[1])[bid]
            cp = cp.reshape(nq, s * BLOCKMAX_SUB, payloads.shape[1])
            csq = sqnorms.reshape(nb, BLOCKMAX_SUB)[bid].reshape(nq, -1)
    elif approx_select and cap > max(4 * m, APPROX_SELECT_MIN_CAP):
        # Unsorted approximate candidate set (order fixed by the refine).
        # Only engaged at scale: below APPROX_SELECT_MIN_CAP the exact
        # top_k costs microseconds while approx_max_k's coarse reduction
        # measurably dips below the 0.99 recall gate (0.987 on a 6k-doc
        # corpus at Q=100, k=10, m=80 — real TPU), so small corpora get
        # exact selection for free.
        assert adj1 is not None  # use_fused implies blockmax_ok
        _, cand = jax.lax.approx_max_k(
            adj1, m, recall_target=0.95, aggregate_to_topk=False
        )
        ce, cp, csq = emb_f32[cand], payloads[cand], sqnorms[cand]
    else:
        assert adj1 is not None  # use_fused implies blockmax_ok
        _, cand = jax.lax.top_k(adj1, m)                # [Q, m]
        ce, cp, csq = emb_f32[cand], payloads[cand], sqnorms[cand]

    # Stage 2: exact f32 over the gathered candidates only.
    sim2 = jnp.einsum("qd,qmd->qm", q, ce, preferred_element_type=jnp.float32)
    if not normalize:
        sim2 = 2.0 * sim2 - csq - jnp.sum(q * q, -1, keepdims=True)
    adj2 = (
        (1.0 - eta) * sim2
        + eta * cp[..., 0]
        + entropy_pref * 0.5 * (cp[..., 1] + cp[..., 3])
    )
    cvalid = cand < n_valid
    adj2 = jnp.where(cvalid, adj2, NEG_INF)
    scores, pos = jax.lax.top_k(adj2, k)
    return scores, jnp.take_along_axis(cand, pos, axis=1)


__all__ = [
    "quantize_rows",
    "quantize_rows_int4",
    "unpack_int4",
    "quantized_search",
    "BLOCKMAX_SUB",
]
