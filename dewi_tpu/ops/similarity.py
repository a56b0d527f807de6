"""Fused similarity + DEWI re-rank + top-k search kernels.

This replaces the reference's three native search paths (hnswlib graph
queries, FAISS IVF scans, and the numpy brute-force with its top-2k
over-fetch, reference backends.py:217-240, 326-355, 430-479) with a single
XLA computation shaped for the TPU:

  sim = Q @ E^T      (MXU matmul, the FLOPs)
  adj = (1-eta)*sim + eta*dewi + entropy_pref*(ht_mean+hi_mean)/2   (fused VPU)
  top-k over masked valid rows                                     (lax.top_k)

Folding the re-rank *into* the score before top-k makes the re-rank exact
over the whole corpus, so the reference's 2k-candidate over-fetch
(backends.py:438-444) is unnecessary: the result is the true argmax of the
adjusted score.  XLA fuses the elementwise re-rank into the matmul epilogue;
everything stays in HBM-resident arrays with no host round trips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")  # python float: no backend init at import time


def l2_normalize(x: jax.Array, eps: float = 0.0) -> jax.Array:
    """Row-wise L2 normalization; zero vectors pass through unchanged.

    Matches the reference's query guard ``if query_norm > 0``
    (backends.py:422-424).
    """
    x = x.astype(jnp.float32)
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return jnp.where(norm > eps, x / jnp.where(norm > 0, norm, 1.0), x)


def rerank_scores(
    sim: jax.Array, payloads: jax.Array, eta: jax.Array, entropy_pref: jax.Array
) -> jax.Array:
    """DEWI-blended adjusted score (reference backends.py:460-465).

    ``sim``: [Q, N] similarity; ``payloads``: [N, 8] in PAYLOAD_FIELDS order
    (dewi at column 0, ht_mean at 1, hi_mean at 3).
    """
    dewi = payloads[:, 0]
    mean_entropy = 0.5 * (payloads[:, 1] + payloads[:, 3])
    return (
        (1.0 - eta) * sim
        + eta * dewi[None, :]
        + entropy_pref * mean_entropy[None, :]
    )


@partial(
    jax.jit,
    static_argnames=("k", "normalize", "pallas_scores", "blockmax_select",
                     "fused_bmax", "interpret", "pallas_block"),
)
def fused_search(
    embeddings: jax.Array,   # [cap, D] — pre-normalized rows if cosine
    sqnorms: jax.Array,      # [cap]    — row squared norms (L2 path)
    payloads: jax.Array,     # [cap, 8] — PAYLOAD_FIELDS order
    queries: jax.Array,      # [Q, D]
    n_valid: jax.Array,      # scalar int32: number of live rows
    eta: jax.Array,          # scalar f32
    entropy_pref: jax.Array, # scalar f32
    k: int = 10,
    normalize: bool = True,  # True: cosine; False: negative squared L2
    pallas_scores: bool = False,
    blockmax_select: bool = False,
    fused_bmax: bool = False,
    interpret: bool = False,  # Pallas interpret mode (CPU parity tests)
    pallas_block: int | None = None,  # kernel stream-block override (tests)
) -> tuple[jax.Array, jax.Array]:
    """Exact DEWI search over the full store: returns ([Q,k] scores, [Q,k] idx).

    Rows at index >= n_valid (growth slack in the capacity buffer) are masked
    to -inf before top-k, so capacity doubling never changes results.
    ``pallas_scores`` swaps the XLA dot+epilogue for the streaming Pallas
    scores kernel (identical results — the top-k still runs outside):
    measured 0.986 vs 1.026 ms chained at 1M x 256 bf16 on one v5e.

    ``blockmax_select`` replaces the full ``lax.top_k`` over the ``[Q, cap]``
    adjusted scores with hierarchical block-max selection: max-reduce each
    128-doc sub-block, exact top-``k`` over the ``[Q, cap/128]`` maxima,
    then top-``k`` over only the winning blocks' scores.  Unlike the
    quantized tier (where selection runs on approximate stage-1 scores and
    needs margin blocks), here the scores ARE the final adjusted scores, so
    top-``k`` blocks by max provably contain the top-``k`` docs: the block
    holding the rank-``i`` doc (``i <= k``) has max >= that doc's score, and
    at most ``k-1`` blocks can hold a doc scoring strictly higher — result
    values are EXACT (tie-broken doc *ids* can differ from the flat top-k
    when distinct docs share a score to the last f32 ulp).  The two-pass
    variant gathers candidate *scores* only (``k*128`` f32/query — cheap at
    any batch size); ``fused_bmax`` additionally composes the Pallas
    stage-1+max kernel so the ``[Q, cap]`` matrix never reaches HBM, then
    re-scores the winning blocks (bf16 dot, same math as the kernel).
    """
    q = queries.astype(jnp.float32)
    if normalize:
        q = l2_normalize(q)

    # Re-rank + validity mask folded into per-row mult/add vectors so the
    # [Q, cap] epilogue is one fused multiply-add (separate scale / re-rank
    # / mask passes each cost an extra [cap]-wide kernel — see
    # ops/quantized.py for the measured effect).  Algebra:
    #   cosine: adj = dots*(1-eta) + [eta*dewi + ep*ent - inf_pad]
    #   L2:     adj = dots*2(1-eta)
    #               + [eta*dewi + ep*ent - (1-eta)*|e|^2 - inf_pad]
    #               - (1-eta)*|q|^2
    one_m_eta = 1.0 - eta
    add = (
        eta * payloads[:, 0]
        + entropy_pref * 0.5 * (payloads[:, 1] + payloads[:, 3])
    )
    if normalize:
        mult = one_m_eta * jnp.ones(embeddings.shape[0], jnp.float32)
    else:
        mult = 2.0 * one_m_eta * jnp.ones(embeddings.shape[0], jnp.float32)
        add = add - one_m_eta * sqnorms
    valid = jnp.arange(embeddings.shape[0], dtype=jnp.int32) < n_valid
    add = jnp.where(valid, add, NEG_INF)

    from .quantized import BLOCKMAX_SUB

    cap, d = embeddings.shape
    nq = q.shape[0]
    sub = BLOCKMAX_SUB
    blockmax_ok = (
        blockmax_select and cap % sub == 0 and cap >= 4 * sub
    )
    nb = cap // sub
    s = min(nb, k)  # exact: top-k docs live in the top-k blocks by max
    # per-query L2 constant — uniform across docs, applied to final values
    l2_const = (
        one_m_eta * jnp.sum(q * q, axis=-1, keepdims=True)
        if not normalize else None
    )

    use_fused = False
    bmax_block = 0
    if fused_bmax and blockmax_ok and pallas_scores:
        from .pallas_search import BMAX_BLOCK

        bmax_block = pallas_block or BMAX_BLOCK
        use_fused = cap % bmax_block == 0 and bmax_block % sub == 0
    if use_fused:
        # Scores never reach HBM: the streaming kernel emits only the
        # [Q, cap/128] sub-block maxima; the winning blocks are re-scored
        # with the same bf16-dot math (block-granular contiguous gathers —
        # k*128 rows/query, see ops/quantized for the gather-shape lesson).
        from .pallas_search import pallas_bmax

        bmax = pallas_bmax(embeddings, mult, add, q,
                           sub=sub, block=bmax_block, interpret=interpret)
        _, bid = jax.lax.top_k(bmax, s)                       # [Q, s]
        cand = (
            bid[:, :, None] * sub
            + jnp.arange(sub, dtype=bid.dtype)[None, None, :]
        ).reshape(nq, s * sub)
        ce = embeddings.reshape(nb, sub, d)[bid].reshape(nq, s * sub, d)
        cm = mult.reshape(nb, sub)[bid].reshape(nq, s * sub)
        ca = add.reshape(nb, sub)[bid].reshape(nq, s * sub)
        sim = jnp.einsum(
            "qd,qmd->qm",
            q.astype(jnp.bfloat16),
            ce.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        adjc = sim * cm + ca
        if l2_const is not None:
            adjc = adjc - l2_const
        vals, pos = jax.lax.top_k(adjc, k)
        return vals, jnp.take_along_axis(cand, pos, axis=1)

    if pallas_scores:
        from .pallas_search import SCORES_BLOCK, pallas_scores_matrix

        adj = pallas_scores_matrix(embeddings, mult, add, q,
                                   block=pallas_block or SCORES_BLOCK,
                                   interpret=interpret)
    else:
        dots = jnp.dot(q, embeddings.T, preferred_element_type=jnp.float32)
        adj = dots * mult[None, :] + add[None, :]
    if l2_const is not None:
        adj = adj - l2_const
    if blockmax_ok:
        # Two-pass variant: the max-reduce reads the materialized scores
        # once (bandwidth-bound), then only the winning blocks' SCORES are
        # gathered (k*128 f32 per query) — no embedding re-read, identical
        # values to the flat top-k at any batch size.
        adj3 = adj.reshape(nq, nb, sub)
        bmax = jnp.max(adj3, axis=-1)                         # [Q, nb]
        _, bid = jax.lax.top_k(bmax, s)                       # [Q, s]
        cs = jnp.take_along_axis(adj3, bid[:, :, None], axis=1)
        cand = (
            bid[:, :, None] * sub
            + jnp.arange(sub, dtype=bid.dtype)[None, None, :]
        ).reshape(nq, s * sub)
        vals, pos = jax.lax.top_k(cs.reshape(nq, s * sub), k)
        return vals, jnp.take_along_axis(cand, pos, axis=1)
    return jax.lax.top_k(adj, k)


@partial(jax.jit, static_argnames=("k",))
def topk_merge(
    scores: jax.Array, indices: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Merge per-shard candidate lists: ([Q, S*k] scores, [Q, S*k] global idx)
    -> global ([Q, k], [Q, k]).  Used by the distributed search after
    all-gathering each shard's local top-k."""
    vals, pos = jax.lax.top_k(scores, k)
    return vals, jnp.take_along_axis(indices, pos, axis=1)


@jax.jit
def pairwise_cosine(a: jax.Array, b: jax.Array) -> jax.Array:
    """Normalized [Na, Nb] cosine similarity matrix.

    The embedding-space primitive behind cross-modal dependency
    (reference cross_modal.py:132-139) and redundancy
    (reference redundancy.py:28-39).
    """
    return jnp.dot(
        l2_normalize(a), l2_normalize(b).T, preferred_element_type=jnp.float32
    )
