"""IVF index: k-means coarse quantizer + probed fixed-size buckets.

TPU-native replacement for FAISS IVFFlat (reference backends.py:287-293,
326-355).  The design differs from FAISS's variable-length inverted lists,
which don't map to XLA's static shapes:

* clusters are materialized as fixed-capacity buckets
  ``[nlist, bucket_cap, D]`` so a probe is a static-shape gather + matmul;
* docs that overflow a bucket go to a dense *overflow tier* that every query
  scans exactly — so imbalanced clusters cost a little compute, never recall;
* search = centroid matmul -> top-nprobe -> bucket gather -> fused DEWI
  re-rank -> top-k, all in one jitted call per query block.

Recall misses can come only from unprobed (non-overflow) buckets, matching
classic IVF semantics with nprobe as the recall/latency dial.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmeans import assign_clusters, kmeans
from ..ops.similarity import l2_normalize, rerank_scores
from ..types import PAYLOAD_FIELDS, Payload
from .base import BaseIndex

NEG_INF = jnp.float32(-jnp.inf)
QUERY_BLOCK = 64


@partial(jax.jit, static_argnames=("k", "nprobe", "normalize"))
def _ivf_search_kernel(
    centroids: jax.Array,     # [nlist, D]
    b_emb: jax.Array,         # [nlist, cap, D]
    b_pay: jax.Array,         # [nlist, cap, 8]
    b_valid: jax.Array,       # [nlist, cap] bool
    b_docidx: jax.Array,      # [nlist, cap] int32 (-1 pad)
    b_sqn: jax.Array,         # [nlist, cap]
    o_emb: jax.Array,         # [o_cap, D]
    o_pay: jax.Array,         # [o_cap, 8]
    o_docidx: jax.Array,      # [o_cap]
    o_sqn: jax.Array,         # [o_cap]
    o_n: jax.Array,           # scalar int32
    queries: jax.Array,       # [Q, D]
    eta: jax.Array,
    entropy_pref: jax.Array,
    k: int,
    nprobe: int,
    normalize: bool,
) -> tuple[jax.Array, jax.Array]:
    q = queries.astype(jnp.float32)
    if normalize:
        q = l2_normalize(q)
        csim = jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
    else:
        cn = jnp.sum(centroids * centroids, axis=1)
        csim = 2.0 * jnp.dot(q, centroids.T, preferred_element_type=jnp.float32) - cn[None, :]
    _, probes = jax.lax.top_k(csim, nprobe)  # [Q, nprobe]

    pe = b_emb[probes]                        # [Q, nprobe, cap, D]
    if normalize:
        sim = jnp.einsum("qd,qncd->qnc", q, pe, preferred_element_type=jnp.float32)
    else:
        dots = jnp.einsum("qd,qncd->qnc", q, pe, preferred_element_type=jnp.float32)
        qn = jnp.sum(q * q, axis=-1)[:, None, None]
        sim = 2.0 * dots - b_sqn[probes] - qn

    pp = b_pay[probes]                        # [Q, nprobe, cap, 8]
    adj = (
        (1.0 - eta) * sim
        + eta * pp[..., 0]
        + entropy_pref * 0.5 * (pp[..., 1] + pp[..., 3])
    )
    adj = jnp.where(b_valid[probes], adj, NEG_INF)
    nq = q.shape[0]
    flat_scores = adj.reshape(nq, -1)
    flat_idx = b_docidx[probes].reshape(nq, -1)

    # Overflow tier: always scanned exactly.
    if normalize:
        osim = jnp.dot(q, o_emb.T, preferred_element_type=jnp.float32)
    else:
        osim = (
            2.0 * jnp.dot(q, o_emb.T, preferred_element_type=jnp.float32)
            - o_sqn[None, :]
            - jnp.sum(q * q, axis=-1, keepdims=True)
        )
    oadj = rerank_scores(osim, o_pay, eta, entropy_pref)
    ovalid = jnp.arange(o_emb.shape[0], dtype=jnp.int32)[None, :] < o_n
    oadj = jnp.where(ovalid, oadj, NEG_INF)

    all_scores = jnp.concatenate([flat_scores, oadj], axis=1)
    all_idx = jnp.concatenate(
        [flat_idx, jnp.broadcast_to(o_docidx[None, :], oadj.shape)], axis=1
    )
    vals, pos = jax.lax.top_k(all_scores, k)
    return vals, jnp.take_along_axis(all_idx, pos, axis=1)


class IVFIndex(BaseIndex):
    """Inverted-file index over k-means buckets with an exact overflow tier."""

    def __init__(
        self,
        dim: int,
        space: str = "cosine",
        nlist: int = 100,
        nprobe: int = 8,
        bucket_load_factor: float = 1.5,
        kmeans_iters: int = 10,
        train_sample: int = 100_000,
        dewi_tier: int = 1024,
        seed: int = 0,
        **kwargs,
    ):
        super().__init__(dim, space, **kwargs)
        self.nlist = int(nlist)
        self.nprobe = int(nprobe)
        self.bucket_load_factor = float(bucket_load_factor)
        self.kmeans_iters = int(kmeans_iters)
        self.train_sample = int(train_sample)
        # DEWI-specific recall guard: the adjusted score mixes in eta*dewi,
        # so at high eta the global ranking is dominated by documents the
        # coarse quantizer has no reason to probe.  The ``dewi_tier`` docs
        # with the highest DEWI scores are therefore routed to the exact
        # overflow scan (always searched), bounding the eta-induced recall
        # loss regardless of nprobe.  No reference counterpart — FAISS/HNSW
        # in the reference re-rank only retrieved candidates and silently
        # miss global DEWI leaders (backends.py:217-240, 326-355).
        self.dewi_tier = int(dewi_tier)
        self.seed = int(seed)
        self._dev = None

    def _hyperparams(self) -> dict:
        return {
            "nlist": self.nlist,
            "nprobe": self.nprobe,
            "bucket_load_factor": self.bucket_load_factor,
            "kmeans_iters": self.kmeans_iters,
            "train_sample": self.train_sample,
            "dewi_tier": self.dewi_tier,
            "seed": self.seed,
        }

    # -- build -------------------------------------------------------------

    def build(self, **kwargs) -> None:
        n = len(self.store)
        if n == 0:
            raise ValueError("No embeddings to build index from")
        emb_dev, sqn_dev, pay_dev, _ = self.store.device_arrays()
        emb = emb_dev[:n]
        sqn = sqn_dev[:n]
        pay = pay_dev[:n]

        nlist = min(self.nlist, n)
        key = jax.random.PRNGKey(self.seed)
        if n > self.train_sample:
            sample_idx = jax.random.choice(key, n, (self.train_sample,), replace=False)
            train = emb[sample_idx]
        else:
            train = emb
        centroids, _ = kmeans(
            train, key, n_clusters=nlist, n_iters=self.kmeans_iters,
            spherical=self.store.normalize,
        )
        assign = np.asarray(assign_clusters(emb, centroids))

        # Host-side bucketization (one pass of numpy; O(N) and build-time only).
        counts = np.bincount(assign, minlength=nlist)
        cap = max(8, int(np.ceil(self.bucket_load_factor * max(1, n / nlist) / 8.0)) * 8)
        order = np.argsort(assign, kind="stable")
        sorted_assign = assign[order]
        # Rank of each doc within its cluster.
        starts = np.zeros(nlist + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        rank = np.arange(n, dtype=np.int64) - starts[sorted_assign]

        in_bucket = rank < cap
        # High-DEWI tier: force the top-dewi docs into the always-scanned
        # overflow arrays (see ctor comment).
        tier_n = min(self.dewi_tier, n)
        if tier_n > 0:
            pay_np = np.asarray(pay, dtype=np.float32)
            is_tier = np.zeros(n, dtype=bool)
            is_tier[np.argpartition(-pay_np[:, 0], tier_n - 1)[:tier_n]] = True
            in_bucket &= ~is_tier[order]
        b_docidx = np.full((nlist, cap), -1, dtype=np.int32)
        b_docidx[sorted_assign[in_bucket], rank[in_bucket]] = order[in_bucket].astype(np.int32)
        overflow_idx = order[~in_bucket].astype(np.int32)

        gather = np.clip(b_docidx, 0, None)
        emb_h = np.asarray(emb, dtype=np.float32)
        pay_h = np.asarray(pay, dtype=np.float32)
        sqn_h = np.asarray(sqn, dtype=np.float32)
        b_valid = b_docidx >= 0
        b_emb = np.where(b_valid[..., None], emb_h[gather], 0.0)
        b_pay = np.where(b_valid[..., None], pay_h[gather], 0.0)
        b_sqn = np.where(b_valid, sqn_h[gather], 0.0)

        o_n = overflow_idx.shape[0]
        o_cap = max(8, int(np.ceil(max(o_n, 1) / 8.0)) * 8)
        o_emb = np.zeros((o_cap, self.dim), dtype=np.float32)
        o_pay = np.zeros((o_cap, len(PAYLOAD_FIELDS)), dtype=np.float32)
        o_docidx = np.full((o_cap,), -1, dtype=np.int32)
        o_sqn = np.zeros((o_cap,), dtype=np.float32)
        if o_n:
            o_emb[:o_n] = emb_h[overflow_idx]
            o_pay[:o_n] = pay_h[overflow_idx]
            o_docidx[:o_n] = overflow_idx
            o_sqn[:o_n] = sqn_h[overflow_idx]

        self._dev = tuple(
            jnp.asarray(a)
            for a in (
                np.asarray(centroids, dtype=np.float32),
                b_emb, b_pay, b_valid, b_docidx, b_sqn,
                o_emb, o_pay, o_docidx, o_sqn,
            )
        ) + (jnp.int32(o_n),)
        self._is_trained = True

    # -- search ---------------------------------------------------------------

    def search_batch(
        self,
        queries: np.ndarray,
        k: int = 10,
        eta: float = 0.5,
        entropy_pref: float = 0.0,
        nprobe: Optional[int] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        if self._dev is None:
            self.build()
        nprobe = min(int(nprobe or self.nprobe), min(self.nlist, len(self.store)))
        q = jnp.atleast_2d(jnp.asarray(queries, dtype=jnp.float32))
        k_eff = min(int(k), len(self.store))

        # The probe gather materializes [block, nprobe, cap, D] f32; bound it
        # to ~1 GB so 1M-doc corpora with large buckets don't OOM the device.
        bucket_cap = int(self._dev[1].shape[1])
        bytes_per_q = nprobe * bucket_cap * self.dim * 4
        block_size = max(1, min(QUERY_BLOCK, (1 << 30) // max(bytes_per_q, 1)))

        outs_v, outs_i = [], []
        for start in range(0, q.shape[0], block_size):
            block = q[start : start + block_size]
            v, i = _ivf_search_kernel(
                *self._dev,
                block,
                jnp.float32(eta),
                jnp.float32(entropy_pref),
                k=k_eff,
                nprobe=nprobe,
                normalize=self.store.normalize,
            )
            outs_v.append(v)
            outs_i.append(i)
        return jnp.concatenate(outs_v, axis=0), jnp.concatenate(outs_i, axis=0)

    def search(
        self,
        query: np.ndarray,
        k: int = 10,
        eta: float = 0.5,
        entropy_pref: float = 0.0,
    ) -> List[Tuple[str, float, Payload]]:
        if len(self.store) == 0:
            return []
        scores, idx = self.search_batch(query, k=k, eta=eta, entropy_pref=entropy_pref)
        scores = np.asarray(scores[0])
        idx = np.asarray(idx[0])
        pay = self.store.payload_matrix()
        results = []
        for rank in range(min(int(k), len(self.store))):
            i = int(idx[rank])
            if i < 0:
                continue
            results.append(
                (self.store.doc_ids[i], float(scores[rank]), Payload.from_array(pay[i]))
            )
        return results
