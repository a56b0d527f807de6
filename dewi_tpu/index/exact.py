"""Exact TPU index: one fused matmul -> re-rank -> top-k XLA computation.

Replaces the reference's numpy brute force (backends.py:386-481) and — by
virtue of TPU matmul throughput — also stands in for its hnswlib/FAISS ANN
tiers at exact recall.  Unlike the reference's pipeline of
normalize / dot / argpartition(2k) / python re-rank / argpartition(k) / sort,
the whole query is a single jitted kernel (ops/similarity.fused_search) whose
re-rank is exact over every document, not just a 2k over-fetch.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.similarity import fused_search
from ..types import Payload
from .base import BaseIndex


class ExactIndex(BaseIndex):
    """Brute-force cosine / L2 search with fused DEWI re-ranking.

    bf16-stored cosine indexes route stage-1 scoring through the streaming
    Pallas scores kernel (``ops/pallas_search.pallas_scores_matrix``) — the
    mult/add epilogue rides the corpus stream, so outputs are identical to
    the XLA path; ``use_pallas=False`` forces the plain XLA path
    everywhere.  Selection defaults to hierarchical block-max
    (``blockmax_select``) — exact result values at every batch size, and
    the fix for the flat ``lax.top_k``'s collapse on large batches
    (319.8 -> 4.18 ms at Q=128, 1M x 256; see __init__ notes).
    """

    def __init__(self, dim: int, space: str = "cosine",
                 use_pallas: bool = True, blockmax_select: bool = True,
                 fused_bmax: bool = False, **kwargs: Any) -> None:
        super().__init__(dim, space, **kwargs)
        self.use_pallas = bool(use_pallas)
        # Hierarchical block-max selection over the FINAL adjusted scores —
        # exact result VALUES (see ops/similarity.fused_search docstring;
        # doc ids can differ from the flat top-k only on exact f32 score
        # ties), replacing the full [Q, cap] lax.top_k.  Default ON: the
        # two-pass variant gathers candidate scores only, so it wins at
        # every batch size — measured at 1M x 256 bf16 on one v5e:
        # Q=1 0.784 vs 0.819 ms (XLA), and Q=128 batched 4.18 vs 319.8 ms
        # (the flat [128, 1M] lax.top_k is catastrophic) — 76x
        # (docs/perf/scan_breakdown.json exact_bf16_* rows).
        self.blockmax_select = bool(blockmax_select)
        # The fused stage-1+max kernel MEASURED A LOSS on the bf16 exact
        # tier at Q=1 (0.846 vs 0.779 ms pallas_topk): the block re-score
        # costs more than the 4 MB scores writeback it avoids when the
        # stream is already 512 MB of bf16.  Kept as an explicit opt-in
        # for A/Bs; the quantized tier (256 MB int8 stream) is where it
        # wins (see QuantizedIndex).
        self.fused_bmax = bool(fused_bmax)

    def _hyperparams(self) -> dict:
        return {
            "use_pallas": self.use_pallas,
            "blockmax_select": self.blockmax_select,
            "fused_bmax": self.fused_bmax,
        }

    def _pallas_ok(self, n_queries: int) -> bool:
        from ..ops.pallas_search import SCORES_BLOCK, pallas_available

        return (
            self.use_pallas
            and self.store.normalize
            # The kernel's matmul runs in bf16: only bit-equivalent for
            # bf16-stored corpora (the recommended serving config).
            and self.store.dtype == jnp.bfloat16
            and self.store.capacity % SCORES_BLOCK == 0
            # [Q, SCORES_BLOCK] out tile lives in VMEM per grid step; large
            # batches must take the XLA path (same guard as
            # QuantizedIndex._pallas_stage1_ok).
            and n_queries <= 32
            and pallas_available()
        )

    def _blockmax_ok(self) -> bool:
        from ..ops.quantized import BLOCKMAX_SUB

        cap = self.store.capacity
        # No query-count gate: the two-pass variant gathers candidate
        # SCORES only (k*128 f32/query), cheap at any batch size; the fused
        # kernel composes on top under _fused_bmax_ok's own Q<=32 gate.
        return (
            self.blockmax_select
            and cap % BLOCKMAX_SUB == 0
            and cap >= 4 * BLOCKMAX_SUB
        )

    def _fused_bmax_ok(self, n_queries: int) -> bool:
        if not self.fused_bmax:  # measured loss on this tier — opt-in only
            return False
        from ..ops.pallas_search import BMAX_BLOCK, bmax_kernel_supported

        return (
            self._blockmax_ok()
            and self._pallas_ok(n_queries)
            and self.store.capacity % BMAX_BLOCK == 0
            and bmax_kernel_supported(False)
        )

    def build(self, **kwargs: Any) -> None:
        if len(self.store) == 0:
            raise ValueError("No embeddings to build index from")
        self.store.device_arrays()  # sync + normalize on device
        self._is_trained = True

    def search_batch(
        self,
        queries: np.ndarray,
        k: int = 10,
        eta: float = 0.5,
        entropy_pref: float = 0.0,
    ) -> Tuple[jax.Array, jax.Array]:
        """Batched device-native search: [Q, D] queries -> ([Q, k], [Q, k]).

        This is the hot path: everything from similarity to top-k runs in one
        XLA computation on the TPU; results stay on device.
        """
        emb, sqn, pay, n = self.store.device_arrays()
        q = jnp.atleast_2d(jnp.asarray(queries, dtype=jnp.float32))
        k_eff = min(int(k), self.store.capacity)
        return fused_search(
            emb,
            sqn,
            pay,
            q,
            n,
            jnp.float32(eta),
            jnp.float32(entropy_pref),
            k=k_eff,
            normalize=self.store.normalize,
            pallas_scores=self._pallas_ok(int(q.shape[0])),
            blockmax_select=self._blockmax_ok(),
            fused_bmax=self._fused_bmax_ok(int(q.shape[0])),
        )

    def search(
        self,
        query: np.ndarray,
        k: int = 10,
        eta: float = 0.5,
        entropy_pref: float = 0.0,
    ) -> List[Tuple[str, float, Payload]]:
        """Single-query search returning (doc_id, adjusted_score, Payload).

        Result-shape parity with reference backends.py:414-481; at most
        ``len(self)`` results are returned (padding rows are masked to -inf
        inside the kernel and trimmed here).
        """
        if len(self.store) == 0:
            return []
        scores, idx = self.search_batch(query, k=k, eta=eta, entropy_pref=entropy_pref)
        scores = np.asarray(scores[0])
        idx = np.asarray(idx[0])
        pay = self.store.payload_matrix()
        n_live = min(int(k), len(self.store))
        results = []
        for rank in range(n_live):
            i = int(idx[rank])
            doc_id = self.store.doc_ids[i]
            results.append((doc_id, float(scores[rank]), Payload.from_array(pay[i])))
        return results
