"""Quantized index: int8 corpus scan + f32 refinement (ScaNN-style).

The TPU-native high-throughput ANN tier — replaces the role of the
reference's graph/IVF engines (backends.py:166-383) with quantization, which
is what actually moves the needle on an accelerator whose brute-force search
is HBM-bandwidth-bound (4× less corpus traffic than f32 in stage 1).
Two-stage refinement keeps recall ≈ 1.0 vs exact; ``refine_factor`` is the
recall/latency dial (analogous to FAISS nprobe / hnsw ef_query).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.quantized import (
    quantize_rows,
    quantize_rows_int4,
    quantized_search,
)
from ..types import Payload
from .base import BaseIndex


class QuantizedIndex(BaseIndex):
    """Exact-recall-in-practice int8 search with fused DEWI re-ranking."""

    def __init__(
        self,
        dim: int,
        space: str = "cosine",
        refine_factor: int = 8,
        approx_select: bool = True,
        use_pallas: bool = True,
        int8_queries: bool = False,
        bf16_scores: bool = False,
        blockmax_select: bool = True,
        int4_storage: bool = False,
        **kwargs: Any,
    ) -> None:
        super().__init__(dim, space, **kwargs)
        self.refine_factor = max(1, int(refine_factor))
        # approx stage-1 candidate selection (lax.approx_max_k): ~1.7x faster
        # at 1M docs, 0.995 recall@10; False restores exact top-m selection.
        self.approx_select = bool(approx_select)
        # Route stage-1 through the streaming Pallas scores kernel where it
        # wins (real TPU, large corpora, small query batches) — measured
        # 0.596 vs 0.62-0.66 ms at 1M x 256 (ops/pallas_search.py).
        self.use_pallas = bool(use_pallas)
        # Quantize QUERIES too: native s8xs8->s32 MXU stage-1 (2x int8
        # throughput on v5e, no int8->bf16 convert on the corpus stream).
        # Adds query-quantization error to stage 1 only — stage 2 refines
        # in f32.  Composes with use_pallas: both set routes stage 1
        # through the streaming s8xs8 Pallas kernel (pallas_scores_matrix_s8).
        self.int8_queries = bool(int8_queries)
        # Materialize the stage-1 [Q, cap] score matrix in bf16: halves its
        # HBM writeback + selection read.  Only matters for batched Q (at
        # Q=1 the matrix is ~2% of the corpus stream); stage 2 re-ranks the
        # candidates exactly in f32 either way.
        self.bf16_scores = bool(bf16_scores)
        # Hierarchical sub-block-max candidate selection: exact w.r.t.
        # stage-1 scores (top-s 128-doc blocks provably contain the stage-1
        # top-s docs) with a block-granular contiguous refine gather.
        # Paired A/Bs at 1M x 256 Q=1 chained: 0.4425 vs approx_max_k's
        # 0.4754 ms at recall 0.9986 vs 0.9982 — the bench headline tier,
        # and the default (it wins on BOTH axes; shape misfits fall back).
        # Takes precedence over approx_select when both are set, but only
        # for small query batches (see search_batch): the refine reads
        # s*128 docs PER QUERY, a large-batch pessimization (1.5 GB of
        # refine gathers at Q=1000 vs approx's 82 MB).
        self.blockmax_select = bool(blockmax_select)
        # int4 nibble-packed storage: HALF the stage-1 HBM stream — the
        # binding resource of the whole scan (docs/perf/scan_breakdown.json:
        # ~750 GB/s effective on the int8 stream, i.e. stage 1 IS the corpus
        # read).  Implies int8_queries (the s4 Pallas kernels run the MXU
        # dot s8xs8); the coarser 15-level grid is absorbed by a 4x-wider
        # stage-2 refine margin (see search_batch), recall-gated in
        # tests/bench like every tier.
        self.int4_storage = bool(int4_storage)
        if self.int4_storage:
            self.int8_queries = True
        self._q_emb: Optional[jax.Array] = None
        self._q_scales: Optional[jax.Array] = None
        # Whether the built int4 corpus is stored packed (s4 kernels
        # available) or pre-unpacked at build time (XLA fallback backends).
        self._int4_packed_runtime = False

    def _hyperparams(self) -> dict:
        return {
            "refine_factor": self.refine_factor,
            "approx_select": self.approx_select,
            "use_pallas": self.use_pallas,
            "int8_queries": self.int8_queries,
            "bf16_scores": self.bf16_scores,
            "blockmax_select": self.blockmax_select,
            "int4_storage": self.int4_storage,
        }

    def _pallas_stage1_ok(self, n_queries: int) -> bool:
        from ..ops.pallas_search import (
            SCORES_BLOCK,
            pallas_available,
            s8_kernel_supported,
        )

        cap = self.store.capacity
        ok = (
            self.use_pallas
            and cap >= SCORES_BLOCK
            and cap % SCORES_BLOCK == 0
            and n_queries <= 32          # [Q, block] out tile stays <= 1 MB
            and pallas_available()
        )
        if ok and self.int4_storage:
            # The s4 composition additionally needs the in-kernel nibble
            # unpack to legalize; its probe subsumes the s8 one.
            from ..ops.pallas_search import s4_kernel_supported

            ok = s4_kernel_supported(fused=False)
        elif ok and self.int8_queries:
            # The s8 composition needs Mosaic to legalize the int8 dot;
            # probe once and fall back to the XLA s8 path if it can't.
            ok = s8_kernel_supported()
        return ok

    def _fused_bmax_block(self, n_queries: int) -> int:
        """Stream-block size for the fused stage-1+blockmax kernel, or 0.

        The kernel dispatches at the query-major BMAX_BLOCK layout for
        EVERY batch size: quantized_search chunks batches above
        BLOCKMAX_REFINE_MAX_Q into 32-query groups under lax.map, re-running
        the small-Q fused pipeline per group (one corpus re-read per group
        — measured cheaper than any [Q, cap]-materializing path at
        Q=128 x 1M: see scan_breakdown batched128_* rows).  Returns 0 when
        fusion cannot engage (blockmax off, Pallas unavailable, capacity
        misaligned, Mosaic probe failed)."""
        from ..ops.pallas_search import (
            BMAX_BLOCK,
            bmax_kernel_supported,
            pallas_available,
            s4_kernel_supported,
            s8_kernel_supported,
        )

        cap = self.store.capacity
        if not (
            self.blockmax_select
            and self.use_pallas
            and pallas_available()
            and (not self.int8_queries or s8_kernel_supported())
            and cap % BMAX_BLOCK == 0
            and cap >= 4 * BMAX_BLOCK
            and bmax_kernel_supported(self.int8_queries)
        ):
            return 0
        if self.int4_storage and not s4_kernel_supported(fused=True):
            # quantized_search would silently unpack via XLA inside the
            # fused dispatch; prefer the plain path so the fallback is the
            # measured two-pass route, not a fused-shaped detour.
            return 0
        if (
            self.int4_storage
            and n_queries <= 8
            and cap % (2 * BMAX_BLOCK) == 0
            and s4_kernel_supported(fused=True, block=2 * BMAX_BLOCK)
        ):
            # Small-Q int4: the 2x stream block halves grid steps —
            # measured 0.2549 vs 0.2673 ms chained at 1M x 256 Q=1.  Its
            # VMEM footprint only closes at small Q (the chunked batched
            # route runs Q=32 groups and keeps the 1x block).
            return 2 * BMAX_BLOCK
        return BMAX_BLOCK

    def build(self, **kwargs: Any) -> None:
        if len(self.store) == 0:
            raise ValueError("No embeddings to build index from")
        emb, _, _, _ = self.store.device_arrays()
        if self.int4_storage:
            packed, self._q_scales = quantize_rows_int4(emb)
            # Backends without the s4 kernels read the corpus through the
            # XLA int8 paths — cache the unpack ONCE here instead of
            # re-unpacking [cap, D/2] -> [cap, D] inside every dispatch
            # (round-5 review finding).  The int4-grid selection margins
            # are preserved via int4_values (the rounding is in the
            # values, not the layout).
            from ..ops.pallas_search import s4_kernel_supported
            from ..ops.quantized import unpack_int4

            self._int4_packed_runtime = s4_kernel_supported(fused=False)
            self._q_emb = (
                packed if self._int4_packed_runtime else unpack_int4(packed)
            )
        else:
            self._q_emb, self._q_scales = quantize_rows(emb)
        self._built_len = len(self.store)
        self._is_trained = True

    def search_batch(
        self,
        queries: np.ndarray,
        k: int = 10,
        eta: float = 0.5,
        entropy_pref: float = 0.0,
    ) -> Tuple[jax.Array, jax.Array]:
        if self._q_emb is None or getattr(self, "_built_len", -1) != len(
            self.store
        ):
            # Docs added since build(): the int8 stage-1 arrays are stale
            # (zero rows at best, a capacity-mismatch crash at worst).
            self.build()
        emb, sqn, pay, n = self.store.device_arrays()
        q = jnp.atleast_2d(jnp.asarray(queries, dtype=jnp.float32))
        cap = self.store.capacity
        k_eff = min(int(k), cap)
        # int4's 15-level grid displaces true top-k members further down
        # the stage-1 ranking than int8's 255-level one; a 4x-wider refine
        # margin recovers the recall gate (measured in bench's int4 rows)
        # while stage 2 stays a tiny fraction of the halved stage-1 read.
        boost = 4 if self.int4_storage else 1
        m = min(max(k_eff * self.refine_factor * boost, 32), cap)
        nq = int(q.shape[0])
        # Fused stage-1+blockmax: engaged at EVERY batch size when the
        # probe passes — large batches shrink the kernel's stream block
        # (VMEM accumulator budget) and quantized_search recomputes the
        # winning blocks' stage-1 scores from gathered int8 rows instead
        # of ever materializing [Q, cap] (the round-3 large-batch path).
        fused_block = self._fused_bmax_block(nq)
        return quantized_search(
            self._q_emb,
            self._q_scales,
            emb,
            sqn,
            pay,
            q,
            n,
            jnp.float32(eta),
            jnp.float32(entropy_pref),
            k=k_eff,
            m=m,
            normalize=self.store.normalize,
            approx_select=self.approx_select,
            pallas_stage1=(
                bool(fused_block) or self._pallas_stage1_ok(nq)
            ),
            pallas_block=fused_block,
            int8_queries=self.int8_queries,
            bf16_scores=self.bf16_scores,
            # No Q gate: above BLOCKMAX_REFINE_MAX_Q quantized_search
            # switches to the score-gather refine internally (flat-path
            # refine traffic, selection still exact w.r.t. stage-1).
            blockmax_select=self.blockmax_select,
            fused_bmax=bool(fused_block),
            int4_packed=(self.int4_storage
                         and self._int4_packed_runtime),
            int4_values=(self.int4_storage
                         and not self._int4_packed_runtime),
        )

    def search(
        self,
        query: np.ndarray,
        k: int = 10,
        eta: float = 0.5,
        entropy_pref: float = 0.0,
    ) -> List[Tuple[str, float, Payload]]:
        if len(self.store) == 0:
            return []
        scores, idx = self.search_batch(query, k=k, eta=eta,
                                        entropy_pref=entropy_pref)
        scores = np.asarray(scores[0])
        idx = np.asarray(idx[0])
        pay = self.store.payload_matrix()
        results = []
        for rank in range(min(int(k), len(self.store))):
            i = int(idx[rank])
            results.append(
                (self.store.doc_ids[i], float(scores[rank]),
                 Payload.from_array(pay[i]))
            )
        return results


__all__ = ["QuantizedIndex"]
