"""Distributed DEWI search: shard_map over the corpus axis.

Replaces both C++ ANN query paths (reference backends.py:217, 326) with the
mesh-native pattern from SURVEY.md §5/§7: each device holds a block of the
document axis, computes its fused similarity + DEWI re-rank + local
``lax.top_k(k)``, then the ``(score, global_id)`` candidate lists are
all-gathered over ICI and merged with one more top-k.  Communication per
query is ``O(n_devices * k)`` floats — independent of corpus size.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.similarity import fused_search, topk_merge
from .mesh import DATA_AXIS, data_sharding


def make_sharded_search(mesh: Mesh, k: int, normalize: bool = True):
    """Build a jitted sharded-search callable for a fixed (mesh, k, space).

    The returned function takes device arrays laid out as:
      emb [cap, D] sharded on data axis, sqn [cap] sharded,
      pay [cap, 8] sharded, queries [Q, D] replicated,
      n_valid / eta / entropy_pref scalars replicated,
    and returns replicated ([Q, k] scores, [Q, k] global row indices).
    """

    def local_search(emb, sqn, pay, queries, n_valid, eta, entropy_pref):
        shard = jax.lax.axis_index(DATA_AXIS)
        shard_cap = emb.shape[0]
        local_n = jnp.clip(n_valid - shard * shard_cap, 0, shard_cap)
        k_local = min(k, shard_cap)
        vals, idx = fused_search(
            emb, sqn, pay, queries, local_n, eta, entropy_pref,
            k=k_local, normalize=normalize,
        )
        gidx = idx + shard * shard_cap
        all_vals = jax.lax.all_gather(vals, DATA_AXIS, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(gidx, DATA_AXIS, axis=1, tiled=True)
        return topk_merge(all_vals, all_idx, min(k, all_vals.shape[1]))

    sharded = jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS), P(DATA_AXIS, None), P(), P(), P(), P()),
        out_specs=(P(), P()),
        # Outputs are replicated by construction (deterministic merge of the
        # all-gathered candidates); VMA can't infer that statically.
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_quantized_search(mesh: Mesh, k: int, m: int):
    """Sharded two-stage int8 search: local int8 scan + f32 refine per shard,
    then the same all-gather/top-k merge as the exact path.  Stage-1 HBM
    traffic per device is the int8 shard — 4x less than f32."""
    from ..ops.quantized import quantized_search

    def local_search(emb_i8, scales, emb, sqn, pay, queries, n_valid, eta,
                     entropy_pref):
        shard = jax.lax.axis_index(DATA_AXIS)
        shard_cap = emb.shape[0]
        local_n = jnp.clip(n_valid - shard * shard_cap, 0, shard_cap)
        k_local = min(k, shard_cap)
        vals, idx = quantized_search(
            emb_i8, scales, emb, sqn, pay, queries, local_n, eta,
            entropy_pref, k=k_local, m=min(m, shard_cap), normalize=True,
        )
        gidx = idx + shard * shard_cap
        all_vals = jax.lax.all_gather(vals, DATA_AXIS, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(gidx, DATA_AXIS, axis=1, tiled=True)
        return topk_merge(all_vals, all_idx, min(k, all_vals.shape[1]))

    sharded = jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=(
            P(DATA_AXIS, None), P(DATA_AXIS), P(DATA_AXIS, None),
            P(DATA_AXIS), P(DATA_AXIS, None), P(), P(), P(), P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


class ShardedQuantizedSearcher:
    """Sharded ScaNN-style search: int8 shard scans + f32 refinement.

    The distributed counterpart of :class:`dewi_tpu.index.QuantizedIndex`;
    quantization happens once at attach time, sharded over the data axis.
    """

    def __init__(self, store, mesh: Mesh, k: int = 10, refine_factor: int = 8):
        from ..ops.quantized import quantize_rows

        self.store = store
        self.mesh = mesh
        self.k = k
        store.sharding = data_sharding(mesh, rank=2)
        emb, _, _, _ = store.device_arrays()
        # Row-wise quantization preserves the data-axis sharding.
        self._q_emb, self._scales = quantize_rows(emb)
        m = max(32, k * refine_factor)
        self._fn = make_sharded_quantized_search(mesh, k, m)

    def search_batch(self, queries, eta: float = 0.5,
                     entropy_pref: float = 0.0):
        emb, sqn, pay, n = self.store.device_arrays()
        q = jnp.atleast_2d(jnp.asarray(queries, dtype=jnp.float32))
        return self._fn(
            self._q_emb, self._scales, emb, sqn, pay, q, n,
            jnp.float32(eta), jnp.float32(entropy_pref),
        )


class ShardedExactSearcher:
    """Convenience wrapper: shard a DocStore over a mesh and serve queries."""

    def __init__(self, store, mesh: Mesh, k: int = 10):
        self.store = store
        self.mesh = mesh
        self.k = k
        store.sharding = data_sharding(mesh, rank=2)
        self._fn = make_sharded_search(mesh, k, normalize=store.normalize)

    def search_batch(
        self,
        queries,
        eta: float = 0.5,
        entropy_pref: float = 0.0,
        k: Optional[int] = None,
    ):
        if k is not None and k != self.k:
            self.k = k
            self._fn = make_sharded_search(self.mesh, k, normalize=self.store.normalize)
        emb, sqn, pay, n = self.store.device_arrays()
        q = jnp.atleast_2d(jnp.asarray(queries, dtype=jnp.float32))
        return self._fn(
            emb, sqn, pay, q, n, jnp.float32(eta), jnp.float32(entropy_pref)
        )
