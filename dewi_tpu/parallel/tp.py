"""Tensor-parallel sharding of the Flax signal backbones over the model axis.

No reference counterpart (single-GPU torch, SURVEY.md §2.3); this is the
"optional model sharding" leg of the mesh design (SURVEY.md §7): Megatron
layout over the ``model`` axis, expressed entirely through parameter
shardings — XLA's SPMD partitioner inserts the collectives.

Layout rules (for the in-repo transformer stack):
* attention qkv / MLP ``fc_in`` kernels  -> split output features (column),
* attention out / MLP ``fc_out`` kernels -> split input features (row),
* embeddings / layernorms / small heads  -> replicated.

Use :func:`shard_params` to place a param pytree, then jit the apply with
activations replicated (or data-sharded) — the partitioner does the rest.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# (path regex, partition spec builder by param rank)
_COLUMN = re.compile(
    r"(attn/(query|key|value)/kernel|fc_in/kernel)$"
)
_ROW = re.compile(r"(attn/out/kernel|fc_out/kernel)$")


def _spec_for(path: str, ndim: int) -> Any:
    if _COLUMN.search(path):
        # kernel [..., in, out] -> split the output features.
        return P(*([None] * (ndim - 1) + [MODEL_AXIS]))
    if _ROW.search(path):
        # kernel [..., in, out] -> split the input features.
        if ndim >= 2:
            return P(*([None] * (ndim - 2) + [MODEL_AXIS, None]))
    return P()  # replicate


def param_specs(params: Any) -> Any:
    """PartitionSpec pytree mirroring ``params`` (Megatron TP layout)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    specs = []
    for path, leaf in flat:
        path_str = "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )
        specs.append(_spec_for(path_str, getattr(leaf, "ndim", 0)))
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a param pytree on the mesh with the TP layout.

    Falls back to replication for any kernel whose split axis doesn't divide
    by the model-axis size (tiny test models with odd dims).
    """
    n_model = mesh.shape[MODEL_AXIS]

    def place(leaf: Any, spec: Any) -> Any:
        if n_model > 1 and spec != P():
            axis = [i for i, s in enumerate(spec) if s == MODEL_AXIS][0]
            if leaf.shape[axis] % n_model != 0:
                spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, params, param_specs(params))


__all__ = ["param_specs", "shard_params"]
