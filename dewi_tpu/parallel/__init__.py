"""Mesh/runtime layer: device meshes, shardings, distributed search."""

from .distributed import (
    ShardedExactSearcher,
    ShardedIVFSearcher,
    ShardedQuantizedSearcher,
    make_sharded_ivf_search,
    make_sharded_quantized_search,
    make_sharded_search,
)
from .sp import sequence_sharded_nll, shard_tokens
from .runtime import (
    default_mesh,
    device_summary,
    initialize_runtime,
    shard_batch,
)
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    data_sharding,
    make_mesh,
    replicated,
    single_device_mesh,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "data_sharding",
    "replicated",
    "single_device_mesh",
    "make_sharded_search",
    "ShardedExactSearcher",
    "ShardedQuantizedSearcher",
    "ShardedIVFSearcher",
    "make_sharded_quantized_search",
    "make_sharded_ivf_search",
    "initialize_runtime",
    "device_summary",
    "shard_batch",
    "default_mesh",
    "shard_tokens",
    "sequence_sharded_nll",
]
