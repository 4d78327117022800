from .mesh import (data_mesh, shard_batch, batch_sharding,
                   pad_batch_to_devices, maybe_initialize_distributed)
from .batch import synthesis_from_compressed_batch

__all__ = [
    "data_mesh", "shard_batch", "batch_sharding", "pad_batch_to_devices",
    "maybe_initialize_distributed", "synthesis_from_compressed_batch",
]
