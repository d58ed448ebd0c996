from .mesh import (DATA_AXIS, SPACE_AXIS, batch_sharding, make_mesh,
                   pad_batch_to_multiple, replicated, shard_batch)

__all__ = [
    "DATA_AXIS", "SPACE_AXIS", "batch_sharding", "make_mesh",
    "pad_batch_to_multiple", "replicated", "shard_batch",
]
