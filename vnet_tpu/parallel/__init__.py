from .mesh import (DATA_AXIS, SPACE_AXIS, batch_sharding, make_mesh,
                   pad_batch_to_multiple, replicated, shard_batch)
from .spatial import (spatial_sharded_forward,
                      spatial_sharded_train_step)

__all__ = [
    "DATA_AXIS", "SPACE_AXIS", "batch_sharding", "make_mesh",
    "pad_batch_to_multiple", "replicated", "shard_batch",
    "spatial_sharded_forward",
    "spatial_sharded_train_step",
]
