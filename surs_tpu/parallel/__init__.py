from .mesh import (DATA_AXIS, POINT_AXIS, make_mesh, batch_sharding,
                   replicated, point_sharding, shard_batch, replicate_tree)

__all__ = [
    "DATA_AXIS", "POINT_AXIS", "make_mesh", "batch_sharding", "replicated",
    "point_sharding", "shard_batch", "replicate_tree",
]
