from .mesh import (DATA_AXIS, POINT_AXIS, make_mesh, batch_sharding,
                   replicated, point_sharding, shard_batch, replicate_tree)
from .sharded_mc import (extract_isosurface_sharded,
                         extract_isosurface_sharded_begin)
from .single_subject import reconstruct_subject_sharded

__all__ = [
    "DATA_AXIS", "POINT_AXIS", "make_mesh", "batch_sharding", "replicated",
    "point_sharding", "shard_batch", "replicate_tree",
    "extract_isosurface_sharded",
    "extract_isosurface_sharded_begin",
    "reconstruct_subject_sharded",
]
