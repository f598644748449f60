from .geometry import (orthogonal, perspective, PROJECTIONS,
                       normalize_depth, in_image_mask)
from .grid_sample import (grid_sample_points, index, pack_bilinear,
                          grid_sample_points_packed)
from .resize import bicubic_resize_2d, bicubic_upsample, avg_pool_2x
from .pixel_shuffle import pixel_shuffle

__all__ = [
    "orthogonal", "perspective", "PROJECTIONS", "normalize_depth",
    "in_image_mask", "grid_sample_points", "index", "pack_bilinear",
    "grid_sample_points_packed", "bicubic_resize_2d",
    "bicubic_upsample", "avg_pool_2x", "pixel_shuffle",
]
