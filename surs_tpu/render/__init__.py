from .camera import OrthoCamera, fit_camera, yaw_pitch_rotation
from .rasterizer import rasterize
from .shading import (vertex_normals, sh9_basis, sh_shading,
                      lambert_shading, default_lighting)
from .dataset_gen import render_views, render_dataset
from .uv import triangle_atlas_uvs, render_uv_maps, render_uv_dataset
from .prt import (compute_prt, irradiance_basis, prt_shading,
                  sh_rotation_matrix)
from .turntable import turntable_frames, save_gif

__all__ = [
    "OrthoCamera", "fit_camera", "yaw_pitch_rotation", "rasterize",
    "vertex_normals", "sh9_basis", "sh_shading", "lambert_shading",
    "default_lighting", "render_views", "render_dataset",
    "triangle_atlas_uvs", "render_uv_maps", "render_uv_dataset",
    "compute_prt", "irradiance_basis", "prt_shading",
    "sh_rotation_matrix",
    "turntable_frames", "save_gif",
]
