from .grid import create_grid, grid_matrix, flat_index_to_world
from .evaluator import eval_grid_octree, eval_grid_dense
from .evaluator_runs import eval_grid_octree_runs, runs_supported
from .marching import extract_isosurface
from .mesh_io import (save_obj_mesh, save_obj_mesh_with_color,
                      save_obj_mesh_with_uv, save_samples_truncted_prob,
                      save_samples_rgb, load_obj)
from .pipeline import (reconstruction, gen_mesh, make_point_eval,
                       eval_calibration)

__all__ = [
    "create_grid", "grid_matrix", "flat_index_to_world",
    "eval_grid_octree", "eval_grid_dense", "eval_grid_octree_runs",
    "runs_supported", "extract_isosurface",
    "save_obj_mesh", "save_obj_mesh_with_color", "save_obj_mesh_with_uv",
    "save_samples_truncted_prob", "save_samples_rgb", "load_obj",
    "reconstruction", "gen_mesh", "make_point_eval", "eval_calibration",
]
