"""End-to-end reconstruction pipeline.

Equivalent of the reference's ``reconstruction`` (lib/mesh_util.py:8-49)
and ``gen_mesh`` (lib/train_util.py:53-85): encode image features once,
evaluate the (HR, LR) occupancy fields over the bounding grid —
coarse-to-fine on device — then extract both meshes on the host and write
``*_HR.obj`` / ``*_LR.obj``.

The device/host boundary is crossed exactly twice per subject (one
occupancy volume each), versus once per 50k-point chunk in the reference
(lib/mesh_util.py:20-28).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..models.surs_net import SuRSNet
from .grid import grid_matrix
from .evaluator import eval_grid_octree, eval_grid_dense
from .marching import extract_isosurface
from .mesh_io import save_obj_mesh


def eval_calibration(batch: int = 1) -> np.ndarray:
    """The fixed orthographic eval calibration diag(2, -2, 2, 1)
    (lib/train_util.py:63-66, lib/data/EvalDataset_LR_v2.py:221-224)."""
    calib = np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32)
    return np.tile(calib[None], (batch, 1, 1))


def make_point_eval(model: SuRSNet, params, feats_lr, feat_hr,
                    calib: jnp.ndarray,
                    query_fn: Optional[Callable] = None):
    """Build the traceable [3, C] -> (hr [C], lr [C]) point evaluator.

    ``query_fn`` overrides the model query (used to swap in the fused
    Pallas kernel path while keeping identical semantics).
    """
    def eval_fn(points):
        pts = points[None]  # [1, 3, C]
        if query_fn is not None:
            hr, lr = query_fn(params, feats_lr, feat_hr, pts, calib)
        else:
            hr, lr = model.apply({"params": params}, feats_lr, feat_hr,
                                 pts, calib, method=SuRSNet.query)
        return hr[0], lr[0]
    return eval_fn


def reconstruction(model: SuRSNet, params, feats_lr, feat_hr,
                   calib, resolution: int, b_min, b_max,
                   use_octree: bool = True, num_samples: int = 50000,
                   threshold: float = 0.05, init_resolution: int = 64,
                   transform: Optional[np.ndarray] = None,
                   query_fn: Optional[Callable] = None,
                   level: float = 0.5):
    """Evaluate both occupancy fields and extract both meshes.

    Returns (verts_hr, faces_hr, verts_lr, faces_lr), verts in world
    coordinates.
    """
    mat = grid_matrix((resolution,) * 3, b_min, b_max)
    if transform is not None:
        mat = np.asarray(transform) @ mat

    eval_fn = make_point_eval(model, params, feats_lr, feat_hr,
                              jnp.asarray(calib), query_fn)
    if use_octree:
        sdf_hr, sdf_lr = eval_grid_octree(
            eval_fn, resolution, mat, threshold,
            init_resolution=init_resolution, num_samples=num_samples)
    else:
        sdf_hr, sdf_lr = eval_grid_dense(
            eval_fn, resolution, mat, num_samples=num_samples)

    def extract(sdf):
        verts, faces = extract_isosurface(np.asarray(sdf), level)
        verts = verts @ mat[:3, :3].T + mat[:3, 3]
        return verts.astype(np.float32), faces

    verts_hr, faces_hr = extract(sdf_hr)
    verts_lr, faces_lr = extract(sdf_lr)
    return verts_hr, faces_hr, verts_lr, faces_lr


def gen_mesh(cfg, model: SuRSNet, params, data: dict, save_path: str,
             use_octree: bool = True,
             query_fn: Optional[Callable] = None) -> Tuple[str, str]:
    """Per-subject inference driver (reference gen_mesh,
    lib/train_util.py:53-85).

    ``data`` holds 'img_LR' [1, S, S, 3] (NHWC), 'b_min', 'b_max'.
    Writes ``<save_path[:-4]>_HR.obj`` and ``_LR.obj``; returns the paths.
    """
    img_lr = jnp.asarray(data["img_LR"])
    _, feats_lr, feat_hr = model.apply({"params": params}, img_lr,
                                       train=False, method=SuRSNet.encode)
    calib = eval_calibration(img_lr.shape[0])

    verts_hr, faces_hr, verts_lr, faces_lr = reconstruction(
        model, params, feats_lr, feat_hr, calib, cfg.resolution,
        data["b_min"], data["b_max"], use_octree=use_octree,
        num_samples=cfg.num_samples, threshold=cfg.threshold,
        init_resolution=cfg.octree_init_resolution, query_fn=query_fn)

    path_hr = save_path[:-4] + "_HR.obj"
    path_lr = save_path[:-4] + "_LR.obj"
    save_obj_mesh(path_hr, verts_hr, faces_hr)
    save_obj_mesh(path_lr, verts_lr, faces_lr)
    return path_hr, path_lr
