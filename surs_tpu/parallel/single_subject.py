"""Single-subject multi-chip reconstruction: sharded eval -> sharded MC.

The reference reconstructs one subject on one GPU (lib/mesh_util.py:8,
lib/sdf.py:48-52 chunked dense eval + host skimage marching cubes).
This module scales ONE subject across a TPU mesh end-to-end:

  * the column-shared dense evaluator shards the R^2 column axis over
    the mesh's "points" axis (recon/evaluator.eval_grid_dense_cols_
    sharded) and — crucially — emits each occupancy volume already
    SHARDED as x-slabs, `P(points, None, None)`;
  * that is exactly the slab layout the sharded isosurface extractor
    consumes (parallel/sharded_mc.py), so the volumes never leave the
    devices and no resharding collective runs between evaluation and
    extraction — the only host traffic is the bucketed wire buffers;
  * the HR and LR extractions are staged through the begin/resolve/
    finish protocol so both count programs enqueue before either sync
    and the LR wire transfer overlaps the HR host merge, matching the
    single-device extract_pair discipline (recon/pipeline.py).

Slab-shape requirements (from the extractor's packed word stencils):
R % n == 0, (R/n) % 4 == 0, R/n >= 4, R % 32 == 0 — satisfied by the
production 512^3 / 256^3 grids on 2..64-chip meshes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from .mesh import POINT_AXIS
from ..recon.evaluator import (eval_grid_dense_cols_sharded,
                               dense_cols_separable)
from ..recon.grid import grid_matrix, require_diagonal


def reconstruct_subject_sharded(cols_weights, feat_lr, feat_hr, calib,
                                resolution: int, b_min, b_max,
                                load_size: int, z_size: float,
                                mesh: Mesh, axis: str = POINT_AXIS,
                                level: float = 0.5,
                                algorithm: str = "cubes",
                                col_block: int = 8,
                                cell_chunk: int = 1 << 16,
                                use_pallas: Optional[bool] = None,
                                interpret: bool = False,
                                cache: Optional[dict] = None,
                                transform: Optional[np.ndarray] = None
                                ) -> Tuple[np.ndarray, np.ndarray,
                                           np.ndarray, np.ndarray]:
    """One subject, whole mesh: dense column-sharded evaluation chained
    into slab-sharded extraction on the same device mesh.

    cols_weights: FusedWeights from prepare_cols_weights. feat_lr /
    feat_hr: [1, H, W, C] UNPACKED feature maps (replicated). Returns
    (verts_hr, faces_hr, verts_lr, faces_lr) in WORLD coordinates —
    the same welded meshes as the single-device dense path (vertex
    order permuted; parity-tested in tests/test_parallel.py).
    """
    from ..recon.pipeline import Reconstructor

    R = resolution
    mat = grid_matrix((R,) * 3, b_min, b_max)
    if transform is not None:
        mat = require_diagonal(
            np.asarray(transform) @ mat,
            "reconstruct_subject_sharded(transform=)")
    if not dense_cols_separable(calib, mat):
        raise ValueError("sharded single-subject reconstruction requires "
                         "a column-separable calibration (the production "
                         "eval calib diag(2,-2,2,1) qualifies)")
    sdf_hr, sdf_lr = eval_grid_dense_cols_sharded(
        cols_weights, feat_lr, feat_hr, calib, R, mat, load_size,
        z_size, mesh, col_block=col_block, use_pallas=use_pallas,
        interpret=interpret, cache=cache)

    # extraction + world transform + HR/LR pipelining live in ONE place:
    # the pipeline's sharded extract_pair branch (recon/pipeline.py)
    out = []
    for verts, faces in Reconstructor.extract_pair(
            sdf_hr, sdf_lr, mat, level=level, mc_backend="sharded",
            mc_caps=dict(mesh=mesh, axis=axis, algorithm=algorithm,
                         cell_chunk=cell_chunk)):
        out += [verts, faces]
    return tuple(out)
