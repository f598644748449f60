"""Reconstruction grid math.

Equivalent of the reference's ``create_grid`` (lib/sdf.py:4-29): a dense
resX x resY x resZ lattice spanning [b_min, b_max) plus the 4x4 index->world
matrix used to map marching-cubes vertices back to world space.

Unlike the reference we normally do NOT materialize the [3, R, R, R] world
-coordinate array (537 MB at 512^3 x3): evaluators synthesize world
coordinates on device from integer indices via the same affine map.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp


def grid_matrix(res: Tuple[int, int, int], b_min, b_max) -> np.ndarray:
    """4x4 affine: integer grid index -> world coordinate."""
    b_min = np.asarray(b_min, dtype=np.float64)
    b_max = np.asarray(b_max, dtype=np.float64)
    length = b_max - b_min
    mat = np.eye(4)
    mat[0, 0] = length[0] / res[0]
    mat[1, 1] = length[1] / res[1]
    mat[2, 2] = length[2] / res[2]
    mat[:3, 3] = b_min
    return mat


def require_diagonal(mat: np.ndarray, context: str) -> np.ndarray:
    """Every device evaluator synthesizes world coordinates via
    ``flat_index_to_world``, which reads only diag(mat[:3, :3]) — a
    rotational/shear grid transform would be SILENTLY dropped by the
    field evaluation while extraction applied it to the vertices
    (inconsistent, garbage geometry). Raise instead."""
    rot = np.asarray(mat[:3, :3], np.float64)
    if not np.allclose(rot, np.diag(np.diag(rot)), atol=1e-12):
        raise ValueError(
            f"{context} supports only axis-aligned (diagonal) grid "
            "transforms: the device evaluators synthesize coordinates "
            "from diag(mat); got off-diagonal terms "
            f"{rot - np.diag(np.diag(rot))!r}")
    return mat


def create_grid(res_x: int, res_y: int, res_z: int, b_min, b_max,
                transform: np.ndarray | None = None):
    """Dense [3, resX, resY, resZ] world-coordinate grid + index->world
    matrix — API-compatible with lib/sdf.py:4 (used by tests and the dense
    CPU path; large-scale evaluators use :func:`grid_matrix` instead)."""
    coords = np.mgrid[:res_x, :res_y, :res_z].reshape(3, -1).astype(np.float64)
    mat = grid_matrix((res_x, res_y, res_z), b_min, b_max)
    coords = mat[:3, :3] @ coords + mat[:3, 3:4]
    if transform is not None:
        coords = transform[:3, :3] @ coords + transform[:3, 3:4]
        mat = transform @ mat
    return coords.reshape(3, res_x, res_y, res_z).astype(np.float32), mat


def flat_index_to_world(flat_idx: jnp.ndarray, lattice_size: int,
                        stride: int, mat: np.ndarray) -> jnp.ndarray:
    """Map flat lattice indices -> world points, on device.

    flat_idx: [N] int32 indices into an L^3 lattice whose grid coordinates
    are ``stride * (i, j, k)``. Returns [3, N] float32 world points.
    """
    L = lattice_size
    k = flat_idx % L
    j = (flat_idx // L) % L
    i = flat_idx // (L * L)
    ijk = jnp.stack([i, j, k]).astype(jnp.float32) * float(stride)
    scale = jnp.asarray(np.diag(mat[:3, :3]), dtype=jnp.float32)
    offset = jnp.asarray(mat[:3, 3], dtype=jnp.float32)
    return ijk * scale[:, None] + offset[:, None]
