"""Projection and depth-normalization primitives.

Capability parity with the reference's ``lib/geometry.py`` (orthogonal:
lib/geometry.py:15, perspective: lib/geometry.py:34) and
``lib/model/DepthNormalizer.py:6``, re-expressed as pure JAX functions.

Conventions: points are ``[B, 3, N]`` (matching the reference's world-space
layout so calibration matrices apply directly); image-space uv is in
[-1, 1] with y already flipped by the calibration matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Projection is tiny (3x3 matmuls) but feeds uv coordinates whose accuracy
# gates grid-sample parity; never let it drop to bf16 MXU passes.
_HI = jax.lax.Precision.HIGHEST


def orthogonal(points: jnp.ndarray, calibs: jnp.ndarray,
               transforms: jnp.ndarray | None = None) -> jnp.ndarray:
    """Orthographic projection of world points into image/uv space.

    points:  [B, 3, N] world coordinates.
    calibs:  [B, 3, 4] or [B, 4, 4] calibration (intrinsic @ extrinsic).
    transforms: optional [B, 2, 3] image-space affine transform.
    Returns [B, 3, N]: (u, v) in [-1, 1] and z in camera units.
    """
    rot = calibs[:, :3, :3]
    trans = calibs[:, :3, 3:4]
    pts = jnp.einsum("bij,bjn->bin", rot, points, precision=_HI) + trans
    if transforms is not None:
        scale = transforms[:, :2, :2]
        shift = transforms[:, :2, 2:3]
        xy = jnp.einsum("bij,bjn->bin", scale, pts[:, :2, :], precision=_HI) + shift
        pts = jnp.concatenate([xy, pts[:, 2:3, :]], axis=1)
    return pts


def perspective(points: jnp.ndarray, calibs: jnp.ndarray,
                transforms: jnp.ndarray | None = None) -> jnp.ndarray:
    """Perspective projection of world points into image/uv space.

    Same signature as :func:`orthogonal`; divides x,y by depth.
    """
    rot = calibs[:, :3, :3]
    trans = calibs[:, :3, 3:4]
    homo = jnp.einsum("bij,bjn->bin", rot, points, precision=_HI) + trans
    xy = homo[:, :2, :] / homo[:, 2:3, :]
    if transforms is not None:
        scale = transforms[:, :2, :2]
        shift = transforms[:, :2, 2:3]
        xy = jnp.einsum("bij,bjn->bin", scale, xy, precision=_HI) + shift
    return jnp.concatenate([xy, homo[:, 2:3, :]], axis=1)


PROJECTIONS = {"orthogonal": orthogonal, "perspective": perspective}


def normalize_depth(z: jnp.ndarray, load_size: int, z_size: float) -> jnp.ndarray:
    """Depth feature normalization: ``z * (load_size // 2) / z_size``.

    Mirrors the reference DepthNormalizer (lib/model/DepthNormalizer.py:18)
    minus its stray debug print. ``z`` may be any shape.
    """
    return z * float(load_size // 2) / float(z_size)


def image_space_rotation(xy: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """Rotate uv coordinates about the image center.

    Equivalent of the reference's ``imageSpaceRotation``
    (lib/net_util.py:153-162): xy [B, 2, N] in [-1, 1], rot [B, 2]
    (x, y) rotation angles in radians applied as a 2D rotation of the
    normalized image plane. Returns [B, 2, N].
    """
    # compose the two axis angles into one in-plane rotation
    theta = rot[:, 0] + rot[:, 1]
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    mats = jnp.stack([jnp.stack([c, -s], axis=-1),
                      jnp.stack([s, c], axis=-1)], axis=1)  # [B, 2, 2]
    return jnp.einsum("bij,bjn->bin", mats, xy, precision=_HI)


def in_image_mask(xy: jnp.ndarray) -> jnp.ndarray:
    """Inside-frustum mask for uv coordinates.

    xy: [..., 2, N] with u=xy[...,0,:], v=xy[...,1,:]. Returns float mask
    [..., N]: 1.0 where both coordinates lie in [-1, 1] (reference:
    lib/model/SuRSNet.py:142).
    """
    u = xy[..., 0, :]
    v = xy[..., 1, :]
    inside = (u >= -1.0) & (u <= 1.0) & (v >= -1.0) & (v <= 1.0)
    return inside.astype(xy.dtype)
