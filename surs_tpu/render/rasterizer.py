"""TPU z-buffer triangle rasterizer (pure JAX).

Replaces the reference's OpenGL/EGL offline renderer
(lib/renderer/gl/render.py:9, glcontext.py:81-142) with a scatter-based
rasterizer that runs on the accelerator — no GL context required.

Algorithm (all static shapes, fully vectorized):
  1. per-face candidate pixels: a PxP patch anchored at each face's
     bbox corner (faces larger than P pixels should be subdivided first
     or rendered at a coarser resolution);
  2. barycentric inside-tests + depth interpolation for all F*P*P
     candidates;
  3. winner-per-pixel via two scatter passes: scatter-min of depth, then
     scatter-min of face id among depth-ties;
  4. per-pixel attribute interpolation from the winning face.

Depth convention: camera looks down +z in uv space (the reference's
calibration flips y and keeps z sign, lib/data/TrainDataset_LR_v2.py:
246-249); the SMALLEST z wins (front-most).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e9)


@functools.partial(jax.jit, static_argnames=("res", "patch"))
def rasterize(verts_uv: jnp.ndarray, faces: jnp.ndarray,
              attrs: jnp.ndarray, res: int = 512, patch: int = 16
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rasterize triangles to an attribute image.

    verts_uv: [V, 3] — x,y in [-1, 1] (y down), z depth.
    faces:    [F, 3] int32.
    attrs:    [V, A] per-vertex attributes to interpolate.
    Returns (image [res, res, A], mask [res, res], depth [res, res]).
    """
    V = verts_uv.shape[0]
    F = faces.shape[0]
    P = patch

    # uv -> continuous pixel coords (align_corners=True convention, the
    # same mapping grid-sample uses: u=-1 -> 0, u=1 -> res-1)
    px = (verts_uv[:, 0] + 1.0) * 0.5 * (res - 1)
    py = (verts_uv[:, 1] + 1.0) * 0.5 * (res - 1)
    pz = verts_uv[:, 2]
    pv = jnp.stack([px, py], axis=1)                      # [V, 2]

    tri = pv[faces]                                       # [F, 3, 2]
    tz = pz[faces]                                        # [F, 3]

    x0 = jnp.floor(tri[:, :, 0].min(axis=1)).astype(jnp.int32)
    y0 = jnp.floor(tri[:, :, 1].min(axis=1)).astype(jnp.int32)

    di = jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
    dj = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
    cx = x0[:, None, None] + dj[None]                     # [F, P, P]
    cy = y0[:, None, None] + di[None]

    ax = tri[:, 0, 0][:, None, None]
    ay = tri[:, 0, 1][:, None, None]
    bx = tri[:, 1, 0][:, None, None]
    by = tri[:, 1, 1][:, None, None]
    ox = tri[:, 2, 0][:, None, None]
    oy = tri[:, 2, 1][:, None, None]

    fx = cx.astype(jnp.float32)
    fy = cy.astype(jnp.float32)
    det = (bx - ax) * (oy - ay) - (ox - ax) * (by - ay)
    l1 = ((fx - ax) * (oy - ay) - (ox - ax) * (fy - ay)) / \
        jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    l2 = ((bx - ax) * (fy - ay) - (fx - ax) * (by - ay)) / \
        jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    l0 = 1.0 - l1 - l2
    inside = ((l0 >= -1e-6) & (l1 >= -1e-6) & (l2 >= -1e-6)
              & (jnp.abs(det) > 1e-12)
              & (cx >= 0) & (cx < res) & (cy >= 0) & (cy < res))

    z = (l0 * tz[:, 0][:, None, None] + l1 * tz[:, 1][:, None, None]
         + l2 * tz[:, 2][:, None, None])
    z = jnp.where(inside, z, _BIG)

    pix = jnp.where(inside, cy * res + cx, res * res)     # OOB -> dropped
    pix_f = pix.reshape(-1)
    z_f = z.reshape(-1)

    # pass 1: front-most depth per pixel
    zbuf = jnp.full((res * res,), _BIG, jnp.float32).at[pix_f].min(
        z_f, mode="drop")
    # pass 2: among depth winners, smallest face id
    fid = jax.lax.broadcasted_iota(jnp.int32, (F, P, P), 0).reshape(-1)
    is_win = z_f <= zbuf[jnp.minimum(pix_f, res * res - 1)] + 0.0
    fid_masked = jnp.where(is_win & (z_f < _BIG), fid, jnp.int32(2 ** 30))
    fbuf = jnp.full((res * res,), 2 ** 30, jnp.int32).at[pix_f].min(
        fid_masked, mode="drop")

    mask = (fbuf < 2 ** 30).reshape(res, res)
    win_face = jnp.minimum(fbuf, F - 1)                   # [res*res]

    # per-pixel barycentric recompute against the winning face
    gx = jax.lax.broadcasted_iota(jnp.int32, (res, res), 1).reshape(-1)
    gy = jax.lax.broadcasted_iota(jnp.int32, (res, res), 0).reshape(-1)
    wt = tri[win_face]                                    # [res*res, 3, 2]
    wz = tz[win_face]
    wa = attrs[faces[win_face]]                           # [res*res, 3, A]
    fxg = gx.astype(jnp.float32)
    fyg = gy.astype(jnp.float32)
    axg, ayg = wt[:, 0, 0], wt[:, 0, 1]
    bxg, byg = wt[:, 1, 0], wt[:, 1, 1]
    oxg, oyg = wt[:, 2, 0], wt[:, 2, 1]
    detg = (bxg - axg) * (oyg - ayg) - (oxg - axg) * (byg - ayg)
    detg = jnp.where(jnp.abs(detg) < 1e-12, 1e-12, detg)
    g1 = ((fxg - axg) * (oyg - ayg) - (oxg - axg) * (fyg - ayg)) / detg
    g2 = ((bxg - axg) * (fyg - ayg) - (fxg - axg) * (byg - ayg)) / detg
    g0 = 1.0 - g1 - g2
    lam = jnp.stack([g0, g1, g2], axis=1)                 # [res*res, 3]
    img = jnp.einsum("pk,pka->pa", lam, wa)
    depth = jnp.einsum("pk,pk->p", lam, wz)

    m = mask.reshape(-1, 1).astype(img.dtype)
    img = (img * m).reshape(res, res, -1)
    depth = jnp.where(mask.reshape(-1), depth, _BIG).reshape(res, res)
    return img, mask, depth
