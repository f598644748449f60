"""Mesh-fidelity metrics: Chamfer, point-to-surface, normal consistency.

The reference repo ships no evaluation utility (its paper reports
Chamfer / P2S / normal errors; SURVEY.md §6) — this module provides the
measurement needed to prove parity. Distances are computed on TPU with a
chunked brute-force nearest-neighbor (exact, MXU-friendly: the pairwise
distance matrix is a matmul) over surface-sampled point sets.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..data.sampling import MeshData, sample_surface


@functools.partial(jax.jit, static_argnames=("chunk",))
def _nn_dist_sq(a: jnp.ndarray, b: jnp.ndarray, chunk: int = 4096
                ) -> jnp.ndarray:
    """For each point in a [N,3], squared distance to nearest in b [M,3]."""
    b_sq = jnp.sum(b * b, axis=1)

    def body(carry, a_chunk):
        d = (jnp.sum(a_chunk * a_chunk, axis=1)[:, None] + b_sq[None, :]
             - 2.0 * a_chunk @ b.T)
        return carry, jnp.min(d, axis=1)

    n = a.shape[0]
    pad = -n % chunk
    a_pad = jnp.pad(a, ((0, pad), (0, 0)))
    _, mins = jax.lax.scan(body, None,
                           a_pad.reshape(-1, chunk, 3))
    return jnp.maximum(mins.reshape(-1)[:n], 0.0)


def chamfer_distance(mesh_a: MeshData, mesh_b: MeshData,
                     n_samples: int = 10000, seed: int = 1991
                     ) -> Tuple[float, float, float]:
    """(chamfer, a->b, b->a) mean point-to-point distances between
    surface samples of two meshes (the standard bidirectional Chamfer-L1
    protocol)."""
    rng = np.random.default_rng(seed)
    pa = jnp.asarray(sample_surface(mesh_a, n_samples, rng).astype(
        np.float32))
    pb = jnp.asarray(sample_surface(mesh_b, n_samples, rng).astype(
        np.float32))
    d_ab = float(jnp.mean(jnp.sqrt(_nn_dist_sq(pa, pb))))
    d_ba = float(jnp.mean(jnp.sqrt(_nn_dist_sq(pb, pa))))
    return 0.5 * (d_ab + d_ba), d_ab, d_ba


def _subdivide_for_raster(uvz: np.ndarray, attrs: np.ndarray,
                          faces: np.ndarray, res: int, max_px: float,
                          max_rounds: int = 8):
    """4-way midpoint-split faces whose projected bbox exceeds
    ``max_px`` pixels, so every face fits the rasterizer's per-face
    candidate patch. Attributes are midpoint-averaged (== barycentric
    interpolation of the original surface). Vertices are duplicated,
    not welded — harmless for rasterization."""
    px_per_uv = 0.5 * (res - 1)
    for _ in range(max_rounds):
        tri = uvz[faces]                                   # [F, 3, 3]
        ext = (tri[:, :, :2].max(axis=1)
               - tri[:, :, :2].min(axis=1)).max(axis=1) * px_per_uv
        big = ext > max_px
        if not np.any(big):
            break
        fb = faces[big]
        base = uvz.shape[0]
        m01 = 0.5 * (uvz[fb[:, 0]] + uvz[fb[:, 1]])
        m12 = 0.5 * (uvz[fb[:, 1]] + uvz[fb[:, 2]])
        m20 = 0.5 * (uvz[fb[:, 2]] + uvz[fb[:, 0]])
        a01 = 0.5 * (attrs[fb[:, 0]] + attrs[fb[:, 1]])
        a12 = 0.5 * (attrs[fb[:, 1]] + attrs[fb[:, 2]])
        a20 = 0.5 * (attrs[fb[:, 2]] + attrs[fb[:, 0]])
        n = fb.shape[0]
        i01 = base + np.arange(n)
        i12 = base + n + np.arange(n)
        i20 = base + 2 * n + np.arange(n)
        uvz = np.concatenate([uvz, m01, m12, m20], axis=0)
        attrs = np.concatenate([attrs, a01, a12, a20], axis=0)
        quads = np.concatenate([
            np.stack([fb[:, 0], i01, i20], axis=1),
            np.stack([i01, fb[:, 1], i12], axis=1),
            np.stack([i20, i12, fb[:, 2]], axis=1),
            np.stack([i01, i12, i20], axis=1)], axis=0)
        faces = np.concatenate([faces[~big], quads], axis=0)
    return uvz, attrs, faces


# jitted helpers for projected_normal_error: the z-merge, map finalize
# and reductions would otherwise run as ~10 distinct eager dispatches
# per call — each a separate remote compile on the tunneled TPU
# (CLAUDE.md discipline). Shapes are fixed per `res`, so the jit caches
# hold one program each.
@jax.jit
def _zmerge(img, mask, depth, img_c, mask_c, depth_c):
    win = depth_c < depth
    return (jnp.where(win[..., None], img_c, img), mask | mask_c,
            jnp.where(win, depth_c, depth))


@jax.jit
def _finalize_normal_map(img, mask):
    n = img / jnp.maximum(
        jnp.linalg.norm(img, axis=-1, keepdims=True), 1e-12)
    return n * mask[..., None]


@jax.jit
def _normal_map_stats(na, ma, nb, mb):
    union = ma | mb
    inter = ma & mb
    diff = jnp.linalg.norm(na - nb, axis=-1)
    l2 = jnp.sum(jnp.where(union, diff, 0.0)) \
        / jnp.maximum(jnp.sum(union), 1)
    cos = jnp.sum(jnp.where(inter, jnp.sum(na * nb, axis=-1), 0.0)) \
        / jnp.maximum(jnp.sum(inter), 1)
    return l2, cos


def projected_normal_error(mesh_rec: MeshData, mesh_gt: MeshData,
                           calib: Optional[np.ndarray] = None,
                           res: int = 512
                           ) -> Tuple[float, float]:
    """Paper's third quality metric (normal consistency, alongside
    Chamfer/P2S — /root/reference/README.md:45-52): render world-space
    unit vertex normals of both meshes from the eval view with the TPU
    rasterizer and compare the normal maps.

    Returns ``(l2, cos)``: mean L2 distance between the two normal maps
    over the UNION of their silhouettes (mask mismatches count at full
    error, the standard PIFu protocol), and mean cosine similarity over
    the INTERSECTION (pure orientation agreement).

    ``calib``: 4x4 projection (default: the fixed eval calibration
    diag(2, -2, 2, 1), recon/pipeline.eval_calibration).
    """
    from ..render import rasterize, vertex_normals

    if calib is None:
        calib = np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32)
    calib = np.asarray(calib, np.float32).reshape(4, 4)
    patch = 16

    def normal_map(mesh: MeshData):
        v = np.asarray(mesh.verts, np.float32)
        f = np.asarray(mesh.faces, np.int64)
        vn = np.asarray(vertex_normals(jnp.asarray(v),
                                       jnp.asarray(f, jnp.int32)))
        uvz = v @ calib[:3, :3].T + calib[:3, 3]
        # the rasterizer drops pixels beyond a patch x patch window per
        # face — split any face projecting larger than that (a no-op
        # for marching-cubes output; matters for coarse GT meshes)
        uvz, vn, f = _subdivide_for_raster(uvz, vn, f, res,
                                           max_px=patch - 2)
        # chunk megaface meshes: the rasterizer's F x patch^2 candidate
        # tensors are ~2.5 GB per 2.4M faces — render in face chunks
        # and z-merge (front-most depth wins per pixel)
        chunk = 400_000
        img = mask = depth = None
        uvz_j = jnp.asarray(uvz)
        vn_j = jnp.asarray(vn)
        for f0 in range(0, max(f.shape[0], 1), chunk):
            img_c, mask_c, depth_c = rasterize(
                uvz_j, jnp.asarray(f[f0:f0 + chunk], jnp.int32),
                vn_j, res=res, patch=patch)
            if img is None:
                img, mask, depth = img_c, mask_c, depth_c
            else:
                img, mask, depth = _zmerge(img, mask, depth,
                                           img_c, mask_c, depth_c)
        # re-normalize the interpolated normals pixel-wise
        return _finalize_normal_map(img, mask), mask

    na, ma = normal_map(mesh_rec)
    nb, mb = normal_map(mesh_gt)
    l2, cos = _normal_map_stats(na, ma, nb, mb)
    return float(l2), float(cos)


def point_to_surface(points: np.ndarray, mesh: MeshData,
                     n_surface: int = 50000, seed: int = 1991) -> float:
    """Mean distance from ``points`` to a dense surface sampling of
    ``mesh`` (P2S proxy via sampled surface)."""
    rng = np.random.default_rng(seed)
    surf = jnp.asarray(sample_surface(mesh, n_surface, rng).astype(
        np.float32))
    return float(jnp.mean(jnp.sqrt(_nn_dist_sq(
        jnp.asarray(points, jnp.float32), surf))))
