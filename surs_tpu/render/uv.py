"""UV-domain rendering: UV_RENDER / UV_MASK / UV_POS / UV_NORMAL.

The reference renders its color-supervision data with a UV-mode GLSL
pass (lib/renderer/gl/data/prt_uv.vs:1-23; prt_render.py:8-9
``uv_mode``): the vertex shader emits the mesh's UV coordinate as the
raster position while world position, normal and shaded color ride
along as interpolated attributes, producing per-texel maps that
TrainDataset.get_color_sampling consumes (lib/data/
TrainDataset_LR_v2.py:441-494; our data/datasets.py:66-111).

Re-expressed for the JAX rasterizer (render/rasterizer.py): the raster
target is the UV chart mapped to [-1, 1] at z=0 and the attribute
vector is [world pos | normal | shaded rgb]. Meshes without artist UVs
get a per-triangle atlas chart (:func:`triangle_atlas_uvs`) — bijective
by construction, so every covered texel maps to exactly one surface
point, which is the only property the color-sampling consumer needs.

View-dependent shading varies per yaw (UV_RENDER/<subject>/<yaw>_0_00
.jpg), while geometry maps (UV_MASK/UV_POS/UV_NORMAL ``00.*``) are
view-independent and written once per subject — the reference layout.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp
from PIL import Image

from .rasterizer import rasterize
from .shading import vertex_normals, sh_shading, default_lighting
from .camera import yaw_pitch_rotation


def triangle_atlas_uvs(n_faces: int, margin: float = 0.15
                       ) -> np.ndarray:
    """Per-face UV chart: a sqrt-grid atlas of right triangles.

    Returns corner uvs [F, 3, 2] in [0, 1]. The map UV -> surface is
    affine per triangle, so barycentric interpolation of position /
    normal / color over the chart is exact.
    """
    G = int(np.ceil(np.sqrt(n_faces)))
    s = 1.0 / G
    m = margin * s
    f = np.arange(n_faces)
    gx = (f % G).astype(np.float64) * s
    gy = (f // G).astype(np.float64) * s
    uv = np.empty((n_faces, 3, 2), np.float64)
    uv[:, 0, 0] = gx + m
    uv[:, 0, 1] = gy + m
    uv[:, 1, 0] = gx + s - m
    uv[:, 1, 1] = gy + m
    uv[:, 2, 0] = gx + m
    uv[:, 2, 1] = gy + s - m
    return uv.astype(np.float32)


def _atlas_patch(n_faces: int, uv_size: int) -> int:
    """Rasterizer patch size covering one atlas cell."""
    G = int(np.ceil(np.sqrt(n_faces)))
    return max(16, int(np.ceil(uv_size / G)) + 2)


def render_uv_maps(verts: np.ndarray, faces: np.ndarray,
                   uv_corner: Optional[np.ndarray] = None,
                   colors: Optional[np.ndarray] = None,
                   uv_size: int = 512, patch: Optional[int] = None
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                              np.ndarray]:
    """Rasterize the view-independent UV maps.

    uv_corner: [F, 3, 2] per-corner chart coords in [0, 1] (default: the
    triangle atlas). colors: per-vertex rgb in [0, 1] (default 0.75).
    Returns (pos [S,S,3] f32, normal [S,S,3] f32 unit, albedo [S,S,3]
    f32, mask [S,S] bool).
    """
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int64)
    F = faces.shape[0]
    if uv_corner is None:
        uv_corner = triangle_atlas_uvs(F)
    if patch is None:
        patch = _atlas_patch(F, uv_size)
    vn = np.asarray(vertex_normals(jnp.asarray(verts),
                                   jnp.asarray(faces, jnp.int32)))
    base = np.asarray(colors, np.float32) if colors is not None \
        else np.full((verts.shape[0], 3), 0.75, np.float32)

    # duplicate vertices per corner so the chart can be discontinuous
    corner_ids = faces.reshape(-1)                       # [F*3]
    pos_c = verts[corner_ids]                            # [F*3, 3]
    nrm_c = vn[corner_ids]
    col_c = base[corner_ids]
    uv_flat = uv_corner.reshape(-1, 2)                   # [F*3, 2]
    raster_xy = uv_flat * 2.0 - 1.0
    raster = np.concatenate(
        [raster_xy, np.zeros((raster_xy.shape[0], 1), np.float32)],
        axis=1)
    faces_uv = np.arange(F * 3, dtype=np.int64).reshape(F, 3)

    attrs = np.concatenate([pos_c, nrm_c, col_c], axis=1)  # [F*3, 9]
    img, mask, _ = rasterize(jnp.asarray(raster),
                             jnp.asarray(faces_uv, jnp.int32),
                             jnp.asarray(attrs), res=uv_size,
                             patch=patch)
    img = np.asarray(img)
    mask = np.asarray(mask)
    pos = img[..., 0:3]
    nrm = img[..., 3:6]
    n = np.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = nrm / np.maximum(n, 1e-12)
    albedo = img[..., 6:9]
    return pos, nrm, albedo, mask


def render_uv_dataset(obj_dir: str, out_root: str, uv_size: int = 512,
                      yaw_step: int = 1,
                      subjects: Optional[Sequence[str]] = None,
                      sh_coeffs: Optional[np.ndarray] = None) -> None:
    """Write the UV_RENDER/UV_MASK/UV_POS/UV_NORMAL layout for every
    ``obj_dir/<subject>_HR.obj``, shading UV_RENDER per yaw with the
    same SH lighting the shaded-view renderer uses."""
    from ..recon.mesh_io import load_obj
    from ..utils.exr import write_exr

    if sh_coeffs is None:
        sh_coeffs = default_lighting()
    if subjects is None:
        subjects = sorted({f[:-7] for f in os.listdir(obj_dir)
                           if f.endswith("_HR.obj")})
    yaws = list(range(0, 360, yaw_step))
    for subject in subjects:
        verts, faces, colors = load_obj(
            os.path.join(obj_dir, subject + "_HR.obj"), with_colors=True)
        if colors is not None and len(colors) != len(verts):
            colors = None
        pos, nrm, albedo, mask = render_uv_maps(verts, faces,
                                                colors=colors,
                                                uv_size=uv_size)
        for d in ("UV_RENDER", "UV_MASK", "UV_POS", "UV_NORMAL"):
            os.makedirs(os.path.join(out_root, d, subject), exist_ok=True)
        Image.fromarray((mask * 255).astype(np.uint8)).save(
            os.path.join(out_root, "UV_MASK", subject, "00.png"))
        write_exr(os.path.join(out_root, "UV_POS", subject, "00.exr"),
                  pos.astype(np.float32))
        nrm_png = ((np.clip(nrm, -1.0, 1.0) + 1.0) * 0.5 * 255.0
                   ).astype(np.uint8)
        Image.fromarray(nrm_png).save(
            os.path.join(out_root, "UV_NORMAL", subject, "00.png"))

        # per-yaw shaded UV renders: rotate normals into camera space
        nrm_flat = jnp.asarray(nrm.reshape(-1, 3))
        alb_flat = albedo.reshape(-1, 3)
        for yaw in yaws:
            R = yaw_pitch_rotation(yaw, 0.0)
            n_cam = nrm_flat @ jnp.asarray(R.T, jnp.float32)
            shade = np.asarray(
                jnp.clip(sh_shading(n_cam, sh_coeffs), 0.0, None))
            rgb = np.clip(alb_flat * shade[:, None], 0.0, 1.0)
            rgb = (rgb.reshape(uv_size, uv_size, 3) * 255).astype(
                np.uint8) * mask[..., None].astype(np.uint8)
            Image.fromarray(rgb).save(os.path.join(
                out_root, "UV_RENDER", subject, f"{yaw}_0_00.jpg"))
