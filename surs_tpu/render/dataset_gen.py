"""Dataset-creation rendering: RENDER / MASK / PARAM folders from meshes.

The reference's training data is produced by an offline OpenGL PRT
renderer ("render following PIFu", reference README.md:27; code under
lib/renderer/gl/). This module provides the same capability on TPU/CPU
via the JAX rasterizer: for each yaw angle it renders a shaded RGB image
and binary mask, and saves the PARAM dict that data/calib.py consumes.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import jax.numpy as jnp
from PIL import Image

from .camera import OrthoCamera, fit_camera, yaw_pitch_rotation
from .rasterizer import rasterize
from .shading import vertex_normals, sh_shading, default_lighting


def render_views(verts: np.ndarray, faces: np.ndarray, load_size: int,
                 yaws: Sequence[float], pitch: float = 0.0,
                 colors: Optional[np.ndarray] = None,
                 sh_coeffs: Optional[np.ndarray] = None,
                 camera: Optional[OrthoCamera] = None, patch: int = 16,
                 prt: Optional[np.ndarray] = None):
    """Yield (yaw, rgb uint8 [S,S,3], mask uint8 [S,S], param dict).

    ``prt``: optional [V, 9] per-vertex transfer vectors (render/prt.py
    compute_prt) — shading becomes the reference's shadowed-PRT model
    (prt.fs evaluateLightingModelPRT), with the transfer rotated into
    each view's light frame (prt.vs's SH rotation). Without it, the
    analytic SH model on camera-space normals is used.
    """
    if camera is None:
        camera = fit_camera(np.asarray(verts), load_size)
    if sh_coeffs is None:
        sh_coeffs = default_lighting()
    verts_j = jnp.asarray(verts, jnp.float32)
    faces_j = jnp.asarray(faces, jnp.int32)
    normals = vertex_normals(verts_j, faces_j)
    base_color = (jnp.asarray(colors, jnp.float32) if colors is not None
                  else jnp.full((verts_j.shape[0], 3), 0.75))
    prt_j = None if prt is None else jnp.asarray(prt, jnp.float32)

    for yaw in yaws:
        cam = OrthoCamera(camera.ortho_ratio, camera.scale, camera.center,
                          yaw_pitch_rotation(yaw, pitch))
        param = cam.param_dict()
        uv = jnp.asarray(cam.world_to_uv(np.asarray(verts), load_size))
        if prt_j is not None:
            from .prt import sh_rotation_matrix, RAW_TO_CONV
            M = sh_rotation_matrix(param["R"])
            # the transfer vectors live in the cosine-CONVOLVED basis
            # (irradiance_basis amplitudes) while sh_shading evaluates
            # the RAW Y9 basis — rescale the lighting per band so the
            # same sh_coeffs give matching exposure on both paths
            sh_prt = (jnp.asarray(sh_coeffs, jnp.float32).T
                      / jnp.asarray(RAW_TO_CONV)).T
            shade = jnp.clip((prt_j @ jnp.asarray(M)) @ sh_prt,
                             0.0, None)
        else:
            # rotate normals into camera space for shading
            n_cam = normals @ jnp.asarray(param["R"].T, jnp.float32)
            shade = jnp.clip(sh_shading(n_cam, sh_coeffs), 0.0, None)
        attrs = base_color * shade[:, None]
        img, mask, _ = rasterize(uv, faces_j, attrs, res=load_size,
                                 patch=patch)
        rgb = np.asarray(jnp.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
        m = (np.asarray(mask) * 255).astype(np.uint8)
        yield yaw, rgb, m, param


def render_dataset(obj_dir: str, out_root: str, load_size: int = 512,
                   yaw_step: int = 1, patch: int = 16,
                   subjects: Optional[Sequence[str]] = None,
                   use_prt: bool = False, prt_dirs: int = 128,
                   prt_grid: int = 96) -> None:
    """Render a full RENDER/MASK/PARAM training layout from
    ``obj_dir/<subject>_HR.obj`` meshes.

    ``use_prt``: shade with per-vertex shadowed radiance transfer
    (render/prt.py) — the reference renderer's lighting model — instead
    of the analytic SH model; transfer vectors are computed once per
    subject and cached next to the OBJ (``<subject>_prt.npy``).
    """
    from ..recon.mesh_io import load_obj

    render_dir = os.path.join(out_root, "RENDER")
    mask_dir = os.path.join(out_root, "MASK")
    param_dir = os.path.join(out_root, "PARAM")
    if subjects is None:
        subjects = sorted({f[:-7] for f in os.listdir(obj_dir)
                           if f.endswith("_HR.obj")})
    yaws = list(range(0, 360, yaw_step))
    for subject in subjects:
        verts, faces = load_obj(os.path.join(obj_dir, subject + "_HR.obj"))
        prt = None
        if use_prt:
            from .prt import compute_prt
            prt_path = os.path.join(obj_dir, subject + "_prt.npy")
            if os.path.exists(prt_path):
                prt = np.load(prt_path)
            if prt is None or prt.shape[0] != verts.shape[0]:
                prt = compute_prt(verts, faces, n_dirs=prt_dirs,
                                  grid=prt_grid)
                np.save(prt_path, prt)
        for d in (render_dir, mask_dir, param_dir):
            os.makedirs(os.path.join(d, subject), exist_ok=True)
        for yaw, rgb, mask, param in render_views(verts, faces, load_size,
                                                  yaws, patch=patch,
                                                  prt=prt):
            stem = f"{yaw}_0_00"
            Image.fromarray(rgb).save(
                os.path.join(render_dir, subject, stem + ".jpg"))
            Image.fromarray(mask).save(
                os.path.join(mask_dir, subject, stem + ".png"))
            np.save(os.path.join(param_dir, subject, stem + ".npy"),
                    param, allow_pickle=True)
