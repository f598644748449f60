"""Turntable visualization of result meshes.

Equivalent of the reference's pytorch3d colab visualizer
(lib/colab_util.py:77 generate_video_from_obj): render N yaw frames of a
mesh with the JAX rasterizer and save an animated GIF.
"""

from __future__ import annotations

from typing import List

import numpy as np
from PIL import Image

from .dataset_gen import render_views


def turntable_frames(verts: np.ndarray, faces: np.ndarray,
                     n_frames: int = 36, res: int = 256,
                     patch: int = 16) -> List[np.ndarray]:
    yaws = np.linspace(0, 360, n_frames, endpoint=False)
    return [rgb for _, rgb, _, _ in
            render_views(verts, faces, res, yaws, patch=patch)]


def save_gif(frames: List[np.ndarray], path: str,
             duration_ms: int = 80) -> None:
    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=duration_ms, loop=0)


def turntable_gif(obj_path: str, out_path: str, n_frames: int = 36,
                  res: int = 256) -> None:
    from ..recon.mesh_io import load_obj
    verts, faces = load_obj(obj_path)
    save_gif(turntable_frames(verts, faces, n_frames, res), out_path)
