"""Mesh and point-cloud I/O.

Writers are byte-compatible with the reference:
  * ``save_obj_mesh`` — ASCII OBJ, '%.4f' vertices, faces written with the
    winding swap f v0 v2 v1 (lib/mesh_util.py:53-61);
  * ``save_samples_truncted_prob`` — ASCII PLY point cloud, red=inside /
    green=outside (lib/sample_util.py:4-26).

The loader replaces trimesh for the dataset pipeline: minimal wavefront
OBJ (v/f lines, polygonal faces fan-triangulated, 1-based and negative
indices).

Formatting hot path: a mesh at 512^3 has millions of vertices; Python
%-formatting per line is the reference's approach and is kept as the
fallback, while the native C++ writer (csrc/mesh_native.cpp) is used when
built.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def save_obj_mesh(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    verts = np.asarray(verts, dtype=np.float64)
    faces = np.asarray(faces, dtype=np.int64)
    from . import native
    if native.available():
        native.write_obj(path, verts, faces)
        return
    with open(path, "w") as f:
        for v in verts:
            f.write("v %.4f %.4f %.4f\n" % (v[0], v[1], v[2]))
        for face in faces + 1:
            f.write("f %d %d %d\n" % (face[0], face[2], face[1]))


def save_obj_mesh_with_color(path: str, verts, faces, colors) -> None:
    verts = np.asarray(verts, dtype=np.float64)
    colors = np.asarray(colors, dtype=np.float64)
    with open(path, "w") as f:
        for v, c in zip(verts, colors):
            f.write("v %.4f %.4f %.4f %.4f %.4f %.4f\n"
                    % (v[0], v[1], v[2], c[0], c[1], c[2]))
        for face in np.asarray(faces, dtype=np.int64) + 1:
            f.write("f %d %d %d\n" % (face[0], face[2], face[1]))


def save_obj_mesh_with_uv(path: str, verts, faces, uvs) -> None:
    verts = np.asarray(verts, dtype=np.float64)
    uvs = np.asarray(uvs, dtype=np.float64)
    with open(path, "w") as f:
        for v, vt in zip(verts, uvs):
            f.write("v %.4f %.4f %.4f\n" % (v[0], v[1], v[2]))
            f.write("vt %.4f %.4f\n" % (vt[0], vt[1]))
        for face in np.asarray(faces, dtype=np.int64) + 1:
            f.write("f %d/%d %d/%d %d/%d\n" % (face[0], face[0],
                                               face[2], face[2],
                                               face[1], face[1]))


_PLY_HEADER = ("ply\nformat ascii 1.0\nelement vertex {:d}\n"
               "property float x\nproperty float y\nproperty float z\n"
               "property uchar red\nproperty uchar green\n"
               "property uchar blue\nend_header")


def save_samples_truncted_prob(path: str, points: np.ndarray,
                               prob: np.ndarray) -> None:
    """Colored PLY of occupancy samples (red=prob>0.5, green=prob<0.5)."""
    points = np.asarray(points)
    prob = np.asarray(prob)
    r = (prob > 0.5).reshape(-1, 1) * 255
    g = (prob < 0.5).reshape(-1, 1) * 255
    b = np.zeros(r.shape)
    data = np.concatenate([points, r, g, b], axis=-1)
    np.savetxt(path, data, fmt="%.6f %.6f %.6f %d %d %d", comments="",
               header=_PLY_HEADER.format(points.shape[0]))


def save_samples_rgb(path: str, points: np.ndarray, rgb: np.ndarray) -> None:
    """Colored PLY with rgb in [0, 1] (lib/sample_util.py:29-47)."""
    data = np.concatenate([np.asarray(points), np.asarray(rgb) * 255],
                          axis=-1)
    np.savetxt(path, data, fmt="%.6f %.6f %.6f %d %d %d", comments="",
               header=_PLY_HEADER.format(np.asarray(points).shape[0]))


def load_obj(path: str, with_colors: bool = False):
    """Load vertices and triangulated faces from a wavefront OBJ.

    Replacement for the trimesh loads in the reference data pipeline
    (lib/data/TrainDataset_LR_v2.py:95-102). Polygons are fan-triangulated;
    indices may be 1-based or negative. ``with_colors=True`` additionally
    returns per-vertex colors (the ``v x y z r g b`` extension this
    module's own color writer emits), or None if absent.
    """
    from . import native
    if not with_colors and native.available():
        out = native.read_obj(path)
        if out is not None:
            return out
    verts = []
    faces = []
    colors = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append((float(parts[1]), float(parts[2]),
                              float(parts[3])))
                if with_colors and len(parts) >= 7:
                    colors.append((float(parts[4]), float(parts[5]),
                                   float(parts[6])))
            elif line.startswith("f "):
                idx = [p.split("/")[0] for p in line.split()[1:]]
                idx = [int(i) for i in idx]
                idx = [i - 1 if i > 0 else len(verts) + i for i in idx]
                for k in range(1, len(idx) - 1):
                    faces.append((idx[0], idx[k], idx[k + 1]))
    v = np.asarray(verts, dtype=np.float32)
    f_arr = np.asarray(faces, dtype=np.int64)
    if with_colors:
        c = (np.asarray(colors, dtype=np.float32)
             if len(colors) == len(verts) else None)
        return v, f_arr, c
    return v, f_arr
