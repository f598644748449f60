"""Normals and spherical-harmonics shading.

Covers the reference renderer's shading capability surface: per-vertex
normal computation (lib/renderer/mesh.py:280) and the 9-band SH lighting
its PRT renderer evaluates in GLSL (lib/renderer/gl/data/prt.vs sh9 /
prt_render.py:246-258), re-expressed as vectorized JAX ops.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted per-vertex normals. verts [V,3], faces [F,3]."""
    tri = verts[faces]
    fn = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])  # [F,3]
    vn = jnp.zeros_like(verts)
    for k in range(3):
        vn = vn.at[faces[:, k]].add(fn)
    norm = jnp.linalg.norm(vn, axis=1, keepdims=True)
    return vn / jnp.maximum(norm, 1e-12)


def sh9_basis(n: jnp.ndarray) -> jnp.ndarray:
    """Real SH basis up to band 2 at directions n [?, 3] -> [?, 9]."""
    x, y, z = n[:, 0], n[:, 1], n[:, 2]
    return jnp.stack([
        jnp.full_like(x, 0.28209479177387814),          # Y00
        0.4886025119029199 * y,                          # Y1-1
        0.4886025119029199 * z,                          # Y10
        0.4886025119029199 * x,                          # Y11
        1.0925484305920792 * x * y,                      # Y2-2
        1.0925484305920792 * y * z,                      # Y2-1
        0.31539156525252005 * (3.0 * z * z - 1.0),       # Y20
        1.0925484305920792 * x * z,                      # Y21
        0.5462742152960396 * (x * x - y * y),            # Y22
    ], axis=1)


def sh_shading(normals: jnp.ndarray, sh_coeffs: np.ndarray) -> jnp.ndarray:
    """Irradiance per vertex from 9-band lighting coefficients.

    sh_coeffs: [9] or [9, 3] (per-channel). Returns [V] or [V, 3].
    """
    basis = sh9_basis(normals)                            # [V, 9]
    return basis @ jnp.asarray(sh_coeffs, jnp.float32)


def default_lighting() -> np.ndarray:
    """A soft studio-like SH environment (ambient + frontal key)."""
    sh = np.zeros(9, np.float32)
    sh[0] = 2.5            # ambient
    sh[2] = -0.8           # light from -z (toward camera)
    sh[1] = 0.3
    return sh


def lambert_shading(normals: jnp.ndarray, light_dir, ambient: float = 0.3
                    ) -> jnp.ndarray:
    l = jnp.asarray(light_dir, jnp.float32)
    l = l / jnp.linalg.norm(l)
    return ambient + (1 - ambient) * jnp.maximum(normals @ l, 0.0)
