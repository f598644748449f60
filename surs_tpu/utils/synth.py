"""Synthetic benchmark subjects, generated on device.

A human-shaped occupancy volume for exercising the mesh-extraction path
at a REPRESENTATIVE workload: the reconstruction target of this
framework is a single clothed human (reference README.md:9), whose
512^3 isosurface has ~150-250k active cells — a large sphere severely
overstates the marching/IO cost (a 0.35-radius sphere activates ~400k
cells). The same capsule skeleton drives benchmarks/subject_demo.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# (ax, ay, az, bx, by, bz, r) capsules, y up, subject in ~[-0.7, 0.85]
_CAPSULES = np.array([
    (0, 0.20, 0, 0, 0.55, 0, 0.17),          # torso
    (0, 0.60, 0, 0, 0.66, 0, 0.065),          # neck
    (0, 0.74, 0, 0, 0.76, 0, 0.115),          # head
    (+0.17, 0.52, 0, +0.40, 0.24, 0.05, 0.055),   # arms
    (-0.17, 0.52, 0, -0.40, 0.24, 0.05, 0.055),
    (+0.40, 0.24, 0.05, +0.44, 0.02, 0.12, 0.05),
    (-0.40, 0.24, 0.05, -0.44, 0.02, 0.12, 0.05),
    (+0.09, 0.16, 0, +0.12, -0.32, 0.02, 0.075),  # legs
    (-0.09, 0.16, 0, -0.12, -0.32, 0.02, 0.075),
    (+0.12, -0.32, 0.02, +0.13, -0.62, 0.0, 0.06),
    (-0.12, -0.32, 0.02, -0.13, -0.62, 0.0, 0.06),
    (+0.13, -0.62, 0.0, +0.13, -0.64, 0.12, 0.05),  # feet
    (-0.13, -0.62, 0.0, -0.13, -0.64, 0.12, 0.05),
], np.float32)


def humanoid_sdf_jnp(px, py, pz, detail: float = 0.0):
    """Signed distance of the capsule humanoid at points (px, py, pz)
    (component-wise 1-D arrays — TPU-friendly layouts)."""
    d = jnp.full_like(px, 1e9)
    for ax, ay, az, bx, by, bz, r in _CAPSULES:
        abx, aby, abz = bx - ax, by - ay, bz - az
        den = abx * abx + aby * aby + abz * abz
        apx, apy, apz = px - ax, py - ay, pz - az
        t = jnp.clip((apx * abx + apy * aby + apz * abz) / den, 0.0, 1.0)
        dx = apx - t * abx
        dy = apy - t * aby
        dz = apz - t * abz
        d = jnp.minimum(d, jnp.sqrt(dx * dx + dy * dy + dz * dz) - r)
    if detail > 0:
        d = d - detail * (jnp.sin(31.0 * px) * jnp.sin(29.0 * py)
                          * jnp.sin(33.0 * pz))
    return d


@functools.partial(jax.jit, static_argnames=("resolution", "detail"))
def humanoid_volume(resolution: int, detail: float = 0.012,
                    lo: float = -1.0, hi: float = 1.0) -> jnp.ndarray:
    """[R, R, R] occupancy-style volume (0.5 + inside-distance) on
    device; isosurface at level 0.5."""
    R = resolution
    g = jnp.linspace(lo, hi, R, dtype=jnp.float32)
    px = jnp.repeat(g, R * R)
    py = jnp.tile(jnp.repeat(g, R), R)
    pz = jnp.tile(g, R * R)
    d = humanoid_sdf_jnp(px, py, pz, detail)
    return (0.5 - d).reshape(R, R, R)
