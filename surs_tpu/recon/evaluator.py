"""Device-resident occupancy-field evaluators.

Replaces the reference's host-side chunked evaluators (``batch_eval``/
``eval_grid`` lib/sdf.py:32-52 and ``eval_grid_octree`` lib/sdf.py:55-120).

The reference round-trips every <=50k-point chunk host<->GPU and prunes
octree cells with a Python triple loop. Here the entire coarse-to-fine
evaluation lives on device: query points are synthesized from integer
lattice indices, dirty-cell compaction is a cumsum scatter, the
data-dependent chunk count is a ``lax.while_loop``, and cell pruning is a
vectorized 8-corner stencil. Only the final occupancy volumes cross back
to the host (for marching cubes).

Pruning semantics match the reference exactly: a cell whose center is
still dirty and whose 8 corner values span less than ``threshold`` is
filled with ``(max+min)/2`` and marked clean; the dirty mask is shared
between the HR and LR fields; only cells with base index < R - reso are
tested (lib/sdf.py:79-117). The reference's sequential cell loop is
order-independent (fills only ever write a cell's own block, and every
corner a later cell reads is outside earlier cells' blocks), so the
vectorized form is exact.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .grid import flat_index_to_world

# eval_fn: [3, C] world points -> (hr [C], lr [C])
EvalFn = Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]


def _chunk_eval_scatter(eval_fn: EvalFn, compact: jnp.ndarray,
                        na: jnp.ndarray, num_chunks, chunk: int, L: int,
                        reso: int, R: int, mat: np.ndarray,
                        sdf_hr, sdf_lr, dirty):
    """Evaluate the first ``na`` compacted lattice indices in fixed-size
    chunks, scattering results into the full-resolution fields."""

    def body(carry):
        sdf_hr, sdf_lr, dirty, c = carry
        idx = lax.dynamic_slice(compact, (c * chunk,), (chunk,))
        valid = (c * chunk + jnp.arange(chunk, dtype=jnp.int32)) < na
        pts = flat_index_to_world(idx, L, reso, mat)
        hr, lr = eval_fn(pts)
        k = (idx % L) * reso
        j = ((idx // L) % L) * reso
        i = (idx // (L * L)) * reso
        i = jnp.where(valid, i, R)  # out-of-bounds -> dropped by scatter
        sdf_hr = sdf_hr.at[i, j, k].set(hr, mode="drop")
        sdf_lr = sdf_lr.at[i, j, k].set(lr, mode="drop")
        dirty = dirty.at[i, j, k].set(False, mode="drop")
        return sdf_hr, sdf_lr, dirty, c + 1

    def cond(carry):
        return carry[3] < num_chunks

    sdf_hr, sdf_lr, dirty, _ = lax.while_loop(
        cond, body, (sdf_hr, sdf_lr, dirty, jnp.int32(0)))
    return sdf_hr, sdf_lr, dirty


def _level_step(eval_fn: EvalFn, R: int, reso: int, chunk: int,
                mat: np.ndarray, sdf_hr, sdf_lr, dirty):
    """Evaluate every still-dirty lattice point at stride ``reso``."""
    L = R // reso
    L3 = L * L * L
    flat = dirty[::reso, ::reso, ::reso].reshape(-1)
    na = jnp.sum(flat.astype(jnp.int32))
    num_chunks = (na + chunk - 1) // chunk
    # stable stream compaction of dirty lattice indices via cumsum scatter
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    target = jnp.where(flat, pos, L3)
    pad = max(chunk, 1)
    compact = jnp.zeros((L3 + pad,), jnp.int32).at[target].set(
        jnp.arange(L3, dtype=jnp.int32), mode="drop")
    return _chunk_eval_scatter(eval_fn, compact, na, num_chunks, chunk, L,
                               reso, R, mat, sdf_hr, sdf_lr, dirty)


def _prune_step(R: int, reso: int, threshold: float, sdf_hr, sdf_lr, dirty):
    """Vectorized equivalent of the reference's per-cell interpolation
    loop (lib/sdf.py:81-117)."""
    L = R // reso
    n = L - 1  # cells per axis: x in range(0, R - reso, reso)

    def spans(sdf):
        s = sdf[::reso, ::reso, ::reso]
        v = jnp.stack([
            s[:-1, :-1, :-1], s[:-1, :-1, 1:], s[:-1, 1:, :-1],
            s[:-1, 1:, 1:], s[1:, :-1, :-1], s[1:, :-1, 1:],
            s[1:, 1:, :-1], s[1:, 1:, 1:]])
        return v.min(axis=0), v.max(axis=0)  # [n, n, n] each

    vmin_hr, vmax_hr = spans(sdf_hr)
    vmin_lr, vmax_lr = spans(sdf_lr)
    half = reso // 2
    center_dirty = dirty[half::reso, half::reso, half::reso][:n, :n, :n]

    fill_hr = center_dirty & ((vmax_hr - vmin_hr) < threshold)
    fill_lr = center_dirty & ((vmax_lr - vmin_lr) < threshold)

    def up(x):
        x = jnp.repeat(x, reso, axis=0)
        x = jnp.repeat(x, reso, axis=1)
        return jnp.repeat(x, reso, axis=2)

    reg = n * reso  # == R - reso
    sl = (slice(0, reg),) * 3
    sdf_hr = sdf_hr.at[sl].set(jnp.where(
        up(fill_hr), up((vmax_hr + vmin_hr) * 0.5), sdf_hr[sl]))
    sdf_lr = sdf_lr.at[sl].set(jnp.where(
        up(fill_lr), up((vmax_lr + vmin_lr) * 0.5), sdf_lr[sl]))
    dirty = dirty.at[sl].set(jnp.where(up(fill_hr | fill_lr), False,
                                       dirty[sl]))
    return sdf_hr, sdf_lr, dirty


def eval_grid_octree(eval_fn: EvalFn, resolution: int, mat: np.ndarray,
                     threshold: float, init_resolution: int = 64,
                     num_samples: int = 50000,
                     jit: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Coarse-to-fine evaluation of the (hr, lr) occupancy fields.

    Returns two [R, R, R] float32 device arrays. ``eval_fn`` must be a
    traceable function mapping [3, C] world points to (hr [C], lr [C]).
    """
    R = resolution
    sdf_hr = jnp.zeros((R, R, R), jnp.float32)
    sdf_lr = jnp.zeros((R, R, R), jnp.float32)
    dirty = jnp.ones((R, R, R), bool)

    mat = np.asarray(mat)

    def level(reso, chunk, sdf_hr, sdf_lr, dirty):
        return _level_step(eval_fn, R, reso, chunk, mat, sdf_hr, sdf_lr,
                           dirty)

    prune = functools.partial(_prune_step, R)
    if jit:
        level = jax.jit(level, static_argnums=(0, 1))
        prune = jax.jit(prune, static_argnums=(0, 1))

    reso = R // init_resolution
    while reso > 0:
        sdf_hr, sdf_lr, dirty = level(reso, num_samples,
                                      sdf_hr, sdf_lr, dirty)
        if reso <= 1:
            break
        sdf_hr, sdf_lr, dirty = prune(reso, threshold,
                                      sdf_hr, sdf_lr, dirty)
        reso //= 2
    return sdf_hr, sdf_lr


def eval_grid_dense(eval_fn: EvalFn, resolution: int, mat: np.ndarray,
                    num_samples: int = 50000,
                    jit: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense evaluation of every grid point (reference eval_grid,
    lib/sdf.py:48-52), chunked on device."""
    R = resolution
    R3 = R * R * R
    chunk = min(num_samples, R3)
    num_chunks = (R3 + chunk - 1) // chunk

    mat = np.asarray(mat)

    def run():
        def body(c, acc):
            hr_acc, lr_acc = acc
            start = c * chunk
            idx = start + jnp.arange(chunk, dtype=jnp.int32)
            idx = jnp.minimum(idx, R3 - 1)  # tail chunk re-evaluates edge
            pts = flat_index_to_world(idx, R, 1, mat)
            hr, lr = eval_fn(pts)
            hr_acc = lax.dynamic_update_slice(hr_acc, hr, (start,))
            lr_acc = lax.dynamic_update_slice(lr_acc, lr, (start,))
            return hr_acc, lr_acc

        init = (jnp.zeros((num_chunks * chunk,), jnp.float32),
                jnp.zeros((num_chunks * chunk,), jnp.float32))
        hr, lr = lax.fori_loop(0, num_chunks, body, init)
        return hr[:R3].reshape(R, R, R), lr[:R3].reshape(R, R, R)

    if jit:
        run = jax.jit(run)
    return run()
