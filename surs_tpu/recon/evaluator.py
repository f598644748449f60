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

Compile discipline: ``eval_fn(points, ctx)`` receives every per-subject
array (features, calibration, weights) through the ``ctx`` pytree, so the
jitted level/prune programs are traced once per static shape and reused
across subjects — pass a persistent ``cache`` dict (the Reconstructor in
pipeline.py does).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .grid import flat_index_to_world

# eval_fn: ([3, C] world points, ctx pytree) -> (hr [C], lr [C])
EvalFn = Callable[[jnp.ndarray, Any], Tuple[jnp.ndarray, jnp.ndarray]]

# Hierarchical dirty-compaction parameters. The naive compaction cumsum
# -scatters the FULL L^3 lattice every level; at 512^3 / reso=1 that is a
# 134M-element scatter which dominates the whole reconstruction (round-1
# xprof: ~80% of octree device time was compaction, not queries). Instead
# the lattice is viewed as (L/B)^3 blocks of B^3 points: an `any` reduce
# marks dirty blocks (bandwidth-bound, fast), the small block list is
# compacted, and the expensive point-level cumsum+scatter runs only over
# the points of up to _GROUP_BLOCKS dirty blocks at a time — on real
# fields a >10x reduction in scan size. Results are bit-identical: the
# same dirty points are evaluated, merely in block order.
_BLOCK = 4            # lattice points per block edge (B)
_GROUP_BLOCKS = 65536  # dirty blocks point-compacted per group (Mg)


def _two_level(L: int) -> bool:
    """Use hierarchical compaction when the lattice outgrows one group.

    Reads the module constants at call time so tests can shrink them to
    exercise the hierarchical/multi-group paths at small resolutions.
    """
    return L % _BLOCK == 0 and L ** 3 > _GROUP_BLOCKS * _BLOCK ** 3


def _block_summary(lat, L: int, block: int, group_blocks: int):
    """Compact the ids of lattice blocks containing any dirty point.

    lat: [L, L, L] bool dirty lattice. Returns (blk_compact
    [(L/block)^3 + group_blocks] int32, nb). Entries past nb are zero.
    """
    Lb = L // block
    Lb3 = Lb ** 3
    blk = lat.reshape(Lb, block, Lb, block, Lb, block).any(axis=(1, 3, 5))
    flat = blk.reshape(-1)
    nb = jnp.sum(flat.astype(jnp.int32))
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    n_out = Lb3 + group_blocks
    target = jnp.where(flat, pos, n_out)  # clean -> out of bounds, dropped
    blk_compact = jnp.zeros((n_out,), jnp.int32).at[target].set(
        jnp.arange(Lb3, dtype=jnp.int32), mode="drop")
    return blk_compact, nb


def _group_compact(lat_flat, blk_compact, g0, nb, L: int, block: int,
                   group_blocks: int, out_len: int):
    """Point-compact the dirty points of dirty blocks [g0, g0+Mg).

    lat_flat: [L^3] bool (the level's dirty lattice, flattened). Returns
    (compact [out_len] int32 flat lattice indices, na_g). Positions >=
    na_g are zero (index 0 — consumers mask by count).
    """
    Lb = L // block
    B3 = block ** 3
    m = g0 + jnp.arange(group_blocks, dtype=jnp.int32)
    valid_m = m < nb
    b = blk_compact[m]                               # [Mg]
    bk = b % Lb
    bj = (b // Lb) % Lb
    bi = b // (Lb * Lb)
    t = jnp.arange(B3, dtype=jnp.int32)
    tk = t % block
    tj = (t // block) % block
    ti = t // (block * block)
    li = bi[:, None] * block + ti[None, :]           # [Mg, B3]
    lj = bj[:, None] * block + tj[None, :]
    lk = bk[:, None] * block + tk[None, :]
    gidx = (li * L + lj) * L + lk                    # flat lattice index
    flags = lat_flat[gidx] & valid_m[:, None]
    flags = flags.reshape(-1)
    gidx = gidx.reshape(-1)
    na_g = jnp.sum(flags.astype(jnp.int32))
    pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
    target = jnp.where(flags, pos, out_len)          # clean -> dropped
    compact = jnp.zeros((out_len,), jnp.int32).at[target].set(
        gidx, mode="drop")
    return compact, na_g


def _level_step(eval_fn: EvalFn, R: int, reso: int, chunk: int,
                mat: np.ndarray, sdf_hr, sdf_lr, dirty, ctx):
    """Evaluate every still-dirty lattice point at stride ``reso``."""
    L = R // reso
    L3 = L * L * L
    lat = dirty[::reso, ::reso, ::reso] if reso > 1 else dirty

    def eval_chunks(compact, na, carry):
        """Dispatch eval over compacted indices [0, na) in `compact`."""
        def body(c2):
            sdf_hr, sdf_lr, dirty, c = c2
            idx = lax.dynamic_slice(compact, (c * chunk,), (chunk,))
            valid = (c * chunk + jnp.arange(chunk, dtype=jnp.int32)) < na
            pts = flat_index_to_world(idx, L, reso, mat)
            hr, lr = eval_fn(pts, ctx)
            k = (idx % L) * reso
            j = ((idx // L) % L) * reso
            i = (idx // (L * L)) * reso
            i = jnp.where(valid, i, R)  # out-of-bounds -> dropped
            sdf_hr = sdf_hr.at[i, j, k].set(hr, mode="drop")
            sdf_lr = sdf_lr.at[i, j, k].set(lr, mode="drop")
            dirty = dirty.at[i, j, k].set(False, mode="drop")
            return sdf_hr, sdf_lr, dirty, c + 1

        num_chunks = (na + chunk - 1) // chunk
        sdf_hr, sdf_lr, dirty, _ = lax.while_loop(
            lambda c2: c2[3] < num_chunks, body, carry + (jnp.int32(0),))
        return sdf_hr, sdf_lr, dirty

    if not _two_level(L):
        flat = lat.reshape(-1)
        na = jnp.sum(flat.astype(jnp.int32))
        pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
        target = jnp.where(flat, pos, L3 + chunk)  # clean -> dropped
        compact = jnp.zeros((L3 + chunk,), jnp.int32).at[target].set(
            jnp.arange(L3, dtype=jnp.int32), mode="drop")
        return eval_chunks(compact, na, (sdf_hr, sdf_lr, dirty))

    out_len = _GROUP_BLOCKS * _BLOCK ** 3 + chunk
    blk_compact, nb = _block_summary(lat, L, _BLOCK, _GROUP_BLOCKS)

    def group_body(carry):
        sdf_hr, sdf_lr, dirty, g = carry
        lat_g = (dirty[::reso, ::reso, ::reso] if reso > 1
                 else dirty).reshape(-1)
        compact, na_g = _group_compact(
            lat_g, blk_compact, g * _GROUP_BLOCKS, nb, L, _BLOCK,
            _GROUP_BLOCKS, out_len)
        sdf_hr, sdf_lr, dirty = eval_chunks(compact, na_g,
                                            (sdf_hr, sdf_lr, dirty))
        return sdf_hr, sdf_lr, dirty, g + 1

    sdf_hr, sdf_lr, dirty, _ = lax.while_loop(
        lambda c2: c2[3] * _GROUP_BLOCKS < nb, group_body,
        (sdf_hr, sdf_lr, dirty, jnp.int32(0)))
    return sdf_hr, sdf_lr, dirty


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
                     num_samples: int = 50000, ctx: Any = None,
                     jit: bool = True,
                     cache: Optional[Dict] = None,
                     init_dirty: Optional[jnp.ndarray] = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Coarse-to-fine evaluation of the (hr, lr) occupancy fields.

    Returns two [R, R, R] float32 device arrays. Per-subject arrays go
    through ``ctx`` (a pytree forwarded to ``eval_fn``); pass the same
    ``cache`` dict across calls to reuse compiled level programs.
    """
    R = resolution
    mat = np.asarray(mat)
    sdf_hr = jnp.zeros((R, R, R), jnp.float32)
    sdf_lr = jnp.zeros((R, R, R), jnp.float32)
    dirty = (init_dirty if init_dirty is not None
             else jnp.ones((R, R, R), bool))

    cache = cache if cache is not None else {}
    base_key = ("oct", R, num_samples, float(threshold), mat.tobytes())
    reso = R // init_resolution
    while reso > 0:
        lkey = base_key + ("level", reso)
        if lkey not in cache:
            fn = functools.partial(_level_step, eval_fn, R, reso,
                                   num_samples, mat)
            cache[lkey] = jax.jit(fn) if jit else fn
        sdf_hr, sdf_lr, dirty = cache[lkey](sdf_hr, sdf_lr, dirty, ctx)
        if reso <= 1:
            break
        pkey = base_key + ("prune", reso)
        if pkey not in cache:
            fn = functools.partial(_prune_step, R, reso, threshold)
            cache[pkey] = jax.jit(fn) if jit else fn
        sdf_hr, sdf_lr, dirty = cache[pkey](sdf_hr, sdf_lr, dirty)
        reso //= 2
    return sdf_hr, sdf_lr


def silhouette_dirty_mask(mask_img: jnp.ndarray, calib, resolution: int,
                          mat: np.ndarray, dilate: int = 3,
                          chunk: int = 1 << 20) -> jnp.ndarray:
    """Visual-hull pre-pruning of the evaluation grid (VaxNeRF-style).

    Voxels whose center projects outside the (dilated) 2D silhouette are
    provably outside the reconstruction, so they start clean with
    occupancy 0 (the evaluator's default fill) and are never queried.
    The reference has no such pruning; on real subjects this removes the
    large majority of grid points before the first network query.

    mask_img: [H, W] or [H, W, 1] binary silhouette; calib [1, 4, 4].
    Returns a [R, R, R] bool dirty mask (True = still unknown).
    """
    from ..ops.geometry import orthogonal
    from ..ops.grid_sample import grid_sample_points

    R = resolution
    mask = jnp.asarray(mask_img, jnp.float32)
    if mask.ndim == 2:
        mask = mask[..., None]
    if dilate > 0:
        pad = dilate
        m4 = mask[None]
        window = (1, 2 * pad + 1, 2 * pad + 1, 1)
        m4 = jax.lax.reduce_window(m4, -jnp.inf, jax.lax.max, window,
                                   (1, 1, 1, 1), "SAME")
        mask = m4[0]
    mat = np.asarray(mat)

    def run(mask, calib):
        R3 = R * R * R
        n_chunks = (R3 + chunk - 1) // chunk

        def body(c, dirty_flat):
            idx = c * chunk + jnp.arange(chunk, dtype=jnp.int32)
            idx_c = jnp.minimum(idx, R3 - 1)
            pts = flat_index_to_world(idx_c, R, 1, mat)
            xyz = orthogonal(pts[None], calib)
            uv = jnp.swapaxes(xyz[:, :2, :], 1, 2)
            hit = grid_sample_points(mask[None], uv)[0, :, 0] > 0.0
            return dirty_flat.at[idx_c].set(hit)

        dirty = jax.lax.fori_loop(0, n_chunks, body,
                                  jnp.zeros((R3,), bool))
        return dirty.reshape(R, R, R)

    return jax.jit(run)(mask, jnp.asarray(calib))


def eval_grid_octree_hostloop(eval_fn: EvalFn, resolution: int,
                              mat: np.ndarray, threshold: float,
                              init_resolution: int = 64,
                              num_samples: int = 50000, ctx: Any = None,
                              cache: Optional[Dict] = None,
                              init_dirty: Optional[jnp.ndarray] = None,
                              stats_out: Optional[Dict] = None
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Octree evaluation with a host-driven chunk loop.

    Numerically identical to :func:`eval_grid_octree`, but the expensive
    query program (``eval_fn`` — gathers + fused MLPs) is compiled ONCE
    for a fixed chunk shape and re-dispatched, while the per-level
    programs (dirty-compaction, index->points, scatter, prune) are small
    separate jits. On backends where compilation is expensive (remote
    -compile TPU terminals) this cuts octree compile time by an order of
    magnitude at the cost of a few hundred async dispatches and one
    device->host sync per level (the dirty count).
    """
    R = resolution
    C = num_samples
    mat = np.asarray(mat)
    cache = cache if cache is not None else {}
    sdf_hr = jnp.zeros((R, R, R), jnp.float32)
    sdf_lr = jnp.zeros((R, R, R), jnp.float32)
    dirty = (init_dirty if init_dirty is not None
             else jnp.ones((R, R, R), bool))

    def get(key, builder):
        if key not in cache:
            cache[key] = jax.jit(builder())
        return cache[key]

    # Compact-buffer capacity shared by every level: one group of dirty
    # blocks (hierarchical path) or a whole small lattice (coarse levels).
    cap = _GROUP_BLOCKS * _BLOCK ** 3
    S = cap + C

    # Single chunk program shared by ALL levels AND all bounding boxes:
    # the lattice size L, stride reso, and the index->world affine enter
    # as traced scalars/arrays, so one compile of the expensive query
    # program serves every coarse-to-fine schedule — one dispatch/chunk.
    def chunk_builder(buf_len):
        def f(sdf_hr, sdf_lr, dirty, compact, start, na, L, reso,
              scale, offset, ctx):
            idx = lax.dynamic_slice(compact, (start,), (C,))
            kg = idx % L
            jg = (idx // L) % L
            ig = idx // (L * L)
            ijk = (jnp.stack([ig, jg, kg]).astype(jnp.float32)
                   * reso.astype(jnp.float32))
            pts = ijk * scale[:, None] + offset[:, None]
            hr, lr = eval_fn(pts, ctx)
            valid = (start + jnp.arange(C, dtype=jnp.int32)) < na
            i = jnp.where(valid, ig * reso, R)
            j = jg * reso
            k = kg * reso
            sdf_hr = sdf_hr.at[i, j, k].set(hr, mode="drop")
            sdf_lr = sdf_lr.at[i, j, k].set(lr, mode="drop")
            dirty = dirty.at[i, j, k].set(False, mode="drop")
            return sdf_hr, sdf_lr, dirty
        return lambda: f

    scale_arr = jnp.asarray(np.diag(mat[:3, :3]), jnp.float32)
    offset_arr = jnp.asarray(mat[:3, 3], jnp.float32)

    def dispatch_chunks(chunk_fn, compact, na, na_host, L, reso,
                        sdf_hr, sdf_lr, dirty):
        if stats_out is not None:
            stats_out.setdefault("queries", 0)
            stats_out.setdefault("chunks", 0)
            stats_out["queries"] += na_host
            stats_out["chunks"] += -(-na_host // C) if na_host else 0
        Lj = jnp.int32(L)
        resoj = jnp.int32(reso)
        for c in range(0, na_host, C):
            sdf_hr, sdf_lr, dirty = chunk_fn(
                sdf_hr, sdf_lr, dirty, compact, jnp.int32(c), na, Lj,
                resoj, scale_arr, offset_arr, ctx)
        return sdf_hr, sdf_lr, dirty

    base = ("hl", R, C, float(threshold), mat.tobytes())
    reso = R // init_resolution
    while reso > 0:
        L = R // reso
        L3 = L * L * L

        if _two_level(L):
            # Hierarchical: block summary + first point-group in ONE
            # program (a single host sync covers the common case where
            # every dirty block fits one group).
            def summary0_builder(reso=reso, L=L):
                def f(dirty):
                    lat = (dirty[::reso, ::reso, ::reso] if reso > 1
                           else dirty)
                    blk_compact, nb = _block_summary(
                        lat, L, _BLOCK, _GROUP_BLOCKS)
                    compact, na0 = _group_compact(
                        lat.reshape(-1), blk_compact, jnp.int32(0), nb,
                        L, _BLOCK, _GROUP_BLOCKS, S)
                    return blk_compact, nb, compact, na0
                return f

            def group_builder(reso=reso, L=L):
                def f(dirty, blk_compact, g0, nb):
                    lat = (dirty[::reso, ::reso, ::reso] if reso > 1
                           else dirty)
                    return _group_compact(
                        lat.reshape(-1), blk_compact, g0, nb, L, _BLOCK,
                        _GROUP_BLOCKS, S)
                return f

            chunk_fn = get(("hl-chunk", R, C, S), lambda: chunk_builder(S)())
            summary0 = get(base + ("summary0", reso), summary0_builder)
            blk_compact, nb, compact, na0 = summary0(dirty)
            nb_host, na_host = jax.device_get((nb, na0))
            sdf_hr, sdf_lr, dirty = dispatch_chunks(
                chunk_fn, compact, na0, int(na_host), L, reso,
                sdf_hr, sdf_lr, dirty)
            if nb_host > _GROUP_BLOCKS:
                group_fn = get(base + ("group", reso), group_builder)
                for g0 in range(_GROUP_BLOCKS, int(nb_host),
                                _GROUP_BLOCKS):
                    compact, na_g = group_fn(dirty, blk_compact,
                                             jnp.int32(g0), nb)
                    sdf_hr, sdf_lr, dirty = dispatch_chunks(
                        chunk_fn, compact, na_g, int(na_g), L, reso,
                        sdf_hr, sdf_lr, dirty)
        else:
            # Small lattice: full compaction into the shared buffer when
            # it fits, else (unusual non-power-of-two configs) into a
            # dedicated L^3-sized buffer with its own chunk program.
            buf_len = S if L3 <= cap else L3 + C

            def compact_builder(reso=reso, L=L, L3=L3, buf_len=buf_len):
                def f(dirty):
                    flat = dirty[::reso, ::reso, ::reso].reshape(-1)
                    na = jnp.sum(flat.astype(jnp.int32))
                    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
                    target = jnp.where(flat, pos, buf_len)  # clean: drop
                    compact = jnp.zeros((buf_len,), jnp.int32)
                    compact = compact.at[target].set(
                        jnp.arange(L3, dtype=jnp.int32), mode="drop")
                    return compact, na
                return f

            chunk_fn = get(("hl-chunk", R, C, buf_len),
                           chunk_builder(buf_len))
            compact_fn = get(base + ("compact", reso), compact_builder)
            compact, na = compact_fn(dirty)
            sdf_hr, sdf_lr, dirty = dispatch_chunks(
                chunk_fn, compact, na, int(na), L, reso,
                sdf_hr, sdf_lr, dirty)
        if reso <= 1:
            break
        pkey = base + ("prune", reso)
        if pkey not in cache:
            cache[pkey] = jax.jit(
                functools.partial(_prune_step, R, reso, threshold))
        sdf_hr, sdf_lr, dirty = cache[pkey](sdf_hr, sdf_lr, dirty)
        reso //= 2
    return sdf_hr, sdf_lr


def eval_grid_dense(eval_fn: EvalFn, resolution: int, mat: np.ndarray,
                    num_samples: int = 50000, ctx: Any = None,
                    jit: bool = True, cache: Optional[Dict] = None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense evaluation of every grid point (reference eval_grid,
    lib/sdf.py:48-52), chunked on device."""
    R = resolution
    R3 = R * R * R
    mat = np.asarray(mat)
    chunk = min(num_samples, R3)
    num_chunks = (R3 + chunk - 1) // chunk

    def run(ctx):
        def body(c, acc):
            hr_acc, lr_acc = acc
            start = c * chunk
            idx = start + jnp.arange(chunk, dtype=jnp.int32)
            idx = jnp.minimum(idx, R3 - 1)  # tail chunk re-evaluates edge
            pts = flat_index_to_world(idx, R, 1, mat)
            hr, lr = eval_fn(pts, ctx)
            hr_acc = lax.dynamic_update_slice(hr_acc, hr, (start,))
            lr_acc = lax.dynamic_update_slice(lr_acc, lr, (start,))
            return hr_acc, lr_acc

        init = (jnp.zeros((num_chunks * chunk,), jnp.float32),
                jnp.zeros((num_chunks * chunk,), jnp.float32))
        hr, lr = lax.fori_loop(0, num_chunks, body, init)
        return hr[:R3].reshape(R, R, R), lr[:R3].reshape(R, R, R)

    cache = cache if cache is not None else {}
    key = ("dense", R, chunk, mat.tobytes())
    if key not in cache:
        cache[key] = jax.jit(run) if jit else run
    return cache[key](ctx)
