"""Octree evaluation over dirty column WINDOWS (the "runs" mode).

The generic octree evaluators (evaluator.py) compact dirty lattice
POINTS and evaluate each through the per-point query path (projection +
2 bilinear gathers + dual MLP — the reference's chunked hot loop,
lib/sdf.py:55-120 + lib/geometry.py:4-12). But the octree's dirty set
clusters in short z-runs along grid columns (the unpruned shell around
the surface), and under the production axis-aligned eval calibration
every point of a column shares its (u, v) projection — the same
structure the column-shared dense evaluator exploits
(evaluator.eval_grid_dense_cols).

This mode compacts dirty 8-point z-WINDOWS instead of points:

  * window detection is a bit-pack over the dirty lattice (each
    window's 8 dirty flags become one int32 — reused later to mask the
    scatter, so no per-point flag gathers ever happen);
  * the window list is compacted hierarchically (1-D block summary +
    per-group point compaction — the same two-level scheme as the point
    path, 8x fewer entries);
  * each window gathers its column features ONCE and evaluates all 8
    depths through ops/fused_mlp.fused_dual_mlp_runs, which factors the
    feature matmuls out per window (~2.8x fewer MACs/point and ~8x
    fewer gather bytes than the generic kernel at the reference config);
  * results scatter back masked to the exactly-dirty points, so fill
    regions and silhouette-pruned points keep their values — the
    reference pruning semantics (lib/sdf.py:79-117) are untouched
    (pruning itself reuses evaluator._prune_upsample).

Requires: column-separable calibration (evaluator.dense_cols_separable),
weights prepared with base_split=(C_lr, C_hr, 1)
(ops/fused_mlp.prepare_cols_weights), and every level lattice divisible
by the window size (true for all reference-shaped power-of-two
schedules with init_resolution >= 8). The pipeline falls back to the
generic mono mode otherwise.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .evaluator import (_dirty_lat, _prune_upsample, _octree_state,
                        _level_schedule, _normalize_init,
                        dense_cols_separable, _pack_bits,
                        _compact_flags_1d)

ZB = 8                 # window size (z points per window)
_WBLOCK = 64           # windows per 1-D summary block
_WGROUP_BLOCKS = 4096  # dirty blocks window-compacted per group


def _win_two_level(NW: int) -> bool:
    return NW % _WBLOCK == 0 and NW > _WGROUP_BLOCKS * _WBLOCK


def _win_block_summary(win_flat, NW: int, block: int, group_blocks: int):
    """Compact ids of 1-D window blocks containing any dirty window.

    Delegates to `_compact_flags_1d`, which takes a packed two-level
    pass above 32k blocks (the 512^3 final level has 262k window
    blocks; the direct path's full-width scatter costs ~2.4 ms there)."""
    Mb = NW // block
    blk = win_flat.reshape(Mb, block).any(axis=1)
    return _compact_flags_1d(blk, Mb + group_blocks)


def _win_group_compact(win_flat, blk_compact, g0, nb, block: int,
                       group_blocks: int, out_len: int):
    """Window-compact the dirty windows of blocks [g0, g0+Mg)."""
    m = g0 + jnp.arange(group_blocks, dtype=jnp.int32)
    valid_m = m < nb
    b = blk_compact[m]                                       # [Mg]
    gidx = (b[:, None] * block
            + jnp.arange(block, dtype=jnp.int32)[None, :])   # [Mg, B]
    flags = win_flat[gidx] & valid_m[:, None]
    flags = flags.reshape(-1)
    gidx = gidx.reshape(-1)
    na_g = jnp.sum(flags.astype(jnp.int32))
    pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
    target = jnp.where(flags, pos, out_len)
    compact = jnp.zeros((out_len,), jnp.int32).at[target].set(
        gidx, mode="drop")
    return compact, na_g


def _win_group_compact_packed(wwords, blk_compact, g0, nb, block: int,
                              group_blocks: int, out_len: int):
    """`_win_group_compact` reading a `_pack_bits`-packed window
    lattice: TWO int32 word gathers per 64-window block instead of 64
    per-window bool gathers (the compaction is gather-descriptor
    -bound). Requires block == 64; output order is identical."""
    m = g0 + jnp.arange(group_blocks, dtype=jnp.int32)
    valid_m = m < nb
    b = blk_compact[m]                                       # [Mg]
    widx = b[:, None] * 2 + jnp.arange(2, dtype=jnp.int32)[None, :]
    w = wwords[widx]                                         # [Mg, 2]
    sh = jnp.arange(32, dtype=jnp.int32)[None, None, :]
    flags = ((((w[:, :, None] >> sh) & 1) == 1)
             & valid_m[:, None, None]).reshape(-1)
    gidx = (b[:, None] * block
            + jnp.arange(block, dtype=jnp.int32)[None, :]).reshape(-1)
    na_g = jnp.sum(flags.astype(jnp.int32))
    pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
    target = jnp.where(flags, pos, out_len)
    compact = jnp.zeros((out_len,), jnp.int32).at[target].set(
        gidx, mode="drop")
    return compact, na_g


def _win_full_compact(win_flat, NW: int, out_len: int):
    na = jnp.sum(win_flat.astype(jnp.int32))
    pos = jnp.cumsum(win_flat.astype(jnp.int32)) - 1
    target = jnp.where(win_flat, pos, out_len)
    compact = jnp.zeros((out_len,), jnp.int32).at[target].set(
        jnp.arange(NW, dtype=jnp.int32), mode="drop")
    return compact, na


def _runs_level_step(R: int, reso: int, nwin_chunk: int, run_block: int,
                     load_size: int, z_size: float, use_pallas: bool,
                     interpret: bool, mat: np.ndarray,
                     val_hr_f, val_lr_f, evald_f, rfh_f, rfl_f,
                     cctx, init_lat=None, lr_packed: bool = False):
    """Evaluate every still-dirty point at stride ``reso`` via windows.

    ``lr_packed``: ``cctx["feat_lr"]`` is a :func:`pack_bilinear`-packed
    map — one contiguous quad-row gather per window instead of four
    scattered row gathers for the heavy 256-channel map.
    """
    from ..ops.fused_mlp import fused_dual_mlp_runs, fused_dual_mlp_runs_xla
    from ..ops.geometry import orthogonal, in_image_mask, normalize_depth
    from ..ops.grid_sample import (grid_sample_points,
                                   grid_sample_points_packed)

    L = R // reso
    assert L % ZB == 0, (L, ZB)
    Wz = L // ZB
    NW = L * L * Wz
    R3 = R ** 3
    C = nwin_chunk
    lat = _dirty_lat(evald_f, rfh_f, rfl_f, L, init_lat)
    pw = jnp.asarray([1 << t for t in range(ZB)], jnp.int32)
    bits = jnp.sum(lat.reshape(NW, ZB).astype(jnp.int32) * pw[None, :],
                   axis=1)                                   # [NW]
    win = bits > 0
    scale = jnp.asarray(np.diag(mat[:3, :3]) * reso, jnp.float32)
    offset = jnp.asarray(mat[:3, 3], jnp.float32)

    # per-level depth features: zf is affine in k under the separable
    # calibration, so zf(k0 + t) = (zf(k0) - zf(0)) + zf(t) exactly
    kidx = jnp.arange(L, dtype=jnp.float32)
    zpts = jnp.stack([jnp.zeros_like(kidx), jnp.zeros_like(kidx), kidx]
                     ) * scale[:, None] + offset[:, None]
    zcam = orthogonal(zpts[None], cctx["calib"])[0, 2, :]
    zf_L = normalize_depth(zcam, load_size, z_size)          # [L]
    zt = zf_L[:ZB]
    kf_all = zf_L - zf_L[0]

    tvec = jnp.arange(ZB, dtype=jnp.int32)

    def eval_chunks(compact, na, carry):
        def body(c2):
            vh, vl, c = c2
            ids = lax.dynamic_slice(compact, (c * C,), (C,))
            cid = ids // Wz
            k0 = (ids % Wz) * ZB
            i = cid // L
            j = cid % L
            pts = (jnp.stack([i, j, jnp.zeros_like(i)]).astype(
                jnp.float32) * scale[:, None] + offset[:, None])
            xyz = orthogonal(pts[None], cctx["calib"])
            mask = in_image_mask(xyz[:, :2, :])[0]           # [C]
            uv = jnp.swapaxes(xyz[:, :2, :], 1, 2)
            sample_lr = grid_sample_points_packed if lr_packed \
                else grid_sample_points
            x_lr = sample_lr(cctx["feat_lr"], uv)[0].astype(jnp.float32)
            x_hr = grid_sample_points(cctx["feat_hr"], uv)[0].astype(
                jnp.float32)
            kf = kf_all[k0]
            if use_pallas:
                hr, lr = fused_dual_mlp_runs(
                    x_lr, x_hr, kf, zt, cctx["weights"],
                    run_block=run_block, interpret=interpret)
            else:
                hr, lr = fused_dual_mlp_runs_xla(x_lr, x_hr, kf, zt,
                                                 cctx["weights"])
            hr = hr * mask[:, None]
            lr = lr * mask[:, None]
            # scatter only the exactly-dirty points of each window
            # (fill regions / silhouette-pruned points keep their
            # values) — the packed per-window bits avoid any per-point
            # flag gather
            bitsc = bits[ids]                                # [C]
            valid = (c * C + jnp.arange(C, dtype=jnp.int32)) < na
            ok = (((bitsc[:, None] >> tvec[None, :]) & 1) > 0) \
                & valid[:, None]
            base = cid * L + k0
            tgt = jnp.where(ok, base[:, None] + tvec[None, :],
                            R3).reshape(-1)
            vh = vh.at[tgt].set(hr.reshape(-1), mode="drop")
            vl = vl.at[tgt].set(lr.reshape(-1), mode="drop")
            return vh, vl, c + 1

        num_chunks = (na + C - 1) // C
        vh, vl, _ = lax.while_loop(lambda c2: c2[2] < num_chunks, body,
                                   carry + (jnp.int32(0),))
        return vh, vl

    if not _win_two_level(NW):
        compact, na = _win_full_compact(win, NW, NW + C)
        return eval_chunks(compact, na, (val_hr_f, val_lr_f))

    S = _WGROUP_BLOCKS * _WBLOCK
    blk_compact, nb = _win_block_summary(win, NW, _WBLOCK,
                                         _WGROUP_BLOCKS)
    wpacked = _WBLOCK == 64 and NW % 32 == 0
    wwords = _pack_bits(win) if wpacked else None
    # buffered append (same scheme as evaluator._level_step): fine
    # -grained compaction groups, fully packed kernel chunks
    cap = max(4 * S // C, 1) * C
    buf0 = jnp.zeros((cap + max(S, C),), jnp.int32)

    def group_body(carry):
        vh, vl, buf, fill, g = carry
        if wpacked:
            compact, na_g = _win_group_compact_packed(
                wwords, blk_compact, g * _WGROUP_BLOCKS, nb, _WBLOCK,
                _WGROUP_BLOCKS, S)
        else:
            compact, na_g = _win_group_compact(
                win, blk_compact, g * _WGROUP_BLOCKS, nb, _WBLOCK,
                _WGROUP_BLOCKS, S)
        buf = lax.dynamic_update_slice(buf, compact[:S], (fill,))
        fill = fill + na_g
        last = (g + 1) * _WGROUP_BLOCKS >= nb

        def flush(args):
            vh, vl, fill = args
            vh, vl = eval_chunks(buf, fill, (vh, vl))
            return vh, vl, jnp.int32(0)

        vh, vl, fill = lax.cond(last | (fill + S > cap), flush,
                                lambda a: a, (vh, vl, fill))
        return vh, vl, buf, fill, g + 1

    vh, vl, _, _, _ = lax.while_loop(
        lambda c2: c2[4] * _WGROUP_BLOCKS < nb, group_body,
        (val_hr_f, val_lr_f, buf0, jnp.int32(0), jnp.int32(0)))
    return vh, vl


def runs_supported(calib, mat, resolution: int,
                   init_resolution: int, cols_weights=None) -> bool:
    """Whether the runs mode applies to this evaluation geometry (and,
    when ``cols_weights`` is given, to this weight shape: the runs
    kernel carries the per-window depth offset in an hr pad lane, so
    C_hr must not be a multiple of 128 — fused_mlp.fused_dual_mlp_runs'
    precondition; callers fall back to the mono program otherwise)."""
    if cols_weights is not None:
        segs = cols_weights.spec_lr.base_segments
        if len(segs) != 3 or segs[2] != 1 or segs[1] % 128 == 0:
            return False
    mat = np.asarray(mat)
    if not dense_cols_separable(calib, mat):
        return False
    try:
        schedule = _level_schedule(resolution, init_resolution)
    except ValueError:
        return False
    return all((resolution // reso) % ZB == 0 for reso in schedule)


def eval_grid_octree_runs(cols_weights, feat_lr, feat_hr, calib,
                          resolution: int, mat: np.ndarray,
                          threshold: float, load_size: int,
                          z_size: float, init_resolution: int = 64,
                          nwin_chunk: int = 32768, run_block: int = 64,
                          use_pallas: Optional[bool] = None,
                          interpret: bool = False,
                          feature_dtype=None,
                          feature_pack: bool = False,
                          cache: Optional[Dict] = None,
                          init_dirty: Optional[jnp.ndarray] = None
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Coarse-to-fine evaluation via dirty column windows, as ONE
    compiled program (the mono dispatch discipline — a single RPC per
    evaluation on remote backends).

    cols_weights: FusedWeights prepared with base_split=(C_lr, C_hr, 1).
    feat_lr/feat_hr: [1, H, W, C] UNPACKED feature maps (any dtype; the
    kernel computes f32/bf16 like the other paths). Returns (hr, lr)
    [R, R, R] float32. Numerically equivalent to the generic octree
    modes up to kernel summation order (parity-tested).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    R = resolution
    mat = np.asarray(mat)
    if not runs_supported(calib, mat, R, init_resolution,
                          cols_weights=cols_weights):
        raise ValueError(
            "runs octree mode requires a column-separable calibration, "
            "window-aligned level lattices and a non-128-aligned C_hr; "
            "use the generic modes")
    cache = cache if cache is not None else {}
    has_init = init_dirty is not None
    schedule = _level_schedule(R, init_resolution)
    init_lats, init_centers = _normalize_init(init_dirty, R, schedule)
    key = ("runs", R, nwin_chunk, run_block, float(threshold),
           mat.tobytes(), has_init, init_resolution, use_pallas,
           str(feature_dtype), feature_pack, load_size, float(z_size),
           interpret)
    if key not in cache:
        def run(cctx, init_lats, init_centers):
            if feature_dtype is not None:
                # storage cast fused into the program (halves gather
                # traffic at bf16) — never an eager dispatch
                cctx = dict(cctx,
                            feat_lr=cctx["feat_lr"].astype(feature_dtype),
                            feat_hr=cctx["feat_hr"].astype(feature_dtype))
            if feature_pack:
                # quad-pack the heavy lr map once per evaluation (in
                # -program; ~8 MB at the reference config) so each
                # window's lr sample is ONE contiguous row gather
                from ..ops.grid_sample import pack_bilinear
                cctx = dict(cctx, feat_lr=pack_bilinear(cctx["feat_lr"]))
            state = _octree_state(R, init_resolution)
            for reso in schedule:
                vh, vl = _runs_level_step(
                    R, reso, nwin_chunk, run_block, load_size, z_size,
                    use_pallas, interpret, mat, *state, cctx,
                    init_lats[reso] if has_init else None,
                    lr_packed=feature_pack)
                state = (vh, vl) + state[2:]
                if reso <= 1:
                    break
                state = _prune_upsample(
                    R, reso, threshold, *state,
                    init_lats[reso] if has_init else None,
                    init_centers[reso] if has_init else None)
            return state[0], state[1]
        cache[key] = jax.jit(run)
    cctx = {"weights": cols_weights, "feat_lr": feat_lr,
            "feat_hr": feat_hr, "calib": jnp.asarray(calib)}
    vh, vl = cache[key](cctx, init_lats if has_init else {},
                        init_centers if has_init else {})
    return vh.reshape(R, R, R), vl.reshape(R, R, R)
