"""Device-resident occupancy-field evaluators.

Replaces the reference's host-side chunked evaluators (``batch_eval``/
``eval_grid`` lib/sdf.py:32-52 and ``eval_grid_octree`` lib/sdf.py:55-120).

The reference round-trips every <=50k-point chunk host<->GPU and prunes
octree cells with a Python triple loop. Here the entire coarse-to-fine
evaluation lives on device and only the final occupancy volumes cross
back to the host (for marching cubes).

Layout strategy (round 2): the reference materializes full R^3 arrays
and touches them at every level through strided views; on TPU a strided
view over the minor (lane) dimension is a shuffle, and round-1 profiling
showed the per-level full-lattice passes — not the network queries —
dominating 512^3 evaluation (prune at reso=2 alone: 1.2 s). So each
level now lives on its OWN contiguous L^3 lattice:

  * level state = (val_hr, val_lr [L^3] f32, evald, rf_hr, rf_lr
    [L^3] bool), stored as the prefix of fixed R^3 flat buffers so the
    expensive query chunk program compiles ONCE for every level;
  * pruning reads the contiguous L^3 lattice directly (cells are
    [L-1]^3, corners are shifted slices — no stride-reso gathers);
  * between levels a fused fill+upsample expands [L]^3 -> [2L]^3:
    even points copy their coarse value, points inside filled cells
    take the cell's fill value, everything else starts at 0/dirty.

Pruning semantics match the reference exactly (lib/sdf.py:79-117): a
cell whose center is still dirty and whose 8 corner values span less
than ``threshold`` is filled with ``(max+min)/2`` — overwriting every
lattice point in its half-open block, including its base corner — and
cleared; the dirty mask is shared between the HR and LR fields, while
fill values are written per field. The reference's sequential cell loop
is order-independent (every corner a cell reads lies outside all other
cells' half-open blocks), so the vectorized form is exact; pinned by
tests/test_recon.py's numpy oracles at 32^3 and 64^3.

Dirty-point compaction is hierarchical: an `any` reduce marks dirty
B^3-point blocks, the small block list is compacted, and the expensive
point-level cumsum+scatter runs only over the points of dirty blocks
(group-chunked) instead of the full lattice — on real fields a >10x
scan reduction at 512^3.

Compile discipline: ``eval_fn(points, ctx)`` receives every per-subject
array (features, calibration, weights) through the ``ctx`` pytree, so
the jitted level/prune programs are traced once per static shape and
reused across subjects — pass a persistent ``cache`` dict (the
Reconstructor in pipeline.py does).
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

# Hierarchical dirty-compaction parameters (see module docstring).
# Group size is a latency/occupancy tradeoff: each group gathers and
# scatters group_blocks * 64 candidate points whether or not the tail
# blocks are dirty, so the processed-candidate total is
# ceil(nb / Mg) * Mg * 64. A human surface at 512^3 marks ~15-60k
# dirty 4^3 blocks; Mg=8192 wastes at most one part-empty group
# (~0.5M candidates) where the round-2 Mg=65536 monolith always paid
# 4.2M (measured: 104 -> 54 ms for the final-level group compaction,
# benchmarks/compact_bench2.py). The groups loop inside one program,
# so extra iterations cost no dispatch round trips.
_BLOCK = 4             # lattice points per block edge (B)
_GROUP_BLOCKS = 8192   # dirty blocks point-compacted per group (Mg)
# The HOSTLOOP evaluator pays a device->host sync and ~1-2 chunk
# dispatches (~30-45 ms RPC each on the remote backend) PER GROUP, so
# its group granularity must stay coarse — fine groups are only cheap
# inside a fused program (the buffered append in _level_step).
_HL_GROUP_BLOCKS = 65536


def _two_level(L: int) -> bool:
    """Use hierarchical compaction when the lattice outgrows one group.

    Reads the module constants at call time so tests can shrink them to
    exercise the hierarchical/multi-group paths at small resolutions.
    """
    return L % _BLOCK == 0 and L ** 3 > _GROUP_BLOCKS * _BLOCK ** 3


def _block_summary(lat_flat, L: int, block: int, group_blocks: int):
    """Compact the ids of lattice blocks containing any dirty point.

    lat_flat: [L^3] bool dirty lattice. Returns (blk_compact
    [(L/block)^3 + group_blocks] int32, nb). Entries past nb are zero.
    """
    Lb = L // block
    Lb3 = Lb ** 3
    lat = lat_flat.reshape(Lb, block, Lb, block, Lb, block)
    blk = lat.any(axis=(1, 3, 5))
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

    lat_flat: [L^3] bool. Returns (compact [out_len] int32 flat lattice
    indices, na_g). Positions >= na_g are zero (consumers mask by count).
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


def _pack_bits(lat_flat: jnp.ndarray) -> jnp.ndarray:
    """[N] bool -> [N/32] int32 words (entry i -> bit i%32 of word
    i//32). One fused dense pass; the compaction gathers/summary then
    read 32x fewer bytes and — the real lever on TPU — issue ONE word
    gather per 4-point lattice row instead of 4 per-point bool gathers
    (random accesses are descriptor-bound, ~5-14 ns each)."""
    w = lat_flat.reshape(-1, 32).astype(jnp.int32)
    shifts = jnp.arange(32, dtype=jnp.int32)[None, :]
    return jnp.sum(w << shifts, axis=1, dtype=jnp.int32)


_SB_GROUP = 4096       # superblocks compacted per group (3-level path)
_3LVL_MIN = 1 << 18    # block-lattice size above which dirty-block ids
                       # are themselves compacted hierarchically


def _compact_block_ids(blk_flat: jnp.ndarray, Lb: int,
                       group_blocks: int):
    """(blk_compact, nb) from a dense [Lb^3] dirty-block bool lattice.

    Small lattices take the direct cumsum+scatter. Big ones (a 512^3
    eval has a 2M-block lattice; scatter attempts cost ~9 ns each, so
    the direct path burns ~18 ms on mostly-clean blocks) RECURSE the
    packed two-level machinery one level up: pack the block lattice,
    summary+group-compact dirty SUPERBLOCKS of 4^3 blocks. Output is a
    superblock-major permutation of `_block_summary`'s flat-order id
    list — consumers are order-independent (visit order only permutes
    compaction ranks / eval order, never values or membership)."""
    Lb3 = Lb ** 3
    if Lb % 32 != 0 or Lb3 <= _3LVL_MIN:
        nb = jnp.sum(blk_flat.astype(jnp.int32))
        pos = jnp.cumsum(blk_flat.astype(jnp.int32)) - 1
        n_out = Lb3 + group_blocks
        target = jnp.where(blk_flat, pos, n_out)
        blk_compact = jnp.zeros((n_out,), jnp.int32).at[target].set(
            jnp.arange(Lb3, dtype=jnp.int32), mode="drop")
        return blk_compact, nb
    words = _pack_bits(blk_flat)
    sb_compact, nsb = _block_summary_packed(words, Lb, _SB_GROUP)
    S = _SB_GROUP * 64
    out0 = jnp.zeros((Lb3 + max(S, group_blocks),), jnp.int32)

    def body(carry):
        out, nb, g = carry
        comp_g, n_g = _group_compact_packed(
            words, sb_compact, g * _SB_GROUP, nsb, Lb, _SB_GROUP, S)
        out = lax.dynamic_update_slice(out, comp_g[:S],
                                       (jnp.minimum(nb, Lb3),))
        return out, nb + n_g, g + 1

    out, nb, _ = lax.while_loop(lambda c: c[2] * _SB_GROUP < nsb, body,
                                (out0, jnp.int32(0), jnp.int32(0)))
    return out, nb


def _block_summary_packed(words: jnp.ndarray, L: int, group_blocks: int):
    """`_block_summary` (block edge 4) reading the packed word lattice:
    each int32 word holds eight 4-entry k-runs (one nibble each).
    Requires L % 32 == 0 — true for every two-level octree level."""
    Lb = L // 4
    w3 = words.reshape(L, L, L // 32)
    jj = (jnp.arange(8, dtype=jnp.int32) * 4)[None, None, None, :]
    run_any = ((w3[:, :, :, None] >> jj) & 0xF) != 0   # [L, L, L/32, 8]
    blk = run_any.reshape(Lb, 4, Lb, 4, Lb).any(axis=(1, 3))
    return _compact_block_ids(blk.reshape(-1), Lb, group_blocks)


def _group_compact_packed(words, blk_compact, g0, nb, L: int,
                          group_blocks: int, out_len: int):
    """`_group_compact` (block edge 4) reading the packed lattice: 16
    word gathers per block (one per (i, j) row — a 4-aligned k-run
    never straddles a 32-bit word) instead of 64 per-point bool
    gathers. Output order is IDENTICAL to `_group_compact`."""
    Lb = L // 4
    m = g0 + jnp.arange(group_blocks, dtype=jnp.int32)
    valid_m = m < nb
    b = blk_compact[m]
    bk = b % Lb
    bj = (b // Lb) % Lb
    bi = b // (Lb * Lb)
    r = jnp.arange(16, dtype=jnp.int32)
    li = bi[:, None] * 4 + (r // 4)[None, :]           # [Mg, 16]
    lj = bj[:, None] * 4 + (r % 4)[None, :]
    rowbase = (li * L + lj) * L + (bk * 4)[:, None]    # [Mg, 16]
    w = words[rowbase >> 5]                            # the gather
    nib = (w >> (rowbase & 31)) & 0xF
    jj = jnp.arange(4, dtype=jnp.int32)[None, None, :]
    flags = ((((nib[:, :, None] >> jj) & 1) == 1)
             & valid_m[:, None, None]).reshape(-1)
    gidx = (rowbase[:, :, None] + jj).reshape(-1)
    na_g = jnp.sum(flags.astype(jnp.int32))
    pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
    target = jnp.where(flags, pos, out_len)
    compact = jnp.zeros((out_len,), jnp.int32).at[target].set(
        gidx, mode="drop")
    return compact, na_g


_1D_GROUP_WORDS = 2048   # dirty words expanded per group (1-D path)
_1D_MIN_FLAGS = 1 << 15  # below this the direct cumsum+scatter wins


def _compact_flags_1d(flags: jnp.ndarray, n_out: int):
    """(compact, n) of set flags in a 1-D bool array.

    Small arrays take the direct cumsum+scatter. Large ones (the runs
    octree's window-block summary is 262k flags at 512^3; scatter
    attempts cost ~9 ns each) pack to int32 words, compact the DIRTY
    WORD ids (N/32 elements), then expand dirty words in groups — the
    same two-level discipline as the 3-D lattice compactions, in 1-D.
    Output order is ascending (identical to the direct path); entries
    past the count are zero. ``n_out`` only needs to cover the flag
    count (callers pass N + a small consumer-side over-read margin);
    the grouped path carries its append slack internally.
    """
    N = flags.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    if N % 32 != 0 or N <= _1D_MIN_FLAGS:
        n = jnp.sum(flags.astype(jnp.int32))
        pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
        target = jnp.where(flags, pos, n_out)
        return (jnp.zeros((n_out,), jnp.int32).at[target].set(
            idx, mode="drop"), n)
    words = _pack_bits(flags)
    Nw = N // 32
    wflags = words != 0
    nw = jnp.sum(wflags.astype(jnp.int32))
    wpos = jnp.cumsum(wflags.astype(jnp.int32)) - 1
    wcomp = jnp.zeros((Nw + _1D_GROUP_WORDS,), jnp.int32).at[
        jnp.where(wflags, wpos, Nw + _1D_GROUP_WORDS)].set(
        jnp.arange(Nw, dtype=jnp.int32), mode="drop")
    G = _1D_GROUP_WORDS
    S = G * 32
    sh = jnp.arange(32, dtype=jnp.int32)
    # slack past n_out so the append offset (<= N <= n_out) never needs
    # clamping — a clamped dynamic_update_slice would overwrite earlier
    # entries instead of dropping like the scatter path
    out0 = jnp.zeros((n_out + S,), jnp.int32)

    def body(carry):
        out, n, g = carry
        m = g * G + jnp.arange(G, dtype=jnp.int32)
        wi = wcomp[m]
        w = words[wi]
        f = ((((w[:, None] >> sh[None, :]) & 1) == 1)
             & (m < nw)[:, None]).reshape(-1)
        ids = (wi[:, None] * 32 + sh[None, :]).reshape(-1)
        n_g = jnp.sum(f.astype(jnp.int32))
        pos = jnp.cumsum(f.astype(jnp.int32)) - 1
        comp = jnp.zeros((S,), jnp.int32).at[
            jnp.where(f, pos, S)].set(ids, mode="drop")
        out = lax.dynamic_update_slice(
            out, comp, (jnp.minimum(n, out.shape[0] - S),))
        return out, n + n_g, g + 1

    out, n, _ = lax.while_loop(lambda c: c[2] * G < nw, body,
                               (out0, jnp.int32(0), jnp.int32(0)))
    return out[:n_out], n


def _full_compact(lat_flat, L3: int, out_len: int):
    """Whole-lattice compaction into an out_len buffer (small lattices)."""
    na = jnp.sum(lat_flat.astype(jnp.int32))
    pos = jnp.cumsum(lat_flat.astype(jnp.int32)) - 1
    target = jnp.where(lat_flat, pos, out_len)
    compact = jnp.zeros((out_len,), jnp.int32).at[target].set(
        jnp.arange(L3, dtype=jnp.int32), mode="drop")
    return compact, na


def _dirty_lat(evald_f, rfh_f, rfl_f, L: int, init_lat) -> jnp.ndarray:
    """[L^3] bool: still-unknown lattice points of the current level.

    A point is clean once evaluated OR once inside a cell filled for
    EITHER field — the reference's dirty mask is shared between fields
    (lib/sdf.py:103,113) while fill values are per field.
    """
    L3 = L ** 3
    lat = (jnp.logical_not(evald_f[:L3])
           & jnp.logical_not(rfh_f[:L3]) & jnp.logical_not(rfl_f[:L3]))
    if init_lat is not None:
        lat = lat & init_lat
    return lat


def _sample_init(init_dirty, R: int, reso: int):
    """Current-level lattice sample of a full-resolution init mask."""
    if init_dirty is None:
        return None
    if reso == 1:
        return init_dirty.reshape(-1)
    return init_dirty[::reso, ::reso, ::reso].reshape(-1)


def _expandf(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """[A,A,A] -> [fA,fA,fA] nearest (value at floor(p/f)).

    Implemented as three static-index takes rather than a broadcast to
    [A,f,A,f,A,f]: the TPU (8,128) tiled layout pads a minor dim of
    f=2 up to 128, so if XLA materializes that broadcast at A=256 it is
    a 64x-padded 32 GB allocation (the round-1 "512^3 compile
    pathology"). Takes keep every intermediate's minor dim >= A.
    """
    if f == 1:
        return x
    A = x.shape[0]
    idx = jnp.arange(f * A, dtype=jnp.int32) // f
    x = jnp.take(x, idx, axis=0)
    x = jnp.take(x, idx, axis=1)
    x = jnp.take(x, idx, axis=2)
    return x


def _pad_cells(c: jnp.ndarray, L: int) -> jnp.ndarray:
    """Pad a [n,n,n] cell array (n = L-1) to [L,L,L] with zeros/False."""
    return jnp.pad(c, ((0, 1),) * 3)


def _prune_upsample(R: int, reso: int, threshold: float,
                    val_hr_f, val_lr_f, evald_f, rfh_f, rfl_f,
                    init_lat, init_center):
    """Fill prunable cells of the [L]^3 level and expand to the next
    level's [fL]^3 lattice (f = reso // next_reso, 2 except for the
    reference's 3->1 halving step).

    Vectorized equivalent of the reference's per-cell interpolation loop
    (lib/sdf.py:81-117) followed by the implicit move to the next octree
    level. Returns updated flat (val_hr_f, val_lr_f, evald_f, rfh_f,
    rfl_f). Region masks are PER FIELD because fill values are per field
    while the dirty mask is shared: a cell filled only for lr clears
    dirty for both, but hr values inside it keep their evaluated-or-zero
    state (lib/sdf.py:96-117). ``init_lat``/``init_center``: optional
    init-dirty samples on the current lattice / at next-level cell
    centers (both None when the evaluation starts fully dirty).
    """
    L = R // reso
    L3 = L ** 3
    n = L - 1
    f = reso // (reso // 2)   # expansion factor to the next lattice
    val_hr = val_hr_f[:L3].reshape(L, L, L)
    val_lr = val_lr_f[:L3].reshape(L, L, L)
    evald = evald_f[:L3].reshape(L, L, L)
    rfh = rfh_f[:L3].reshape(L, L, L)
    rfl = rfl_f[:L3].reshape(L, L, L)

    # after the level's evaluation, every dirty lattice point is known
    evald = evald | _dirty_lat(evald_f, rfh_f, rfl_f, L,
                               init_lat).reshape(L, L, L)

    def spans(v):
        c = jnp.stack([
            v[:-1, :-1, :-1], v[:-1, :-1, 1:], v[:-1, 1:, :-1],
            v[:-1, 1:, 1:], v[1:, :-1, :-1], v[1:, :-1, 1:],
            v[1:, 1:, :-1], v[1:, 1:, 1:]])
        return c.min(axis=0), c.max(axis=0)          # [n,n,n]

    vmin_hr, vmax_hr = spans(val_hr)
    vmin_lr, vmax_lr = spans(val_lr)

    # cell center = a next-level point never on any coarser lattice:
    # dirty unless inside an earlier-filled region or pre-pruned by the
    # init mask (lib/sdf.py:84-87)
    center_ok = jnp.logical_not(rfh[:n, :n, :n] | rfl[:n, :n, :n])
    if init_center is not None:
        center_ok = center_ok & init_center
    fill_hr = center_ok & ((vmax_hr - vmin_hr) < threshold)
    fill_lr = center_ok & ((vmax_lr - vmin_lr) < threshold)

    # expand to the next [fL]^3 lattice
    L2 = f * L
    e1 = (jnp.arange(L2, dtype=jnp.int32) % f) == 0
    coarse_pt = (e1[:, None, None] & e1[None, :, None]
                 & e1[None, None, :])   # fine point coincides w/ coarse

    def expand_field(val, rf_field, fill, vmin, vmax):
        # Select per COARSE point first, expand the two selected payloads
        # once each (3 big expands per field instead of 5): the fine
        # value is fv inside a freshly-filled cell, else the enclosing
        # cell's base value where it must be kept (old filled region or
        # a fine point coinciding with a coarse one), else 0.
        fillp = _pad_cells(fill, L)
        fvp = _pad_cells((vmax + vmin) * 0.5, L)
        rf_old = _pad_cells(rf_field[:n, :n, :n], L)
        v_on_coarse = jnp.where(fillp, fvp, val)
        v_off_coarse = jnp.where(fillp, fvp,
                                 jnp.where(rf_old, val, 0.0))
        val2 = jnp.where(coarse_pt, _expandf(v_on_coarse, f),
                         _expandf(v_off_coarse, f))
        rf2 = _expandf(rf_old | fillp, f)
        return val2, rf2

    val2_hr, rfh2 = expand_field(val_hr, rfh, fill_hr, vmin_hr, vmax_hr)
    val2_lr, rfl2 = expand_field(val_lr, rfl, fill_lr, vmin_lr, vmax_lr)
    evald2 = _expandf(evald, f) & coarse_pt

    L23 = L2 ** 3
    val_hr_f = val_hr_f.at[:L23].set(val2_hr.reshape(-1))
    val_lr_f = val_lr_f.at[:L23].set(val2_lr.reshape(-1))
    evald_f = evald_f.at[:L23].set(evald2.reshape(-1))
    rfh_f = rfh_f.at[:L23].set(rfh2.reshape(-1))
    rfl_f = rfl_f.at[:L23].set(rfl2.reshape(-1))
    return val_hr_f, val_lr_f, evald_f, rfh_f, rfl_f


def _sample_init_center(init_dirty, R: int, reso: int):
    """init-dirty values at next-level cell centers [n,n,n]."""
    if init_dirty is None:
        return None
    n = R // reso - 1
    half = reso // 2
    return init_dirty[half::reso, half::reso, half::reso][:n, :n, :n]


def _normalize_init(init_dirty, R: int, schedule):
    """Per-level init masks: ({reso: [L^3] flat}, {reso: [n,n,n]}).

    Accepts either the per-level dict produced by
    :func:`silhouette_init_masks` (preferred: each level's mask is
    computed AT that level's resolution — minor-axis strided sampling
    of a full [R^3] mask costs hundreds of ms per level on TPU) or a
    raw [R,R,R] array (legacy/tests), which is sampled eagerly here.
    """
    if init_dirty is None:
        return None, None
    if isinstance(init_dirty, dict):
        return init_dirty["lat"], init_dirty["center"]
    lat = {reso: _sample_init(init_dirty, R, reso) for reso in schedule}
    center = {reso: _sample_init_center(init_dirty, R, reso)
              for reso in schedule if reso > 1}
    return lat, center


def _level_schedule(R: int, init_resolution: int):
    """Reference reso halving schedule, validated for the level-local
    lattice representation: every stride must divide R and each next
    stride must divide its predecessor (true for all power-of-two
    R/init_resolution ratios, i.e. every reference-shaped config)."""
    reso = R // init_resolution
    out = []
    while reso > 0:
        out.append(reso)
        reso //= 2
    for i, s in enumerate(out):
        nxt = out[i + 1] if i + 1 < len(out) else None
        if R % s != 0 or (nxt is not None and s % nxt != 0):
            raise ValueError(
                f"unsupported octree schedule {out} for resolution {R}: "
                f"every stride must divide the resolution and each "
                f"halved stride its predecessor — use a power-of-two "
                f"resolution/init_resolution ratio (reference-shaped "
                f"configs; lib/sdf.py:56-57)")
    return out


def _level_step(eval_fn: EvalFn, R: int, reso: int, chunk: int,
                mat: np.ndarray, val_hr_f, val_lr_f, evald_f, rfh_f,
                rfl_f, ctx, init_lat=None):
    """Evaluate every still-dirty lattice point at stride ``reso``.

    State is the flat-prefix representation (module docstring); only the
    [L^3] prefix of each buffer is touched.
    """
    L = R // reso
    L3 = L * L * L
    R3 = R ** 3
    lat_flat = _dirty_lat(evald_f, rfh_f, rfl_f, L, init_lat)
    scale = jnp.asarray(np.diag(mat[:3, :3]) * reso, jnp.float32)
    offset = jnp.asarray(mat[:3, 3], jnp.float32)

    def eval_chunks(compact, na, carry):
        def body(c2):
            val_hr_f, val_lr_f, c = c2
            idx = lax.dynamic_slice(compact, (c * chunk,), (chunk,))
            k = idx % L
            j = (idx // L) % L
            i = idx // (L * L)
            pts = (jnp.stack([i, j, k]).astype(jnp.float32)
                   * scale[:, None] + offset[:, None])
            hr, lr = eval_fn(pts, ctx)
            valid = (c * chunk + jnp.arange(chunk, dtype=jnp.int32)) < na
            tgt = jnp.where(valid, idx, R3)   # out-of-bounds -> dropped
            val_hr_f = val_hr_f.at[tgt].set(hr, mode="drop")
            val_lr_f = val_lr_f.at[tgt].set(lr, mode="drop")
            return val_hr_f, val_lr_f, c + 1

        num_chunks = (na + chunk - 1) // chunk
        val_hr_f, val_lr_f, _ = lax.while_loop(
            lambda c2: c2[2] < num_chunks, body,
            carry + (jnp.int32(0),))
        return val_hr_f, val_lr_f

    if not _two_level(L):
        compact, na = _full_compact(lat_flat, L3, L3 + chunk)
        return eval_chunks(compact, na, (val_hr_f, val_lr_f))

    S = _GROUP_BLOCKS * _BLOCK ** 3
    packed = _BLOCK == 4 and L % 32 == 0
    if packed:
        words = _pack_bits(lat_flat)
        blk_compact, nb = _block_summary_packed(words, L, _GROUP_BLOCKS)
    else:
        blk_compact, nb = _block_summary(lat_flat, L, _BLOCK,
                                         _GROUP_BLOCKS)

    # Buffered evaluation: group compactions are APPENDED (one
    # contiguous dynamic_update_slice each — garbage past a group's
    # count is overwritten by the next append or masked by the fill
    # count) into a multi-chunk buffer that is flushed through the
    # chunked eval loop only when the next group might not fit. This
    # decouples the compaction group size (small: candidate waste is
    # at most one part-empty group) from the query batching (large:
    # the eval chunks stay fully packed) — evaluating per group would
    # pay up to chunk/2 padded queries per group, which at 8k-point
    # groups on a multi-million-point dirty set costs hundreds of ms.
    cap = max(4 * 1024 * 1024 // chunk, 1) * chunk   # flush threshold
    # tail room for one group append at fill == cap AND the chunk
    # loop's fixed-size over-read of the last partial chunk
    buf0 = jnp.zeros((cap + max(S, chunk),), jnp.int32)

    def group_body(carry):
        val_hr_f, val_lr_f, buf, fill, g = carry
        if packed:
            compact, na_g = _group_compact_packed(
                words, blk_compact, g * _GROUP_BLOCKS, nb, L,
                _GROUP_BLOCKS, S)
        else:
            compact, na_g = _group_compact(
                lat_flat, blk_compact, g * _GROUP_BLOCKS, nb, L, _BLOCK,
                _GROUP_BLOCKS, S)
        buf = lax.dynamic_update_slice(buf, compact[:S], (fill,))
        fill = fill + na_g
        last = (g + 1) * _GROUP_BLOCKS >= nb

        def flush(args):
            val_hr_f, val_lr_f, fill = args
            val_hr_f, val_lr_f = eval_chunks(buf, fill,
                                             (val_hr_f, val_lr_f))
            return val_hr_f, val_lr_f, jnp.int32(0)

        val_hr_f, val_lr_f, fill = lax.cond(
            last | (fill + S > cap), flush, lambda a: a,
            (val_hr_f, val_lr_f, fill))
        return val_hr_f, val_lr_f, buf, fill, g + 1

    val_hr_f, val_lr_f, _, _, _ = lax.while_loop(
        lambda c2: c2[4] * _GROUP_BLOCKS < nb, group_body,
        (val_hr_f, val_lr_f, buf0, jnp.int32(0), jnp.int32(0)))
    return val_hr_f, val_lr_f


def _octree_state(R: int, init_resolution: int):
    """Fresh flat level-state buffers (val_hr, val_lr, evald, rf_hr,
    rf_lr); only the current level's L^3 prefix of each is live."""
    R3 = R ** 3
    return (jnp.zeros((R3,), jnp.float32), jnp.zeros((R3,), jnp.float32),
            jnp.zeros((R3,), bool), jnp.zeros((R3,), bool),
            jnp.zeros((R3,), bool))


def eval_grid_octree_mono(eval_fn: EvalFn, resolution: int,
                          mat: np.ndarray, threshold: float,
                          init_resolution: int = 64,
                          num_samples: int = 50000, ctx: Any = None,
                          cache: Optional[Dict] = None,
                          init_dirty: Optional[jnp.ndarray] = None,
                          silhouette: Optional[jnp.ndarray] = None,
                          silhouette_calib=None,
                          silhouette_dilate: int = 3
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The ENTIRE coarse-to-fine schedule as ONE compiled program.

    On remote-dispatch backends every dispatch costs a ~30-45 ms RPC
    round trip; the per-level fused mode pays ~9 of those per
    evaluation (~0.3 s at 512^3 — comparable to the actual compute).
    This mode chains every level's compaction/query/prune into a single
    jit: one dispatch, one sync. Compile cost is the sum of all level
    programs (persistently cached). Accepts the same per-level
    init-mask dict as the other modes, OR — preferred for visual-hull
    pruning — a raw ``silhouette`` mask (+ its ``silhouette_calib``),
    whose per-level init masks are then computed INSIDE the mono
    program (``_sil_masks_traced``) instead of as ~13 separate mask
    programs per subject. Requires the 2-D projection fast path; pass
    precomputed ``init_dirty`` for exotic calibrations.
    """
    R = resolution
    mat = np.asarray(mat)
    cache = cache if cache is not None else {}
    schedule = _level_schedule(R, init_resolution)
    if silhouette is not None:
        if init_dirty is not None:
            raise ValueError("pass silhouette= or init_dirty=, not both")
        calib_np = np.asarray(silhouette_calib)
        null_axis = _sil_null_axis(calib_np, mat)
        if null_axis is None:
            raise ValueError(
                "mono inline silhouette pruning needs the 2-D projection "
                "fast path (an orthographic lattice axis); precompute "
                "init_dirty=silhouette_init_masks(...) instead")
        mask = jnp.asarray(silhouette)
        key = ("monosil", R, num_samples, float(threshold),
               mat.tobytes(), init_resolution, tuple(mask.shape),
               silhouette_dilate, null_axis)
        if key not in cache:
            def run_sil(ctx, mask, calib):
                lats, centers = _sil_masks_traced(
                    mask, calib, R, mat, schedule, silhouette_dilate,
                    null_axis)
                return _mono_schedule(eval_fn, R, schedule, num_samples,
                                      mat, threshold, init_resolution,
                                      ctx, lats, centers)
            cache[key] = jax.jit(run_sil)
        vh, vl = cache[key](ctx, mask, jnp.asarray(silhouette_calib))
        return vh.reshape(R, R, R), vl.reshape(R, R, R)
    has_init = init_dirty is not None
    init_lats, init_centers = _normalize_init(init_dirty, R, schedule)
    key = ("mono", R, num_samples, float(threshold), mat.tobytes(),
           has_init, init_resolution)
    if key not in cache:
        def run(ctx, init_lats, init_centers):
            return _mono_schedule(
                eval_fn, R, schedule, num_samples, mat, threshold,
                init_resolution, ctx,
                init_lats if has_init else None,
                init_centers if has_init else None)
        cache[key] = jax.jit(run)
    vh, vl = cache[key](ctx, init_lats if has_init else {},
                        init_centers if has_init else {})
    return vh.reshape(R, R, R), vl.reshape(R, R, R)


def _mono_schedule(eval_fn, R, schedule, num_samples, mat, threshold,
                   init_resolution, ctx, init_lats, init_centers):
    """Traced body shared by the mono evaluator's entry points: the
    full coarse-to-fine schedule over the flat level-state buffers."""
    has_init = init_lats is not None
    state = _octree_state(R, init_resolution)
    for reso in schedule:
        vh, vl = _level_step(
            eval_fn, R, reso, num_samples, mat, *state, ctx,
            init_lats[reso] if has_init else None)
        state = (vh, vl) + state[2:]
        if reso <= 1:
            break
        state = _prune_upsample(
            R, reso, threshold, *state,
            init_lats[reso] if has_init else None,
            init_centers[reso] if has_init else None)
    return state[0], state[1]


def eval_grid_octree(eval_fn: EvalFn, resolution: int, mat: np.ndarray,
                     threshold: float, init_resolution: int = 64,
                     num_samples: int = 50000, ctx: Any = None,
                     jit: bool = True,
                     cache: Optional[Dict] = None,
                     init_dirty: Optional[jnp.ndarray] = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Coarse-to-fine evaluation of the (hr, lr) occupancy fields.

    Fully fused mode: one compiled program per level (compaction +
    query while_loop) plus one per prune/upsample — no host syncs.
    Returns two [R, R, R] float32 device arrays. Per-subject arrays go
    through ``ctx``; pass the same ``cache`` dict across calls to reuse
    compiled level programs.
    """
    R = resolution
    mat = np.asarray(mat)
    cache = cache if cache is not None else {}
    base_key = ("oct", R, num_samples, float(threshold), mat.tobytes(),
                init_dirty is not None)
    has_init = init_dirty is not None
    state = _octree_state(R, init_resolution)

    schedule = _level_schedule(R, init_resolution)
    init_lats, init_centers = _normalize_init(init_dirty, R, schedule)
    for reso in schedule:
        lkey = base_key + ("level", reso)
        if lkey not in cache:
            def build(reso=reso, has_init=has_init):
                def f(state, ctx, init_lat):
                    vh, vl = _level_step(
                        eval_fn, R, reso, num_samples, mat, *state, ctx,
                        init_lat if has_init else None)
                    return (vh, vl) + state[2:]
                return f
            fn = build()
            cache[lkey] = jax.jit(fn) if jit else fn
        state = cache[lkey](state, ctx,
                            init_lats[reso] if has_init else None)
        if reso <= 1:
            break
        pkey = base_key + ("prune", reso)
        if pkey not in cache:
            def buildp(reso=reso, has_init=has_init):
                def f(state, init_lat, init_center):
                    return _prune_upsample(
                        R, reso, threshold, *state,
                        init_lat if has_init else None,
                        init_center if has_init else None)
                return f
            fn = buildp()
            cache[pkey] = jax.jit(fn) if jit else fn
        state = cache[pkey](state,
                            init_lats[reso] if has_init else None,
                            init_centers[reso] if has_init else None)
    return state[0].reshape(R, R, R), state[1].reshape(R, R, R)


def _sil_null_axis(calib_np: np.ndarray, mat: np.ndarray):
    """Lattice axis along which the projected uv is constant, or None.

    uv is AFFINE in the integer voxel index under orthographic
    projection, with a rank-<=2 Jacobian: J = calib[:2,:3] @ diag(mat).
    When a lattice axis is in the null space (always true for the
    production eval calibration diag(2,-2,2,1): the z column is zero)
    the hit field is constant along it — a 2-D hit map over the other
    two axes (O(R^2) samples) broadcast along it equals the full
    projection of all R^3 voxel centers."""
    J = calib_np[0, :2, :3] @ np.diag(np.diag(mat[:3, :3]))
    null_axes = np.where(np.abs(J).sum(axis=0) == 0.0)[0]
    return int(null_axes[0]) if len(null_axes) else None


def _sil_dilate(mask: jnp.ndarray, dilate: int) -> jnp.ndarray:
    """Max-window dilation of a [H, W, 1] float mask (traced)."""
    if dilate > 0:
        window = (1, 2 * dilate + 1, 2 * dilate + 1, 1)
        mask = jax.lax.reduce_window(mask[None], -jnp.inf, jax.lax.max,
                                     window, (1, 1, 1, 1), "SAME")[0]
    return mask


def _sil_hit_lattice(mask, calib, L: int, mat_l: np.ndarray,
                     null_axis: int) -> jnp.ndarray:
    """[L, L, L] bool visual-hull hit lattice from an already-DILATED
    mask via the 2-D fast path (traced; mat_l is the host-side
    index->world affine of this lattice)."""
    from ..ops.geometry import orthogonal
    from ..ops.grid_sample import grid_sample_points

    axes = [a for a in range(3) if a != null_axis]
    ii = jnp.arange(L, dtype=jnp.float32)
    g0 = jnp.repeat(ii, L)      # first non-null axis index
    g1 = jnp.tile(ii, L)        # second non-null axis index
    coords = [jnp.zeros_like(g0)] * 3
    coords[axes[0]] = g0
    coords[axes[1]] = g1
    pts = (jnp.stack(coords)
           * jnp.asarray(np.diag(mat_l[:3, :3]), jnp.float32)[:, None]
           + jnp.asarray(mat_l[:3, 3], jnp.float32)[:, None])
    xyz = orthogonal(pts[None], calib)
    uv = jnp.swapaxes(xyz[:, :2, :], 1, 2)
    hit2 = grid_sample_points(mask[None], uv)[0, :, 0] > 0.0
    shape = [1, 1, 1]
    shape[axes[0]] = L
    shape[axes[1]] = L
    return jnp.broadcast_to(hit2.reshape(shape), (L, L, L))


def _sil_masks_traced(mask, calib, R: int, mat: np.ndarray, schedule,
                      dilate: int, null_axis: int):
    """Traced equivalent of :func:`silhouette_init_masks` — every
    level's (lat, center) visual-hull masks computed INSIDE the calling
    program (the mono evaluator folds them into its single dispatch;
    as separate programs they cost ~13 dispatch enqueues per subject).
    Requires the 2-D fast path (``null_axis`` not None). The mask is
    dilated once and shared by all levels."""
    mask = jnp.asarray(mask, jnp.float32)
    if mask.ndim == 2:
        mask = mask[..., None]
    mask = _sil_dilate(mask, dilate)
    lat: Dict = {}
    center: Dict = {}
    for reso in schedule:
        L = R // reso
        mat_l = mat.copy()
        mat_l[:3, :3] = mat[:3, :3] * reso
        lat[reso] = _sil_hit_lattice(mask, calib, L, mat_l,
                                     null_axis).reshape(-1)
        if reso > 1:
            n = L - 1
            mat_c = mat_l.copy()
            mat_c[:3, 3] = (mat_c[:3, 3]
                            + np.diag(mat[:3, :3]) * (reso // 2))
            center[reso] = _sil_hit_lattice(mask, calib, n, mat_c,
                                            null_axis)
    return lat, center


def silhouette_dirty_mask(mask_img: jnp.ndarray, calib, resolution: int,
                          mat: np.ndarray, dilate: int = 3,
                          chunk: int = 1 << 20,
                          cache: Optional[Dict] = None) -> jnp.ndarray:
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
    mat = np.asarray(mat)
    calib_np = np.asarray(calib)

    # 2-D fast path (see _sil_null_axis): O(R^2) samples + broadcast
    # instead of projecting and gathering all R^3 voxel centers (~0.5 G
    # element gathers at 512^3)
    null_axis = _sil_null_axis(calib_np, mat)

    def run_2d(mask, calib):
        return _sil_hit_lattice(_sil_dilate(mask, dilate), calib, R,
                                mat, null_axis)

    def run_3d(mask, calib):
        mask = _sil_dilate(mask, dilate)
        R3 = R * R * R
        ch = min(chunk, R3)
        n_chunks = (R3 + ch - 1) // ch

        def body(c, dirty_flat):
            start = jnp.minimum(c * ch, R3 - ch)
            idx = start + jnp.arange(ch, dtype=jnp.int32)
            pts = flat_index_to_world(idx, R, 1, mat)
            xyz = orthogonal(pts[None], calib)
            uv = jnp.swapaxes(xyz[:, :2, :], 1, 2)
            hit = grid_sample_points(mask[None], uv)[0, :, 0] > 0.0
            # contiguous chunk -> dynamic_update_slice, never a 134M
            # -element scatter (element scatters run ~5 ns/update)
            return lax.dynamic_update_slice(dirty_flat, hit, (start,))

        dirty = jax.lax.fori_loop(0, n_chunks, body,
                                  jnp.zeros((R3,), bool))
        return dirty.reshape(R, R, R)

    # one compiled program per (R, mask shape, bbox, dilate) — without a
    # shared cache every evaluate() call would re-trace and re-dispatch
    # a fresh jit (seconds per call through the remote-compile cache)
    cache = cache if cache is not None else {}
    key = ("sil", R, mask.shape, dilate, chunk, mat.tobytes(),
           calib_np.tobytes(), null_axis)
    if key not in cache:
        cache[key] = jax.jit(run_2d if null_axis is not None else run_3d)
    return cache[key](mask, jnp.asarray(calib))


def silhouette_init_masks(mask_img, calib, resolution: int,
                          mat: np.ndarray, init_resolution: int = 64,
                          dilate: int = 3,
                          cache: Optional[Dict] = None) -> Dict:
    """Per-level visual-hull init masks for the octree evaluators.

    Each level's mask is computed AT that level's lattice resolution by
    scaling the index->world affine (positions coincide exactly with
    the stride-reso samples of the full-resolution mask, so results are
    identical to sampling a [R^3] mask — but the strided minor-axis
    sampling that costs hundreds of ms per 512^3 level never happens,
    and with the production orthographic calibration every mask is an
    O(L^2) computation). Pass the returned dict as ``init_dirty``.
    """
    mat = np.asarray(mat)
    lat: Dict = {}
    center: Dict = {}
    for reso in _level_schedule(resolution, init_resolution):
        L = resolution // reso
        mat_l = mat.copy()
        mat_l[:3, :3] = mat[:3, :3] * reso
        lat[reso] = silhouette_dirty_mask(
            mask_img, calib, L, mat_l, dilate=dilate,
            cache=cache).reshape(-1)
        if reso > 1:
            n = L - 1
            mat_c = mat_l.copy()
            mat_c[:3, 3] = mat_c[:3, 3] + np.diag(
                mat[:3, :3]) * (reso // 2)
            center[reso] = silhouette_dirty_mask(
                mask_img, calib, n, mat_c, dilate=dilate, cache=cache)
    return {"lat": lat, "center": center}


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
    programs (compaction, prune/upsample) are small separate jits. On
    backends where compilation is expensive (remote-compile TPU
    terminals) this cuts octree compile time by an order of magnitude at
    the cost of a few hundred async dispatches and one device->host sync
    per level (the dirty count).
    """
    R = resolution
    C = num_samples
    R3 = R ** 3
    mat = np.asarray(mat)
    cache = cache if cache is not None else {}
    has_init = init_dirty is not None
    val_hr_f, val_lr_f, evald_f, rfh_f, rfl_f = _octree_state(
        R, init_resolution)

    def get(key, builder):
        if key not in cache:
            cache[key] = jax.jit(builder())
        return cache[key]

    # Compact-buffer capacity shared by every level: one group of dirty
    # blocks (hierarchical path) or a whole small lattice (coarse levels).
    G = _HL_GROUP_BLOCKS
    cap = G * _BLOCK ** 3
    S = cap + C

    def hl_two_level(L):
        return L % _BLOCK == 0 and L ** 3 > G * _BLOCK ** 3

    # Single chunk program shared by ALL levels AND all bounding boxes:
    # lattice size L and the index->world affine enter as traced
    # scalars/arrays, so one compile of the expensive query program
    # serves every coarse-to-fine schedule — one dispatch per chunk.
    def chunk_builder(buf_len):
        def build():
            def f(val_hr_f, val_lr_f, compact, start, na, L, scale,
                  offset, ctx):
                idx = lax.dynamic_slice(compact, (start,), (C,))
                k = idx % L
                j = (idx // L) % L
                i = idx // (L * L)
                pts = (jnp.stack([i, j, k]).astype(jnp.float32)
                       * scale[:, None] + offset[:, None])
                hr, lr = eval_fn(pts, ctx)
                valid = (start + jnp.arange(C, dtype=jnp.int32)) < na
                tgt = jnp.where(valid, idx, R3)
                val_hr_f = val_hr_f.at[tgt].set(hr, mode="drop")
                val_lr_f = val_lr_f.at[tgt].set(lr, mode="drop")
                return val_hr_f, val_lr_f
            return f
        return build

    offset_arr = jnp.asarray(mat[:3, 3], jnp.float32)

    def dispatch_chunks(chunk_fn, compact, na, na_host, L, reso):
        nonlocal val_hr_f, val_lr_f
        if stats_out is not None:
            stats_out.setdefault("queries", 0)
            stats_out.setdefault("chunks", 0)
            stats_out["queries"] += na_host
            stats_out["chunks"] += -(-na_host // C) if na_host else 0
        Lj = jnp.int32(L)
        scale_arr = jnp.asarray(np.diag(mat[:3, :3]) * reso, jnp.float32)
        for c in range(0, na_host, C):
            val_hr_f, val_lr_f = chunk_fn(
                val_hr_f, val_lr_f, compact, jnp.int32(c), na, Lj,
                scale_arr, offset_arr, ctx)

    import time as _time
    base = ("hl", R, C, float(threshold), mat.tobytes(), has_init)
    schedule = _level_schedule(R, init_resolution)
    init_lats, init_centers = _normalize_init(init_dirty, R, schedule)
    for reso in schedule:
        _t0 = _time.time()
        L = R // reso
        L3 = L * L * L
        _nb_dbg = 0
        init_lat = init_lats[reso] if has_init else None

        if hl_two_level(L):
            # Hierarchical: block summary + first point-group in ONE
            # program (a single host sync covers the common case where
            # every dirty block fits one group).
            def summary0_builder(reso=reso, L=L):
                def f(evald_f, rfh_f, rfl_f, init_lat):
                    lat = _dirty_lat(evald_f, rfh_f, rfl_f, L,
                                     init_lat if has_init else None)
                    blk_compact, nb = _block_summary(
                        lat, L, _BLOCK, G)
                    compact, na0 = _group_compact(
                        lat, blk_compact, jnp.int32(0), nb, L, _BLOCK,
                        G, S)
                    return blk_compact, nb, compact, na0
                return f

            def group_builder(reso=reso, L=L):
                def f(evald_f, rfh_f, rfl_f, init_lat, blk_compact, g0,
                      nb):
                    lat = _dirty_lat(evald_f, rfh_f, rfl_f, L,
                                     init_lat if has_init else None)
                    return _group_compact(
                        lat, blk_compact, g0, nb, L, _BLOCK,
                        G, S)
                return f

            chunk_fn = get(("hl-chunk", R, C, S), chunk_builder(S))
            summary0 = get(base + ("summary0", reso), summary0_builder)
            blk_compact, nb, compact, na0 = summary0(evald_f, rfh_f,
                                                     rfl_f, init_lat)
            nb_host, na_host = jax.device_get((nb, na0))
            _nb_dbg = int(nb_host)
            dispatch_chunks(chunk_fn, compact, na0, int(na_host), L, reso)
            if nb_host > G:
                group_fn = get(base + ("group", reso), group_builder)
                for g0 in range(G, int(nb_host), G):
                    compact, na_g = group_fn(evald_f, rfh_f, rfl_f,
                                             init_lat, blk_compact,
                                             jnp.int32(g0), nb)
                    dispatch_chunks(chunk_fn, compact, na_g, int(na_g),
                                    L, reso)
        else:
            # Small lattice: full compaction into the shared buffer when
            # it fits, else (unusual non-power-of-two configs) into a
            # dedicated L^3-sized buffer with its own chunk program.
            buf_len = S if L3 <= cap else L3 + C

            def compact_builder(reso=reso, L=L, L3=L3, buf_len=buf_len):
                def f(evald_f, rfh_f, rfl_f, init_lat):
                    lat = _dirty_lat(evald_f, rfh_f, rfl_f, L,
                                     init_lat if has_init else None)
                    return _full_compact(lat, L3, buf_len)
                return f

            chunk_fn = get(("hl-chunk", R, C, buf_len),
                           chunk_builder(buf_len))
            compact_fn = get(base + ("compact", reso), compact_builder)
            compact, na = compact_fn(evald_f, rfh_f, rfl_f, init_lat)
            dispatch_chunks(chunk_fn, compact, na, int(na), L, reso)
        if stats_out is not None:
            stats_out.setdefault("levels", []).append(
                (reso, _nb_dbg, _time.time() - _t0))
        if reso <= 1:
            break
        pkey = base + ("prune", reso)
        if pkey not in cache:
            def buildp(reso=reso):
                def f(val_hr_f, val_lr_f, evald_f, rfh_f, rfl_f,
                      init_lat, init_center):
                    return _prune_upsample(
                        R, reso, threshold, val_hr_f, val_lr_f,
                        evald_f, rfh_f, rfl_f,
                        init_lat if has_init else None,
                        init_center if has_init else None)
                return f
            cache[pkey] = jax.jit(buildp())
        val_hr_f, val_lr_f, evald_f, rfh_f, rfl_f = cache[pkey](
            val_hr_f, val_lr_f, evald_f, rfh_f, rfl_f, init_lat,
            init_centers[reso] if has_init else None)
    return val_hr_f.reshape(R, R, R), val_lr_f.reshape(R, R, R)


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


# ---------------------------------------------------------------------------
# Column-shared dense evaluation (projective structure).
#
# Under an axis-aligned projection every z sample of a grid column (i, j)
# projects to the same (u, v) — the production eval calibration
# diag(2, -2, 2, 1) with an axis-aligned bbox qualifies. Features are
# then sampled once per COLUMN (R^2 gathers instead of R^3) and the
# dual MLP runs through the column-shared kernel
# (ops/fused_mlp.fused_dual_mlp_cols), which factors the feature matmuls
# out per column: ~3.8x fewer MACs and ~R/2x fewer gather bytes than the
# generic dense evaluator at the reference config. Replaces the hot
# chain of the reference's eval_grid (lib/sdf.py:48-52).

def dense_cols_separable(calib, mat, tol: float = 1e-6) -> bool:
    """True when (u, v) is independent of the grid k axis and depth is
    independent of (i, j) — the precondition for column sharing."""
    calib = np.asarray(calib, np.float64).reshape(-1, 4, 4)[0]
    mat = np.asarray(mat, np.float64)
    A = calib[:3, :3] @ mat[:3, :3]
    return bool(abs(A[0, 2]) < tol and abs(A[1, 2]) < tol
                and abs(A[2, 0]) < tol and abs(A[2, 1]) < tol)


def eval_grid_dense_cols(cols_weights, feat_lr, feat_hr, calib,
                         resolution: int, mat: np.ndarray,
                         load_size: int, z_size: float,
                         col_block: int = 8,
                         use_pallas: Optional[bool] = None,
                         interpret: bool = False,
                         cache: Optional[Dict] = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense evaluation of every grid point via column sharing.

    cols_weights: FusedWeights prepared with base_split=(C_lr, C_hr, 1).
    feat_lr/feat_hr: [1, H, W, C] UNPACKED feature maps. Requires
    :func:`dense_cols_separable`(calib, mat). Returns (hr, lr) [R, R, R].
    """
    from ..ops.fused_mlp import (fused_dual_mlp_cols,
                                 fused_dual_mlp_cols_xla)
    from ..ops.geometry import orthogonal, in_image_mask, normalize_depth
    from ..ops.grid_sample import grid_sample_points

    if use_pallas is None:       # the kernel needs a real TPU (or
        use_pallas = jax.default_backend() != "cpu"   # interpret mode)
    R = resolution
    ncol = R * R
    mat = np.asarray(mat)

    def run(ctx):
        calib_ = ctx["calib"]
        # shared depth-feature vector (z depends only on k)
        zpts = flat_index_to_world(jnp.arange(R, dtype=jnp.int32),
                                   R, 1, mat)                  # [3, R]
        zf = normalize_depth(
            orthogonal(zpts[None], calib_)[0, 2, :], load_size, z_size)

        # world coords of each column at k = 0 (uv is k-independent)
        cid = jnp.arange(ncol, dtype=jnp.int32)
        pts = flat_index_to_world(cid * R, R, 1, mat)          # [3, NC]
        xyz = orthogonal(pts[None], calib_)                    # [1,3,NC]
        mask = in_image_mask(xyz[:, :2, :])[0]                 # [NC]
        uv = jnp.swapaxes(xyz[:, :2, :], 1, 2)                 # [1,NC,2]
        x_lr = grid_sample_points(ctx["feat_lr"], uv)[0]
        x_hr = grid_sample_points(ctx["feat_hr"], uv)[0]
        x_lr = x_lr.astype(jnp.float32)
        x_hr = x_hr.astype(jnp.float32)
        if use_pallas:
            hr, lr = fused_dual_mlp_cols(
                x_lr, x_hr, zf, ctx["weights"],
                col_block=col_block, interpret=interpret)
        else:
            hr, lr = fused_dual_mlp_cols_xla(x_lr, x_hr, zf,
                                             ctx["weights"])
        hr = hr * mask[:, None]                                # [NC, R]
        lr = lr * mask[:, None]
        return hr.reshape(R, R, R), lr.reshape(R, R, R)

    ctx = {"weights": cols_weights, "feat_lr": feat_lr,
           "feat_hr": feat_hr, "calib": jnp.asarray(calib)}
    cache = cache if cache is not None else {}
    key = ("dense-cols", R, col_block, use_pallas, interpret,
           load_size, float(z_size), mat.tobytes())
    if key not in cache:
        cache[key] = jax.jit(run)
    return cache[key](ctx)


def eval_grid_dense_cols_sharded(cols_weights, feat_lr, feat_hr, calib,
                                 resolution: int, mat: np.ndarray,
                                 load_size: int, z_size: float,
                                 mesh, col_block: int = 8,
                                 use_pallas: Optional[bool] = None,
                                 interpret: bool = False,
                                 cache: Optional[Dict] = None
                                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-chip column-shared dense evaluation.

    Columns are embarrassingly parallel, so the R^2 column axis shards
    over the mesh's 'points' axis (shard_map): each device samples and
    evaluates its contiguous slab of columns against replicated feature
    maps/weights — no collectives on the hot path, one all-gather
    materializes the full volumes at the end (XLA inserts it from the
    output spec). Requires R^2 divisible by the axis size and the
    per-device slab to be whole i-rows (R divisible by the axis size).
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from ..ops.fused_mlp import (fused_dual_mlp_cols,
                                 fused_dual_mlp_cols_xla)
    from ..ops.geometry import orthogonal, in_image_mask, normalize_depth
    from ..ops.grid_sample import grid_sample_points
    from ..parallel.mesh import POINT_AXIS

    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    R = resolution
    ncol = R * R
    n_shards = mesh.shape[POINT_AXIS]
    if R % n_shards != 0:
        raise ValueError(
            f"column-sharded dense evaluation needs resolution divisible "
            f"by the '{POINT_AXIS}' axis size (whole x-rows per device); "
            f"got R={R} over {n_shards} shards")
    ncol_loc = ncol // n_shards
    mat = np.asarray(mat)

    def local(ctx):
        calib_ = ctx["calib"]
        zpts = flat_index_to_world(jnp.arange(R, dtype=jnp.int32),
                                   R, 1, mat)
        zf = normalize_depth(
            orthogonal(zpts[None], calib_)[0, 2, :], load_size, z_size)
        shard = jax.lax.axis_index(POINT_AXIS)
        cid = shard * ncol_loc + jnp.arange(ncol_loc, dtype=jnp.int32)
        pts = flat_index_to_world(cid * R, R, 1, mat)
        xyz = orthogonal(pts[None], calib_)
        mask = in_image_mask(xyz[:, :2, :])[0]
        uv = jnp.swapaxes(xyz[:, :2, :], 1, 2)
        x_lr = grid_sample_points(ctx["feat_lr"], uv)[0].astype(
            jnp.float32)
        x_hr = grid_sample_points(ctx["feat_hr"], uv)[0].astype(
            jnp.float32)
        if use_pallas:
            hr, lr = fused_dual_mlp_cols(x_lr, x_hr, zf, ctx["weights"],
                                         col_block=col_block,
                                         interpret=interpret)
        else:
            hr, lr = fused_dual_mlp_cols_xla(x_lr, x_hr, zf,
                                             ctx["weights"])
        hr = (hr * mask[:, None]).reshape(R // n_shards, R, R)
        lr = (lr * mask[:, None]).reshape(R // n_shards, R, R)
        return hr, lr

    ctx = {"weights": cols_weights, "feat_lr": feat_lr,
           "feat_hr": feat_hr, "calib": jnp.asarray(calib)}
    cache = cache if cache is not None else {}
    # the compiled shard_map closes over the CONCRETE mesh, so the key
    # carries the device identity (a same-size mesh over different
    # devices/order must not reuse the program — sharded_mc._mesh_key
    # discipline)
    key = ("dense-cols-sharded", R, col_block, use_pallas, interpret,
           tuple(d.id for d in mesh.devices.flat), mesh.axis_names,
           load_size, float(z_size), mat.tobytes())
    if key not in cache:
        fn = shard_map(local, mesh=mesh,
                       in_specs=(P(),),
                       out_specs=(P(POINT_AXIS), P(POINT_AXIS)))
        cache[key] = jax.jit(fn)
    return cache[key](ctx)
