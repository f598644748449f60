r"""Device-resident isosurface extraction (JAX/TPU).

The reference extracts meshes on the host with skimage marching cubes
(lib/mesh_util.py:40,45) after shipping the full occupancy volume off
the GPU. At the 512^3 operating point that is two 536 MB device->host
transfers plus seconds of single-core host work per mesh — the largest
remaining cost of the reconstruction pipeline once field evaluation is
fast. This module runs marching tetrahedra (same tables as ``tetra.py``,
identical output mesh) and classic marching cubes (``mc_tables.py``)
entirely on device; only packed vertex/face buffers cross to the host.

TPU design notes — the kernel is GATHER-DESCRIPTOR-bound, not
byte- or FLOP-bound (~14 ns per random index into an HBM array, ~9 ns
per scatter attempt, measured in benchmarks/gather_rate_bench.py), so
every structure below exists to minimize random-access descriptors:

  * Active cells are found with shifted-slice min/max stencils (dense)
    and compacted hierarchically (block summary + per-group point
    compaction with a group size adapted to the dirty-block count).
  * Vertex welding needs NO sort and no slot lut: every emitted edge
    runs from its componentwise-min corner ``p`` along a delta in
    {0,1}^3 \ {0}, so ``(p, delta)`` is already canonical. Crossing
    low-corner points are compacted once (a second dense stencil) and
    a point-rank lattice gives every edge the id
    ``slot * max_pts + rank(p)`` — 3 slots for cubes (axis edges),
    7 for tets (axis + diagonal edges).
  * The emission loop gathers per cell only its 8 corner values and 8
    corner point-ranks (corner-major [8, K]: a [K, 8] layout would
    tile-pad 8 -> 128 lanes); the per-case tessellation is ONE packed
    int32 table word per (group, tri-slot) — emin bits, slot id and
    valid bit — instead of per-vertex corner-id table lookups.
  * The finalize pass is slot-major and dense: per slot, presence and
    the interpolation parameter come from one gather of the slot's
    far-end value; no per-edge owner arithmetic, no 19-way lut.
  * Triangle capacity is bucketed to the PREVIOUS extraction's count
    (speculative, like the cell bucket): face buffers, remap gathers
    and face scatters shrink ~3x vs the worst-case tris_per_cell cap.
  * Everything is 1-D component-wise: a device array shaped [N, 3]
    takes the (8, 128) tiled layout, padding the minor dim 3 -> 128 —
    a 42x memory blowup that at 512^3 is a 20 GB allocation. So
    coordinates, triangle vertex ids and vertex positions each live in
    separate x/y/z (or v0/v1/v2) 1-D buffers, stacked on the host.
  * Static shapes throughout: capacities are compile-time parameters
    and overflow is detected on the host from the returned counts.

Tables are imported from ``tetra.py``/``mc_tables.py`` so the host and
device backends cannot drift.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .tetra import _CORNER_OFFSETS, _TETS, _TET_EDGES, _CASE_TRIS
from .evaluator import (_block_summary, _group_compact,
                        _compact_block_ids, _compact_flags_1d)

# Adaptive compaction group: small enough that a lightly-dirty lattice
# (a human surface marks ~10-60k 4^3 blocks) compacts in a few cheap
# groups instead of one 4.2M-element monolith (each group gathers and
# scatters group * 64 candidates regardless of tail occupancy;
# benchmarks/compact_bench2.py).
_MC_GROUP_BLOCKS = 8192

# ---- static tables ------------------------------------------------------

# Edge slots are DELTAS only (the canonical edge id is its min corner
# plus a delta): cubes emit axis edges, tets also the face/body
# diagonals of the 6-tet decomposition.
_DELTAS_CUBES = np.array([(1, 0, 0), (0, 1, 0), (0, 0, 1)], np.int32)
_DELTAS_TETS = np.array([((d & 1), (d >> 1) & 1, (d >> 2) & 1)
                         for d in range(1, 8)], np.int32)


def _slot_of_delta(d, deltas) -> int:
    for i, dd in enumerate(deltas):
        if tuple(dd) == tuple(d):
            return i
    raise ValueError(f"delta {d} not in slot table")


# Per (tet, slot, vertex): local corner pair (a, b) indexed by case.
# _VTX_A[t, s, v][case] = local corner id a (0 where the case emits no
# triangle in that slot — masked by _TRI_VALID).
_VTX_A = np.zeros((6, 2, 3, 16), np.int32)
_VTX_B = np.zeros((6, 2, 3, 16), np.int32)
_TRI_VALID = np.zeros((6, 2, 16), bool)
for _t, _tet in enumerate(_TETS):
    for _case in range(16):
        for _s in range(2):
            tri = _CASE_TRIS[_case, _s]
            if tri[0] < 0:
                continue
            _TRI_VALID[_t, _s, _case] = True
            for _v in range(3):
                a_loc, b_loc = _TET_EDGES[tri[_v]]
                _VTX_A[_t, _s, _v, _case] = _tet[a_loc]
                _VTX_B[_t, _s, _v, _case] = _tet[b_loc]

_OFFX = _CORNER_OFFSETS[:, 0].astype(np.int32)
_OFFY = _CORNER_OFFSETS[:, 1].astype(np.int32)
_OFFZ = _CORNER_OFFSETS[:, 2].astype(np.int32)

# ---- unified per-algorithm emission tables ----
# Each algorithm is a list of corner GROUPS; a group's sign bits form
# the case index into its packed emission table.
from .mc_tables import MC_EDGES, MC_CASE_TRIS, MC_MAX_TRIS

_VTX_A_MC = np.zeros((1, MC_MAX_TRIS, 3, 256), np.int32)
_VTX_B_MC = np.zeros((1, MC_MAX_TRIS, 3, 256), np.int32)
_TRI_VALID_MC = np.zeros((1, MC_MAX_TRIS, 256), bool)
for _case in range(256):
    for _s in range(MC_MAX_TRIS):
        _tri = MC_CASE_TRIS[_case, _s]
        if _tri[0] < 0:
            continue
        _TRI_VALID_MC[0, _s, _case] = True
        for _v in range(3):
            _a, _b = MC_EDGES[_tri[_v]]
            _VTX_A_MC[0, _s, _v, _case] = _a
            _VTX_B_MC[0, _s, _v, _case] = _b


def _pack_emit_tables(va: np.ndarray, vb: np.ndarray, valid: np.ndarray,
                      deltas: np.ndarray) -> np.ndarray:
    """ONE int32 word per (group, tri-slot, case) holding everything
    the emit pass needs — gather rates on this TPU are descriptor
    -bound, so the emit loop's per-cell cost is set by its LOOKUP
    COUNT, not its arithmetic. Word layout:

      bits [6v .. 6v+2]   per vertex v: canonical-edge min corner
                          (emin = min(a, b) componentwise) as 3
                          axis bits;
      bits [6v+3 .. 6v+5] per vertex v: edge slot id (the index of
                          |a-b| in the algorithm's delta table);
      bit 18              triangle valid for this case.
    """
    G, S, _, C = va.shape
    packed = np.zeros((G, S, C), np.int32)
    offs = _CORNER_OFFSETS.astype(np.int32)          # [8, 3]
    for g in range(G):
        for s in range(S):
            for c in range(C):
                if not valid[g, s, c]:
                    continue
                w = 1 << 18
                for v in range(3):
                    a = offs[va[g, s, v, c]]
                    b = offs[vb[g, s, v, c]]
                    em = np.minimum(a, b)
                    slot = _slot_of_delta(np.abs(a - b), deltas)
                    bits = (int(em[0]) | int(em[1]) << 1
                            | int(em[2]) << 2 | slot << 3)
                    w |= bits << (6 * v)
                packed[g, s, c] = w
    return packed


_ALGOS = {
    "tets": dict(groups=[tuple(t) for t in _TETS], n_cases=16,
                 ptab=_pack_emit_tables(_VTX_A, _VTX_B, _TRI_VALID,
                                        _DELTAS_TETS),
                 tris_per_cell=12,
                 n_slots=len(_DELTAS_TETS), deltas=_DELTAS_TETS),
    "cubes": dict(groups=[tuple(range(8))], n_cases=256,
                  ptab=_pack_emit_tables(_VTX_A_MC, _VTX_B_MC,
                                         _TRI_VALID_MC, _DELTAS_CUBES),
                  tris_per_cell=MC_MAX_TRIS,
                  n_slots=len(_DELTAS_CUBES), deltas=_DELTAS_CUBES),
}


# ---- kernel -------------------------------------------------------------

def _cells_active(in3: jnp.ndarray) -> jnp.ndarray:
    """[X,Y,Z] bool lattice: True at base corners of straddling cells.

    Operates on the inside mask ``in3 = vol > level`` (computed ONCE by
    the caller and shared with `_points_active`): a cell straddles iff
    some corner is inside and some corner is outside — equivalent to
    the min/max-corner test but the 8 shifted stencil reads touch 1-byte
    bools instead of f32 (4x less HBM traffic at 512^3)."""
    X, Y, Z = in3.shape
    any_in = in3[:-1, :-1, :-1]
    all_in = in3[:-1, :-1, :-1]
    for dx, dy, dz in _CORNER_OFFSETS[1:]:
        blk = in3[dx:X - 1 + dx, dy:Y - 1 + dy, dz:Z - 1 + dz]
        any_in = any_in | blk
        all_in = all_in & blk
    act = any_in & jnp.logical_not(all_in)
    return jnp.pad(act, ((0, 1),) * 3)


def _pack_inside_z(vol3: jnp.ndarray, level) -> jnp.ndarray:
    """[X,Y,Z] f32 -> [X,Y,Z/32] int32 inside-mask words (bit k of word
    w = vol[x,y,32w+k] > level). ONE fused dense pass over the volume;
    the downstream stencils then run entirely in the word domain, so
    the bool inside/active/point lattices (3 x 134 MB at 512^3) are
    never materialized and every shifted stencil read touches 32x fewer
    bytes. Requires Z % 32 == 0 (guarded by the caller)."""
    X, Y, Z = vol3.shape
    b = (vol3 > level).reshape(X, Y, Z // 32, 32).astype(jnp.int32)
    sh = jnp.arange(32, dtype=jnp.int32)
    return jnp.sum(b << sh, axis=-1, dtype=jnp.int32)


def _shift_words(w: jnp.ndarray, dx: int, dy: int, dz: int) -> jnp.ndarray:
    """Word lattice of the inside mask shifted by (dx,dy,dz) in {0,1}^3,
    zero-filled past the max boundary. The z shift is a bit shift with
    carry-in from the next word (logical: arithmetic >> then clear the
    sign bit); x/y shifts are whole-word slice+pad."""
    X, Y, _ = w.shape
    if dz:
        nxt = jnp.pad(w[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
        w = ((w >> 1) & 0x7FFFFFFF) | ((nxt & 1) << 31)
    if dx:
        w = jnp.pad(w[1:], ((0, 1), (0, 0), (0, 0)))
    if dy:
        w = jnp.pad(w[:, 1:], ((0, 0), (0, 1), (0, 0)))
    return w


def _zero_max_planes_words(w: jnp.ndarray, ax: bool = True, ay: bool = True,
                           az: bool = True) -> jnp.ndarray:
    """Clear the requested max-coordinate planes of a word lattice (the
    padded-with-False planes of the bool stencils)."""
    X, Y, Wz = w.shape
    if az:
        zb = np.full((Wz,), -1, np.int32)
        zb[-1] = 0x7FFFFFFF
        w = w & jnp.asarray(zb)[None, None, :]
    if ax:
        w = jnp.pad(w[:X - 1], ((0, 1), (0, 0), (0, 0)))
    if ay:
        w = jnp.pad(w[:, :Y - 1], ((0, 0), (0, 1), (0, 0)))
    return w


def _cells_active_words(w: jnp.ndarray) -> jnp.ndarray:
    """`_cells_active` in the packed word domain: bit-parallel over 32
    z-entries per op, no bool lattice materialized."""
    anyw = w
    allw = w
    for dx, dy, dz in _CORNER_OFFSETS[1:]:
        s = _shift_words(w, dx, dy, dz)
        anyw = anyw | s
        allw = allw & s
    return _zero_max_planes_words(anyw & ~allw)


def _points_active_words(w: jnp.ndarray, deltas: np.ndarray) -> jnp.ndarray:
    """`_points_active` in the packed word domain."""
    out = jnp.zeros_like(w)
    for dx, dy, dz in deltas:
        x = w ^ _shift_words(w, dx, dy, dz)
        out = out | _zero_max_planes_words(x, bool(dx), bool(dy), bool(dz))
    return out


def _case_lattice_words(w: jnp.ndarray) -> jnp.ndarray:
    """`_case_lattice` reading the packed word lattice: 8 shifted WORD
    reads (17 MB each at 512^3) instead of 8 bool reads (134 MB each);
    the 32-entry unpack fuses into the consumer's rank-lattice OR."""
    X, Y, Wz = w.shape
    sh = jnp.arange(32, dtype=jnp.int32)
    case = None
    for c, (dx, dy, dz) in enumerate(_CORNER_OFFSETS):
        s = _zero_max_planes_words(_shift_words(w, int(dx), int(dy),
                                                int(dz)))
        t = ((s[..., None] >> sh) & 1) << c
        case = t if case is None else case | t
    return case.reshape(X, Y, Wz * 32)


def _spread16(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 16 bits of each int32 to the even bit positions
    (bit j -> bit 2j) — the standard interleave shift-mask chain."""
    x = x & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _interleave_pair_words(aw: jnp.ndarray, pw: jnp.ndarray) -> jnp.ndarray:
    """Convert two z-packed word lattices (bit k = entry 32w+k) into the
    `_pack_pair` layout (2 bits per entry, 16 entries per word: bit 2j =
    lattice A, bit 2j+1 = lattice P) via bit interleave — elementwise,
    so the stencil -> compaction handoff never leaves the word domain.
    Output is bit-identical to `_pack_pair(a_bools, p_bools)`."""
    a = aw.reshape(-1)
    p = pw.reshape(-1)
    lo = _spread16(a) | (_spread16(p) << 1)
    hi = _spread16((a >> 16) & 0xFFFF) | (_spread16((p >> 16) & 0xFFFF) << 1)
    return jnp.stack([lo, hi], axis=-1).reshape(-1)


def _case_lattice(in3: jnp.ndarray) -> jnp.ndarray:
    """[X,Y,Z] int32: the 8-bit cell sign code at each cell's BASE
    corner (bit c = inside-mask at ring-order corner _CORNER_OFFSETS[c];
    zero on the max planes). One dense stencil pass; the emit loop then
    reads the whole case from the base corner's rank-lattice gather
    instead of gathering 8 volume values per cell."""
    X, Y, Z = in3.shape
    case = jnp.zeros((X - 1, Y - 1, Z - 1), jnp.int32)
    for c, (dx, dy, dz) in enumerate(_CORNER_OFFSETS):
        case = case | (in3[dx:X - 1 + dx, dy:Y - 1 + dy,
                           dz:Z - 1 + dz].astype(jnp.int32) << c)
    return jnp.pad(case, ((0, 1),) * 3)


def _points_active(in3: jnp.ndarray, deltas: np.ndarray) -> jnp.ndarray:
    """[X,Y,Z] bool lattice: True where the point is the min corner of
    at least one level-crossing edge of the algorithm's delta set —
    the canonical-vertex owners the weld enumerates."""
    X, Y, Z = in3.shape
    out = jnp.zeros_like(in3)
    for dx, dy, dz in deltas:
        a = in3[:X - dx, :Y - dy, :Z - dz]
        b = in3[dx:, dy:, dz:]
        out = out | jnp.pad(a ^ b, ((0, dx), (0, dy), (0, dz)))
    return out


def _compact_capped(flags_flat: jnp.ndarray, cap: int):
    """Ordered indices of set flags into a [cap+1] buffer (+count).

    TPU random accesses are descriptor-bound (~9-14 ns each), so the
    naive full-lattice cumsum+scatter (134M attempts at 512^3:
    measured 620 ms) is replaced by the evaluator's hierarchical
    compaction: an `any` block reduce, a block-id scatter over L^3/64
    elements, then point gathers/scatters only over the points of
    dirty blocks — in groups of _MC_GROUP_BLOCKS so a lightly-dirty
    lattice pays for the blocks it has, not a fixed monolith.
    """
    n_flat = flags_flat.shape[0]
    L = round(n_flat ** (1 / 3))
    if L ** 3 != n_flat or L % 4 != 0:
        n = jnp.sum(flags_flat.astype(jnp.int32))
        pos = jnp.cumsum(flags_flat.astype(jnp.int32)) - 1
        tgt = jnp.where(flags_flat & (pos < cap), pos, cap)
        out = jnp.zeros((cap + 1,), jnp.int32).at[tgt].set(
            jnp.arange(n_flat, dtype=jnp.int32), mode="drop")
        return out, n

    blk_compact, nb = _block_summary(flags_flat, L, 4, _MC_GROUP_BLOCKS)
    out0 = jnp.zeros((cap + 1,), jnp.int32)
    S = _MC_GROUP_BLOCKS * 64

    def body(carry):
        out, n, g = carry
        comp_g, na_g = _group_compact(flags_flat, blk_compact,
                                      g * _MC_GROUP_BLOCKS, nb, L, 4,
                                      _MC_GROUP_BLOCKS, S)
        idx = jnp.arange(S, dtype=jnp.int32)
        tgt = jnp.where((idx < na_g) & (n + idx < cap), n + idx, cap)
        out = out.at[tgt].set(comp_g[:S], mode="drop")
        return out, n + na_g, g + 1

    out, n, _ = lax.while_loop(
        lambda ca: ca[2] * _MC_GROUP_BLOCKS < nb, body,
        (out0, jnp.int32(0), jnp.int32(0)))
    return out, n


def _pack_pair(a_flat: jnp.ndarray, p_flat: jnp.ndarray) -> jnp.ndarray:
    """Bit-pack TWO bool lattices into one int32 word lattice: entry
    ``i`` occupies bits (2*(i%16), 2*(i%16)+1) of word ``i//16`` —
    bit 0 is lattice A (active cells), bit 1 is lattice P (crossing
    points). One dense elementwise pass (XLA fuses the shift+reduce);
    downstream group compaction then gathers ONE word per 4-point
    lattice row instead of 8 per-point bool gathers (2 lattices x 4),
    and the block summary reads 33 MB of words instead of 2x134 MB of
    bools at 512^3. Requires len % 16 == 0 (guarded by the caller)."""
    e = a_flat.astype(jnp.int32) | (p_flat.astype(jnp.int32) << 1)
    shifts = (jnp.arange(16, dtype=jnp.int32) * 2)[None, :]
    return jnp.sum(e.reshape(-1, 16) << shifts, axis=1,
                   dtype=jnp.int32)


def _block_summary_pair_packed(words: jnp.ndarray, dims: Tuple[int, ...],
                               group_blocks: int):
    """`_block_summary` of the UNION lattice, reading the packed word
    lattice from `_pack_pair` (block edge fixed at 4: each word holds
    four 4-entry k-runs, one byte each). Cube lattices compact dirty
    -block ids with the evaluator's `_compact_block_ids` (3-level above
    2^18 blocks: the 2M-attempt block scatter at 512^3 goes away);
    rectangular lattices (the sharded extractor's slabs) use the 1-D
    packed two-level compaction."""
    X, Y, Z = dims
    w3 = words.reshape(X, Y, Z // 16)
    jj = (jnp.arange(4, dtype=jnp.int32) * 8)[None, None, None, :]
    run_any = ((w3[:, :, :, None] >> jj) & 0xFF) != 0   # [X, Y, Z/16, 4]
    blk = (run_any.reshape(X // 4, 4, Y // 4, 4, Z // 4)).any(axis=(1, 3))
    if X == Y == Z:
        return _compact_block_ids(blk.reshape(-1), X // 4, group_blocks)
    nb3 = (X // 4) * (Y // 4) * (Z // 4)
    return _compact_flags_1d(blk.reshape(-1), nb3 + group_blocks)


def _group_compact2_packed(words, blk_compact, g0, nb, dims,
                           group_blocks: int, out_len: int):
    """`_group_compact2` reading the packed pair lattice: per block,
    16 word gathers (one per (i, j) row, covering both lattices' four
    k-flags) instead of 128 per-point bool gathers — the compaction is
    gather-DESCRIPTOR-bound, so this is the 8x lever. A 4-aligned
    k-run never straddles a 16-entry word (Z % 4 == 0), so each row is
    one word. Output order matches `_group_compact2` exactly (row-major
    (ti, tj, tk) within block, blocks in summary order)."""
    X, Y, Z = dims
    Lby = Y // 4
    Lbz = Z // 4
    m = g0 + jnp.arange(group_blocks, dtype=jnp.int32)
    valid_m = m < nb
    b = blk_compact[m]
    bk = b % Lbz
    bj = (b // Lbz) % Lby
    bi = b // (Lbz * Lby)
    r = jnp.arange(16, dtype=jnp.int32)
    li = bi[:, None] * 4 + (r // 4)[None, :]          # [Mg, 16]
    lj = bj[:, None] * 4 + (r % 4)[None, :]
    rowbase = (li * Y + lj) * Z + (bk * 4)[:, None]   # [Mg, 16]
    w = words[rowbase >> 4]                           # the gather
    byte = (w >> ((rowbase & 15) * 2)) & 0xFF         # 4 entries x 2 b
    jj = jnp.arange(4, dtype=jnp.int32)[None, None, :]
    gidx = (rowbase[:, :, None] + jj).reshape(-1)
    vm = valid_m[:, None, None]
    out = []
    for shift in (0, 1):
        flags = ((((byte[:, :, None] >> (2 * jj + shift)) & 1) == 1)
                 & vm).reshape(-1)
        n = jnp.sum(flags.astype(jnp.int32))
        pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
        target = jnp.where(flags, pos, out_len)
        out.append(jnp.zeros((out_len,), jnp.int32).at[target].set(
            gidx, mode="drop"))
        out.append(n)
    return tuple(out)


def _group_compact2(a_flat, p_flat, blk_compact, g0, nb, L: int,
                    block: int, group_blocks: int, out_len: int):
    """_group_compact for TWO flag lattices sharing one dirty-block
    list: the candidate index math and block gather run once, each
    lattice keeps its own rank/scatter. Returns (ca, na, cp, np)."""
    Lb = L // block
    B3 = block ** 3
    m = g0 + jnp.arange(group_blocks, dtype=jnp.int32)
    valid_m = m < nb
    b = blk_compact[m]
    bk = b % Lb
    bj = (b // Lb) % Lb
    bi = b // (Lb * Lb)
    t = jnp.arange(B3, dtype=jnp.int32)
    tk = t % block
    tj = (t // block) % block
    ti = t // (block * block)
    li = bi[:, None] * block + ti[None, :]
    lj = bj[:, None] * block + tj[None, :]
    lk = bk[:, None] * block + tk[None, :]
    gidx = ((li * L + lj) * L + lk).reshape(-1)
    vm = jnp.repeat(valid_m, B3)
    out = []
    for flat in (a_flat, p_flat):
        flags = flat[gidx] & vm
        n = jnp.sum(flags.astype(jnp.int32))
        pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
        target = jnp.where(flags, pos, out_len)
        out.append(jnp.zeros((out_len,), jnp.int32).at[target].set(
            gidx, mode="drop"))
        out.append(n)
    return tuple(out)


def _pair_compact_loop(group_fn, nb, cap_a: int, cap_p: int):
    """Shared two-level pair-compaction driver: streams dirty-block
    groups through ``group_fn(g0) -> (ca, na_g, cp, np_g)`` and appends
    each group's S-element compactions contiguously
    (dynamic_update_slice, not a second full element scatter). Returns
    ((compact_a, n_a), (compact_p, n_p)); buffers are [cap + group]
    long with garbage past the count (consumers mask by count; overflow
    triggers the caller's recount-and-rerun)."""
    G = _MC_GROUP_BLOCKS
    S = G * 64
    outa0 = jnp.zeros((cap_a + S,), jnp.int32)
    outp0 = jnp.zeros((cap_p + S,), jnp.int32)

    def body(carry):
        outa, na, outp, npt, g = carry
        ca, na_g, cp, np_g = group_fn(g * G)
        outa = lax.dynamic_update_slice(outa, ca[:S],
                                        (jnp.minimum(na, cap_a),))
        outp = lax.dynamic_update_slice(outp, cp[:S],
                                        (jnp.minimum(npt, cap_p),))
        return outa, na + na_g, outp, npt + np_g, g + 1

    outa, na, outp, npt, _ = lax.while_loop(
        lambda ca: ca[4] * G < nb, body,
        (outa0, jnp.int32(0), outp0, jnp.int32(0), jnp.int32(0)))
    return (outa, na), (outp, npt)


def _compact_pair_from_words(words, dims: Tuple[int, ...], cap_a: int,
                             cap_p: int):
    """The packed-pair compaction core: active cells (bit 0) and
    crossing points (bit 1) of a `_pack_pair`-layout word lattice over
    ONE shared dirty-block structure. Supports rectangular dims (the
    sharded extractor's slabs) — every edge must be a multiple of 4,
    Z of 16. See ``_pair_compact_loop`` for the output contract."""
    G = _MC_GROUP_BLOCKS
    S = G * 64
    blk_compact, nb = _block_summary_pair_packed(words, dims, G)
    return _pair_compact_loop(
        lambda g0: _group_compact2_packed(words, blk_compact, g0, nb,
                                          dims, G, S),
        nb, cap_a, cap_p)


def _compact_capped_pair(act_flat, pt_flat, cap_a: int, cap_p: int):
    """Compact the active-cell AND crossing-point lattices over ONE
    shared dirty-block structure (their dirty blocks nearly coincide:
    every crossing edge's min corner is a corner of an active cell).
    One block summary instead of two, and one set of candidate index
    math per group. See ``_pair_compact_loop`` for the output
    contract."""
    n_flat = act_flat.shape[0]
    L = round(n_flat ** (1 / 3))
    if L ** 3 != n_flat or L % 4 != 0:
        return (_compact_capped(act_flat, cap_a),
                _compact_capped(pt_flat, cap_p))
    if L % 16 == 0 and n_flat % 16 == 0:
        return _compact_pair_from_words(_pack_pair(act_flat, pt_flat),
                                        (L, L, L), cap_a, cap_p)
    G = _MC_GROUP_BLOCKS
    S = G * 64
    blk_compact, nb = _block_summary(act_flat | pt_flat, L, 4, G)
    return _pair_compact_loop(
        lambda g0: _group_compact2(act_flat, pt_flat, blk_compact, g0,
                                   nb, L, 4, G, S),
        nb, cap_a, cap_p)


def _emit_cells(vol_flat, cell_gids, cell_valid, rankp_lat, level,
                dims: Tuple[int, int, int], max_pts: int,
                algo: str = "tets", fold_case: bool = False):
    """Per-chunk triangle emission, fully 1-D.

    cell_gids [K] flat base-corner ids (garbage where ~cell_valid).
    Returns (vid0, vid1, vid2, valid — each [tris_per_cell * K],
    group-major then cell). Only face VERTEX IDS are emitted: the
    canonical id of an edge is ``slot * max_pts + rank(min corner)``
    where rank comes from the crossing-point lattice — presence and
    the interpolation parameter are recomputed in the finalize pass.

    Gather budget (the cost driver): 8 point-rank gathers per cell
    (corner-major [8, K] rows), then ONE packed-table lookup per
    (group, tri-slot); min-corner ranks come from the pre-gathered
    rankp8T rows via 3-bit select chains. When ``fold_case`` the
    rank lattice carries the dense 8-bit cell sign code in bits 24-31
    (`_case_lattice`), so the base corner's rank gather delivers the
    whole case and the 8 volume gathers per cell disappear; otherwise
    (max_pts >= 2^24: no free rank bits) the volume is gathered.
    """
    X, Y, Z = dims
    bz = cell_gids % Z
    by = (cell_gids // Z) % Y
    bx = cell_gids // (Y * Z)

    offx = jnp.asarray(_OFFX)
    offy = jnp.asarray(_OFFY)
    offz = jnp.asarray(_OFFZ)
    cgx = bx[None, :] + offx[:, None]
    cgy = by[None, :] + offy[:, None]
    cgz = bz[None, :] + offz[:, None]
    gid8 = (cgx * Y + cgy) * Z + cgz
    rankp8T = rankp_lat[gid8]                              # [8, K]
    if fold_case:
        code8 = (rankp8T[0] >> 24) & 0xFF                  # [K]
        in8 = [(code8 >> c) & 1 for c in range(8)]
        rankp8T = rankp8T & 0xFFFFFF
    else:
        val8T = vol_flat[gid8]                             # [8, K]
        in8 = (val8T > level).astype(jnp.int32)

    def sel8(rows, ox, oy, oz):
        """rows[corner_id(ox, oy, oz)] per element, where corner ids
        follow _CORNER_OFFSETS' ring order ((0,0,0), (1,0,0), (1,1,0),
        (0,1,0), then the same ring at z=1), via a select chain."""
        ring0 = jnp.where(oz == 1, rows[4], rows[0])   # (0, 0)
        ring1 = jnp.where(oz == 1, rows[5], rows[1])   # (1, 0)
        ring2 = jnp.where(oz == 1, rows[6], rows[2])   # (1, 1)
        ring3 = jnp.where(oz == 1, rows[7], rows[3])   # (0, 1)
        row_y0 = jnp.where(ox == 1, ring1, ring0)
        row_y1 = jnp.where(ox == 1, ring2, ring3)
        return jnp.where(oy == 1, row_y1, row_y0)

    spec = _ALGOS[algo]
    ptab = spec["ptab"]
    vids, valids = [[], [], []], []
    for g_i, corners in enumerate(spec["groups"]):
        case = sum(in8[c] << j for j, c in enumerate(corners))     # [K]
        for s_i in range(ptab.shape[1]):
            packed = jnp.asarray(ptab[g_i, s_i])[case]             # [K]
            valids.append(((packed >> 18) & 1).astype(bool)
                          & cell_valid)
            for v_i in range(3):
                w = packed >> (6 * v_i)
                emx = w & 1          # emin corner bits
                emy = (w >> 1) & 1
                emz = (w >> 2) & 1
                slot = (w >> 3) & 7  # delta-table slot id
                rank = sel8(rankp8T, emx, emy, emz)
                vids[v_i].append(slot * max_pts + rank)
    valid = jnp.concatenate(valids)               # [tris_per_cell * K]
    out = [jnp.concatenate(vids[v]) for v in range(3)]
    return (*out, valid)


@functools.partial(jax.jit, static_argnames=(
    "dims", "max_cells", "max_pts", "max_tris", "max_verts",
    "cell_chunk", "algo"))
def _march_core(vol_flat, level, dims, max_cells: int, max_pts: int,
                max_tris: int, max_verts: int, cell_chunk: int,
                algo: str = "tets", x_act_limit=None, x_pt_limit=None,
                x_edge_limit=None):
    """``x_act_limit``/``x_pt_limit`` (optional traced scalars): zero
    the active-cell / crossing-point stencils at x planes >= the limit
    — the slab-ownership masks of the sharded extractor
    (parallel/sharded_mc.py). ``x_edge_limit``: max base plane (excl.)
    for dx-carrying edges in the weld finalize — the last slab's
    duplicated halo would otherwise register phantom diagonal-edge
    crossings (mixed deltas shift in y/z, so duplicate-plane values DO
    differ). None = single-device defaults."""
    X, Y, Z = dims
    XYZ = X * Y * Z
    level = jnp.float32(level)
    vol3 = vol_flat.reshape(X, Y, Z)
    spec = _ALGOS[algo]
    n_slots = spec["n_slots"]
    deltas = spec["deltas"]
    xi = jnp.arange(X, dtype=jnp.int32)[:, None, None]

    # Stencil phase: in the word domain when the lattice allows it (one
    # fused pass packs the inside mask along z; stencils, the pair
    # layout and the case lattice all read 32x fewer bytes and no bool
    # lattice is ever materialized), else the bool-lattice path.
    words_path = X % 4 == 0 and Y % 4 == 0 and Z % 32 == 0
    if words_path:
        wlat = _pack_inside_z(vol3, level)
        aw = _cells_active_words(wlat)
        pw = _points_active_words(wlat, deltas)
        if x_act_limit is not None:
            aw = jnp.where(xi < x_act_limit, aw, 0)
        if x_pt_limit is not None:
            pw = jnp.where(xi < x_pt_limit, pw, 0)
        pair_words = _interleave_pair_words(aw, pw)
        (compact, n_cells), (compact_p, n_pts) = _compact_pair_from_words(
            pair_words, (X, Y, Z), max_cells, max_pts)
    else:
        in3 = vol3 > level      # ONE f32 pass; both stencils read bools
        act3 = _cells_active(in3)
        pt3 = _points_active(in3, deltas)
        if x_act_limit is not None:
            act3 = act3 & (xi < x_act_limit)
        if x_pt_limit is not None:
            pt3 = pt3 & (xi < x_pt_limit)
        (compact, n_cells), (compact_p, n_pts) = _compact_capped_pair(
            act3.reshape(-1), pt3.reshape(-1), max_cells, max_pts)

    # point-rank lattice: rankp_lat[crossing-point gid] = compact rank;
    # with free upper bits (every production max_pts) the dense 8-bit
    # cell sign code rides in bits 24-31 so the emit loop's base-corner
    # rank gather replaces its 8 per-cell volume gathers
    fold_case = max_pts < (1 << 24)
    mp_ = jnp.arange(max_pts, dtype=jnp.int32)
    ptgt = jnp.where(mp_ < jnp.minimum(n_pts, max_pts),
                     compact_p[:max_pts], XYZ)
    if fold_case:
        # scatter-ADD the ranks straight onto the case-initialized
        # lattice (ranks < 2^24 never carry into the case bits) — one
        # dense XYZ pass fewer than scatter-then-OR
        case = (_case_lattice_words(wlat) if words_path
                else _case_lattice(in3))
        rankp_lat = (case.reshape(-1) << 24).at[ptgt].add(
            mp_, mode="drop")
    else:
        rankp_lat = jnp.zeros((XYZ,), jnp.int32).at[ptgt].set(
            mp_, mode="drop")

    n_vid = n_slots * max_pts
    # emit-time packing: when every vid fits 21 bits (cubes always —
    # max_pts is capped at 2^21/3; tets at small-to-mid capacities) the
    # emit loop packs the 3 vid streams into 2 words with the wire-
    # format bit layout, so each chunk pays 2 max_tris-domain scatters
    # instead of 3 and the loop carries one buffer fewer. max_pts is
    # static, so this is a trace-time branch, not a dual runtime path.
    pack_emit = n_vid <= (1 << 21)
    n_bufs = 2 if pack_emit else 3
    fbuf0 = tuple(jnp.zeros((max_tris + 1,), jnp.int32)
                  for _ in range(n_bufs))

    na = jnp.minimum(n_cells, max_cells)
    num_chunks = (na + cell_chunk - 1) // cell_chunk

    def body(carry):
        *fbufs, n_tris, c = carry
        idx = c * cell_chunk + jnp.arange(cell_chunk, dtype=jnp.int32)
        cell_valid = idx < na
        gids = compact[jnp.minimum(idx, max_cells)]
        v0, v1, v2, valid = _emit_cells(
            vol_flat, gids, cell_valid, rankp_lat, level, dims,
            max_pts, algo, fold_case=fold_case)
        streams = ((v0 | (v1 << 21), (v1 >> 11) | (v2 << 10))
                   if pack_emit else (v0, v1, v2))
        # compact this chunk's triangles into the global buffers
        pos = n_tris + jnp.cumsum(valid.astype(jnp.int32)) - 1
        ftgt = jnp.where(valid & (pos < max_tris), pos, max_tris)
        fbufs = [f.at[ftgt].set(s, mode="drop")
                 for f, s in zip(fbufs, streams)]
        n_tris = n_tris + jnp.sum(valid.astype(jnp.int32))
        return (*fbufs, n_tris, c + 1)

    *fbufs, n_tris, _ = lax.while_loop(
        lambda ca: ca[n_bufs + 1] < num_chunks, body,
        fbuf0 + (jnp.int32(0), jnp.int32(0)))
    if pack_emit:
        e0, e1 = fbufs[0][:max_tris], fbufs[1][:max_tris]
        f0 = e0 & 0x1FFFFF
        f1 = ((e0 >> 21) & 0x7FF) | ((e1 & 0x3FF) << 11)
        f2 = (e1 >> 10) & 0x1FFFFF
    else:
        f0, f1, f2 = (b[:max_tris] for b in fbufs)

    # ---- vertex presence, weld index and position — SLOT-MAJOR and
    # dense over the compacted crossing points: per slot, one gather of
    # the far-end value; the canonical edge (p, delta_s) carries a
    # vertex iff its endpoints straddle the level ----
    gidp = compact_p[:max_pts]
    pz = gidp % Z
    py = (gidp // Z) % Y
    px = gidp // (Y * Z)
    v0p = vol_flat[gidp]
    in0p = v0p > level
    pok = mp_ < jnp.minimum(n_pts, max_pts)
    pres_parts, tq_parts = [], []
    xeb = X - 1 if x_edge_limit is None else x_edge_limit
    for dx, dy, dz in deltas:
        step = (dx * Y + dy) * Z + dz
        inb = pok
        if dx:
            inb = inb & (px < xeb)
        if dy:
            inb = inb & (py < Y - 1)
        if dz:
            inb = inb & (pz < Z - 1)
        vhi = vol_flat[jnp.where(inb, gidp + step, 0)]
        pres_parts.append(((vhi > level) != in0p) & inb)
        denom = vhi - v0p
        denom = jnp.where(jnp.abs(denom) < 1e-12, jnp.float32(1e-12),
                          denom)
        tq_parts.append(jnp.clip((level - v0p) / denom, 0.0, 1.0))
    present = jnp.concatenate(pres_parts)          # [n_slots * max_pts]
    tq = jnp.concatenate(tq_parts)

    n_verts = jnp.sum(present.astype(jnp.int32))
    vpos = jnp.cumsum(present.astype(jnp.int32)) - 1
    remap = jnp.where(present, vpos, -1)
    vtgt = jnp.where(present & (vpos < max_verts), vpos, max_verts)
    # compact wire format: (canonical vertex id, t) per packed vertex —
    # 8 B/vertex instead of 12, decoded EXACTLY on the host (the f32
    # position formula is replayed bit-identically from (vid, t))
    vid_of = jnp.zeros((max_verts + 1,), jnp.int32).at[vtgt].set(
        jnp.arange(n_vid, dtype=jnp.int32), mode="drop")[:max_verts]
    t_of = jnp.zeros((max_verts + 1,), jnp.float32).at[vtgt].set(
        tq, mode="drop")[:max_verts]

    # ---- face remap + degenerate drop, bit-packed 3x21 -> 2 words ----
    nt = jnp.minimum(n_tris, max_tris)
    g0 = remap[jnp.minimum(f0, n_vid - 1)]
    g1 = remap[jnp.minimum(f1, n_vid - 1)]
    g2 = remap[jnp.minimum(f2, n_vid - 1)]
    tri_ok = ((jnp.arange(max_tris) < nt)
              & (g0 != g1) & (g1 != g2) & (g0 != g2))
    fpos = jnp.cumsum(tri_ok.astype(jnp.int32)) - 1
    ftgt = jnp.where(tri_ok, fpos, max_tris)
    w0 = g0 | (g1 << 21)
    w1 = (g1 >> 11) | (g2 << 10)
    faces_out = [jnp.zeros((max_tris + 1,), jnp.int32)
                 .at[ftgt].set(w, mode="drop")[:max_tris]
                 for w in (w0, w1)]
    n_faces = jnp.sum(tri_ok.astype(jnp.int32))

    return (vid_of, t_of, faces_out[0], faces_out[1], compact_p,
            n_verts, n_faces, n_cells, n_tris, n_pts)


def _bucket(n: int, quantum: int = 1 << 16) -> int:
    return max(quantum, ((n + quantum - 1) // quantum) * quantum)


def unpack_wire_faces(w0h: np.ndarray, w1h: np.ndarray) -> np.ndarray:
    """Host decode of the packed face wire format (3 x 21-bit vertex
    indices in two uint32 words) -> [F, 3] int64. The single inverse of
    `_march_core`'s packing, shared by the single-device finish() and
    the sharded merge (parallel/sharded_mc.py)."""
    f0 = (w0h & 0x1FFFFF).astype(np.int64)
    f1 = ((w0h >> 21) | ((w1h & 0x3FF) << 11)).astype(np.int64)
    f2 = ((w1h >> 10) & 0x1FFFFF).astype(np.int64)
    return np.stack([f0, f1, f2], axis=1)


def replay_wire_vertices(gid: np.ndarray, slot: np.ndarray,
                         t: np.ndarray, deltas: np.ndarray,
                         Y: int, Z: int) -> np.ndarray:
    """Host decode of the vertex wire format: replay ``lo + t * delta``
    in f32, bit-identical to the device interpolation formula. ``gid``
    are flat lattice ids with (Y*Z, Z, 1) strides."""
    lo = np.stack([gid // (Y * Z), (gid // Z) % Y, gid % Z],
                  axis=1).astype(np.float32)
    return lo + t[:, None].astype(np.float32) \
        * deltas[slot].astype(np.float32)


# last (cell, point, tris) buckets that fit a given volume shape: lets
# repeat extractions skip the count program + its host sync and go
# straight to the core (speculative; a miss falls back to recount +
# rerun). The tris bucket carries 25% headroom so nearby surfaces of
# the same subject family reuse the compiled core.
_LAST_CELL_BUCKET: Dict = {}


@functools.partial(jax.jit, static_argnames=("dims", "algo"))
def _count_cells(vol_flat, level, dims, algo: str = "tets",
                 x_act_limit=None, x_pt_limit=None):
    X, Y, Z = dims
    deltas = _ALGOS[algo]["deltas"]
    xi = jnp.arange(X, dtype=jnp.int32)[:, None, None]
    if Z % 32 == 0:
        w = _pack_inside_z(vol_flat.reshape(X, Y, Z), jnp.float32(level))
        aw = _cells_active_words(w)
        pw = _points_active_words(w, deltas)
        if x_act_limit is not None:
            aw = jnp.where(xi < x_act_limit, aw, 0)
        if x_pt_limit is not None:
            pw = jnp.where(xi < x_pt_limit, pw, 0)
        return (jnp.sum(lax.population_count(aw)),
                jnp.sum(lax.population_count(pw)))
    in3 = vol_flat.reshape(X, Y, Z) > jnp.float32(level)
    act = _cells_active(in3)
    pts = _points_active(in3, deltas)
    if x_act_limit is not None:
        act = act & (xi < x_act_limit)
    if x_pt_limit is not None:
        pts = pts & (xi < x_pt_limit)
    return (jnp.sum(act.astype(jnp.int32)),
            jnp.sum(pts.astype(jnp.int32)))


def marching_tetrahedra_device_begin(volume, level: float = 0.5,
                                     max_cells: int = 1 << 21,
                                     max_tris: int = 6 << 20,
                                     max_verts: int = 2 << 20,
                                     cell_chunk: int = 1 << 16,
                                     algorithm: str = "tets",
                                     max_pts: int = None,
                                     bucket_tag: str = "",
                                     defer_sync: bool = False):
    """Start a device extraction; returns ``finish() -> (verts, faces)``.

    The device->host copies are started asynchronously, so the caller
    can launch the NEXT extraction (or any other device work) while
    this mesh streams back over the (slow) host link — the
    reconstruction pipeline overlaps the LR mesh's compute with the HR
    mesh's transfer this way. The wire format is 8 B/vertex
    (canonical edge id + t, position replayed bit-exactly on the host)
    and 8 B/face (3 x 21-bit indices in two words) — a third less
    traffic than raw f32/i32 triples.

    ``bucket_tag`` keys the speculative-bucket cache: callers that
    alternate between systematically different surfaces at the same
    shape (the HR/LR pair of extract_pair) pass distinct tags so the
    smaller mesh's cached buckets don't force a recount-and-rerun of
    the larger one on every call.

    ``defer_sync=True`` returns ``resolve() -> finish`` instead: the
    extraction core is dispatched immediately, but the counts fetch (a
    host<->device round trip that would serialize back-to-back
    extractions) is postponed until ``resolve()``. extract_pair uses
    this to enqueue the HR and LR cores with no sync in between, so
    the device runs them as one pipelined stream.
    """
    if max_verts > (1 << 21):
        raise ValueError("packed faces hold 21-bit vertex indices: "
                         "max_verts must be <= 2^21")
    if max_pts is None:
        max_pts = max_cells
    vol = jnp.asarray(volume, jnp.float32)
    X, Y, Z = vol.shape
    spec = _ALGOS[algorithm]
    tpc = spec["tris_per_cell"]
    ns = spec["n_slots"]
    deltas = spec["deltas"]
    bkey = (X, Y, Z, max_cells, algorithm, bucket_tag)
    buckets = _LAST_CELL_BUCKET.get(bkey)
    if buckets is None:
        nc0, np0 = map(int, jax.device_get(_count_cells(
            vol.reshape(-1), float(level), (X, Y, Z), algorithm)))
        if nc0 > max_cells:
            raise ValueError(
                f"marching_tetrahedra_device capacity exceeded: cells "
                f"{nc0}/{max_cells}")
        if np0 > max_pts:
            raise ValueError(
                f"marching_tetrahedra_device capacity exceeded: "
                f"crossing points {np0}/{max_pts}")
        buckets = (min(max_cells, _bucket(max(nc0, 1), 1 << 15)),
                   min(max_pts, _bucket(max(np0, 1), 1 << 15)),
                   None)

    def enqueue(buckets):
        bc, bp, bt = buckets
        mc = min(max_cells, bc)
        mp = min(max_pts, bp)
        # a cell emits <= tris_per_cell triangles; the tris bucket from
        # the previous run (25% headroom) usually beats that bound 3x
        mt = min(max_tris, tpc * mc if bt is None else bt)
        mv = min(max_verts, ns * mp)
        out = _march_core(vol.reshape(-1), float(level), (X, Y, Z),
                          mc, mp, mt, mv, cell_chunk, algorithm)
        return out, mc, mp, mt, mv

    # the core is DISPATCHED here; the counts fetch (a device sync)
    # happens in resolve(), so a deferred caller can enqueue several
    # extractions back-to-back and the device pipelines them
    pend = enqueue(buckets)

    def resolve():
        out, mc, mp, mt, mv = pend
        nv, nf, ncl, nt, npt = map(int, jax.device_get(out[5:10]))
        for attempt in range(2):
            if ncl <= mc and npt <= mp and nt <= mt and nv <= mv:
                break
            # speculative bucket miss (or true overflow): size to the
            # real counts and rerun
            if ncl > max_cells or npt > max_pts or nt > max_tris \
                    or nv > max_verts:
                raise ValueError(
                    f"marching_tetrahedra_device capacity exceeded: "
                    f"cells {ncl}/{max_cells}, pts {npt}/{max_pts}, "
                    f"tris {nt}/{max_tris}, verts {nv}/{max_verts}")
            # a clipped cell bucket undercounts triangles, so the
            # observed nt is scaled by the unprocessed-cell ratio
            # before the 25% headroom; a second miss falls back to the
            # worst-case tris_per_cell bound (bt=None)
            nt_est = nt if ncl <= mc else -(-nt * ncl // max(mc, 1))
            bt = (None if attempt == 1
                  else min(max_tris, _bucket(nt_est + (nt_est >> 2),
                                             1 << 16)))
            bks = (min(max_cells, _bucket(ncl, 1 << 15)),
                   min(max_pts, _bucket(npt, 1 << 15)), bt)
            out, mc, mp, mt, mv = enqueue(bks)
            nv, nf, ncl, nt, npt = map(int, jax.device_get(out[5:10]))
        if ncl > mc or npt > mp or nt > mt or nv > mv:
            raise ValueError(
                f"marching_tetrahedra_device capacity exceeded: cells "
                f"{ncl}/{mc}, pts {npt}/{mp}, tris {nt}/{mt}, verts "
                f"{nv}/{mv}")
        _LAST_CELL_BUCKET[bkey] = (mc, mp,
                                   min(max_tris,
                                       _bucket(nt + (nt >> 2), 1 << 16)))
        vid_of, t_of, w0, w1, compact_p = out[:5]
        # fetch in coarse buckets so the slice programs are reused
        bv = min(_bucket(nv), mv)
        bf = min(_bucket(nf), mt)
        bc = min(_bucket(npt), mp + 1)
        slices = [vid_of[:bv], t_of[:bv], w0[:bf], w1[:bf],
                  compact_p[:bc]]
        for s in slices:
            try:
                s.copy_to_host_async()
            except Exception:
                pass  # backend without async copies: finish() is sync

        def finish() -> Tuple[np.ndarray, np.ndarray]:
            vid = np.asarray(jax.device_get(slices[0]))[:nv]
            t = np.asarray(jax.device_get(slices[1]))[:nv]
            w0h = np.asarray(jax.device_get(slices[2]))[:nf] \
                .view(np.uint32)
            w1h = np.asarray(jax.device_get(slices[3]))[:nf] \
                .view(np.uint32)
            comp = np.asarray(jax.device_get(slices[4]))
            slot = vid // mp
            verts = replay_wire_vertices(comp[vid % mp], slot, t,
                                         deltas, Y, Z)
            return verts, unpack_wire_faces(w0h, w1h)

        return finish

    if defer_sync:
        return resolve
    return resolve()


def marching_tetrahedra_device(volume, level: float = 0.5,
                               max_cells: int = 1 << 21,
                               max_tris: int = 6 << 20,
                               max_verts: int = 2 << 20,
                               cell_chunk: int = 1 << 16,
                               algorithm: str = "tets",
                               max_pts: int = None
                               ) -> Tuple[np.ndarray, np.ndarray]:
    """Device marching tetrahedra; same mesh as tetra.marching_tetrahedra.

    volume: [X, Y, Z] float32 (device or host array). Returns host
    (verts [V, 3] f32 grid coords, faces [F, 3] i64). Raises if any
    static capacity overflows (increase the caps or use the host
    backend — random/noise fields activate nearly every cell).

    The weld domain scales with max_pts * n_slots (7 for tets, 3 for
    cubes), so the actual cell/point counts are measured first (one
    tiny program + scalar fetch) and the core runs at the smallest
    buckets that fit.
    """
    return marching_tetrahedra_device_begin(
        volume, level, max_cells, max_tris, max_verts, cell_chunk,
        algorithm, max_pts)()


def marching_cubes_device(volume, level: float = 0.5, **kw
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Classic marching cubes on device (constructed table,
    mc_tables.py): ~3x fewer triangles than marching tetrahedra for the
    same isosurface — the reference's skimage tessellation density."""
    return marching_tetrahedra_device(volume, level, algorithm="cubes",
                                      **kw)
