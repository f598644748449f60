"""Device marching tetrahedra == numpy marching tetrahedra.

The device extractor (recon/tetra_device.py) must produce the same
welded mesh as the host reference (recon/tetra.py) — same vertex set,
same face set, same windings — for interior surfaces, surfaces cut by
the volume boundary (exercises the clipped canonical-owner path), noise
fields (every tet case), and empty fields.
"""

import numpy as np
import pytest

from surs_tpu.recon.tetra import marching_tetrahedra as mt_host
from surs_tpu.recon.tetra_device import marching_tetrahedra_device


def canon_faces(verts, faces):
    """Faces as position-key triples, cyclically rotated so the smallest
    key is first (order-independent, winding-preserving), sorted."""
    q = np.rint(np.asarray(verts, np.float64) * 4096.0).astype(np.int64)
    out = []
    for f in np.asarray(faces):
        keys = [tuple(q[i]) for i in f]
        r = keys.index(min(keys))
        out.append(tuple(keys[r:] + keys[:r]))
    return sorted(out)


def assert_same_mesh(vh, fh, vd, fd):
    assert vh.shape == vd.shape, (vh.shape, vd.shape)
    assert fh.shape == fd.shape, (fh.shape, fd.shape)
    # identical vertex sets
    qh = sorted(map(tuple, np.rint(vh * 4096).astype(np.int64)))
    qd = sorted(map(tuple, np.rint(vd * 4096).astype(np.int64)))
    assert qh == qd
    # identical face sets with winding preserved (cyclic-normalized)
    assert canon_faces(vh, fh) == canon_faces(vd, fd)


def sphere_vol(n, center, r):
    g = np.stack(np.meshgrid(*([np.arange(n)] * 3), indexing="ij"), -1)
    d = np.sqrt(((g - np.asarray(center)) ** 2).sum(-1))
    return (0.5 + (r - d)).astype(np.float32)


def test_interior_sphere_matches_host():
    vol = sphere_vol(24, (11.5, 11.5, 11.5), 7.3)
    vh, fh = mt_host(vol, 0.5)
    vd, fd = marching_tetrahedra_device(
        vol, 0.5, max_cells=1 << 14, max_tris=1 << 16,
        max_verts=1 << 15, cell_chunk=1 << 10)
    assert fh.shape[0] > 100
    assert_same_mesh(vh, fh, vd, fd)


def test_boundary_cut_sphere_matches_host():
    """Sphere centered at a corner: surface crosses all max-planes,
    exercising the boundary-clipped canonical owner."""
    vol = sphere_vol(16, (15.0, 15.0, 15.0), 9.1)
    vh, fh = mt_host(vol, 0.5)
    vd, fd = marching_tetrahedra_device(
        vol, 0.5, max_cells=1 << 12, max_tris=1 << 15,
        max_verts=1 << 14, cell_chunk=1 << 9)
    assert fh.shape[0] > 50
    assert_same_mesh(vh, fh, vd, fd)


def test_noise_field_matches_host():
    rng = np.random.default_rng(7)
    vol = rng.random((9, 10, 11)).astype(np.float32)
    vh, fh = mt_host(vol, 0.5)
    vd, fd = marching_tetrahedra_device(
        vol, 0.5, max_cells=1 << 11, max_tris=1 << 15,
        max_verts=1 << 14, cell_chunk=1 << 8)
    assert_same_mesh(vh, fh, vd, fd)


def test_empty_field():
    vol = np.zeros((8, 8, 8), np.float32)
    vd, fd = marching_tetrahedra_device(
        vol, 0.5, max_cells=256, max_tris=256, max_verts=256,
        cell_chunk=64)
    assert vd.shape == (0, 3) and fd.shape == (0, 3)


def test_capacity_overflow_raises():
    vol = sphere_vol(16, (7.5, 7.5, 7.5), 5.0)
    with pytest.raises(ValueError, match="capacity exceeded"):
        marching_tetrahedra_device(vol, 0.5, max_cells=16,
                                   max_tris=1 << 12, max_verts=1 << 12,
                                   cell_chunk=64)


def test_marching_cubes_device_matches_host():
    """Device 'cubes' algorithm == the host classic-MC reference (same
    constructed table), interior + boundary-cut + noise fields."""
    from surs_tpu.recon.mc_tables import marching_cubes_classic
    from surs_tpu.recon.tetra_device import marching_cubes_device

    for vol in (sphere_vol(24, (11.5, 11.5, 11.5), 7.3),
                sphere_vol(16, (15.0, 15.0, 15.0), 9.1)):
        vh, fh = marching_cubes_classic(vol, 0.5)
        vd, fd = marching_cubes_device(
            vol, 0.5, max_cells=1 << 14, max_tris=1 << 16,
            max_verts=1 << 15, cell_chunk=1 << 10)
        assert fh.shape[0] > 50
        assert_same_mesh(vh, fh, vd, fd)
    rng = np.random.default_rng(11)
    vol = rng.random((9, 10, 11)).astype(np.float32)
    vh, fh = marching_cubes_classic(vol, 0.5)
    vd, fd = marching_cubes_device(
        vol, 0.5, max_cells=1 << 11, max_tris=1 << 14,
        max_verts=1 << 13, cell_chunk=1 << 8)
    assert_same_mesh(vh, fh, vd, fd)


def _plane_contour_segments(verts, faces, axis, coord):
    """Boundary contour segments of a mesh lying in the plane
    {p[axis] == coord}: triangle edges with both endpoints on the plane
    and multiplicity 1 (fan-triangulation chords in the plane appear
    twice; true open-boundary contour segments once)."""
    from collections import Counter
    q = np.rint(np.asarray(verts, np.float64) * 4096.0).astype(np.int64)
    on = np.abs(np.asarray(verts)[:, axis] - coord) < 1e-6
    cnt = Counter()
    for f in np.asarray(faces):
        for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            if on[a] and on[b]:
                cnt[frozenset((tuple(q[a]), tuple(q[b])))] += 1
    return {e for e, c in cnt.items() if c == 1}


def test_mc_ambiguous_face_rule_pinned():
    """The 4-crossing (diagonal-sign) ambiguous face: two adjacent cells
    evaluated INDEPENDENTLY must produce the identical contour on the
    shared face (crack-freeness), and that contour must follow the fixed
    'connect around positive corners' rule (mc_tables.py:76-84) — each
    segment joins the two face-edge midpoints flanking one positive
    corner. Pinned for both diagonals across varied outer corners, and
    device == host on the two-cell volume."""
    from surs_tpu.recon.mc_tables import marching_cubes_classic
    from surs_tpu.recon.tetra_device import marching_cubes_device

    # face coords (y, z); midpoints of the 4 face edges adjacent to
    # each corner
    adj_mid = {(0, 0): ((0.5, 0.0), (0.0, 0.5)),
               (1, 0): ((0.5, 0.0), (1.0, 0.5)),
               (1, 1): ((1.0, 0.5), (0.5, 1.0)),
               (0, 1): ((0.5, 1.0), (0.0, 0.5))}
    rng = np.random.default_rng(3)
    for diag in (((0, 0), (1, 1)), ((0, 1), (1, 0))):
        for trial in range(8):
            vol = np.zeros((3, 2, 2), np.float32)
            for (y, z) in diag:
                vol[1, y, z] = 1.0          # shared face: diagonal signs
            vol[0] = rng.integers(0, 2, (2, 2)).astype(np.float32)
            vol[2] = rng.integers(0, 2, (2, 2)).astype(np.float32)

            cell_a, cell_b = vol[0:2], vol[1:3]
            va, fa = marching_cubes_classic(cell_a, 0.5)
            vb, fb = marching_cubes_classic(cell_b, 0.5)
            segs_a = _plane_contour_segments(va, fa, 0, 1.0)
            # cell B's local x=0 plane is the same world plane; shift
            # its x by +1 for comparable keys
            vb_shift = np.asarray(vb).copy()
            vb_shift[:, 0] += 1.0
            segs_b = _plane_contour_segments(vb_shift, fb, 0, 1.0)
            assert segs_a == segs_b, (diag, trial)   # crack-free

            # values 0/1 at level 0.5 put face vertices exactly at edge
            # midpoints: the rule's segments are the midpoint pairs
            # around each positive corner
            expect = set()
            for c in diag:
                (my1, mz1), (my2, mz2) = adj_mid[c]
                k1 = tuple(np.rint(np.array([1.0, my1, mz1]) * 4096.0)
                           .astype(np.int64))
                k2 = tuple(np.rint(np.array([1.0, my2, mz2]) * 4096.0)
                           .astype(np.int64))
                expect.add(frozenset((k1, k2)))
            assert segs_a == expect, (diag, trial)

            # device extractor agrees on the full two-cell volume
            vh, fh = marching_cubes_classic(vol, 0.5)
            vd, fd = marching_cubes_device(
                vol, 0.5, max_cells=64, max_tris=256, max_verts=256,
                cell_chunk=64)
            assert_same_mesh(vh, fh, vd, fd)


def test_marching_cubes_density_and_watertightness():
    """~3x fewer triangles than marching tets for the same surface;
    closed fields produce watertight 2-manifold meshes with the same
    orientation convention."""
    from surs_tpu.recon.tetra_device import marching_cubes_device

    vol = sphere_vol(24, (11.5, 11.5, 11.5), 7.3)
    vt, ft = mt_host(vol, 0.5)
    vc, fc = marching_cubes_device(
        vol, 0.5, max_cells=1 << 14, max_tris=1 << 16,
        max_verts=1 << 15, cell_chunk=1 << 10)
    assert 2.5 < ft.shape[0] / fc.shape[0] < 3.6
    e = np.concatenate([fc[:, [0, 1]], fc[:, [1, 2]], fc[:, [2, 0]]])
    _, counts = np.unique(np.sort(e, 1), axis=0, return_counts=True)
    assert np.all(counts == 2)

    def signed_volume(v, f):
        t = v[f]
        return np.einsum("ij,ij->i", t[:, 0],
                         np.cross(t[:, 1], t[:, 2])).sum() / 6

    sv_t = signed_volume(vt, ft)
    sv_c = signed_volume(vc, fc)
    assert sv_t * sv_c > 0                       # same winding
    true_v = 4 / 3 * np.pi * 7.3 ** 3
    assert abs(sv_c - true_v) / true_v < 0.05


def test_speculative_bucket_miss_rerun():
    """A small mesh caches small speculative buckets; a much larger
    volume at the same (shape, caps, algorithm) key must survive the
    bucket miss. Regression: the rerun sized its triangle bucket from
    the clipped first run's UNDERCOUNTED triangle total (only cells
    that fit the stale bucket are processed) and overflowed again —
    hit in production by extract_pair (small LR mesh, then HR mesh)."""
    from surs_tpu.recon import tetra_device as td
    td._LAST_CELL_BUCKET.clear()
    try:
        n = 160
        small = sphere_vol(n, (79.5, 79.5, 79.5), 9.0)
        big = sphere_vol(n, (79.5, 79.5, 79.5), 74.0)
        marching_tetrahedra_device(small, 0.5, algorithm="cubes")
        vd, fd = marching_tetrahedra_device(big, 0.5, algorithm="cubes")
        td._LAST_CELL_BUCKET.clear()
        vf, ff = marching_tetrahedra_device(big, 0.5, algorithm="cubes")
        assert_same_mesh(vf, ff, vd, fd)
    finally:
        td._LAST_CELL_BUCKET.clear()


def test_packed_pair_compaction_matches_unpacked():
    """The bit-packed word-gather compaction (L % 16 == 0 fast path)
    must reproduce the generic per-point pair compaction EXACTLY —
    same block summary, same per-group compact arrays, same counts —
    so the packed path can never change which cells/points the
    extractor sees or their ranks."""
    import jax.numpy as jnp
    from surs_tpu.recon import tetra_device as td
    from surs_tpu.recon.evaluator import _block_summary

    rng = np.random.default_rng(3)
    L = 32
    a = jnp.asarray(rng.random((L ** 3,)) < 0.08)
    p = jnp.asarray(rng.random((L ** 3,)) < 0.12)
    G = 64          # small groups force several while-loop trips
    S = G * 64

    blk_u, nb_u = _block_summary(a | p, L, 4, G)
    words = td._pack_pair(a, p)
    blk_p, nb_p = td._block_summary_pair_packed(words, (L, L, L), G)
    assert int(nb_u) == int(nb_p)
    np.testing.assert_array_equal(np.asarray(blk_u), np.asarray(blk_p))

    for g0 in range(0, int(nb_u), G):
        ca_u, na_u, cp_u, np_u = td._group_compact2(
            a, p, blk_u, jnp.int32(g0), nb_u, L, 4, G, S)
        ca_p, na_p, cp_p, np_p = td._group_compact2_packed(
            words, blk_p, jnp.int32(g0), nb_p, (L, L, L), G, S)
        assert int(na_u) == int(na_p) and int(np_u) == int(np_p)
        np.testing.assert_array_equal(
            np.asarray(ca_u)[:int(na_u)], np.asarray(ca_p)[:int(na_p)])
        np.testing.assert_array_equal(
            np.asarray(cp_u)[:int(np_u)], np.asarray(cp_p)[:int(np_p)])

    # and the public pair entry point yields exactly the set of flags
    (ca, na), (cp, npt) = td._compact_capped_pair(
        a, p, int(np.sum(np.asarray(a))) + 64,
        int(np.sum(np.asarray(p))) + 64)
    assert int(na) == int(np.sum(np.asarray(a)))
    assert int(npt) == int(np.sum(np.asarray(p)))
    got_a = sorted(np.asarray(ca)[:int(na)].tolist())
    got_p = sorted(np.asarray(cp)[:int(npt)].tolist())
    assert got_a == np.flatnonzero(np.asarray(a)).tolist()
    assert got_p == np.flatnonzero(np.asarray(p)).tolist()


def test_sphere_32_packed_path_matches_host():
    """32^3 (L % 16 == 0): the packed word-gather compaction feeds the
    full extractor; mesh must equal the host reference. (A noise field
    at this size hits ~1e-4 of vertices whose f32 interpolation
    parameter differs from the float64 host oracle by one ulp exactly
    on a quantization boundary — smooth fields, like every other
    strict mesh test here, avoid that test artifact; the EXACT packed
    == unpacked invariant is pinned by
    test_packed_pair_compaction_matches_unpacked.)"""
    vol = sphere_vol(32, (15.2, 16.1, 14.8), 11.3)
    vh, fh = mt_host(vol, 0.5)
    vd, fd = marching_tetrahedra_device(
        vol, 0.5, max_cells=1 << 16, max_tris=1 << 19,
        max_verts=1 << 18, cell_chunk=1 << 10)
    assert fh.shape[0] > 1000
    assert_same_mesh(vh, fh, vd, fd)


def test_no_fold_case_fallback_matches_host():
    """max_pts >= 2^24 leaves no free rank-lattice bits for the folded
    cell code; the volume-gather fallback must stay correct."""
    vol = sphere_vol(16, (7.5, 7.5, 7.5), 5.2)
    vh, fh = mt_host(vol, 0.5)
    from surs_tpu.recon import tetra_device as td
    out = td._march_core(
        np.asarray(vol, np.float32).reshape(-1), 0.5, (16, 16, 16),
        max_cells=1 << 12, max_pts=1 << 24, max_tris=1 << 15,
        max_verts=1 << 14, cell_chunk=1 << 9)
    (vid_of, t_of, w0, w1, compact_p,
     n_verts, n_faces, n_cells, n_tris, n_pts) = out
    assert int(n_pts) < (1 << 24) and int(n_verts) > 100
    # decode through the public wrapper for the folded path and compare
    vd, fd = marching_tetrahedra_device(
        vol, 0.5, max_cells=1 << 12, max_tris=1 << 15,
        max_verts=1 << 14, cell_chunk=1 << 9)
    assert_same_mesh(vh, fh, vd, fd)
    # counts agree between the two paths
    assert int(n_faces) == fd.shape[0]


def test_word_domain_stencils_match_bool_lattices():
    """The packed-word stencil path (used when X == Y == Z % 32 == 0)
    must reproduce the bool-lattice stencils bit for bit: cell-active,
    point-active (both delta sets), the folded case lattice, and the
    _pack_pair compaction layout."""
    import jax.numpy as jnp
    from surs_tpu.recon import tetra_device as td

    rng = np.random.default_rng(7)
    vol = rng.normal(0.5, 0.4, (32, 32, 32)).astype(np.float32)
    vol3 = jnp.asarray(vol)
    in3 = vol3 > 0.5
    w = td._pack_inside_z(vol3, jnp.float32(0.5))

    # the pack itself round-trips
    sh = np.arange(32)
    unpacked = ((np.asarray(w)[..., None] >> sh) & 1).astype(bool)
    assert np.array_equal(unpacked.reshape(32, 32, 32), np.asarray(in3))

    act_b = np.asarray(td._cells_active(in3))
    aw = np.asarray(td._cells_active_words(w))
    assert np.array_equal(((aw[..., None] >> sh) & 1).astype(bool)
                          .reshape(32, 32, 32), act_b)

    for algo in ("tets", "cubes"):
        deltas = td._ALGOS[algo]["deltas"]
        pt_b = np.asarray(td._points_active(in3, deltas))
        pw = np.asarray(td._points_active_words(w, deltas))
        assert np.array_equal(((pw[..., None] >> sh) & 1).astype(bool)
                              .reshape(32, 32, 32), pt_b)

    case_b = np.asarray(td._case_lattice(in3))
    case_w = np.asarray(td._case_lattice_words(w))
    assert np.array_equal(case_b, case_w)

    # interleave == _pack_pair on the flat bool lattices
    deltas = td._ALGOS["cubes"]["deltas"]
    pair_ref = np.asarray(td._pack_pair(
        jnp.asarray(act_b.reshape(-1)),
        jnp.asarray(td._points_active(in3, deltas)).reshape(-1)))
    pair_w = np.asarray(td._interleave_pair_words(
        td._cells_active_words(w), td._points_active_words(w, deltas)))
    assert np.array_equal(pair_ref, pair_w)


def test_word_domain_count_cells_matches():
    """_count_cells word path == bool path on a cube lattice (the bool
    path is forced through a non-32-divisible reshape-equivalent by
    calling the stencils directly)."""
    import jax.numpy as jnp
    from surs_tpu.recon import tetra_device as td

    rng = np.random.default_rng(3)
    vol = rng.normal(0.5, 0.5, (32, 32, 32)).astype(np.float32)
    for algo in ("tets", "cubes"):
        nc, npt = map(int, td._count_cells(
            jnp.asarray(vol.reshape(-1)), 0.5, (32, 32, 32), algo))
        in3 = jnp.asarray(vol) > 0.5
        nc_ref = int(np.asarray(td._cells_active(in3)).sum())
        np_ref = int(np.asarray(
            td._points_active(in3, td._ALGOS[algo]["deltas"])).sum())
        assert (nc, npt) == (nc_ref, np_ref)


def test_rect_pair_compaction_matches_flat(monkeypatch):
    """The rectangular-lattice packed pair compaction (sharded slabs)
    must produce exactly the set of flagged cells/points, across
    several compaction groups (shrunken group constant)."""
    import jax.numpy as jnp
    from surs_tpu.recon import tetra_device as td

    monkeypatch.setattr(td, "_MC_GROUP_BLOCKS", 4)  # 4 blocks/group
    rng = np.random.default_rng(9)
    X, Y, Z = 12, 8, 32          # X%4, Y%4, Z%32 — slab-shaped
    n = X * Y * Z
    a = jnp.asarray(rng.random(n) < 0.15)
    p = jnp.asarray(rng.random(n) < 0.2)
    words = td._pack_pair(a, p)
    na_ref = int(np.asarray(a).sum())
    np_ref = int(np.asarray(p).sum())
    (ca, na), (cp, npt) = td._compact_pair_from_words(
        words, (X, Y, Z), na_ref + 16, np_ref + 16)
    assert int(na) == na_ref and int(npt) == np_ref
    assert sorted(np.asarray(ca)[:na_ref].tolist()) \
        == np.flatnonzero(np.asarray(a)).tolist()
    assert sorted(np.asarray(cp)[:np_ref].tolist()) \
        == np.flatnonzero(np.asarray(p)).tolist()


def test_emit_pack_paths_agree():
    """The packed 2-stream emit path (n_vid <= 2^21, the production
    cubes configuration) and the 3-stream fallback (large tets
    capacities) produce the same mesh as the host reference.

    Both cases call _march_core directly: the public wrapper buckets
    max_pts down to the measured crossing-point count, so a large
    max_pts passed through it would silently re-test the packed path
    (n_vid = n_slots * bucketed_pts stays < 2^21)."""
    from surs_tpu.recon import tetra_device as td
    vol = sphere_vol(16, (7.5, 7.5, 7.5), 5.0)
    vh, fh = mt_host(vol, 0.5)
    n_slots = td._ALGOS["tets"]["n_slots"]
    deltas = td._ALGOS["tets"]["deltas"]

    def run_core(max_pts):
        out = td._march_core(
            np.asarray(vol, np.float32).reshape(-1), 0.5, (16, 16, 16),
            max_cells=1 << 12, max_pts=max_pts, max_tris=1 << 15,
            max_verts=1 << 14, cell_chunk=1 << 9)
        (vid_of, t_of, w0, w1, compact_p,
         n_verts, n_faces, _, _, n_pts) = out
        nv, nf = int(n_verts), int(n_faces)
        assert int(n_pts) <= max_pts
        vid = np.asarray(vid_of)[:nv]
        t = np.asarray(t_of)[:nv]
        comp = np.asarray(compact_p)
        verts = td.replay_wire_vertices(comp[vid % max_pts],
                                        vid // max_pts, t, deltas,
                                        16, 16)
        faces = td.unpack_wire_faces(
            np.asarray(w0)[:nf].view(np.uint32),
            np.asarray(w1)[:nf].view(np.uint32))
        return verts, faces

    # packed: 7 * 2^12 vids < 2^21
    assert n_slots * (1 << 12) <= (1 << 21)
    vd, fd = run_core(1 << 12)
    assert_same_mesh(vh, fh, vd, fd)
    # unpacked: 7 * 2^19 vids > 2^21 forces the 3-stream emit path
    assert n_slots * (1 << 19) > (1 << 21)
    vd2, fd2 = run_core(1 << 19)
    assert_same_mesh(vh, fh, vd2, fd2)
