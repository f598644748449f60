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
