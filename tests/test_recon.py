"""Reconstruction-layer tests: grid math, octree parity, isosurface,
mesh I/O, and the end-to-end pipeline with a fake occupancy oracle
(the Vhull-debug-net testing pattern from the reference, SURVEY.md §4)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from surs_tpu.recon import (create_grid, grid_matrix, eval_grid_octree,
                            eval_grid_dense, save_obj_mesh, load_obj,
                            save_samples_truncted_prob)
from surs_tpu.recon import native
from surs_tpu.recon.tetra import marching_tetrahedra as mt_numpy
from surs_tpu.recon.grid import flat_index_to_world


# ---------------------------------------------------------------------------
# reference-semantics numpy oracle for the octree evaluator
# (mirrors lib/sdf.py:55-120 behavior for the parity test)
def oracle_octree(eval_xyz, R, mat, threshold, init_res):
    coords = np.mgrid[:R, :R, :R].reshape(3, -1).astype(np.float64)
    coords = (mat[:3, :3] @ coords + mat[:3, 3:4]).reshape(3, R, R, R)
    sdf_hr = np.zeros((R, R, R))
    sdf_lr = np.zeros((R, R, R))
    dirty = np.ones((R, R, R), dtype=bool)
    grid_mask = np.zeros((R, R, R), dtype=bool)
    reso = R // init_res
    while reso > 0:
        grid_mask[0:R:reso, 0:R:reso, 0:R:reso] = True
        test_mask = np.logical_and(grid_mask, dirty)
        points = coords[:, test_mask]
        hr, lr = eval_xyz(points)
        sdf_hr[test_mask] = hr
        sdf_lr[test_mask] = lr
        dirty[test_mask] = False
        if reso <= 1:
            break
        for x in range(0, R - reso, reso):
            for y in range(0, R - reso, reso):
                for z in range(0, R - reso, reso):
                    if not dirty[x + reso // 2, y + reso // 2, z + reso // 2]:
                        continue
                    for sdf in (sdf_hr, sdf_lr):
                        v = sdf[x:x + reso + 1:reso, y:y + reso + 1:reso,
                                z:z + reso + 1:reso].reshape(-1)
                        if v.max() - v.min() < threshold:
                            sdf[x:x + reso, y:y + reso, z:z + reso] = \
                                (v.max() + v.min()) / 2
                            dirty[x:x + reso, y:y + reso, z:z + reso] = False
        reso //= 2
    return sdf_hr, sdf_lr


def binary_sphere_eval(points):
    """Fake occupancy oracle: hr sphere r=0.35, lr sphere r=0.30."""
    r = np.linalg.norm(np.asarray(points), axis=0)
    return ((r < 0.35).astype(np.float32), (r < 0.30).astype(np.float32))


def binary_sphere_eval_jax(points, ctx=None):
    r = jnp.linalg.norm(points, axis=0)
    return ((r < 0.35).astype(jnp.float32), (r < 0.30).astype(jnp.float32))


# ---------------------------------------------------------------------------
def test_create_grid_matches_reference_math():
    coords, mat = create_grid(8, 8, 8, np.array([-1., -1., -1.]),
                              np.array([1., 1., 1.]))
    assert coords.shape == (3, 8, 8, 8)
    np.testing.assert_allclose(coords[:, 0, 0, 0], [-1, -1, -1])
    # step = length/res (note: grid spans [b_min, b_max) like the reference)
    np.testing.assert_allclose(coords[:, 1, 0, 0], [-0.75, -1, -1])
    np.testing.assert_allclose(mat[0, 0], 0.25)


def test_flat_index_to_world_matches_create_grid():
    R = 8
    b_min, b_max = np.array([-1.0, -2.0, 0.0]), np.array([1.0, 2.0, 4.0])
    coords, mat = create_grid(R, R, R, b_min, b_max)
    idx = jnp.arange(R ** 3, dtype=jnp.int32)
    pts = np.asarray(flat_index_to_world(idx, R, 1, mat))
    np.testing.assert_allclose(pts.reshape(3, R, R, R), coords, rtol=1e-5,
                               atol=1e-6)


def test_octree_matches_reference_oracle():
    R, init_res, thr = 32, 8, 0.05
    b = np.array([-0.5, -0.5, -0.5]), np.array([0.5, 0.5, 0.5])
    mat = grid_matrix((R, R, R), *b)
    ref_hr, ref_lr = oracle_octree(binary_sphere_eval, R, mat, thr, init_res)
    got_hr, got_lr = eval_grid_octree(binary_sphere_eval_jax, R, mat, thr,
                                      init_resolution=init_res,
                                      num_samples=1000)
    np.testing.assert_allclose(np.asarray(got_hr), ref_hr, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_lr), ref_lr, atol=1e-6)


def test_octree_matches_dense_on_smooth_field():
    R, thr = 32, 0.05
    mat = grid_matrix((R, R, R), np.array([-0.5] * 3), np.array([0.5] * 3))

    def smooth(points, ctx=None):
        r = jnp.linalg.norm(points, axis=0)
        v = jnp.clip(1.0 - r / 0.4, 0.0, 1.0)
        return v, v * 0.9

    dense_hr, dense_lr = eval_grid_dense(smooth, R, mat, num_samples=977)
    oct_hr, oct_lr = eval_grid_octree(smooth, R, mat, thr,
                                      init_resolution=8, num_samples=977)
    # pruned cells are filled with (max+min)/2 of corners whose spread is
    # < threshold -> bounded deviation from the dense field
    assert np.abs(np.asarray(oct_hr) - np.asarray(dense_hr)).max() < thr
    assert np.abs(np.asarray(oct_lr) - np.asarray(dense_lr)).max() < thr


def test_dense_eval_uneven_chunks():
    R = 8
    mat = grid_matrix((R, R, R), np.array([-1.0] * 3), np.array([1.0] * 3))
    hr, lr = eval_grid_dense(binary_sphere_eval_jax, R, mat, num_samples=100)
    exp_hr, exp_lr = binary_sphere_eval(
        np.asarray(flat_index_to_world(jnp.arange(R ** 3, dtype=jnp.int32),
                                       R, 1, mat)))
    np.testing.assert_allclose(np.asarray(hr).reshape(-1), exp_hr)
    np.testing.assert_allclose(np.asarray(lr).reshape(-1), exp_lr)


# ---------------------------------------------------------------------------
def sphere_volume(R=24, radius=8.0):
    g = np.mgrid[:R, :R, :R].astype(np.float64) - (R - 1) / 2
    return (radius - np.sqrt((g ** 2).sum(axis=0))).astype(np.float32)


def test_marching_tetrahedra_sphere_geometry():
    R, radius = 24, 8.0
    verts, faces = mt_numpy(sphere_volume(R, radius), 0.0)
    assert verts.shape[0] > 100 and faces.shape[0] > 100
    r = np.linalg.norm(verts - (R - 1) / 2, axis=1)
    # all vertices lie close to the true sphere (linear interp error)
    assert np.abs(r - radius).max() < 0.15
    # watertight: every edge is shared by exactly two faces
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]])
    keys = edges.min(1).astype(np.int64) * 10 ** 9 + edges.max(1)
    _, counts = np.unique(keys, return_counts=True)
    assert (counts == 2).all()


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_matches_numpy_backend():
    vol = sphere_volume(16, 5.0)
    v_np, f_np = mt_numpy(vol, 0.0)
    v_na, f_na = native.marching_tetrahedra(vol, 0.0)
    assert v_np.shape == v_na.shape and f_np.shape == f_na.shape
    # same vertex set (ordering differs)
    s_np = np.asarray(sorted(map(tuple, np.round(v_np, 4))))
    s_na = np.asarray(sorted(map(tuple, np.round(v_na, 4))))
    np.testing.assert_allclose(s_np, s_na, atol=1e-4)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_edge_map_grows_past_initial_capacity():
    """Regression: EdgeMap was a FIXED-capacity open-addressing table
    (2^21 slots); a volume with more unique edge crossings than capacity
    made slot()'s probe loop spin forever once the table filled (hit in
    practice by benchmarks/baseline_torch.py --mesh noise fields at
    256^3). The table must rehash-grow instead. This volume produces
    ~3M unique crossing vertices (> the old 2.1M slot ceiling); under
    the broken code this test hangs rather than fails, so it runs the
    extraction in a subprocess with a hard timeout."""
    import subprocess
    import sys
    code = (
        "import numpy as np\n"
        "from surs_tpu.recon import native\n"
        "rng = np.random.default_rng(7)\n"
        "vol = rng.random((96, 96, 96), dtype=np.float32)\n"
        "v, f = native.marching_tetrahedra(vol, 0.5)\n"
        "assert v.shape[0] > 2_200_000, v.shape\n"
        "assert f.min() >= 0 and f.max() < v.shape[0]\n"
        "print('verts', v.shape[0])\n")
    r = subprocess.run([sys.executable, "-c", code], timeout=240,
                       capture_output=True, text=True,
                       env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "verts" in r.stdout


def test_obj_roundtrip(tmp_path):
    verts = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    faces = np.array([[0, 1, 2]])
    p = str(tmp_path / "tri.obj")
    save_obj_mesh(p, verts, faces)
    txt = open(p).read().splitlines()
    assert txt[0] == "v 0.0000 0.0000 0.0000"
    assert txt[3] == "f 1 3 2"  # reference winding swap (mesh_util.py:60)
    v2, f2 = load_obj(p)
    np.testing.assert_allclose(v2, verts, atol=1e-4)
    # winding swap is undone by the swap-aware reader? No: loader returns
    # faces as stored; verify vertex identity only, plus triangle count.
    assert f2.shape == (1, 3)


def test_ply_header_format(tmp_path):
    p = str(tmp_path / "s.ply")
    pts = np.zeros((4, 3))
    prob = np.array([0.9, 0.1, 0.6, 0.2])
    save_samples_truncted_prob(p, pts, prob)
    lines = open(p).read().splitlines()
    assert lines[0] == "ply"
    assert lines[2] == "element vertex 4"
    assert lines[-5].endswith("end_header")
    assert lines[-4].split()[3:] == ["255", "0", "0"]  # red = inside


def test_pipeline_end_to_end_tiny(tmp_path):
    """Full gen_mesh on a tiny random-weight SuRSNet."""
    import jax
    from surs_tpu.models import SuRSNet
    from surs_tpu.recon import gen_mesh
    from surs_tpu.config import SuRSConfig

    cfg = SuRSConfig(loadSize=32, resolution=16, num_samples=512,
                     octree_init_resolution=8,
                     b_min=[-0.5, -0.5, -0.5], b_max=[0.5, 0.5, 0.5])
    model = SuRSNet(load_size=32, num_stack_lr=2)
    S = 16
    rng0 = np.random.default_rng(0)
    img = jnp.asarray(rng0.standard_normal((1, S, S, 3)).astype(np.float32))
    img_hr = jnp.asarray(
        rng0.standard_normal((1, 2 * S, 2 * S, 3)).astype(np.float32))
    pts0 = jnp.asarray((rng0.random((1, 3, 4)) - 0.5).astype(np.float32))
    calib0 = jnp.asarray(
        np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32))[None]
    variables = model.init(jax.random.PRNGKey(0), img, img_hr, pts0, pts0,
                           calib0, train=True)
    data = {"img_LR": img, "b_min": np.array(cfg.b_min),
            "b_max": np.array(cfg.b_max)}
    path = str(tmp_path / "subject.obj")
    p_hr, p_lr = gen_mesh(cfg, model, variables["params"], data, path)
    assert os.path.exists(p_hr) and os.path.exists(p_lr)


def test_octree_hostloop_matches_fused():
    from surs_tpu.recon.evaluator import eval_grid_octree_hostloop
    R, init_res, thr = 32, 8, 0.05
    mat = grid_matrix((R, R, R), np.array([-0.5] * 3), np.array([0.5] * 3))
    fused_hr, fused_lr = eval_grid_octree(
        binary_sphere_eval_jax, R, mat, thr, init_resolution=init_res,
        num_samples=500)
    hl_hr, hl_lr = eval_grid_octree_hostloop(
        binary_sphere_eval_jax, R, mat, thr, init_resolution=init_res,
        num_samples=500)
    np.testing.assert_allclose(np.asarray(hl_hr), np.asarray(fused_hr),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(hl_lr), np.asarray(fused_lr),
                               atol=1e-6)


def test_silhouette_pruning():
    """Visual-hull pre-pruning: voxels outside the mask are never queried
    and end at occupancy 0; the in-silhouette region still evaluates."""
    import jax.numpy as jnp
    from surs_tpu.recon.evaluator import (silhouette_dirty_mask,
                                          eval_grid_octree_hostloop)
    R = 16
    mat = grid_matrix((R, R, R), np.array([-0.5] * 3), np.array([0.5] * 3))
    # silhouette: a centered square occupying uv in [-0.5, 0.5]
    S = 64
    yy, xx = np.mgrid[:S, :S]
    m = ((np.abs(xx - (S - 1) / 2) < S / 4)
         & (np.abs(yy - (S - 1) / 2) < S / 4)).astype(np.float32)
    calib = np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32)[None]
    dirty0 = silhouette_dirty_mask(jnp.asarray(m), calib, R, mat, dilate=0)
    d = np.asarray(dirty0)
    assert 0 < d.sum() < R ** 3
    # x=0.4 -> u=0.8 outside the half-width-0.5 square
    # world->voxel: (x + 0.5) * R
    assert not d[int((0.4 + 0.5) * R), R // 2, R // 2]
    assert d[R // 2, R // 2, R // 2]

    calls = {"n": 0}

    def eval_fn(points, ctx):
        calls["n"] += 1  # trace count (compiles once per level shape)
        r = jnp.linalg.norm(points, axis=0)
        return ((r < 0.35).astype(jnp.float32),
                (r < 0.3).astype(jnp.float32))

    hr, lr = eval_grid_octree_hostloop(eval_fn, R, mat, 0.05,
                                       init_resolution=8, num_samples=128,
                                       init_dirty=dirty0)
    hr = np.asarray(hr)
    # outside-silhouette region was never filled with inside values
    assert hr[int((0.45 + 0.5) * R) % R, R // 2, R // 2] == 0.0
    # inside the silhouette the sphere evaluates normally near center
    assert hr[R // 2, R // 2, R // 2] == 1.0


def test_mask_prune_mesh_parity():
    """mask_prune on/off produce IDENTICAL meshes for a silhouette
    -consistent subject (the mask covers the object's projection): the
    pruned voxels are provably outside the visual hull, so the level-0.5
    crossing never moves. This is the semantic basis for defaulting
    ``mask_prune`` on (config.py)."""
    from surs_tpu.recon.evaluator import (silhouette_init_masks,
                                          eval_grid_octree_mono,
                                          eval_grid_octree_hostloop)
    from surs_tpu.recon.marching import extract_isosurface

    R, init_res, thr = 32, 8, 0.05
    mat = grid_matrix((R, R, R), np.array([-0.5] * 3), np.array([0.5] * 3))
    calib = np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32)[None]

    def smooth_sphere_eval(points, ctx=None):
        # smooth occupancy: MC vertex positions interpolate, so any
        # near-surface value perturbation would move the mesh
        r = jnp.linalg.norm(points, axis=0)
        occ = jnp.clip(0.5 + (0.35 - r) * 4.0, 0.0, 1.0)
        occ_lr = jnp.clip(0.5 + (0.30 - r) * 4.0, 0.0, 1.0)
        return occ, occ_lr

    # silhouette-consistent mask: the sphere (r=0.35) projects to a uv
    # disc of radius 0.7; a 0.78-radius disc covers it with margin
    S = 64
    yy, xx = np.mgrid[:S, :S]
    cc = (S - 1) / 2
    disc = ((((xx - cc) ** 2 + (yy - cc) ** 2)
             < (0.39 * S) ** 2)).astype(np.float32)

    for fn in (eval_grid_octree_mono, eval_grid_octree_hostloop):
        init = silhouette_init_masks(jnp.asarray(disc), calib, R, mat,
                                     init_resolution=init_res, dilate=2)
        hr_m, lr_m = fn(smooth_sphere_eval, R, mat, thr,
                        init_resolution=init_res, num_samples=128,
                        init_dirty=init)
        hr_u, lr_u = fn(smooth_sphere_eval, R, mat, thr,
                        init_resolution=init_res, num_samples=128)
        # the mask must actually have pruned something (else the test
        # proves nothing) — volumes differ away from the surface...
        assert not np.array_equal(np.asarray(hr_m), np.asarray(hr_u))
        for masked, unmasked in ((hr_m, hr_u), (lr_m, lr_u)):
            vm, fm = extract_isosurface(np.asarray(masked), 0.5)
            vu, fu = extract_isosurface(np.asarray(unmasked), 0.5)
            # ... but the extracted meshes are identical
            assert fm.shape == fu.shape and vm.shape == vu.shape
            np.testing.assert_array_equal(fm, fu)
            np.testing.assert_allclose(vm, vu, atol=0.0)


def test_mono_inline_silhouette_matches_precomputed():
    """eval_grid_octree_mono(silhouette=...) — per-level masks computed
    INSIDE the mono program — is bit-identical to the precomputed
    silhouette_init_masks path (evaluator._sil_masks_traced)."""
    from surs_tpu.recon.evaluator import (silhouette_init_masks,
                                          eval_grid_octree_mono)

    R, init_res, thr = 32, 8, 0.05
    mat = grid_matrix((R, R, R), np.array([-0.5] * 3), np.array([0.5] * 3))
    calib = np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32)[None]

    def blob_eval(points, ctx=None):
        r = jnp.linalg.norm(points - jnp.array([[0.05], [0.0], [-0.03]]),
                            axis=0)
        occ = jnp.clip(0.5 + (0.33 - r) * 4.0, 0.0, 1.0)
        return occ, jnp.clip(0.5 + (0.28 - r) * 4.0, 0.0, 1.0)

    S = 64
    yy, xx = np.mgrid[:S, :S]
    cc = (S - 1) / 2
    disc = ((((xx - cc) ** 2 + (yy - 0.9 * cc) ** 2)
             < (0.36 * S) ** 2)).astype(np.float32)

    init = silhouette_init_masks(jnp.asarray(disc), calib, R, mat,
                                 init_resolution=init_res, dilate=2)
    hr_p, lr_p = eval_grid_octree_mono(
        blob_eval, R, mat, thr, init_resolution=init_res,
        num_samples=128, init_dirty=init)
    hr_i, lr_i = eval_grid_octree_mono(
        blob_eval, R, mat, thr, init_resolution=init_res,
        num_samples=128, silhouette=jnp.asarray(disc),
        silhouette_calib=calib, silhouette_dilate=2)
    np.testing.assert_array_equal(np.asarray(hr_p), np.asarray(hr_i))
    np.testing.assert_array_equal(np.asarray(lr_p), np.asarray(lr_i))


def test_mask_prune_defaults_on():
    """The config default takes the measured-faster pruned path on every
    masked subject; --no_mask_prune is the opt-out (config.py)."""
    from surs_tpu.config import SuRSConfig, parse_config
    assert SuRSConfig().mask_prune is True
    assert parse_config(["--no_mask_prune"]).mask_prune is False


def test_octree_hierarchical_compaction_matches_oracle(monkeypatch):
    """Force the two-level (block-summary + group) compaction path — at
    production constants it only engages for lattices >= 256^3 — and pin
    it to the reference-semantics oracle, in BOTH evaluator modes,
    including the multi-group loop (group capacity 8 blocks)."""
    from surs_tpu.recon import evaluator as ev
    monkeypatch.setattr(ev, "_BLOCK", 2)
    monkeypatch.setattr(ev, "_GROUP_BLOCKS", 8)
    monkeypatch.setattr(ev, "_HL_GROUP_BLOCKS", 8)
    R, init_res, thr = 32, 8, 0.05
    assert ev._two_level(R)  # reso=1 level takes the hierarchical path
    mat = grid_matrix((R, R, R), np.array([-0.5] * 3), np.array([0.5] * 3))
    ref_hr, ref_lr = oracle_octree(binary_sphere_eval, R, mat, thr, init_res)
    for mode in ("fused", "hostloop"):
        fn = (eval_grid_octree if mode == "fused"
              else ev.eval_grid_octree_hostloop)
        got_hr, got_lr = fn(binary_sphere_eval_jax, R, mat, thr,
                            init_resolution=init_res, num_samples=100)
        np.testing.assert_allclose(np.asarray(got_hr), ref_hr, atol=1e-6,
                                   err_msg=mode)
        np.testing.assert_allclose(np.asarray(got_lr), ref_lr, atol=1e-6,
                                   err_msg=mode)


@pytest.mark.slow
def test_octree_oracle_64_noncubic_bbox_init_dirty():
    """Deeper oracle pin (VERDICT r1 #7): 64^3, production-shaped reso
    schedule 8->1, non-cubic bbox, silhouette-style init_dirty, both
    evaluator modes. One-off full-lattice parity with lib/sdf.py:55-120
    semantics."""
    from surs_tpu.recon.evaluator import eval_grid_octree_hostloop
    R, init_res, thr = 64, 8, 0.05
    b_min = np.array([-0.5, -0.8, -0.4])
    b_max = np.array([0.5, 0.8, 0.6])
    mat = grid_matrix((R, R, R), b_min, b_max)

    def eval_np(points):
        p = np.asarray(points)
        r = np.linalg.norm(p * np.array([[1.0], [0.6], [1.2]]), axis=0)
        hr = np.clip(1.0 - r / 0.45, 0.0, 1.0)
        return hr.astype(np.float32), (hr * 0.9 + 0.02).astype(np.float32)

    def eval_jax(points, ctx=None):
        r = jnp.linalg.norm(
            points * jnp.array([[1.0], [0.6], [1.2]]), axis=0)
        hr = jnp.clip(1.0 - r / 0.45, 0.0, 1.0)
        return hr.astype(jnp.float32), (hr * 0.9 + 0.02).astype(jnp.float32)

    # oracle with an initial dirty mask (half-space pre-pruned)
    init_np = np.mgrid[:R, :R, :R][0] < (3 * R) // 4

    def oracle_with_init(eval_xyz):
        coords = np.mgrid[:R, :R, :R].reshape(3, -1).astype(np.float64)
        coords = (mat[:3, :3] @ coords + mat[:3, 3:4]).reshape(3, R, R, R)
        sdf_hr = np.zeros((R, R, R))
        sdf_lr = np.zeros((R, R, R))
        dirty = init_np.copy()
        grid_mask = np.zeros((R, R, R), dtype=bool)
        reso = R // init_res
        while reso > 0:
            grid_mask[0:R:reso, 0:R:reso, 0:R:reso] = True
            test_mask = np.logical_and(grid_mask, dirty)
            points = coords[:, test_mask]
            hr, lr = eval_xyz(points)
            sdf_hr[test_mask] = hr
            sdf_lr[test_mask] = lr
            dirty[test_mask] = False
            if reso <= 1:
                break
            for x in range(0, R - reso, reso):
                for y in range(0, R - reso, reso):
                    for z in range(0, R - reso, reso):
                        if not dirty[x + reso // 2, y + reso // 2,
                                     z + reso // 2]:
                            continue
                        for sdf in (sdf_hr, sdf_lr):
                            v = sdf[x:x + reso + 1:reso,
                                    y:y + reso + 1:reso,
                                    z:z + reso + 1:reso].reshape(-1)
                            if v.max() - v.min() < thr:
                                sdf[x:x + reso, y:y + reso,
                                    z:z + reso] = (v.max() + v.min()) / 2
                                dirty[x:x + reso, y:y + reso,
                                      z:z + reso] = False
            reso //= 2
        return sdf_hr, sdf_lr

    ref_hr, ref_lr = oracle_with_init(eval_np)
    init_jax = jnp.asarray(init_np)
    for mode in ("fused", "hostloop"):
        fn = (eval_grid_octree if mode == "fused"
              else eval_grid_octree_hostloop)
        got_hr, got_lr = fn(eval_jax, R, mat, thr,
                            init_resolution=init_res, num_samples=5000,
                            init_dirty=init_jax)
        np.testing.assert_allclose(np.asarray(got_hr), ref_hr, atol=1e-5,
                                   err_msg=mode)
        np.testing.assert_allclose(np.asarray(got_lr), ref_lr, atol=1e-5,
                                   err_msg=mode)


def test_octree_stats_and_init_dirty_fused():
    """stats_out counts; fused mode honors init_dirty identically."""
    import jax.numpy as jnp
    from surs_tpu.recon.evaluator import eval_grid_octree_hostloop
    R, init_res = 16, 8
    mat = grid_matrix((R, R, R), np.array([-0.5] * 3), np.array([0.5] * 3))
    # half-space pre-pruned
    init_dirty = jnp.asarray(
        np.mgrid[:R, :R, :R][0] < R // 2)
    stats = {}
    hl_hr, _ = eval_grid_octree_hostloop(
        binary_sphere_eval_jax, R, mat, 0.05, init_resolution=init_res,
        num_samples=64, init_dirty=init_dirty, stats_out=stats)
    assert 0 < stats["queries"] < R ** 3
    f_hr, _ = eval_grid_octree(
        binary_sphere_eval_jax, R, mat, 0.05, init_resolution=init_res,
        num_samples=64, init_dirty=init_dirty)
    np.testing.assert_allclose(np.asarray(hl_hr), np.asarray(f_hr),
                               atol=1e-6)
    # pre-pruned half stays at the default 0 fill
    assert float(np.abs(np.asarray(hl_hr)[R // 2:]).max()) == 0.0


def test_silhouette_mask_2d_and_3d_paths_agree():
    """The O(R^2) broadcast path (null-axis orthographic calib) and the
    generic chunked 3-D path must produce identical dirty masks."""
    import jax.numpy as jnp
    from surs_tpu.recon.evaluator import silhouette_dirty_mask
    from surs_tpu.recon.grid import grid_matrix

    R, S = 24, 16
    rng = np.random.default_rng(5)
    mask = (rng.random((S, S)) > 0.4).astype(np.float32)
    mat = grid_matrix((R,) * 3, [-0.5] * 3, [0.5] * 3)
    calib_fixed = np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32)[None]

    cache = {}
    d2 = np.asarray(silhouette_dirty_mask(jnp.asarray(mask), calib_fixed,
                                          R, mat, dilate=1, cache=cache))
    assert any(k[0] == "sil" for k in cache)

    # rotate the calib so no lattice axis is in the uv null space ->
    # generic path; compare on the SAME geometry by rotating 0 degrees
    # is not possible, so instead verify the 3-D path against the fixed
    # calib by defeating the null-axis detection with an epsilon-free
    # equivalent: a calib with a tiny exact-zero-free rotation column
    # would change geometry. Use the private runners via a calib whose
    # null column is non-zero but maps outside the mask identically:
    # simplest honest check — brute-force numpy oracle for BOTH paths.
    def oracle(calib):
        from surs_tpu.ops.geometry import orthogonal
        from surs_tpu.ops.grid_sample import grid_sample_points
        import jax
        m = jnp.asarray(mask)[..., None]
        m4 = jax.lax.reduce_window(m[None], -jnp.inf, jax.lax.max,
                                   (1, 3, 3, 1), (1, 1, 1, 1), "SAME")[0]
        idx = np.arange(R ** 3)
        k = idx % R
        j = (idx // R) % R
        i = idx // (R * R)
        pts = np.stack([i, j, k]).astype(np.float32)
        pts = (np.diag(mat[:3, :3])[:, None] * pts
               + mat[:3, 3][:, None]).astype(np.float32)
        xyz = np.asarray(orthogonal(jnp.asarray(pts)[None],
                                    jnp.asarray(calib)))
        uv = np.swapaxes(xyz[:, :2, :], 1, 2)
        hit = np.asarray(grid_sample_points(m4[None],
                                            jnp.asarray(uv)))[0, :, 0]
        return (hit > 0).reshape(R, R, R)

    np.testing.assert_array_equal(d2, oracle(calib_fixed))

    # generic path: a yaw-rotated calib (no exact-zero uv column)
    th = 0.3
    rot = np.array([[np.cos(th), 0, np.sin(th), 0],
                    [0, -2.0, 0, 0],
                    [-np.sin(th), 0, np.cos(th), 0],
                    [0, 0, 0, 1.0]], np.float32)
    rot[0] *= 2.0
    rot[2] *= 2.0
    calib_rot = rot[None]
    d3 = np.asarray(silhouette_dirty_mask(jnp.asarray(mask), calib_rot,
                                          R, mat, dilate=1,
                                          chunk=R ** 3 // 4 + 7,
                                          cache=cache))
    np.testing.assert_array_equal(d3, oracle(calib_rot))


def test_silhouette_init_masks_match_strided_sampling():
    """Per-level mask computation (scaled affine) == stride-reso samples
    of the full-resolution mask — the two init_dirty forms the octree
    evaluators accept must be interchangeable."""
    import jax.numpy as jnp
    from surs_tpu.recon.evaluator import (silhouette_dirty_mask,
                                          silhouette_init_masks,
                                          _sample_init,
                                          _sample_init_center,
                                          _level_schedule)
    from surs_tpu.recon.grid import grid_matrix

    R, S = 32, 16
    rng = np.random.default_rng(9)
    mask = (rng.random((S, S)) > 0.45).astype(np.float32)
    mat = grid_matrix((R,) * 3, [-0.5] * 3, [0.5] * 3)
    calib = np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32)[None]
    cache = {}
    full = silhouette_dirty_mask(jnp.asarray(mask), calib, R, mat,
                                 dilate=2, cache=cache)
    per_level = silhouette_init_masks(jnp.asarray(mask), calib, R, mat,
                                      init_resolution=8, dilate=2,
                                      cache=cache)
    for reso in _level_schedule(R, 8):
        np.testing.assert_array_equal(
            np.asarray(per_level["lat"][reso]),
            np.asarray(_sample_init(full, R, reso)),
            err_msg=f"lat reso={reso}")
        if reso > 1:
            np.testing.assert_array_equal(
                np.asarray(per_level["center"][reso]),
                np.asarray(_sample_init_center(full, R, reso)),
                err_msg=f"center reso={reso}")


def test_octree_mono_matches_hostloop():
    """The single-program octree == the host-driven one (same fields),
    with and without per-level init masks."""
    import jax.numpy as jnp
    from surs_tpu.recon.evaluator import (eval_grid_octree_hostloop,
                                          eval_grid_octree_mono,
                                          silhouette_init_masks)
    from surs_tpu.recon.grid import grid_matrix

    R = 16
    mat = grid_matrix((R,) * 3, [-0.5] * 3, [0.5] * 3)

    def eval_fn(pts, ctx):
        d = jnp.sqrt((pts ** 2).sum(0))
        return (0.30 - d) + 0.5, (0.28 - d) + 0.5

    a_hr, a_lr = eval_grid_octree_hostloop(
        eval_fn, R, mat, 0.05, init_resolution=4, num_samples=64,
        ctx=None)
    b_hr, b_lr = eval_grid_octree_mono(
        eval_fn, R, mat, 0.05, init_resolution=4, num_samples=64,
        ctx=None)
    np.testing.assert_allclose(np.asarray(b_hr), np.asarray(a_hr),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(b_lr), np.asarray(a_lr),
                               atol=1e-6)

    mask = np.zeros((8, 8), np.float32)
    mask[2:6, 2:6] = 1.0
    calib = np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32)[None]
    im = silhouette_init_masks(jnp.asarray(mask), calib, R, mat,
                               init_resolution=4, dilate=1)
    a_hr, _ = eval_grid_octree_hostloop(
        eval_fn, R, mat, 0.05, init_resolution=4, num_samples=64,
        ctx=None, init_dirty=im)
    b_hr, _ = eval_grid_octree_mono(
        eval_fn, R, mat, 0.05, init_resolution=4, num_samples=64,
        ctx=None, init_dirty=im)
    np.testing.assert_allclose(np.asarray(b_hr), np.asarray(a_hr),
                               atol=1e-6)


def test_dense_cols_matches_generic_dense():
    """Column-shared dense evaluator == the generic query-path dense
    evaluator on an axis-aligned calib; rotated calibs are detected as
    non-separable and fall back."""
    import jax
    from surs_tpu.models import SuRSNet
    from surs_tpu.recon.pipeline import Reconstructor
    from surs_tpu.recon.evaluator import dense_cols_separable
    from surs_tpu.ops.fused_mlp import prepare_fused_weights

    model = SuRSNet(load_size=32, num_stack_lr=2)
    S = 16
    rng0 = np.random.default_rng(5)
    img = jnp.asarray(rng0.standard_normal((1, S, S, 3)).astype(np.float32))
    img_hr = jnp.asarray(
        rng0.standard_normal((1, 2 * S, 2 * S, 3)).astype(np.float32))
    pts0 = jnp.asarray((rng0.random((1, 3, 4)) - 0.5).astype(np.float32))
    calib = np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32)[None]
    params = model.init(jax.random.PRNGKey(0), img, img_hr, pts0, pts0,
                        jnp.asarray(calib), train=True)["params"]
    rec = Reconstructor(model)
    _, feats_lr, feat_hr = rec.encode(params, img)

    R = 16
    b_min, b_max = np.array([-0.6, -0.5, -0.4]), np.array([0.5, 0.6, 0.7])
    ref_hr, ref_lr, mat = rec.evaluate(params, feats_lr, feat_hr, calib,
                                       R, b_min, b_max, use_octree=False,
                                       num_samples=500)

    fw3 = prepare_fused_weights(
        params["mlp_lr"], params["mlp_hr"],
        (321, 1024, 512, 256, 128, 1), (322, 1024, 512, 256, 128, 1),
        base_split=(256, 64, 1))
    rec_c = Reconstructor(model, cols_weights=fw3, load_size=32,
                          z_size=200.0)
    got_hr, got_lr, _ = rec_c.evaluate(params, feats_lr, feat_hr, calib,
                                       R, b_min, b_max, use_octree=False,
                                       num_samples=500)
    np.testing.assert_allclose(np.asarray(got_hr), np.asarray(ref_hr),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_lr), np.asarray(ref_lr),
                               rtol=1e-4, atol=1e-5)

    # rotated calib: not separable; evaluate() falls back to generic
    th = np.deg2rad(30.0)
    rot = np.eye(4, dtype=np.float32)
    rot[0, 0] = rot[2, 2] = np.cos(th)
    rot[0, 2] = np.sin(th)
    rot[2, 0] = -np.sin(th)
    calib_r = (calib[0] @ rot)[None]
    mat16 = grid_matrix((R, R, R), b_min, b_max)
    assert not dense_cols_separable(calib_r, mat16)
    ref2_hr, _, _ = rec.evaluate(params, feats_lr, feat_hr, calib_r, R,
                                 b_min, b_max, use_octree=False,
                                 num_samples=500)
    got2_hr, _, _ = rec_c.evaluate(params, feats_lr, feat_hr, calib_r, R,
                                   b_min, b_max, use_octree=False,
                                   num_samples=500)
    np.testing.assert_allclose(np.asarray(got2_hr), np.asarray(ref2_hr),
                               atol=1e-6)


def test_packed_group_compact_matches_unpacked():
    """The bit-packed (word-gather) group compaction must reproduce
    `_group_compact` EXACTLY: same block summary, same compact arrays,
    same counts — packing can never change the octree's visit order."""
    import jax.numpy as jnp
    from surs_tpu.recon import evaluator as ev

    rng = np.random.default_rng(5)
    L = 32
    lat = jnp.asarray(rng.random((L ** 3,)) < 0.07)
    G = 16
    S = G * 64
    blk_u, nb_u = ev._block_summary(lat, L, 4, G)
    words = ev._pack_bits(lat)
    blk_p, nb_p = ev._block_summary_packed(words, L, G)
    assert int(nb_u) == int(nb_p)
    np.testing.assert_array_equal(np.asarray(blk_u), np.asarray(blk_p))
    for g0 in range(0, int(nb_u), G):
        c_u, n_u = ev._group_compact(lat, blk_u, jnp.int32(g0), nb_u,
                                     L, 4, G, S)
        c_p, n_p = ev._group_compact_packed(words, blk_p, jnp.int32(g0),
                                            nb_p, L, G, S)
        assert int(n_u) == int(n_p)
        np.testing.assert_array_equal(
            np.asarray(c_u)[:int(n_u)], np.asarray(c_p)[:int(n_p)])


def test_octree_packed_compaction_matches_oracle(monkeypatch):
    """Force the two-level compaction at production block edge 4 with a
    tiny group capacity so a 32^3 lattice (L % 32 == 0) drives the
    PACKED multi-group fused path, and pin it to the oracle."""
    from surs_tpu.recon import evaluator as ev
    monkeypatch.setattr(ev, "_GROUP_BLOCKS", 8)
    R, init_res, thr = 32, 8, 0.05
    assert ev._two_level(R)
    mat = grid_matrix((R, R, R), np.array([-0.5] * 3), np.array([0.5] * 3))
    ref_hr, ref_lr = oracle_octree(binary_sphere_eval, R, mat, thr, init_res)
    got_hr, got_lr = eval_grid_octree(binary_sphere_eval_jax, R, mat, thr,
                                      init_resolution=init_res,
                                      num_samples=100)
    np.testing.assert_allclose(np.asarray(got_hr), ref_hr, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_lr), ref_lr, atol=1e-6)


def test_compact_block_ids_3level_matches_direct():
    """Above the 2^18-block threshold the dirty-block ids are compacted
    via the recursive packed superblock path; it must yield exactly the
    direct path's id SET and count (order is a documented superblock
    -major permutation)."""
    import jax.numpy as jnp
    from surs_tpu.recon import evaluator as ev

    rng = np.random.default_rng(9)
    Lb = 128                       # Lb^3 = 2M > _3LVL_MIN
    blk = rng.random((Lb ** 3,)) < 0.004      # ~8k dirty blocks
    # carve a dense clump so several superblock groups fill unevenly
    blk3 = blk.reshape(Lb, Lb, Lb)
    blk3[10:14, 20:40, 50:90] = True
    blkj = jnp.asarray(blk3.reshape(-1))
    G = 8192
    out, nb = ev._compact_block_ids(blkj, Lb, G)
    want = np.flatnonzero(np.asarray(blkj))
    assert int(nb) == want.size
    got = np.sort(np.asarray(out)[:int(nb)])
    np.testing.assert_array_equal(got, want)
    # and the direct path agrees on membership
    nb_d = int(jnp.sum(blkj.astype(jnp.int32)))
    assert nb_d == want.size
