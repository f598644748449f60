"""Runs-mode (dirty column window) octree evaluator parity.

The runs evaluator must produce the same occupancy volumes as the
generic mono octree evaluator driven by an eval_fn computing the exact
same per-point math (projection + bilinear gathers + the padded XLA
dual-MLP chain). The only numeric difference is the depth-feature
decomposition zf(k0+t) = (zf(k0)-zf(0)) + zf(t) — exact up to f32
rounding — so volumes agree to ~1e-4.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from surs_tpu.models import SurfaceClassifier
from surs_tpu.ops.fused_mlp import prepare_fused_weights, fused_dual_mlp_xla
from surs_tpu.ops.geometry import orthogonal, in_image_mask, normalize_depth
from surs_tpu.ops.grid_sample import grid_sample_points
from surs_tpu.recon.grid import grid_matrix
from surs_tpu.recon.evaluator import eval_grid_octree_mono
from surs_tpu.recon.evaluator_runs import (eval_grid_octree_runs,
                                           runs_supported)

DIMS_LR = (321, 1024, 512, 256, 128, 1)
DIMS_HR = (322, 1024, 512, 256, 128, 1)
C_LR, C_HR = 256, 64
LOAD_SIZE, Z_SIZE = 32, 200.0


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(1234)
    mlp_lr = SurfaceClassifier(DIMS_LR, res_layers=(2, 3, 4))
    mlp_hr = SurfaceClassifier(DIMS_HR, res_layers=(2, 3, 4))
    p_lr = mlp_lr.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 4, DIMS_LR[0])))["params"]
    p_hr = mlp_hr.init(jax.random.PRNGKey(1),
                       jnp.zeros((1, 4, DIMS_HR[0])))["params"]
    fw = prepare_fused_weights(p_lr, p_hr, DIMS_LR, DIMS_HR,
                               base_split=(C_LR, C_HR, 1))
    feat_lr = jnp.asarray(0.3 * rng.standard_normal(
        (1, 16, 16, C_LR)).astype(np.float32))
    feat_hr = jnp.asarray(0.3 * rng.standard_normal(
        (1, 32, 32, C_HR)).astype(np.float32))
    calib = jnp.asarray(np.diag([2.0, -2.0, 2.0, 1.0]).astype(
        np.float32))[None]
    return fw, feat_lr, feat_hr, calib


def make_eval_fn(fw, feat_lr, feat_hr, calib):
    """Generic per-point eval_fn with the exact runs-path math."""
    def eval_fn(points, ctx):
        pts = points[None]
        xyz = orthogonal(pts, calib)
        xy = xyz[:, :2, :]
        mask = in_image_mask(xy)[0]
        zf = jnp.swapaxes(normalize_depth(xyz[:, 2:3, :], LOAD_SIZE,
                                          Z_SIZE), 1, 2)[0]   # [N, 1]
        uv = jnp.swapaxes(xy, 1, 2)
        x_lr = grid_sample_points(feat_lr, uv)[0]
        x_hr = grid_sample_points(feat_hr, uv)[0]
        hr, lr = fused_dual_mlp_xla([x_lr, x_hr, zf], fw)
        return hr * mask, lr * mask
    return eval_fn


def _volumes(setup, R, init_res, threshold, init_dirty=None,
             nwin_chunk=64):
    fw, feat_lr, feat_hr, calib = setup
    mat = grid_matrix((R,) * 3, np.array([-0.5, -0.5, -0.5]),
                      np.array([0.5, 0.5, 0.5]))
    assert runs_supported(calib, mat, R, init_res)
    hr_r, lr_r = eval_grid_octree_runs(
        fw, feat_lr, feat_hr, calib, R, mat, threshold, LOAD_SIZE,
        Z_SIZE, init_resolution=init_res, nwin_chunk=nwin_chunk,
        run_block=2, use_pallas=False, init_dirty=init_dirty)
    eval_fn = make_eval_fn(fw, feat_lr, feat_hr, calib)
    hr_m, lr_m = eval_grid_octree_mono(
        eval_fn, R, mat, threshold, init_resolution=init_res,
        num_samples=97, init_dirty=init_dirty)
    return hr_r, lr_r, hr_m, lr_m


def test_runs_octree_matches_mono(setup):
    hr_r, lr_r, hr_m, lr_m = _volumes(setup, R=32, init_res=8,
                                      threshold=0.1)
    np.testing.assert_allclose(np.asarray(hr_r), np.asarray(hr_m),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(lr_r), np.asarray(lr_m),
                               atol=2e-4)


def test_runs_octree_matches_mono_with_init_mask(setup):
    """Silhouette init masks: pre-pruned points stay 0 in both modes."""
    fw, feat_lr, feat_hr, calib = setup
    from surs_tpu.recon.evaluator import silhouette_init_masks
    R, init_res = 32, 8
    mat = grid_matrix((R,) * 3, np.array([-0.5, -0.5, -0.5]),
                      np.array([0.5, 0.5, 0.5]))
    m = np.zeros((24, 24), np.float32)
    m[4:18, 7:15] = 1.0
    masks = silhouette_init_masks(jnp.asarray(m), np.asarray(calib), R,
                                  mat, init_resolution=init_res,
                                  dilate=1)
    hr_r, lr_r, hr_m, lr_m = _volumes(setup, R=R, init_res=init_res,
                                      threshold=0.1, init_dirty=masks)
    np.testing.assert_allclose(np.asarray(hr_r), np.asarray(hr_m),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(lr_r), np.asarray(lr_m),
                               atol=2e-4)


def test_runs_hierarchical_window_compaction(setup, monkeypatch):
    """Shrink the window-compaction group so a 32^3 run exercises the
    hierarchical 1-D block-summary + buffered multi-group path."""
    import surs_tpu.recon.evaluator_runs as er
    monkeypatch.setattr(er, "_WBLOCK", 8)
    monkeypatch.setattr(er, "_WGROUP_BLOCKS", 16)   # 128 windows/group
    hr_r, lr_r, hr_m, lr_m = _volumes(setup, R=32, init_res=8,
                                      threshold=0.1, nwin_chunk=96)
    np.testing.assert_allclose(np.asarray(hr_r), np.asarray(hr_m),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(lr_r), np.asarray(lr_m),
                               atol=2e-4)


def test_runs_supported_gates():
    calib = np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32)[None]
    mat = grid_matrix((32,) * 3, np.array([-0.5] * 3), np.array([0.5] * 3))
    assert runs_supported(calib, mat, 32, 8)
    # rotated calibration mixes z into (u, v): not separable
    th = 0.3
    rot = np.eye(4, dtype=np.float32)
    rot[0, 0], rot[0, 2] = np.cos(th), np.sin(th)
    rot[2, 0], rot[2, 2] = -np.sin(th), np.cos(th)
    assert not runs_supported((rot @ calib[0])[None], mat, 32, 8)
    # init level below the window size
    assert not runs_supported(calib, mat, 16, 4)
    # weight-shape gate: the runs kernel needs a free hr pad lane, so a
    # 128-aligned C_hr must fall back to the mono program instead of
    # asserting mid-trace (fused_mlp.fused_dual_mlp_runs precondition)
    class _Spec:
        base_segments = (256, 64, 1)

    class _SpecAligned:
        base_segments = (256, 128, 1)

    class _FW:
        spec_lr = _Spec()

    class _FWAligned:
        spec_lr = _SpecAligned()

    assert runs_supported(calib, mat, 32, 8, cols_weights=_FW())
    assert not runs_supported(calib, mat, 32, 8,
                              cols_weights=_FWAligned())


def test_reconstructor_runs_mode_fallback():
    """octree_mode='runs' must fall back to the generic mono program
    when no cols weights are attached (and still produce fields)."""
    from surs_tpu.models import SuRSNet
    from surs_tpu.recon.pipeline import Reconstructor
    rng = np.random.default_rng(7)
    net = SuRSNet(load_size=32, num_stack_lr=2)
    S = 16
    img = jnp.asarray(rng.standard_normal((1, S, S, 3)).astype(np.float32))
    img_hr = jnp.asarray(
        rng.standard_normal((1, 2 * S, 2 * S, 3)).astype(np.float32))
    pts0 = jnp.asarray((rng.random((1, 3, 4)) - 0.5).astype(np.float32))
    calib = jnp.asarray(np.diag([2.0, -2.0, 2.0, 1.0]).astype(
        np.float32))[None]
    params = net.init(jax.random.PRNGKey(0), img, img_hr, pts0, pts0,
                      calib, train=True)["params"]
    rec = Reconstructor(net, octree_mode="runs")     # no cols_weights
    _, feats_lr, feat_hr = rec.encode(params, img)
    sdf_hr, sdf_lr, _ = rec.evaluate(
        params, feats_lr, feat_hr, np.asarray(calib), 16,
        np.array([-0.5] * 3), np.array([0.5] * 3),
        num_samples=977, init_resolution=8)
    assert sdf_hr.shape == (16, 16, 16)
    assert np.isfinite(np.asarray(sdf_hr)).all()


def test_runs_octree_packed_matches_unpacked(setup):
    """feature_pack=True (quad-packed lr gathers) is numerically
    identical to the 4-tap path (same tap weights, pre-baked padding)."""
    fw, feat_lr, feat_hr, calib = setup
    R, init_res = 16, 8
    mat = grid_matrix((R,) * 3, np.array([-0.5] * 3), np.array([0.5] * 3))
    kw = dict(threshold=0.1, init_resolution=init_res, nwin_chunk=64,
              run_block=2, use_pallas=False)
    hr_a, lr_a = eval_grid_octree_runs(fw, feat_lr, feat_hr, calib, R,
                                       mat, load_size=LOAD_SIZE,
                                       z_size=Z_SIZE, **kw)
    hr_b, lr_b = eval_grid_octree_runs(fw, feat_lr, feat_hr, calib, R,
                                       mat, load_size=LOAD_SIZE,
                                       z_size=Z_SIZE, feature_pack=True,
                                       **kw)
    np.testing.assert_allclose(np.asarray(hr_b), np.asarray(hr_a),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(lr_b), np.asarray(lr_a),
                               atol=1e-5)


def test_win_group_compact_packed_matches_unpacked():
    """The packed window compaction (2 word gathers per 64-window
    block) must reproduce `_win_group_compact` EXACTLY."""
    import jax.numpy as jnp
    from surs_tpu.recon import evaluator_runs as er
    from surs_tpu.recon.evaluator import _pack_bits

    rng = np.random.default_rng(13)
    NW = 4096
    win = jnp.asarray(rng.random((NW,)) < 0.1)
    G = 8
    S = G * 64
    blk, nb = er._win_block_summary(win, NW, 64, G)
    wwords = _pack_bits(win)
    for g0 in range(0, int(nb), G):
        c_u, n_u = er._win_group_compact(win, blk, jnp.int32(g0), nb,
                                         64, G, S)
        c_p, n_p = er._win_group_compact_packed(wwords, blk,
                                                jnp.int32(g0), nb, 64,
                                                G, S)
        assert int(n_u) == int(n_p)
        np.testing.assert_array_equal(
            np.asarray(c_u)[:int(n_u)], np.asarray(c_p)[:int(n_p)])


def test_compact_flags_1d_packed_matches_direct(monkeypatch):
    """The 1-D two-level packed compaction (used by the window-block
    summary above 32k blocks) must match the direct cumsum+scatter:
    same ids, same ascending order, zeros past the count."""
    import numpy as np
    import jax.numpy as jnp
    from surs_tpu.recon import evaluator as ev

    rng = np.random.default_rng(11)
    for n, dens in ((4096, 0.02), (4096, 0.6), (4096, 0.0), (4000, 0.1)):
        flags = rng.random(n) < dens
        n_out = n + 64
        direct, nd = ev._compact_flags_1d(jnp.asarray(flags), n_out)
        # force the packed path by shrinking the threshold + group
        monkeypatch.setattr(ev, "_1D_MIN_FLAGS", 64)
        monkeypatch.setattr(ev, "_1D_GROUP_WORDS", 4)
        packed, npk = ev._compact_flags_1d(jnp.asarray(flags), n_out)
        monkeypatch.undo()
        assert int(nd) == int(npk) == int(flags.sum())
        # exact buffer equality: same ids in ascending order, zeros past
        # the count on both paths
        assert np.array_equal(np.asarray(direct), np.asarray(packed))
