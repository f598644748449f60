"""Fused dual-MLP kernel parity vs the Flax SurfaceClassifier modules."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from surs_tpu.models import SurfaceClassifier, SuRSNet
from surs_tpu.ops.fused_mlp import (prepare_fused_weights, fused_dual_mlp,
                                    fused_dual_mlp_xla)
from surs_tpu.ops.point_query import make_fused_query_fn

DIMS_LR = (321, 1024, 512, 256, 128, 1)
DIMS_HR = (322, 1024, 512, 256, 128, 1)


@pytest.fixture(scope="module")
def mlps():
    mlp_lr = SurfaceClassifier(DIMS_LR, res_layers=(2, 3, 4))
    mlp_hr = SurfaceClassifier(DIMS_HR, res_layers=(2, 3, 4))
    x_lr = jnp.zeros((1, 4, DIMS_LR[0]))
    x_hr = jnp.zeros((1, 4, DIMS_HR[0]))
    p_lr = mlp_lr.init(jax.random.PRNGKey(0), x_lr)["params"]
    p_hr = mlp_hr.init(jax.random.PRNGKey(1), x_hr)["params"]
    return mlp_lr, mlp_hr, p_lr, p_hr


def reference_chain(mlps, x):
    """Coarse -> conditioning -> fine via the Flax modules."""
    mlp_lr, mlp_hr, p_lr, p_hr = mlps
    pred_lr = mlp_lr.apply({"params": p_lr}, x[None])          # [1, N, 1]
    inp_hr = jnp.concatenate([x[None], pred_lr], axis=-1)
    pred_hr = mlp_hr.apply({"params": p_hr}, inp_hr)
    return np.asarray(pred_hr[0, :, 0]), np.asarray(pred_lr[0, :, 0])


def test_xla_path_matches_flax(mlps, rng):
    _, _, p_lr, p_hr = mlps
    fw = prepare_fused_weights(p_lr, p_hr, DIMS_LR, DIMS_HR)
    x = jnp.asarray(rng.standard_normal((37, 321)).astype(np.float32))
    hr, lr = fused_dual_mlp_xla(x, fw)
    ref_hr, ref_lr = reference_chain(mlps, x)
    np.testing.assert_allclose(np.asarray(lr), ref_lr, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hr), ref_hr, rtol=1e-5, atol=1e-6)


def test_pallas_kernel_matches_flax(mlps, rng):
    """interpret=True exercises the exact kernel program on CPU."""
    _, _, p_lr, p_hr = mlps
    fw = prepare_fused_weights(p_lr, p_hr, DIMS_LR, DIMS_HR)
    x = jnp.asarray(rng.standard_normal((300, 321)).astype(np.float32))
    hr, lr = fused_dual_mlp(x, fw, block_n=256, interpret=True)
    ref_hr, ref_lr = reference_chain(mlps, x)
    np.testing.assert_allclose(np.asarray(lr), ref_lr, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hr), ref_hr, rtol=1e-5, atol=1e-6)


def test_fused_query_matches_model(rng):
    """End-to-end: fused query path == SuRSNet.query on random weights."""
    net = SuRSNet(load_size=32, num_stack_lr=2)
    S, N = 16, 50
    img = jnp.asarray(rng.standard_normal((1, S, S, 3)).astype(np.float32))
    img_hr = jnp.asarray(
        rng.standard_normal((1, 2 * S, 2 * S, 3)).astype(np.float32))
    pts0 = jnp.asarray((rng.random((1, 3, 4)) - 0.5).astype(np.float32))
    calib0 = jnp.asarray(np.diag([2.0, -2.0, 2.0, 1.0]).astype(
        np.float32))[None]
    variables = net.init(jax.random.PRNGKey(0), img, img_hr, pts0, pts0,
                         calib0, train=True)
    params = variables["params"]
    _, feats_lr, feat_hr = net.apply({"params": params}, img, train=False,
                                     method=SuRSNet.encode)
    pts = jnp.asarray((rng.random((1, 3, N)) - 0.5).astype(np.float32))
    calib = jnp.asarray(np.tile(
        np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32), (1, 1, 1)))

    ref_hr, ref_lr = net.apply({"params": params}, feats_lr, feat_hr, pts,
                               calib, method=SuRSNet.query)

    fw = prepare_fused_weights(params["mlp_lr"], params["mlp_hr"],
                               DIMS_LR, DIMS_HR)
    qf = make_fused_query_fn(load_size=32, z_size=200.0,
                             use_pallas=False)
    got_hr, got_lr = qf(fw, feats_lr, feat_hr, pts, calib)
    np.testing.assert_allclose(np.asarray(got_lr), np.asarray(ref_lr),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_hr), np.asarray(ref_hr),
                               rtol=1e-5, atol=1e-6)


def test_split_concat_variant_matches(mlps, rng):
    _, _, p_lr, p_hr = mlps
    fw = prepare_fused_weights(p_lr, p_hr, DIMS_LR, DIMS_HR)
    x = jnp.asarray(rng.standard_normal((256, 321)).astype(np.float32))
    base_hr, base_lr = fused_dual_mlp(x, fw, block_n=256, interpret=True)
    sp_hr, sp_lr = fused_dual_mlp(x, fw, block_n=256, interpret=True,
                                  split_concat=True)
    np.testing.assert_allclose(np.asarray(sp_hr), np.asarray(base_hr),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sp_lr), np.asarray(base_lr),
                               rtol=1e-5, atol=1e-6)


def test_segmented_input_matches_single(mlps, rng):
    """base_split-prepared weights + per-segment inputs == monolithic
    input path (the packed-gather inference layout; no [N, C_in] concat
    ever materializes)."""
    _, _, p_lr, p_hr = mlps
    fw1 = prepare_fused_weights(p_lr, p_hr, DIMS_LR, DIMS_HR)
    fw2 = prepare_fused_weights(p_lr, p_hr, DIMS_LR, DIMS_HR,
                                base_split=(256, 65))
    x = jnp.asarray(rng.standard_normal((256, 321)).astype(np.float32))
    parts = [x[:, :256], x[:, 256:]]
    ref_hr, ref_lr = fused_dual_mlp_xla(x, fw1)
    got_hr, got_lr = fused_dual_mlp_xla(parts, fw2)
    np.testing.assert_allclose(np.asarray(got_hr), np.asarray(ref_hr),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_lr), np.asarray(ref_lr),
                               rtol=1e-5, atol=1e-6)
    # exact kernel program (interpret mode), both concat modes
    for sc in (False, True):
        k_hr, k_lr = fused_dual_mlp(parts, fw2, block_n=256,
                                    interpret=True, split_concat=sc)
        np.testing.assert_allclose(np.asarray(k_hr), np.asarray(ref_hr),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(k_lr), np.asarray(ref_lr),
                                   rtol=1e-5, atol=1e-6)


def test_fused_query_packed_matches_model(rng):
    """Packed-gather query path == SuRSNet.query end to end."""
    net = SuRSNet(load_size=32, num_stack_lr=2)
    S, N = 16, 50
    img = jnp.asarray(rng.standard_normal((1, S, S, 3)).astype(np.float32))
    img_hr = jnp.asarray(
        rng.standard_normal((1, 2 * S, 2 * S, 3)).astype(np.float32))
    pts0 = jnp.asarray((rng.random((1, 3, 4)) - 0.5).astype(np.float32))
    calib0 = jnp.asarray(np.diag([2.0, -2.0, 2.0, 1.0]).astype(
        np.float32))[None]
    params = net.init(jax.random.PRNGKey(0), img, img_hr, pts0, pts0,
                      calib0, train=True)["params"]
    _, feats_lr, feat_hr = net.apply({"params": params}, img, train=False,
                                     method=SuRSNet.encode)
    # points both inside and outside the image
    pts = jnp.asarray((rng.random((1, 3, N)) - 0.5).astype(np.float32) * 1.6)
    calib = jnp.asarray(np.diag([2.0, -2.0, 2.0, 1.0]).astype(
        np.float32))[None]
    ref_hr, ref_lr = net.apply({"params": params}, feats_lr, feat_hr, pts,
                               calib, method=SuRSNet.query)

    C_lr = feats_lr[-1].shape[-1]
    C_hr = feat_hr.shape[-1]
    fw = prepare_fused_weights(params["mlp_lr"], params["mlp_hr"],
                               DIMS_LR, DIMS_HR,
                               base_split=(C_lr, C_hr + 1))
    from surs_tpu.ops.grid_sample import pack_bilinear
    qf = make_fused_query_fn(load_size=32, z_size=200.0,
                             use_pallas=False, packed=True)
    got_hr, got_lr = qf(fw, [pack_bilinear(feats_lr[-1])],
                        feat_hr, pts, calib)
    np.testing.assert_allclose(np.asarray(got_lr), np.asarray(ref_lr),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_hr), np.asarray(ref_hr),
                               rtol=1e-5, atol=1e-6)


def test_cols_kernel_matches_flax(mlps, rng):
    """Column-shared kernel (interpret=True) == the Flax chain on the
    expanded per-point inputs, and == its XLA twin."""
    from surs_tpu.ops.fused_mlp import (fused_dual_mlp_cols,
                                        fused_dual_mlp_cols_xla)
    _, _, p_lr, p_hr = mlps
    C_lr, C_hr = 256, 64
    fw = prepare_fused_weights(p_lr, p_hr, DIMS_LR, DIMS_HR,
                               base_split=(C_lr, C_hr, 1))
    Ncol, Z = 6, 16
    x_lr = jnp.asarray(rng.standard_normal((Ncol, C_lr)).astype(
        np.float32))
    x_hr = jnp.asarray(rng.standard_normal((Ncol, C_hr)).astype(
        np.float32))
    zf = jnp.asarray(rng.standard_normal((Z,)).astype(np.float32))

    hr, lr = fused_dual_mlp_cols(x_lr, x_hr, zf, fw, col_block=2,
                                 interpret=True)
    assert hr.shape == (Ncol, Z)
    hr_x, lr_x = fused_dual_mlp_cols_xla(x_lr, x_hr, zf, fw)
    np.testing.assert_allclose(np.asarray(hr), np.asarray(hr_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lr), np.asarray(lr_x),
                               rtol=1e-5, atol=1e-6)

    # oracle: the Flax chain on the expanded per-point concat input
    x_full = jnp.concatenate(
        [jnp.repeat(x_lr, Z, axis=0), jnp.repeat(x_hr, Z, axis=0),
         jnp.tile(zf[:, None], (Ncol, 1))], axis=-1)
    ref_hr, ref_lr = reference_chain(mlps, x_full)
    np.testing.assert_allclose(np.asarray(lr).reshape(-1), ref_lr,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hr).reshape(-1), ref_hr,
                               rtol=1e-5, atol=1e-6)


def test_cols_kernel_ragged_ncol(mlps, rng):
    """Ncol not divisible by col_block: pad columns are dropped."""
    from surs_tpu.ops.fused_mlp import (fused_dual_mlp_cols,
                                        fused_dual_mlp_cols_xla)
    _, _, p_lr, p_hr = mlps
    fw = prepare_fused_weights(p_lr, p_hr, DIMS_LR, DIMS_HR,
                               base_split=(256, 64, 1))
    Ncol, Z = 3, 8
    x_lr = jnp.asarray(rng.standard_normal((Ncol, 256)).astype(np.float32))
    x_hr = jnp.asarray(rng.standard_normal((Ncol, 64)).astype(np.float32))
    zf = jnp.asarray(rng.standard_normal((Z,)).astype(np.float32))
    hr, lr = fused_dual_mlp_cols(x_lr, x_hr, zf, fw, col_block=2,
                                 interpret=True)
    hr_x, lr_x = fused_dual_mlp_cols_xla(x_lr, x_hr, zf, fw)
    assert hr.shape == (Ncol, Z)
    np.testing.assert_allclose(np.asarray(hr), np.asarray(hr_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lr), np.asarray(lr_x),
                               rtol=1e-5, atol=1e-6)


def test_cols_kernel_z_blocked(mlps, rng):
    """Z >= 256 engages the z-sub-block grid (zb=256); parity holds
    across the block boundary."""
    from surs_tpu.ops.fused_mlp import (fused_dual_mlp_cols,
                                        fused_dual_mlp_cols_xla)
    _, _, p_lr, p_hr = mlps
    fw = prepare_fused_weights(p_lr, p_hr, DIMS_LR, DIMS_HR,
                               base_split=(256, 64, 1))
    Ncol, Z = 2, 512
    x_lr = jnp.asarray(rng.standard_normal((Ncol, 256)).astype(np.float32))
    x_hr = jnp.asarray(rng.standard_normal((Ncol, 64)).astype(np.float32))
    zf = jnp.asarray(np.linspace(-1.0, 1.0, Z).astype(np.float32))
    hr, lr = fused_dual_mlp_cols(x_lr, x_hr, zf, fw, col_block=2,
                                 interpret=True)
    hr_x, lr_x = fused_dual_mlp_cols_xla(x_lr, x_hr, zf, fw)
    np.testing.assert_allclose(np.asarray(hr), np.asarray(hr_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lr), np.asarray(lr_x),
                               rtol=1e-5, atol=1e-6)


def test_runs_kernel_matches_flax(mlps, rng):
    """Window ("runs") kernel (interpret=True) == the Flax chain on the
    expanded per-point inputs, and == its XLA twin. Exercises ragged NR
    (pad windows dropped) and the kernel's z-major block row layout."""
    from surs_tpu.ops.fused_mlp import (fused_dual_mlp_runs,
                                        fused_dual_mlp_runs_xla)
    _, _, p_lr, p_hr = mlps
    C_lr, C_hr = 256, 64
    fw = prepare_fused_weights(p_lr, p_hr, DIMS_LR, DIMS_HR,
                               base_split=(C_lr, C_hr, 1))
    NR, zb = 5, 8          # not a multiple of run_block=2? yes: ragged
    x_lr = jnp.asarray(rng.standard_normal((NR, C_lr)).astype(np.float32))
    x_hr = jnp.asarray(rng.standard_normal((NR, C_hr)).astype(np.float32))
    kf = jnp.asarray(rng.standard_normal((NR,)).astype(np.float32))
    zt = jnp.asarray(np.linspace(-0.3, 0.3, zb).astype(np.float32))

    hr, lr = fused_dual_mlp_runs(x_lr, x_hr, kf, zt, fw, run_block=2,
                                 interpret=True)
    assert hr.shape == (NR, zb)
    hr_x, lr_x = fused_dual_mlp_runs_xla(x_lr, x_hr, kf, zt, fw)
    np.testing.assert_allclose(np.asarray(hr), np.asarray(hr_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lr), np.asarray(lr_x),
                               rtol=1e-5, atol=1e-6)

    # oracle: the Flax chain on the expanded per-point concat input
    zf = np.asarray(kf)[:, None] + np.asarray(zt)[None, :]   # [NR, zb]
    x_full = jnp.concatenate(
        [jnp.repeat(x_lr, zb, axis=0), jnp.repeat(x_hr, zb, axis=0),
         jnp.asarray(zf.reshape(-1, 1))], axis=-1)
    ref_hr, ref_lr = reference_chain(mlps, x_full)
    np.testing.assert_allclose(np.asarray(lr).reshape(-1), ref_lr,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hr).reshape(-1), ref_hr,
                               rtol=1e-5, atol=1e-5)
