"""Torch state-dict import shim tests.

Builds a synthetic reference-named state dict (shapes from a tiny SuRSNet
config), imports it, and verifies tensors land on the right Flax leaves
with the right transposes — plus that dead reference weights are dropped.
"""

import numpy as np
import jax
import jax.numpy as jnp

from surs_tpu.models import SuRSNet
from surs_tpu.compat import import_torch_state_dict


def init_tiny_params():
    net = SuRSNet(load_size=32, num_stack_lr=2)
    rng = np.random.default_rng(0)
    S = 16
    args = (
        jnp.asarray(rng.standard_normal((1, S, S, 3)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((1, 2 * S, 2 * S, 3)).astype(
            np.float32)),
        jnp.asarray((rng.random((1, 3, 4)) - 0.5).astype(np.float32)),
        jnp.asarray((rng.random((1, 3, 4)) - 0.5).astype(np.float32)),
        jnp.asarray(np.diag([2.0, -2.0, 2.0, 1.0]).astype(
            np.float32))[None],
    )
    params = net.init(jax.random.PRNGKey(0), *args, train=True)["params"]
    return net, params


def test_conv2d_weight_mapping():
    net, params = init_tiny_params()
    k = np.asarray(params["super_resolution"]["head"]["conv"]["kernel"])
    w_torch = np.arange(np.prod(k.shape), dtype=np.float32).reshape(
        k.shape[3], k.shape[2], k.shape[0], k.shape[1])  # [out,in,kh,kw]
    sd = {"super_resolution.head.0.weight": w_torch,
          "super_resolution.head.0.bias": np.zeros(k.shape[3], np.float32)}
    new_params, n = import_torch_state_dict(sd, params, strict=False)
    assert n == 2
    got = np.asarray(new_params["super_resolution"]["head"]["conv"]["kernel"])
    np.testing.assert_array_equal(got, w_torch.transpose(2, 3, 1, 0))


def test_conv1d_mlp_mapping():
    net, params = init_tiny_params()
    k = np.asarray(params["mlp_lr"]["conv0"]["kernel"])  # [in, out]
    w_torch = np.random.default_rng(1).standard_normal(
        (k.shape[1], k.shape[0], 1)).astype(np.float32)  # [out, in, 1]
    sd = {"mlp_lr.conv0.weight": w_torch,
          "mlp_lr.conv0.bias": np.ones(k.shape[1], np.float32)}
    new_params, n = import_torch_state_dict(sd, params, strict=False)
    assert n == 2
    got = np.asarray(new_params["mlp_lr"]["conv0"]["kernel"])
    np.testing.assert_array_equal(got, w_torch[:, :, 0].T)
    assert np.asarray(new_params["mlp_lr"]["conv0"]["bias"]).min() == 1.0


def test_groupnorm_and_hourglass_mapping():
    net, params = init_tiny_params()
    gn = params["image_filter_lr"]["m0"]["b1_2"]["bn1"]["gn"]
    w = np.full(np.asarray(gn["scale"]).shape, 2.0, np.float32)
    sd = {"image_filter_lr.m0.b1_2.bn1.weight": w,
          "image_filter_lr.m0.b1_2.bn1.bias": w * 0}
    new_params, n = import_torch_state_dict(sd, params, strict=False)
    assert n == 2
    got = np.asarray(
        new_params["image_filter_lr"]["m0"]["b1_2"]["bn1"]["gn"]["scale"])
    np.testing.assert_array_equal(got, w)


def test_dead_reference_weights_dropped():
    net, params = init_tiny_params()
    sd = {
        "image_filter_hr.conv1.weight": np.zeros((64, 64, 7, 7), np.float32),
        "image_filter_hr.bn1.weight": np.zeros(64, np.float32),
        "super_resolution.sub_mean.weight": np.zeros((3, 3, 1, 1),
                                                     np.float32),
        "image_filter_lr.conv2.downsample.0.weight": np.zeros(
            (256,), np.float32),
        "image_filter_hr.m0.b1_2.conv1.weight": np.zeros((128, 256, 3, 3),
                                                         np.float32),
    }
    _, n = import_torch_state_dict(sd, params, strict=False)
    assert n == 0  # everything dropped, nothing raised


def test_batchnorm_checkpoint_imports_into_batch_model():
    """A --norm batch checkpoint resolves norm leaves to the 'bn'
    submodule and lands running stats in batch_stats."""
    net = SuRSNet(load_size=32, num_stack_lr=2, norm="batch")
    rng = np.random.default_rng(0)
    S = 16
    args = (
        jnp.asarray(rng.standard_normal((1, S, S, 3)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((1, 2 * S, 2 * S, 3)).astype(
            np.float32)),
        jnp.asarray((rng.random((1, 3, 4)) - 0.5).astype(np.float32)),
        jnp.asarray((rng.random((1, 3, 4)) - 0.5).astype(np.float32)),
        jnp.asarray(np.diag([2.0, -2.0, 2.0, 1.0]).astype(
            np.float32))[None],
    )
    variables = net.init(jax.random.PRNGKey(0), *args, train=True)
    params, stats = variables["params"], variables["batch_stats"]
    bn = params["image_filter_lr"]["m0"]["b1_2"]["bn1"]["bn"]
    C = np.asarray(bn["scale"]).shape[0]
    sd = {
        "image_filter_lr.m0.b1_2.bn1.weight": np.full(C, 2.0, np.float32),
        "image_filter_lr.m0.b1_2.bn1.bias": np.full(C, 0.5, np.float32),
        "image_filter_lr.m0.b1_2.bn1.running_mean": np.full(C, 3.0,
                                                            np.float32),
        "image_filter_lr.m0.b1_2.bn1.running_var": np.full(C, 4.0,
                                                           np.float32),
        "image_filter_lr.m0.b1_2.bn1.num_batches_tracked": np.asarray(7),
    }
    new_params, new_stats, n = import_torch_state_dict(
        sd, params, strict=False, batch_stats=stats)
    assert n == 4
    got = new_params["image_filter_lr"]["m0"]["b1_2"]["bn1"]["bn"]
    np.testing.assert_array_equal(np.asarray(got["scale"]),
                                  np.full(C, 2.0, np.float32))
    got_s = new_stats["image_filter_lr"]["m0"]["b1_2"]["bn1"]["bn"]
    np.testing.assert_array_equal(np.asarray(got_s["mean"]),
                                  np.full(C, 3.0, np.float32))
    np.testing.assert_array_equal(np.asarray(got_s["var"]),
                                  np.full(C, 4.0, np.float32))


def test_batchnorm_stats_without_tree_raise_clearly():
    """Strict: running stats with no batch_stats tree raise with a
    clear message; lenient partial imports skip them like any other
    unmatched leaf."""
    import pytest
    net, params = init_tiny_params()  # group-norm model
    sd = {"image_filter_lr.m0.b1_2.bn1.running_mean":
          np.zeros(8, np.float32)}
    with pytest.raises(ValueError, match="batch_stats"):
        import_torch_state_dict(sd, params, strict=True)
    _, n = import_torch_state_dict(sd, params, strict=False)
    assert n == 0


def test_resblock_and_tail_mapping():
    net, params = init_tiny_params()
    # SuRSNet default has residual=False; use SR net with residual=True
    from surs_tpu.models import SuRSSR
    sr = SuRSSR(residual=True)
    x = jnp.zeros((1, 8, 8, 3))
    p = sr.init(jax.random.PRNGKey(0), x)["params"]
    k = np.asarray(p["body1_0"]["conv0"]["kernel"])
    w = np.random.default_rng(2).standard_normal(
        (k.shape[3], k.shape[2], 3, 3)).astype(np.float32)
    sd = {"body1.0.body.0.weight": w}
    # wrap keys as they appear inside SuRSNet
    sd = {f"super_resolution.{key}": v for key, v in sd.items()}
    wrapped = {"super_resolution": p}
    new_params, n = import_torch_state_dict(sd, wrapped, strict=False)
    assert n == 1
    got = np.asarray(
        new_params["super_resolution"]["body1_0"]["conv0"]["kernel"])
    np.testing.assert_array_equal(got, w.transpose(2, 3, 1, 0))


def test_batch_norm_eval_threads_running_stats(rng):
    """load_params returns the full variables dict for norm='batch' and
    the Reconstructor's encode/query accept it — batch-norm eval runs
    on the imported running statistics instead of failing (or silently
    using none)."""
    import jax
    import numpy as np
    from surs_tpu.config import SuRSConfig
    from surs_tpu.compat.torch_import import load_params
    from surs_tpu.models import surs_net_from_config
    from surs_tpu.recon.pipeline import Reconstructor

    cfg = SuRSConfig(loadSize=32, num_stack_lr=2, norm="batch",
                     load_netG_checkpoint_path=None)
    model = surs_net_from_config(cfg)
    params = load_params(cfg, model)
    assert "batch_stats" in params      # variables dict, not bare tree
    rec = Reconstructor(model)
    img = np.asarray(rng.standard_normal((1, 16, 16, 3)), np.float32)
    _, feats_lr, feat_hr = rec.encode(params, img)
    assert np.isfinite(np.asarray(feat_hr)).all()
    calib = np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32)[None]
    hr, lr = rec.query_points(params, feats_lr, feat_hr, calib,
                              np.zeros((3, 4), np.float32))
    assert np.isfinite(np.asarray(hr)).all()
