"""Legacy PIFu capability surface: backbones, ConvPIFuNet, Vhull oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from surs_tpu.models.pifu_legacy import (MultiConvFilter, VGGStyleFilter,
                                         ResNetStyleFilter, ConvPIFuNet,
                                         MLP, VhullNet, ResBlkColorNet)


def test_backbone_shapes(rng):
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    for cls, n_feats in [(MultiConvFilter, 4), (VGGStyleFilter, 3),
                         (ResNetStyleFilter, 4)]:
        net = cls()
        params = net.init(jax.random.PRNGKey(0), x)["params"]
        feats = net.apply({"params": params}, x)
        assert len(feats) == n_feats


def test_conv_pifu_forward(rng):
    net = ConvPIFuNet(load_size=32)
    img = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    pts = jnp.asarray((rng.random((1, 3, 10)) - 0.5).astype(np.float32))
    calib = jnp.asarray(np.diag([2.0, -2.0, 2.0, 1.0]).astype(
        np.float32))[None]
    params = net.init(jax.random.PRNGKey(0), img, pts, calib)["params"]
    out = net.apply({"params": params}, img, pts, calib)
    assert out.shape == (1, 10, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_mlp_with_norm(rng):
    mlp = MLP((64, 128, 64, 1), res_layers=(1,))
    x = jnp.asarray(rng.standard_normal((2, 7, 64)).astype(np.float32))
    params = mlp.init(jax.random.PRNGKey(0), x)["params"]
    out = mlp.apply({"params": params}, x)
    assert out.shape == (2, 7, 1)


def test_vhull_oracle_sphere():
    """The Vhull oracle recovers a centered box from 2 orthogonal views."""
    H = W = 33
    yy, xx = np.mgrid[:H, :W]
    # square mask centered, half-width 8 px around center 16
    m = ((np.abs(xx - 16) <= 8) & (np.abs(yy - 16) <= 8)).astype(np.float32)
    masks = jnp.asarray(np.stack([m, m])[..., None])        # [2, H, W, 1]
    # view 0: identity ortho; view 1: rotated 90° about y
    c0 = np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32)
    rot = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32)
    c1 = c0.copy()
    c1[:3, :3] = c0[:3, :3] @ rot
    calibs = jnp.asarray(np.stack([c0, c1]))

    vh = VhullNet()
    # points: center (inside), offset past the square edge (outside)
    pts = jnp.asarray(np.array(
        [[[0.0, 0.4], [0.0, 0.0], [0.0, 0.0]]], np.float32))
    occ = np.asarray(vh.query(masks, pts, calibs))
    # 0.4 * 2 = 0.8 uv -> pixel offset 0.8*16 = 12.8 > 8 -> outside
    np.testing.assert_array_equal(occ[0], [1.0, 0.0])


def test_color_net(rng):
    net = ResBlkColorNet(load_size=32)
    img = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    pts = jnp.asarray((rng.random((1, 3, 5)) - 0.5).astype(np.float32))
    calib = jnp.asarray(np.diag([2.0, -2.0, 2.0, 1.0]).astype(
        np.float32))[None]
    params = net.init(jax.random.PRNGKey(0), img, pts, calib)["params"]
    out = net.apply({"params": params}, img, pts, calib)
    assert out.shape == (1, 5, 3)
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0
