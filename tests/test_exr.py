"""First-party EXR reader/writer + the UV color-supervision path."""

import os

import numpy as np
import pytest

from surs_tpu.utils.exr import read_exr, write_exr


@pytest.mark.parametrize("half,compress", [(False, False), (False, True),
                                           (True, True)])
def test_exr_roundtrip(tmp_path, half, compress):
    rng = np.random.default_rng(0)
    img = rng.standard_normal((37, 21, 3)).astype(np.float32) * 3.0
    p = str(tmp_path / "t.exr")
    write_exr(p, img, half=half, compress=compress)
    out = read_exr(p)
    assert out.shape == img.shape
    tol = 2e-2 if half else 0.0
    np.testing.assert_allclose(out, img.astype(
        np.float16 if half else np.float32).astype(np.float32), atol=tol)


def test_exr_zip_multiblock(tmp_path):
    """ZIP blocks cover 16 scanlines; exercise multiple blocks + a
    partial tail block."""
    rng = np.random.default_rng(1)
    img = (rng.random((40, 8, 3)) * 100).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img, compress=True)
    np.testing.assert_array_equal(read_exr(p), img)


def test_uv_color_sampling(tmp_path):
    """TrainDataset.get_color_sampling consumes the reference's
    UV_RENDER/UV_MASK/UV_POS/UV_NORMAL layout: sampled points lie at
    pos + offset*normal of masked texels; colors map to [-1, 1]."""
    from PIL import Image
    from surs_tpu.config import SuRSConfig
    from surs_tpu.data import TrainDataset

    root = str(tmp_path)
    subj = "s0"
    for d in ("RENDER", "MASK", "PARAM", "UV_RENDER", "UV_MASK",
              "UV_POS", "UV_NORMAL"):
        os.makedirs(os.path.join(root, d, subj), exist_ok=True)
    os.makedirs(os.path.join(root, "GEO", "OBJ"), exist_ok=True)
    open(os.path.join(root, "val.txt"), "w").write("")
    # minimal RENDER layout so the dataset can enumerate subjects
    Image.new("RGB", (8, 8)).save(
        os.path.join(root, "RENDER", subj, "0_0_00.jpg"))

    H = W = 16
    rng = np.random.default_rng(2)
    mask = np.zeros((H, W), np.uint8)
    mask[4:12, 4:12] = 255
    colors = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    normals = np.zeros((H, W, 3), np.float32)
    normals[..., 1] = 1.0                     # +y everywhere
    pos = rng.standard_normal((H, W, 3)).astype(np.float32)

    Image.fromarray(mask).save(
        os.path.join(root, "UV_MASK", subj, "00.png"))
    Image.fromarray(colors).save(
        os.path.join(root, "UV_RENDER", subj, "0_0_00.jpg"), quality=98)
    Image.fromarray(((normals + 1) * 127.5).astype(np.uint8)).save(
        os.path.join(root, "UV_NORMAL", subj, "00.png"))
    write_exr(os.path.join(root, "UV_POS", subj, "00.exr"), pos)

    cfg = SuRSConfig(dataroot=root, num_sample_color=32, sigma=0.05,
                     num_sample_inout=0)
    ds = TrainDataset(cfg, phase="train", yaw_list=[0])
    assert ds.has_uv_renders()
    out = ds.get_color_sampling(subj, 0, 0, rng=np.random.default_rng(3))
    assert out["color_samples"].shape == (3, 32)
    assert out["rgbs"].shape == (3, 32)
    assert np.all(out["rgbs"] >= -1.0) and np.all(out["rgbs"] <= 1.0)
    # every sample's x/z must equal a masked texel position's x/z up to
    # the 8-bit normal quantization (the jitter is along ~+y)
    masked_pos = pos[4:12, 4:12].reshape(-1, 3)
    for i in range(32):
        d = np.abs(masked_pos[:, [0, 2]]
                   - out["color_samples"][[0, 2], i]).sum(1)
        assert d.min() < 3e-3


def test_uv_color_samples_drive_netc_training(tmp_path):
    """End-to-end: UV-sampled color labels feed the netC training step
    (batch contract: points [B,3,N] from color_samples, rgbs [B,N,3])."""
    import jax
    import jax.numpy as jnp
    import optax
    from PIL import Image
    from surs_tpu.config import SuRSConfig
    from surs_tpu.data import TrainDataset
    from surs_tpu.models.pifu_legacy import ResBlkColorNet
    from surs_tpu.train.color import (create_color_state,
                                      make_color_train_step)

    root = str(tmp_path)
    subj = "s0"
    for d in ("RENDER", "UV_RENDER", "UV_MASK", "UV_POS", "UV_NORMAL"):
        os.makedirs(os.path.join(root, d, subj), exist_ok=True)
    open(os.path.join(root, "val.txt"), "w").write("")
    Image.new("RGB", (8, 8)).save(
        os.path.join(root, "RENDER", subj, "0_0_00.jpg"))
    H = W = 12
    rng = np.random.default_rng(4)
    Image.fromarray(np.full((H, W), 255, np.uint8)).save(
        os.path.join(root, "UV_MASK", subj, "00.png"))
    Image.fromarray((rng.random((H, W, 3)) * 255).astype(np.uint8)).save(
        os.path.join(root, "UV_RENDER", subj, "0_0_00.jpg"))
    Image.fromarray(np.full((H, W, 3), 255, np.uint8)).save(
        os.path.join(root, "UV_NORMAL", subj, "00.png"))
    write_exr(os.path.join(root, "UV_POS", subj, "00.exr"),
              rng.standard_normal((H, W, 3)).astype(np.float32) * 0.3)

    cfg = SuRSConfig(dataroot=root, num_sample_color=24, sigma=0.02,
                     num_sample_inout=0)
    ds = TrainDataset(cfg, phase="train", yaw_list=[0])
    col = ds.get_color_sampling(subj, 0, 0, rng=rng)

    net = ResBlkColorNet(load_size=16,
                         mlp_dim_color=(257, 64, 32, 3))
    opt = optax.adam(1e-3)
    batch = {
        "images": jnp.asarray(
            rng.standard_normal((1, 16, 16, 3)).astype(np.float32)),
        "points": jnp.asarray(col["color_samples"][None]),
        "calibs": jnp.asarray(np.diag(
            [2.0, -2.0, 2.0, 1.0]).astype(np.float32))[None],
        "rgbs": jnp.asarray(col["rgbs"].T[None]),
    }
    state = create_color_state(net, opt, jax.random.PRNGKey(0), batch)
    step = make_color_train_step(net, opt)
    losses = []
    for _ in range(3):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
