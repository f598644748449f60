"""Golden tests for the ops layer against torch-CPU reference semantics."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from surs_tpu import ops


def test_orthogonal_matches_reference(rng):
    B, N = 2, 17
    pts = rng.standard_normal((B, 3, N)).astype(np.float32)
    calib = rng.standard_normal((B, 4, 4)).astype(np.float32)
    out = np.asarray(ops.orthogonal(jnp.asarray(pts), jnp.asarray(calib)))
    # reference: torch.baddbmm(trans, rot, points) (lib/geometry.py:25)
    t_out = torch.baddbmm(torch.from_numpy(calib[:, :3, 3:4]),
                          torch.from_numpy(calib[:, :3, :3]),
                          torch.from_numpy(pts)).numpy()
    np.testing.assert_allclose(out, t_out, rtol=1e-5, atol=1e-5)


def test_orthogonal_with_transform(rng):
    B, N = 2, 9
    pts = rng.standard_normal((B, 3, N)).astype(np.float32)
    calib = rng.standard_normal((B, 4, 4)).astype(np.float32)
    tr = rng.standard_normal((B, 2, 3)).astype(np.float32)
    out = np.asarray(ops.orthogonal(jnp.asarray(pts), jnp.asarray(calib),
                                    jnp.asarray(tr)))
    base = torch.baddbmm(torch.from_numpy(calib[:, :3, 3:4]),
                         torch.from_numpy(calib[:, :3, :3]),
                         torch.from_numpy(pts))
    xy = torch.baddbmm(torch.from_numpy(tr[:, :2, 2:3]),
                       torch.from_numpy(tr[:, :2, :2]), base[:, :2, :])
    ref = torch.cat([xy, base[:, 2:3, :]], dim=1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_perspective_matches_reference(rng):
    B, N = 2, 11
    pts = rng.standard_normal((B, 3, N)).astype(np.float32)
    pts[:, 2] += 5.0  # keep depth away from zero
    calib = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    calib[:, :3, 3] = rng.standard_normal((B, 3)).astype(np.float32)
    out = np.asarray(ops.perspective(jnp.asarray(pts), jnp.asarray(calib)))
    homo = torch.baddbmm(torch.from_numpy(calib[:, :3, 3:4]),
                         torch.from_numpy(calib[:, :3, :3]),
                         torch.from_numpy(pts))
    xy = homo[:, :2, :] / homo[:, 2:3, :]
    ref = torch.cat([xy, homo[:, 2:3, :]], 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("H,W,N", [(16, 16, 64), (33, 17, 101)])
def test_grid_sample_matches_torch(rng, H, W, N):
    B, C = 2, 5
    feat = rng.standard_normal((B, C, H, W)).astype(np.float32)
    # include points outside [-1,1] to exercise zero padding
    uv = (rng.random((B, N, 2)).astype(np.float32) * 2.6 - 1.3)
    ref = F.grid_sample(torch.from_numpy(feat),
                        torch.from_numpy(uv).unsqueeze(2),
                        mode="bilinear", padding_mode="zeros",
                        align_corners=True)[:, :, :, 0].numpy()  # [B,C,N]
    feat_nhwc = jnp.asarray(feat.transpose(0, 2, 3, 1))
    out = np.asarray(ops.grid_sample_points(feat_nhwc, jnp.asarray(uv)))
    np.testing.assert_allclose(out.transpose(0, 2, 1), ref, rtol=1e-4, atol=1e-5)


def test_index_wrapper_layout(rng):
    B, C, H, W, N = 1, 3, 8, 8, 10
    feat = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    uv = rng.random((B, 2, N)).astype(np.float32) * 2 - 1
    out = ops.index(feat, jnp.asarray(uv))
    assert out.shape == (B, N, C)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("scale", [2])
def test_bicubic_upsample_matches_torch(rng, align, scale):
    B, C, H, W = 1, 3, 13, 9
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=scale,
                        mode="bicubic", align_corners=align).numpy()
    out = np.asarray(ops.bicubic_upsample(
        jnp.asarray(x.transpose(0, 2, 3, 1)), scale, align))
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_bicubic_downsample_matches_torch(rng):
    B, C, H, W = 1, 2, 16, 16
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=(8, 8), mode="bicubic",
                        align_corners=False, antialias=False).numpy()
    out = np.asarray(ops.bicubic_resize_2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)), 8, 8, align_corners=False))
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_avg_pool_2x(rng):
    x = rng.standard_normal((2, 8, 6, 4)).astype(np.float32)
    ref = F.avg_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2, 2).numpy()
    out = np.asarray(ops.avg_pool_2x(jnp.asarray(x)))
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref,
                               rtol=1e-6, atol=1e-6)


def test_pixel_shuffle_matches_torch(rng):
    B, C, H, W, r = 2, 8, 3, 5, 2
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    ref = F.pixel_shuffle(torch.from_numpy(x), r).numpy()
    out = np.asarray(ops.pixel_shuffle(
        jnp.asarray(x.transpose(0, 2, 3, 1)), r))
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref,
                               rtol=1e-6, atol=1e-6)


def test_depth_normalizer():
    z = jnp.asarray([[1.0, -2.0]])
    out = np.asarray(ops.normalize_depth(z, load_size=512, z_size=200.0))
    np.testing.assert_allclose(out, np.asarray([[1.28, -2.56]]), rtol=1e-6)


def test_in_image_mask():
    xy = jnp.asarray([[[-1.0, 0.0, 1.01, 0.5],
                       [0.0, -1.01, 0.0, 1.0]]])  # [1, 2, 4]
    m = np.asarray(ops.in_image_mask(xy))
    np.testing.assert_array_equal(m, [[1.0, 0.0, 0.0, 1.0]])


def test_image_space_rotation(rng):
    import jax.numpy as jnp
    from surs_tpu import ops
    xy = jnp.asarray(rng.standard_normal((2, 2, 7)).astype(np.float32))
    rot = jnp.zeros((2, 2))
    out = np.asarray(ops.geometry.image_space_rotation(xy, rot))
    np.testing.assert_allclose(out, np.asarray(xy), atol=1e-6)
    # 90° rotation maps (1, 0) -> (0, 1)
    xy1 = jnp.asarray([[[1.0], [0.0]]])
    rot90 = jnp.asarray([[np.pi / 2, 0.0]])
    out = np.asarray(ops.geometry.image_space_rotation(xy1, rot90))
    np.testing.assert_allclose(out[0, :, 0], [0.0, 1.0], atol=1e-6)


def test_bicubic_identity_when_same_size(rng):
    x = jnp.asarray(rng.standard_normal((1, 9, 9, 2)).astype(np.float32))
    out = ops.bicubic_resize_2d(x, 9, 9, align_corners=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


@pytest.mark.parametrize("H,W,N", [(16, 16, 64), (33, 17, 101)])
def test_packed_grid_sample_matches_unpacked(rng, H, W, N):
    """pack_bilinear + single-gather sampling == 4-tap sampling,
    including out-of-range uv (zero padding) and far-out points."""
    B, C = 2, 5
    feat = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    uv = jnp.asarray((rng.random((B, N, 2)).astype(np.float32) * 2.6 - 1.3))
    # append extreme points (whole quad out of range both sides)
    far = jnp.asarray(np.array([[[-9.0, 0.1], [9.0, 0.2], [0.3, -9.0],
                                 [0.0, 9.0]]], np.float32))
    uv = jnp.concatenate([uv, jnp.tile(far, (B, 1, 1))], axis=1)
    ref = np.asarray(ops.grid_sample_points(feat, uv))
    feat_q = ops.pack_bilinear(feat)
    assert feat_q.shape == (B, H + 1, W + 1, 4 * C)
    out = np.asarray(ops.grid_sample_points_packed(feat_q, uv))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_packed_grid_sample_exact_corners(rng):
    """Samples exactly on pixel centers return the pixel values."""
    H = W = 8
    feat = jnp.asarray(rng.standard_normal((1, H, W, 3)).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    uv = np.stack([xs.ravel() / (W - 1) * 2 - 1,
                   ys.ravel() / (H - 1) * 2 - 1], -1)[None].astype(np.float32)
    out = np.asarray(ops.grid_sample_points_packed(
        ops.pack_bilinear(feat), jnp.asarray(uv)))
    ref = np.asarray(feat).reshape(1, H * W, 3)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
