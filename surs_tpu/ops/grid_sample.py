"""Pixel-aligned bilinear feature sampling.

TPU-native re-design of the reference's hot primitive ``index()``
(lib/geometry.py:4-12), which wraps ``F.grid_sample(..., align_corners=True)``
with zero padding. Instead of an image-warp, we express the per-point sample
as four batched gathers + a weighted sum, which XLA lowers to dynamic-gather
on TPU and fuses with the surrounding elementwise work.

Layout: features are NHWC ``[B, H, W, C]`` (channels on the lane dimension);
sampled point features come back as ``[B, N, C]`` so the downstream point
MLP is a plain row-major matmul on the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_points(feat: jnp.ndarray, uv: jnp.ndarray,
                       align_corners: bool = True) -> jnp.ndarray:
    """Sample ``feat`` at continuous uv locations, bilinear + zero padding.

    feat: [B, H, W, C] feature map.
    uv:   [B, N, 2] normalized coords in [-1, 1]; uv[..., 0]=x (width axis),
          uv[..., 1]=y (height axis) — same convention as F.grid_sample.
    Returns [B, N, C].

    Matches torch.nn.functional.grid_sample(mode='bilinear',
    padding_mode='zeros', align_corners=True) to float32 accuracy; the
    reference warns parity here is what preserves reconstruction quality
    (lib/geometry.py:9-10).
    """
    B, H, W, C = feat.shape
    x = uv[..., 0]
    y = uv[..., 1]
    if align_corners:
        fx = (x + 1.0) * 0.5 * (W - 1)
        fy = (y + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((x + 1.0) * W - 1.0) * 0.5
        fy = ((y + 1.0) * H - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0  # weight of the x1 tap
    wy = fy - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = feat.reshape(B, H * W, C)

    def tap(xi, yi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        g = jnp.take_along_axis(flat, idx[..., None], axis=1)  # [B, N, C]
        return g * (w * valid.astype(feat.dtype))[..., None]

    out = tap(x0i, y0i, (1.0 - wx) * (1.0 - wy))
    out = out + tap(x0i + 1, y0i, wx * (1.0 - wy))
    out = out + tap(x0i, y0i + 1, (1.0 - wx) * wy)
    out = out + tap(x0i + 1, y0i + 1, wx * wy)
    return out


def pack_bilinear(feat: jnp.ndarray) -> jnp.ndarray:
    """Pack each 2x2 bilinear tap neighborhood into one feature row.

    feat [B, H, W, C] -> [B, H+1, W+1, 4C] where entry (yq, xq) holds the
    four taps of the cell whose base corner is (y0, x0) = (yq-1, xq-1):

        [F(y0, x0) | F(y0, x0+1) | F(y0+1, x0) | F(y0+1, x0+1)]

    with F zero outside the image (torch zeros-padding baked in). A
    bilinear sample then needs ONE contiguous [4C] row gather instead of
    four scattered [C] gathers (grid_sample_points_packed) — gathers are
    the HBM-bound stage of the query hot loop, and 4x fewer, 4x longer
    transfers sit much closer to memory speed-of-light. Costs 4x feature
    memory; built once per subject at encode time.
    """
    z = ((0, 0),)
    t00 = jnp.pad(feat, (z[0], (1, 0), (1, 0), z[0]))
    t01 = jnp.pad(feat, (z[0], (1, 0), (0, 1), z[0]))
    t10 = jnp.pad(feat, (z[0], (0, 1), (1, 0), z[0]))
    t11 = jnp.pad(feat, (z[0], (0, 1), (0, 1), z[0]))
    return jnp.concatenate([t00, t01, t10, t11], axis=-1)


def grid_sample_points_packed(feat_q: jnp.ndarray, uv: jnp.ndarray,
                              align_corners: bool = True) -> jnp.ndarray:
    """Bilinear sampling from a :func:`pack_bilinear`-packed feature map.

    feat_q: [B, H+1, W+1, 4C]; uv as in :func:`grid_sample_points`.
    Returns [B, N, C], numerically identical to ``grid_sample_points`` on
    the unpacked map (same tap weights; zero-padding pre-baked into the
    packed rows; fully-out-of-range quads masked as a whole).
    """
    B, Hq, Wq, C4 = feat_q.shape
    H, W = Hq - 1, Wq - 1
    C = C4 // 4
    x = uv[..., 0]
    y = uv[..., 1]
    if align_corners:
        fx = (x + 1.0) * 0.5 * (W - 1)
        fy = (y + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((x + 1.0) * W - 1.0) * 0.5
        fy = ((y + 1.0) * H - 1.0) * 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # Quads with base corner in [-1, W-1] x [-1, H-1] have at least one
    # real tap and their zero padding is baked in; anything further out
    # has ALL taps outside the image -> whole-quad mask.
    x0c = jnp.clip(x0i, -1, W - 1)
    y0c = jnp.clip(y0i, -1, H - 1)
    valid = ((x0i == x0c) & (y0i == y0c)).astype(feat_q.dtype)

    idx = (y0c + 1) * Wq + (x0c + 1)
    flat = feat_q.reshape(B, Hq * Wq, C4)
    g = jnp.take_along_axis(flat, idx[..., None], axis=1)   # [B, N, 4C]

    w00 = ((1.0 - wx) * (1.0 - wy) * valid)[..., None]
    w01 = (wx * (1.0 - wy) * valid)[..., None]
    w10 = ((1.0 - wx) * wy * valid)[..., None]
    w11 = (wx * wy * valid)[..., None]
    return (g[..., 0 * C:1 * C] * w00 + g[..., 1 * C:2 * C] * w01
            + g[..., 2 * C:3 * C] * w10 + g[..., 3 * C:4 * C] * w11)


def index(feat: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Reference-shaped wrapper: uv ``[B, 2, N]`` -> features ``[B, N, C]``.

    (The reference returns [B, C, N]; we keep channels last.)
    """
    return grid_sample_points(feat, jnp.swapaxes(uv, 1, 2), align_corners=True)
