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


def index(feat: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Reference-shaped wrapper: uv ``[B, 2, N]`` -> features ``[B, N, C]``.

    (The reference returns [B, C, N]; we keep channels last.)
    """
    return grid_sample_points(feat, jnp.swapaxes(uv, 1, 2), align_corners=True)
