"""PixelShuffle (depth-to-space) with torch channel ordering, NHWC layout.

The SR decoder uses ``nn.PixelShuffle(2)`` (lib/model/SuRSSR_v3.py:111-115).
torch semantics on NCHW are out[c, h*r+i, w*r+j] = in[c*r*r + i*r + j, h, w];
we reproduce exactly that channel ordering on NHWC tensors so imported torch
conv weights stay valid.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B, H, W, C*r*r] -> [B, H*r, W*r, C]."""
    B, H, W, Crr = x.shape
    C = Crr // (r * r)
    x = x.reshape(B, H, W, C, r, r)          # [..., c, i, j]
    x = x.transpose(0, 1, 4, 2, 5, 3)        # [B, H, i, W, j, C]
    return x.reshape(B, H * r, W * r, C)
