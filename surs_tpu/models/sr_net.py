"""Super-resolution branch (encoder-decoder U-Net with PixelShuffle ups).

Re-design of the reference's ``SuRSSR_v3`` (lib/model/SuRSSR_v3.py:30-181):
bicubic 2x upsample of the LR input, a 3-level strided-conv encoder with
optional EDSR ResBlock bodies, and a skip-concat decoder using 2x
PixelShuffle. Returns the SR image plus the two intermediate feature maps
that feed the hourglass filters:

  img_SR  [B, 2S, 2S, 3]      super-resolved image (S = LR input size)
  f_lr    [B, S/2, S/2, 256]  ("new2" in the reference)
  f_hr    [B, 2S,  2S,  64]   ("new_fin")

(The reference's MeanShift pair is constructed but never applied
(lib/model/SuRSSR_v3.py:39-40); we omit it — the torch-import shim drops
those buffers.)
"""

from __future__ import annotations

import functools
from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..ops.resize import bicubic_upsample
from ..ops.pixel_shuffle import pixel_shuffle
from .layers import conv, ResBlock, leaky_relu_02


class ConvLReLU(nn.Module):
    """conv(k3,p1) + LeakyReLU(0.2) unit."""
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return leaky_relu_02(
            conv(self.features, 3, stride=self.stride, pad=1, name="conv",
                 dtype=self.dtype)(x))


class SuRSSR(nn.Module):
    n_block: Sequence[int] = (2, 2, 2)
    residual: bool = False
    scale: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        dt = self.dtype
        CL = functools.partial(ConvLReLU, dtype=dt)
        h = bicubic_upsample(x.astype(dt), self.scale, align_corners=False)
        h = CL(32, name="head")(h)                       # [2S, 2S, 32]

        d1 = CL(32, stride=2, name="down1")(h)           # [S, S, 32]
        if self.residual:
            for i in range(self.n_block[0]):
                d1 = ResBlock(32, dtype=dt, name=f"body1_{i}")(d1)
        d1f = CL(32, name="tail1_0")(d1)
        d1f = CL(64, name="tail1_1")(d1f)                # [S, S, 64]

        d2 = CL(64, stride=2, name="down2")(d1f)         # [S/2, S/2, 64]
        if self.residual:
            for i in range(self.n_block[1]):
                d2 = ResBlock(64, dtype=dt, name=f"body2_{i}")(d2)
        d2f = CL(64, name="tail2_0")(d2)
        d2f = CL(128, name="tail2_1")(d2f)               # [S/2, S/2, 128]

        d3 = CL(128, stride=2, name="down3")(d2f)        # [S/4, S/4, 128]
        if self.residual:
            for i in range(self.n_block[2]):
                d3 = ResBlock(128, dtype=dt, name=f"body3_{i}")(d3)
        d3f = CL(128, name="tail3_0")(d3)
        d3f = CL(256, name="tail3_1")(d3f)               # [S/4, S/4, 256]

        bo = CL(256, name="bottleneck")(d3f)
        new1 = jnp.concatenate([d3f, bo], axis=-1)              # [S/4, S/4, 512]
        up1 = CL(512, name="bott2")(new1)
        up1 = leaky_relu_02(pixel_shuffle(up1, 2))              # [S/2, S/2, 128]
        f_lr = jnp.concatenate([d2f, up1], axis=-1)             # [S/2, S/2, 256]

        up2 = CL(256, name="ups2")(f_lr)
        up2 = leaky_relu_02(pixel_shuffle(up2, 2))              # [S, S, 64]
        new3 = jnp.concatenate([d1f, up2], axis=-1)             # [S, S, 128]
        up3 = CL(128, name="ups3")(new3)
        up3 = leaky_relu_02(pixel_shuffle(up3, 2))              # [2S, 2S, 32]

        fin = jnp.concatenate([h, up3], axis=-1)                # [2S, 2S, 64]
        f_hr = CL(64, name="ups4")(fin)                  # [2S, 2S, 64]

        img = CL(32, name="last_0")(f_hr)
        img_sr = conv(3, 3, pad=1, name="last_1",
                      dtype=dt)(img).astype(jnp.float32)          # [2S, 2S, 3]

        return img_sr, f_lr, f_hr
