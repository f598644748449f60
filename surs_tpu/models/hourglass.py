"""Stacked-hourglass pixel-aligned feature extractor.

Re-design of the reference's ``HourGlass``/``HGFilter``
(lib/model/HGFilters.py:76-208). Two operating modes are used by SuRS:

  * ``low_res``: ConvBlock(256->256) stem, then ``num_stack`` hourglasses of
    recursion depth ``depth`` with intermediate supervision — each stack
    emits a ``last_ch``-channel feature map (HGFilters.py:183-206).
  * ``high_res``: a single 1x1 conv 64->64 — a learned linear projection of
    the SR branch's full-resolution features (HGFilters.py:179-181).

Downsampling inside the hourglass is 2x average pooling; upsampling is
bicubic align_corners=True (HGFilters.py:101,115).

The reference also constructs ``conv1/bn1/conv3/conv4`` stems that its
forward never touches (HGFilters.py:133-152) — dead weights that exist only
in its checkpoints. We do not re-create them; the torch-import shim drops
them by name.
"""

from __future__ import annotations

import functools
from typing import Any, List

import jax.numpy as jnp
import flax.linen as nn

from ..ops.resize import avg_pool_2x, bicubic_upsample
from .layers import conv, ConvBlock, Norm


class HourGlass(nn.Module):
    """Recursive hourglass of ConvBlocks (lib/model/HGFilters.py:76-120)."""
    depth: int
    features: int
    norm: str = "group"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        CB = functools.partial(ConvBlock, self.features, self.norm,
                               self.dtype)

        def level(lv, inp):
            up1 = CB(name=f"b1_{lv}")(inp, train)
            low1 = avg_pool_2x(inp)
            low1 = CB(name=f"b2_{lv}")(low1, train)
            if lv > 1:
                low2 = level(lv - 1, low1)
            else:
                low2 = CB(name=f"b2_plus_{lv}")(low1, train)
            low3 = CB(name=f"b3_{lv}")(low2, train)
            up2 = bicubic_upsample(low3, 2, align_corners=True)
            return up1 + up2

        return level(self.depth, x)


class HGFilter(nn.Module):
    """Stacked hourglass filter with intermediate supervision outputs."""
    num_stack: int
    depth: int
    last_ch: int
    norm: str = "group"
    down_type: str = "low_res"   # low_res | high_res | conv64
    use_sigmoid: bool = False    # reference quirk: applies Tanh when True
                                 # (HGFilters.py:198-199); SuRS passes False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        outputs: List[jnp.ndarray] = []
        dt = self.dtype
        x = x.astype(dt)

        if self.down_type == "high_res":
            outputs.append(conv(self.last_ch, 1, name="conv5",
                                dtype=dt)(x))
            return outputs

        if self.down_type == "low_res":
            x = ConvBlock(256, self.norm, dt, name="conv2")(x, train)
        elif self.down_type == "conv64":
            x = ConvBlock(64, self.norm, dt, name="conv2")(x, train)
            x = conv(128, 3, stride=2, pad=1, name="down_conv2",
                     dtype=dt)(x)
        else:
            raise ValueError(f"unknown down_type {self.down_type!r}")

        previous = x
        for i in range(self.num_stack):
            hg = HourGlass(self.depth, 256, self.norm, dt, name=f"m{i}")(
                previous, train)
            ll = ConvBlock(256, self.norm, dt, name=f"top_m_{i}")(hg, train)
            ll = conv(256, 1, name=f"conv_last{i}", dtype=dt)(ll)
            ll = nn.relu(Norm(self.norm, dt, name=f"bn_end{i}")(ll, train))
            tmp_out = conv(self.last_ch, 1, name=f"l{i}", dtype=dt)(ll)
            outputs.append(jnp.tanh(tmp_out) if self.use_sigmoid else tmp_out)
            if i < self.num_stack - 1:
                ll = conv(256, 1, name=f"bl{i}", dtype=dt)(ll)
                tmp_out_ = conv(256, 1, name=f"al{i}", dtype=dt)(tmp_out)
                previous = previous + ll + tmp_out_

        return outputs
