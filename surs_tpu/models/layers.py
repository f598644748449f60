"""Shared Flax building blocks.

Covers the reference's primitive layers with torch-compatible semantics:
``conv3x3`` (lib/net_util.py:94), ``ConvBlock`` (lib/model/HGFilters.py:29),
``ResBlock``/``default_conv``/``MeanShift`` (lib/model/common.py:9-43) and
the batch/group norm switch (lib/model/HGFilters.py:36-45).

All tensors are NHWC. Padding is always explicit (torch-style symmetric
pixel counts) — never 'SAME' — so strided convs produce identical shapes
and values to the reference.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

# torch init_net initializes every conv with normal(0, 0.02) and zero bias
# (lib/net_util.py:99-132); we keep that as the framework default so random
# -weight behavior is statistically comparable.
conv_kernel_init = nn.initializers.normal(stddev=0.02)


def conv(features: int, kernel: int, stride: int = 1, pad: int = 0,
         use_bias: bool = True, name: Optional[str] = None,
         dtype=jnp.float32) -> nn.Conv:
    """Conv2d with explicit torch-style padding."""
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((pad, pad), (pad, pad)), use_bias=use_bias,
                   kernel_init=conv_kernel_init,
                   bias_init=nn.initializers.zeros, name=name, dtype=dtype)


def conv3x3(features: int, stride: int = 1, pad: int = 1,
            use_bias: bool = False, name: Optional[str] = None,
            dtype=jnp.float32) -> nn.Conv:
    return conv(features, 3, stride, pad, use_bias, name, dtype)


class Norm(nn.Module):
    """batch | group norm selector with torch numerics.

    GroupNorm: 32 groups, eps 1e-5 (torch default). BatchNorm: eps 1e-5,
    running-average momentum equivalent to torch's 0.1.
    """
    kind: str = "group"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "batch":
            # torch init_net draws BatchNorm scale from N(1, 0.02)
            # (lib/net_util.py:126-128).
            def scale_init(key, shape, dtype=jnp.float32):
                return 1.0 + nn.initializers.normal(0.02)(key, shape, dtype)
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, scale_init=scale_init,
                                dtype=self.dtype, name="bn")(x)
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                            name="gn")(x)


class ConvBlock(nn.Module):
    """Three-way split residual block (stacked-hourglass building block).

    Mirrors lib/model/HGFilters.py:29-74: three 3x3 convs producing
    out/2, out/4, out/4 channels, concatenated, plus a (norm-relu-1x1)
    projection shortcut when in != out channels.
    """
    out_planes: int
    norm: str = "group"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        half = self.out_planes // 2
        quarter = self.out_planes // 4
        dt = self.dtype

        out1 = nn.relu(Norm(self.norm, dt, name="bn1")(x, train))
        out1 = conv3x3(half, name="conv1", dtype=dt)(out1)

        out2 = nn.relu(Norm(self.norm, dt, name="bn2")(out1, train))
        out2 = conv3x3(quarter, name="conv2", dtype=dt)(out2)

        out3 = nn.relu(Norm(self.norm, dt, name="bn3")(out2, train))
        out3 = conv3x3(quarter, name="conv3", dtype=dt)(out3)

        out = jnp.concatenate([out1, out2, out3], axis=-1)

        residual = x.astype(out.dtype)
        if in_planes != self.out_planes:
            residual = nn.relu(Norm(self.norm, dt, name="bn4")(x, train))
            residual = conv(self.out_planes, 1, use_bias=False,
                            name="downsample_conv", dtype=dt)(residual)
        return out + residual


class ResBlock(nn.Module):
    """EDSR-style residual block: conv-relu-conv + identity
    (lib/model/common.py:14-33). kernel 3, bias=True, res_scale 1."""
    n_feat: int
    res_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = conv(self.n_feat, 3, pad=1, name="conv0", dtype=self.dtype)(x)
        h = nn.relu(h)
        h = conv(self.n_feat, 3, pad=1, name="conv1", dtype=self.dtype)(h)
        return x.astype(h.dtype) + h * self.res_scale


def leaky_relu_02(x):
    """LeakyReLU(0.2) used throughout the SR branch
    (lib/model/SuRSSR_v3.py:48 etc.)."""
    return nn.leaky_relu(x, negative_slope=0.2)


def leaky_relu_001(x):
    """F.leaky_relu default slope 0.01 used between point-MLP layers
    (lib/model/SurfaceClassifier.py:68)."""
    return nn.leaky_relu(x, negative_slope=0.01)
