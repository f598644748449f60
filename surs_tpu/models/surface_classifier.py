"""Per-point occupancy MLP.

Re-design of the reference's ``SurfaceClassifier``
(lib/model/SurfaceClassifier.py:6-81). The reference runs 1x1 Conv1d over
``[B, C, N]``; on TPU the natural form is a row-major dense matmul over
``[B, N, C]`` point features — N points ride the MXU sublanes, channels the
lanes. Residual wiring: the *original input* is re-concatenated before each
layer listed in ``res_layers`` (default {2,3,4}); LeakyReLU(0.01) between
layers; optional sigmoid at the end; multi-view mean-pool halfway
(SurfaceClassifier.py:70-76).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from .layers import conv_kernel_init, leaky_relu_001


class SurfaceClassifier(nn.Module):
    filter_channels: Sequence[int]   # e.g. (321, 1024, 512, 256, 128, 1)
    num_views: int = 1
    no_residual: bool = False
    res_layers: Sequence[int] = (2, 3, 4)
    sigmoid: bool = True
    tanh: bool = False               # color-net last op (ResBlkPIFuNet.py:32)

    @nn.compact
    def __call__(self, feature: jnp.ndarray) -> jnp.ndarray:
        """feature: [B, N, C_in] -> [B, N, C_out]."""
        y = feature
        tmpy = feature
        n_layers = len(self.filter_channels) - 1
        for i in range(n_layers):
            inp = y
            if (not self.no_residual) and (i in self.res_layers):
                inp = jnp.concatenate([y, tmpy], axis=-1)
            y = nn.Dense(self.filter_channels[i + 1],
                         kernel_init=conv_kernel_init,
                         bias_init=nn.initializers.zeros,
                         name=f"conv{i}")(inp)
            if i != n_layers - 1:
                y = leaky_relu_001(y)
            if self.num_views > 1 and i == n_layers // 2:
                y = y.reshape(-1, self.num_views, *y.shape[1:]).mean(axis=1)
                tmpy = feature.reshape(
                    -1, self.num_views, *feature.shape[1:]).mean(axis=1)
        if self.tanh:
            y = jnp.tanh(y)
        elif self.sigmoid:
            y = nn.sigmoid(y)
        return y
