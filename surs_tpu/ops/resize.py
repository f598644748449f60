"""Bicubic resize as separable matmuls (MXU-friendly, bit-matching torch).

The reference upsamples with torch bicubic in two places with *different*
alignment semantics:
  * SR branch input upsample: ``nn.Upsample(mode='bicubic',
    align_corners=False)`` (lib/model/SuRSSR_v3.py:140-141)
  * hourglass decoder upsample: ``F.interpolate(scale_factor=2,
    mode='bicubic', align_corners=True)`` (lib/model/HGFilters.py:115)

torch uses the Keys cubic kernel with a = -0.75 (jax.image.resize uses
a = -0.5, so it cannot be used for parity). Because all shapes are static
under jit, we materialize the 1-D resampling operator as a dense
``[out, in]`` matrix per axis at trace time and apply it as two matmuls —
exact, differentiable, and it runs on the MXU instead of scattered gathers.
Matrices are cached per (in, out, align) key.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

_A = -0.75  # torch's bicubic coefficient


def _cubic(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    x2 = x * x
    x3 = x2 * x
    w = np.where(
        x <= 1.0,
        (_A + 2.0) * x3 - (_A + 3.0) * x2 + 1.0,
        np.where(x < 2.0, _A * (x3 - 5.0 * x2 + 8.0 * x - 4.0), 0.0),
    )
    return w


@functools.lru_cache(maxsize=None)
def _resize_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense [out_size, in_size] bicubic interpolation operator."""
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros(1)
        else:
            src = i * (in_size - 1) / (out_size - 1)
    else:
        src = (i + 0.5) * (in_size / out_size) - 0.5
    f = np.floor(src)
    t = src - f
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for k in range(-1, 3):
        w = _cubic(k - t)
        idx = np.clip(f.astype(np.int64) + k, 0, in_size - 1)
        np.add.at(mat, (np.arange(out_size), idx), w)
    return mat.astype(np.float32)


def bicubic_resize_2d(x: jnp.ndarray, out_h: int, out_w: int,
                      align_corners: bool) -> jnp.ndarray:
    """Bicubic-resize an NHWC tensor to (out_h, out_w), torch semantics."""
    B, H, W, C = x.shape
    kh = jnp.asarray(_resize_matrix(H, out_h, align_corners))
    kw = jnp.asarray(_resize_matrix(W, out_w, align_corners))
    dtype = x.dtype
    y = jnp.einsum("oh,bhwc->bowc", kh, x.astype(jnp.float32), precision=_HI)
    y = jnp.einsum("ow,bhwc->bhoc", kw, y, precision=_HI)
    return y.astype(dtype)


def bicubic_upsample(x: jnp.ndarray, scale: int,
                     align_corners: bool) -> jnp.ndarray:
    """Scale-factor bicubic upsample of an NHWC tensor."""
    B, H, W, C = x.shape
    return bicubic_resize_2d(x, H * scale, W * scale, align_corners)


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 average pool (NHWC) — hourglass downsample
    (reference lib/model/HGFilters.py:101)."""
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))
