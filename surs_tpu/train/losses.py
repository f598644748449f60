"""Loss functions and regularizers.

The four operative SuRS losses live in the model forward
(models/surs_net.py, mirroring lib/model/SuRSNet.py:196-265). This module
adds the reference's auxiliary loss surface as standalone functions:

  * masked/weighted BCE and MSE (lib/net_util.py:227-263
    CustomBCELoss/CustomMSELoss, gamma-weighted positive class);
  * WGAN-GP gradient penalty (lib/net_util.py:165-201) — expressed with
    jax.grad over interpolated inputs;
  * plain mse/l1/bce helpers used by the color branch
    (``--color_loss_type``, lib/options.py:114).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def mse(pred, target):
    return jnp.mean((pred - target) ** 2)


def l1(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def bce(pred, target, eps: float = 1e-7):
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))


def custom_bce(pred, target, gamma: float = 0.5,
               mask: Optional[jnp.ndarray] = None, eps: float = 1e-7):
    """Class-weighted BCE: gamma on positives, (1-gamma) on negatives,
    optionally masked (reference CustomBCELoss semantics)."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    loss = -(gamma * target * jnp.log(p)
             + (1 - gamma) * (1 - target) * jnp.log(1 - p))
    if mask is not None:
        loss = loss * mask
        return jnp.sum(loss) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(loss)


def custom_mse(pred, target, gamma: float = 0.5,
               mask: Optional[jnp.ndarray] = None):
    """Class-weighted MSE (reference CustomMSELoss semantics)."""
    w = gamma * target + (1 - gamma) * (1 - target)
    loss = w * (pred - target) ** 2
    if mask is not None:
        loss = loss * mask
        return jnp.sum(loss) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(loss)


COLOR_LOSSES = {"mse": mse, "l1": l1, "bce": bce}


def gradient_penalty(disc_fn: Callable, real: jnp.ndarray,
                     fake: jnp.ndarray, rng: jax.Array,
                     lambda_gp: float = 10.0) -> jnp.ndarray:
    """WGAN-GP penalty E[(||∇D(x̂)||₂ − 1)²] on interpolates x̂
    (reference cal_gradient_penalty, lib/net_util.py:165-201)."""
    alpha = jax.random.uniform(rng, (real.shape[0],) + (1,) *
                               (real.ndim - 1))
    inter = alpha * real + (1 - alpha) * fake

    def scalar_disc(x):
        return jnp.sum(disc_fn(x))

    grads = jax.grad(scalar_disc)(inter)
    norms = jnp.sqrt(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2,
                             axis=1) + 1e-16)
    return lambda_gp * jnp.mean((norms - 1.0) ** 2)
