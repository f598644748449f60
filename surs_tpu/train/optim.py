"""Optimizers and LR schedule.

Covers the reference's optimizer selection (apps/train_SuRS.py:54-72:
SGD | ADAM | RMSprop | AMSgrad with momentum/betas/eps/weight_decay flags)
and its step-decay schedule ``lr *= gamma`` at the epochs in ``schedule``
(lib/train_util.py:89-95), re-expressed with optax. The learning rate is
injected as a mutable hyperparameter so the epoch-boundary decay does not
recompile the train step.
"""

from __future__ import annotations

from typing import Sequence

import optax


def make_optimizer(cfg) -> optax.GradientTransformation:
    """Build the optax optimizer for a SuRSConfig."""
    kind = cfg.optimizer

    def build(learning_rate):
        if kind == "SGD":
            opt = optax.sgd(learning_rate, momentum=cfg.momentum or None)
        elif kind == "ADAM":
            opt = optax.adam(learning_rate, b1=cfg.beta1, b2=cfg.beta2,
                             eps=cfg.epsilon)
        elif kind == "RMSprop":
            opt = optax.rmsprop(learning_rate, momentum=0.0)
        elif kind == "AMSgrad":
            opt = optax.amsgrad(learning_rate, b1=cfg.beta1, b2=cfg.beta2,
                                eps=cfg.epsilon)
        else:
            raise ValueError(f"unknown optimizer {kind!r}")
        if cfg.weight_decay:
            # torch couples L2 into the gradient before the moment update
            opt = optax.chain(
                optax.add_decayed_weights(cfg.weight_decay), opt)
        return opt

    return optax.inject_hyperparams(build)(learning_rate=cfg.learning_rate)


def lr_for_epoch(base_lr: float, epoch: int, schedule: Sequence[int],
                 gamma: float) -> float:
    """LR in effect during ``epoch``.

    The reference multiplies lr by gamma at the *end* of each epoch listed
    in ``schedule`` (apps/train_SuRS.py:192), so epoch e uses
    base_lr * gamma^|{s in schedule : s < e}|.
    """
    return base_lr * (gamma ** sum(1 for s in schedule if s < epoch))


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning-rate hyperparameter in-place-ly.

    The leaf must keep its strong f32 dtype: optax initializes it as a
    float32 array, and writing a weak-typed Python float would change
    the train step's abstract signature — forcing a full recompile at
    the first epoch-boundary decay (minutes on remote backends), which
    is exactly what hyperparameter injection exists to avoid."""
    import jax.numpy as jnp
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state
