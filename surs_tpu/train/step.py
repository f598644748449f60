"""Jitted training step with data-parallel sharding.

Replaces the reference's eager loop body (apps/train_SuRS.py:122-148:
forward -> zero_grad -> backward -> step) with a single donated jit
program. Under a device mesh, the batch is sharded over the "data" axis
and params are replicated; XLA inserts the gradient all-reduce (psum)
over ICI — the NCCL-equivalent the reference lacks (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.surs_net import SuRSNet


def denormalize_images(batch):
    """Device-side cast for uint8-shipped images (see batch_to_device):
    (k - 127) / 127 inverts the host's symmetric [-1, 1] quantization —
    exact at -1, 0 (masked background) and +1."""
    out = dict(batch)
    for k in ("images_lr", "images_hr"):
        if out[k].dtype == jnp.uint8:
            out[k] = (out[k].astype(jnp.float32) - 127.0) / 127.0
    return out


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any = None  # only populated for norm='batch'

    def replace_params(self, params):
        return self.replace(params=params)


def create_train_state(model: SuRSNet, optimizer, rng, sample_batch,
                       ) -> TrainState:
    # jitted init: eager init dispatches one compile per op, which is
    # pathologically slow on remote-compile TPU backends
    variables = jax.jit(
        lambda k: model.init(k, **sample_batch, train=True))(rng)
    params = variables["params"]
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=optimizer.init(params),
                      batch_stats=variables.get("batch_stats"))


def make_train_step(model: SuRSNet, optimizer, donate: bool = True,
                    jit: bool = True):
    """Returns jitted ``step(state, batch) -> (state, metrics)``.

    batch keys: images_lr, images_hr, points_lr, points_hr, calibs,
    labels_lr (displacement), labels_hr (occupancy).

    ``jit=False`` returns the traceable step itself so callers can embed
    it in larger programs (e.g. a ``lax.scan`` chain for steady-state
    benchmarking, benchmarks/train_bench.py).
    """
    has_bn = model.norm == "batch"

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        batch = denormalize_images(batch)

        def loss_fn(params):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
                (pred_hr, total, pred_lr, errors), updates = model.apply(
                    variables, train=True, mutable=["batch_stats"], **batch)
                return total, (errors, updates["batch_stats"],
                               pred_hr, pred_lr)
            pred_hr, total, pred_lr, errors = model.apply(
                variables, train=True, **batch)
            return total, (errors, None, pred_hr, pred_lr)

        grads, (errors, new_bs, pred_hr, pred_lr) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt_state,
                                  batch_stats=new_bs if has_bn
                                  else state.batch_stats)
        metrics = dict(errors)
        metrics["pred_hr"] = pred_hr
        metrics["pred_lr"] = pred_lr
        return new_state, metrics

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_loss_step(model: SuRSNet):
    """Jitted loss-only forward for validation."""
    def step(params, batch):
        batch = denormalize_images(batch)
        _, total, _, errors = model.apply({"params": params}, train=False,
                                          **batch)
        return errors
    return jax.jit(step)
