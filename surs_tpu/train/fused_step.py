"""Training step that routes the point-MLP stage through the fused
Pallas kernel (custom_vjp: kernel forward, XLA-recompute backward).

The standard step (train/step.py) differentiates the whole Flax forward
under XLA. This variant keeps encode (SR net + hourglasses) on the Flax
path but evaluates every stack's coarse/fine MLP chain with
ops/fused_mlp.make_fused_dual_mlp_train_ad, reproducing the reference's
train-time cross-wiring exactly (lib/model/SuRSNet.py:240-266: coarse
MLP on the HR sample points, fine MLP on the LR sample points
conditioned on the coarse predictions) including the in-image masking
of each prediction list (SuRSNet.py:156,183) and the 4-term loss
(SuRSNet.py:196-236). Gradient parity with the Flax path is pinned by
tests/test_fused_train.py.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax

from ..models.surs_net import SuRSNet
from ..ops.geometry import PROJECTIONS, in_image_mask, normalize_depth
from ..ops.grid_sample import grid_sample_points
from ..ops.fused_mlp import (prepare_fused_weights,
                             make_fused_dual_mlp_train_ad)
from .step import TrainState, denormalize_images


def make_fused_train_step(model: SuRSNet, optimizer, block_n: int = 512,
                          interpret: bool = False, use_pallas: bool = True,
                          donate: bool = True, jit: bool = True):
    """Returns jitted ``step(state, batch) -> (state, metrics)`` with the
    same contract as train/step.make_train_step. ``jit=False`` returns
    the traceable step itself (for lax.scan chains, mirroring
    make_train_step)."""
    if model.norm == "batch":
        raise ValueError("fused train step does not thread batch_stats; "
                         "use make_train_step for norm='batch'")
    if model.num_views != 1:
        raise ValueError("fused train step evaluates the point MLPs on "
                         "flat [B*V, N] rows and cannot reproduce the "
                         "mid-MLP view fusion (SurfaceClassifier); use "
                         "make_train_step for num_views > 1")
    op = make_fused_dual_mlp_train_ad(block_n=block_n, interpret=interpret,
                                      use_pallas=use_pallas)

    def project(points, calibs):
        xyz = PROJECTIONS[model.projection_mode](points, calibs)
        xy = xyz[:, :2, :]
        z = xyz[:, 2:3, :]
        mask = in_image_mask(xy)[..., None]                   # [B, N, 1]
        z_feat = normalize_depth(z, model.load_size, model.z_size)
        return jnp.swapaxes(xy, 1, 2), jnp.swapaxes(z_feat, 1, 2), mask

    def loss_fn(params, batch):
        img_sr, feats_lr, feat_hr = model.apply(
            {"params": params}, batch["images_lr"], train=True,
            method=SuRSNet.encode)
        fw = prepare_fused_weights(
            params["mlp_lr"], params["mlp_hr"],
            tuple(model.mlp_dim_lr), tuple(model.mlp_dim_hr),
            tuple(model.mlp_res_layers_lr),
            tuple(model.mlp_res_layers_hr))

        uv_a, z_a, mask_a = project(batch["points_hr"], batch["calibs"])
        uv_b, z_b, mask_b = project(batch["points_lr"], batch["calibs"])
        f_hr32 = feat_hr.astype(jnp.float32)
        hr_a = grid_sample_points(f_hr32, uv_a)
        hr_b = grid_sample_points(f_hr32, uv_b)

        B, N = uv_a.shape[:2]
        preds_lr, preds_hr = [], []
        for f in feats_lr:
            f32 = f.astype(jnp.float32)
            pf_a = jnp.concatenate(
                [grid_sample_points(f32, uv_a), hr_a, z_a], axis=-1)
            pf_b = jnp.concatenate(
                [grid_sample_points(f32, uv_b), hr_b, z_b], axis=-1)
            C = pf_a.shape[-1]
            p_hr, p_lr = op(pf_a.reshape(B * N, C),
                            pf_b.reshape(B * N, C),
                            mask_a.reshape(B * N), fw)
            preds_lr.append(mask_a * p_lr.reshape(B, N, 1))
            preds_hr.append(mask_b * p_hr.reshape(B, N, 1))

        labels_hr = batch["labels_hr"]
        labels_lr = batch["labels_lr"]
        e_mlp1 = sum(jnp.mean((p - labels_hr) ** 2)
                     for p in preds_lr) / len(preds_lr)
        e_mlp2 = sum(jnp.mean((p - labels_lr) ** 2)
                     for p in preds_hr) / len(preds_hr)
        e_sr = jnp.mean(jnp.abs(img_sr - batch["images_hr"]))
        disp_gt = labels_lr - labels_hr
        disp_pred = preds_hr[-1] - preds_lr[-1]
        e_disp = jnp.mean((disp_gt - disp_pred) ** 2)
        total = (model.w_mlp1 * e_mlp1 + model.w_mlp2 * e_mlp2 +
                 model.w_sr * e_sr + model.w_disp * e_disp)
        errors = {"mlp1": e_mlp1, "mlp2": e_mlp2, "sr": e_sr,
                  "disp": e_disp, "total": total}
        return total, (errors, preds_hr[-1], preds_lr[-1])

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        batch = denormalize_images(batch)
        grads, (errors, pred_hr, pred_lr) = jax.grad(
            loss_fn, has_aux=True)(state.params, batch)
        updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt_state)
        metrics = dict(errors)
        metrics["pred_hr"] = pred_hr
        metrics["pred_lr"] = pred_lr
        return new_state, metrics

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())
