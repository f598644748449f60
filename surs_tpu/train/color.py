"""Color-branch (netC) training and colored-mesh output.

The reference carries a color PIFu branch (ResBlkPIFuNet,
lib/model/ResBlkPIFuNet.py:11) and UV-render color sampling but its
training path is broken upstream (missing BasePIFuNet import) and
eval never instantiates netC. Here the capability is complete:

  * :func:`make_color_train_step` — jitted L1/MSE regression of per-point
    RGB from pixel-aligned features (``--color_loss_type``,
    lib/options.py:114);
  * :func:`colorize_vertices` — sample the trained color net at mesh
    vertices for ``--with_color`` OBJ output
    (recon/mesh_io.save_obj_mesh_with_color).

Color supervision comes from data/sampling.sample_surface_colors
(surface points + barycentric vertex colors).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.pifu_legacy import ResBlkColorNet
from .losses import COLOR_LOSSES


class ColorState(struct.PyTreeNode):
    step: jnp.ndarray
    params: dict
    opt_state: object


def create_color_state(color_net: ResBlkColorNet, optimizer, rng,
                       sample_batch: Dict) -> ColorState:
    params = jax.jit(lambda k: color_net.init(
        k, sample_batch["images"], sample_batch["points"],
        sample_batch["calibs"]))(rng)["params"]
    return ColorState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=optimizer.init(params))


def make_color_train_step(color_net: ResBlkColorNet, optimizer,
                          loss_type: str = "l1"):
    """batch: images [B,S,S,3], points [B,3,N], calibs [B,4,4],
    rgbs [B,N,3] in [-1,1]."""
    loss_fn_inner = COLOR_LOSSES[loss_type]

    def step(state: ColorState, batch: Dict):
        def loss_fn(params):
            pred = color_net.apply({"params": params}, batch["images"],
                                   batch["points"], batch["calibs"])
            return loss_fn_inner(pred, batch["rgbs"])

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt), loss

    return jax.jit(step)


def colorize_vertices(color_net: ResBlkColorNet, params,
                      image: jnp.ndarray, verts: np.ndarray,
                      calib: jnp.ndarray, chunk: int = 65536) -> np.ndarray:
    """Predict RGB in [0, 1] for mesh vertices (world coords [V, 3])."""
    apply = jax.jit(lambda p, im, pts, cal: color_net.apply(
        {"params": p}, im, pts, cal))
    V = verts.shape[0]
    out = np.empty((V, 3), np.float32)
    pts_all = np.asarray(verts, np.float32).T  # [3, V]
    for s in range(0, V, chunk):
        end = min(s + chunk, V)
        pts = np.zeros((3, chunk), np.float32)
        pts[:, :end - s] = pts_all[:, s:end]
        pred = apply(params, image, jnp.asarray(pts)[None], calib)
        out[s:end] = np.asarray(pred[0, :end - s])
    return np.clip(out * 0.5 + 0.5, 0.0, 1.0)  # [-1,1] -> [0,1]


def colorize_vertices_ref(color_net, params, image: jnp.ndarray,
                          im_feat: jnp.ndarray, verts: np.ndarray,
                          calib: jnp.ndarray,
                          chunk: int = 65536) -> np.ndarray:
    """colorize_vertices for the reference-compatible RefColorNet, whose
    query attaches netG's pixel-aligned feature map (``im_feat`` — the
    last LR hourglass stack output, ResBlkPIFuNet.py:46-48)."""
    apply = jax.jit(lambda p, im, f, pts, cal: color_net.apply(
        {"params": p}, im, f, pts, cal))
    V = verts.shape[0]
    out = np.empty((V, 3), np.float32)
    pts_all = np.asarray(verts, np.float32).T  # [3, V]
    for s in range(0, V, chunk):
        end = min(s + chunk, V)
        pts = np.zeros((3, chunk), np.float32)
        pts[:, :end - s] = pts_all[:, s:end]
        pred = apply(params, image, im_feat, jnp.asarray(pts)[None], calib)
        out[s:end] = np.asarray(pred[0, :end - s])
    return np.clip(out * 0.5 + 0.5, 0.0, 1.0)  # [-1,1] -> [0,1]
