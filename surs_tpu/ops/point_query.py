"""Fused point-query path: projection + pixel-aligned gather + dual MLP.

Drop-in replacement for ``SuRSNet.query`` (inference) that routes the MLP
stack through the fused Pallas kernel (fused_mlp.py). Semantics are
identical: orthographic projection, bilinear feature sampling from the
last hourglass stack + the HR projection, depth-feature concat, coarse
MLP -> conditioning -> fine MLP, in-image masking.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import jax.numpy as jnp

from .geometry import PROJECTIONS, in_image_mask, normalize_depth
from .grid_sample import grid_sample_points, grid_sample_points_packed
from .fused_mlp import FusedWeights, fused_dual_mlp, fused_dual_mlp_xla


def fused_query(fw: FusedWeights, feat_lr: jnp.ndarray,
                feat_hr: jnp.ndarray, points: jnp.ndarray,
                calibs: jnp.ndarray, load_size: int, z_size: float,
                projection: str = "orthogonal", use_pallas: bool = True,
                block_n: int = 512, interpret: bool = False
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """points [B, 3, N] -> (pred_hr [B, N], pred_lr [B, N])."""
    xyz = PROJECTIONS[projection](points, calibs)
    xy = xyz[:, :2, :]
    z = xyz[:, 2:3, :]
    mask = in_image_mask(xy)                                    # [B, N]
    z_feat = jnp.swapaxes(normalize_depth(z, load_size, z_size), 1, 2)
    uv = jnp.swapaxes(xy, 1, 2)                                 # [B, N, 2]

    x = jnp.concatenate([grid_sample_points(feat_lr, uv),
                         grid_sample_points(feat_hr, uv), z_feat], axis=-1)
    B, N, C = x.shape
    flat = x.reshape(B * N, C)
    if use_pallas:
        hr, lr = fused_dual_mlp(flat, fw, block_n=block_n,
                                interpret=interpret)
    else:
        hr, lr = fused_dual_mlp_xla(flat, fw)
    return hr.reshape(B, N) * mask, lr.reshape(B, N) * mask


def fused_query_packed(fw: FusedWeights, feat_lr_q: jnp.ndarray,
                       feat_hr: jnp.ndarray, points: jnp.ndarray,
                       calibs: jnp.ndarray, load_size: int, z_size: float,
                       projection: str = "orthogonal",
                       use_pallas: bool = True,
                       block_n: int = 512, interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bandwidth-optimized query: packed lr map + 4-tap hr map.

    Same math as :func:`fused_query`, two structural changes for the
    HBM-bound gather stage (the round-1 bottleneck after the MLP kernel
    reached MXU peak): (a) the lr map (256ch rows — the heavy gather)
    is pack_bilinear'd so sampling is ONE contiguous quad-row gather;
    the hr map keeps 4-tap gathers (measured FASTER than packed for its
    thin 64ch/128 B rows at bf16); (b) the sampled segments feed the
    kernel as separate lane-aligned arrays (``fw`` must be prepared
    with ``base_split=(C_lr, C_hr + 1)``), so the [N, C_in] concat+pad
    pass never materializes.
    """
    xyz = PROJECTIONS[projection](points, calibs)
    xy = xyz[:, :2, :]
    z = xyz[:, 2:3, :]
    mask = in_image_mask(xy)                                    # [B, N]
    z_feat = jnp.swapaxes(normalize_depth(z, load_size, z_size), 1, 2)
    uv = jnp.swapaxes(xy, 1, 2)                                 # [B, N, 2]

    x_lr = grid_sample_points_packed(feat_lr_q, uv)             # [B,N,Clr]
    x_hr = grid_sample_points(feat_hr, uv)                      # [B,N,Chr]
    xz = jnp.concatenate([x_hr, z_feat.astype(x_hr.dtype)], axis=-1)
    B, N, C_lr = x_lr.shape
    parts = [x_lr.reshape(B * N, C_lr),
             xz.reshape(B * N, xz.shape[-1]).astype(jnp.float32)]
    parts[0] = parts[0].astype(jnp.float32)
    if use_pallas:
        hr, lr = fused_dual_mlp(parts, fw, block_n=block_n,
                                interpret=interpret)
    else:
        hr, lr = fused_dual_mlp_xla(parts, fw)
    return hr.reshape(B, N) * mask, lr.reshape(B, N) * mask


def make_fused_query_fn(load_size: int, z_size: float,
                        projection: str = "orthogonal",
                        use_pallas: bool = True, block_n: int = 512,
                        interpret: bool = False,
                        packed: bool = False) -> Callable:
    """Build a ``query_fn(weights, feats_lr, feat_hr, points, calibs)``
    compatible with recon.pipeline.Reconstructor, where ``weights`` is a
    FusedWeights pytree (passed per call — traced, not baked in).

    ``packed=True`` expects pack_bilinear'd feature maps (Reconstructor
    ``feature_pack=True``) and weights prepared with the matching
    ``base_split`` — the fast single-gather inference path.
    """
    def query_fn(weights: FusedWeights, feats_lr: List[jnp.ndarray],
                 feat_hr, points, calibs):
        if packed:
            return fused_query_packed(
                weights, feats_lr[-1], feat_hr, points, calibs,
                load_size, z_size, projection, use_pallas=use_pallas,
                block_n=block_n, interpret=interpret)
        return fused_query(weights, feats_lr[-1], feat_hr, points, calibs,
                           load_size, z_size, projection,
                           use_pallas=use_pallas, block_n=block_n,
                           interpret=interpret)
    return query_fn
