"""SuRSNet — the flagship composite model.

Re-design of the reference's ``SuRSNet`` (lib/model/SuRSNet.py:41-266) as a
functional Flax module. The reference caches features and predictions on
module state (``self.im_feat_list_lr`` etc.); here every stage is a pure
method so the whole pipeline jits and shards cleanly:

  encode(images_lr)                -> (img_sr, feats_lr[list], feat_hr)
  query(feats..., points, calibs)  -> per-stack coarse & fine occupancy
  __call__(train batch)            -> predictions + the 4-term loss

Cross-wiring preserved from the reference forward (lib/model/SuRSNet.py:
240-266): the *coarse* MLP consumes the HR sample points against HR labels;
the *fine* MLP consumes the LR sample points against displacement labels
and is conditioned on the coarse MLP's prediction list (which, at train
time, was evaluated at the HR points — an intentional reference quirk).
Eval keeps only the last hourglass stack (SuRSNet.py:109-110); in-image
masking multiplies predictions (SuRSNet.py:156,183).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..ops.geometry import PROJECTIONS, in_image_mask, normalize_depth
from ..ops.grid_sample import grid_sample_points
from .sr_net import SuRSSR
from .hourglass import HGFilter
from .surface_classifier import SurfaceClassifier


class SuRSNet(nn.Module):
    # model topology (defaults = reference defaults, lib/options.py)
    num_stack_lr: int = 3
    num_stack_hr: int = 1
    hg_depth: int = 2
    hg_dim: int = 256
    norm: str = "group"
    mlp_dim_lr: Sequence[int] = (321, 1024, 512, 256, 128, 1)
    mlp_dim_hr: Sequence[int] = (322, 1024, 512, 256, 128, 1)
    mlp_res_layers_lr: Sequence[int] = (2, 3, 4)
    mlp_res_layers_hr: Sequence[int] = (2, 3, 4)
    no_residual: bool = False
    num_views: int = 1
    n_block: Sequence[int] = (2, 2, 2)
    residual: bool = False
    scale: int = 2
    # projection / depth feature
    projection_mode: str = "orthogonal"
    load_size: int = 512
    z_size: float = 200.0
    # loss weights
    w_mlp1: float = 1.0
    w_mlp2: float = 1.0
    w_sr: float = 1.0
    w_disp: float = 1.0
    # conv-trunk compute dtype ('float32' | 'bfloat16'); params stay f32
    # and the point MLPs always run f32
    dtype: str = "float32"
    # rematerialize point-MLP activations under grad (config.py `remat`):
    # drops the [B,N,1024..128] hidden-layer grad temps that dominate
    # train-step memory at large N, at the cost of one extra MLP forward
    # in the backward pass
    remat: bool = False
    # also checkpoint the conv trunk (SR + hourglass filters): drops the
    # [B, S, S, C] encoder activation grad temps that dominate HBM at
    # large batch (config.py `remat_encoder`); no-op outside grad
    remat_encoder: bool = False

    def setup(self):
        import jax.numpy as _jnp
        if self.dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"SuRSNet dtype must be resolved to float32/bfloat16 "
                f"(got {self.dtype!r}; use surs_net_from_config or "
                f"config.resolve_auto for 'auto')")
        dt = _jnp.bfloat16 if self.dtype == "bfloat16" else _jnp.float32
        sr_cls = (nn.remat(SuRSSR) if self.remat_encoder else SuRSSR)
        hg_cls = (nn.remat(HGFilter) if self.remat_encoder else HGFilter)
        self.super_resolution = sr_cls(n_block=tuple(self.n_block),
                                       residual=self.residual,
                                       scale=self.scale, dtype=dt)
        self.image_filter_lr = hg_cls(self.num_stack_lr, self.hg_depth,
                                      self.hg_dim, self.norm, "low_res",
                                      use_sigmoid=False, dtype=dt)
        self.image_filter_hr = hg_cls(self.num_stack_hr, self.hg_depth,
                                      64, self.norm, "high_res",
                                      use_sigmoid=False, dtype=dt)
        mlp_cls = (nn.remat(SurfaceClassifier) if self.remat
                   else SurfaceClassifier)
        self.mlp_lr = mlp_cls(tuple(self.mlp_dim_lr),
                              self.num_views, self.no_residual,
                              tuple(self.mlp_res_layers_lr))
        self.mlp_hr = mlp_cls(tuple(self.mlp_dim_hr),
                              self.num_views, self.no_residual,
                              tuple(self.mlp_res_layers_hr))

    # ------------------------------------------------------------------
    def encode(self, images_lr: jnp.ndarray, train: bool = False):
        """images_lr [B, S, S, 3] -> (img_sr, feats_lr list, feat_hr).

        Covers the reference's super_res + filter_lr + filter_hr
        (SuRSNet.py:101-129). At eval only the last hourglass stack output
        is kept.
        """
        img_sr, f_lr, f_hr = self.super_resolution(images_lr)
        feats_lr = self.image_filter_lr(f_lr, train)
        if not train:
            feats_lr = [feats_lr[-1]]
        feat_hr = self.image_filter_hr(f_hr, train)[0]
        return img_sr, feats_lr, feat_hr

    # ------------------------------------------------------------------
    def _project(self, points: jnp.ndarray, calibs: jnp.ndarray,
                 transforms: Optional[jnp.ndarray]):
        """points [B,3,N] -> (uv [B,N,2], z_feat [B,N,1], mask [B,N,1])."""
        xyz = PROJECTIONS[self.projection_mode](points, calibs, transforms)
        xy = xyz[:, :2, :]
        z = xyz[:, 2:3, :]
        mask = in_image_mask(xy)[..., None]                       # [B,N,1]
        z_feat = normalize_depth(z, self.load_size, self.z_size)
        return jnp.swapaxes(xy, 1, 2), jnp.swapaxes(z_feat, 1, 2), mask

    def _point_features(self, feats_lr, feat_hr, uv, z_feat):
        """Per-stack pixel-aligned features: cat(lr_i, hr, z) [B,N,321]
        — always f32 (occupancy precision is independent of the conv
        trunk's compute dtype)."""
        hr_samp = grid_sample_points(feat_hr.astype(jnp.float32), uv)
        return [jnp.concatenate(
                    [grid_sample_points(f.astype(jnp.float32), uv),
                     hr_samp, z_feat], axis=-1)
                for f in feats_lr]

    def query_mr(self, feats_lr: List[jnp.ndarray], feat_hr: jnp.ndarray,
                 points: jnp.ndarray, calibs: jnp.ndarray,
                 transforms: Optional[jnp.ndarray] = None
                 ) -> List[jnp.ndarray]:
        """Coarse occupancy per stack (reference query_mr, SuRSNet.py:131)."""
        uv, z_feat, mask = self._project(points, calibs, transforms)
        preds = []
        for pf in self._point_features(feats_lr, feat_hr, uv, z_feat):
            preds.append(mask * self.mlp_lr(pf))                  # [B,N,1]
        return preds

    def query_sr(self, feats_lr: List[jnp.ndarray], feat_hr: jnp.ndarray,
                 points: jnp.ndarray, calibs: jnp.ndarray,
                 preds_lr: List[jnp.ndarray],
                 transforms: Optional[jnp.ndarray] = None
                 ) -> List[jnp.ndarray]:
        """Fine occupancy per stack, conditioned on the coarse predictions
        (reference query_sr, SuRSNet.py:161)."""
        uv, z_feat, mask = self._project(points, calibs, transforms)
        preds = []
        pfs = self._point_features(feats_lr, feat_hr, uv, z_feat)
        for pf, p_lr in zip(pfs, preds_lr):
            inp = jnp.concatenate([pf, p_lr], axis=-1)            # [B,N,322]
            preds.append(mask * self.mlp_hr(inp))
        return preds

    def query(self, feats_lr, feat_hr, points, calibs,
              transforms=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Inference query: both fields at the same points.

        Returns (pred_hr, pred_lr) each [B, N] from the last stack —
        the equivalent of reference query_mr+query_sr+get_preds
        (lib/mesh_util.py:25-27, BaseSuRSNet.py:80-85).
        """
        preds_lr = self.query_mr(feats_lr, feat_hr, points, calibs, transforms)
        preds_hr = self.query_sr(feats_lr, feat_hr, points, calibs,
                                 preds_lr, transforms)
        return preds_hr[-1][..., 0], preds_lr[-1][..., 0]

    # ------------------------------------------------------------------
    def __call__(self, images_lr, images_hr, points_lr, points_hr, calibs,
                 labels_lr=None, labels_hr=None, transforms=None,
                 train: bool = True):
        """Full training forward (reference forward, SuRSNet.py:240-266).

        images_lr [B,S,S,3], images_hr [B,2S,2S,3], points_* [B,3,N],
        calibs [B,4,4], labels_hr = HR occupancy [B,N,1], labels_lr =
        displacement labels [B,N,1].
        Returns (pred_hr [B,N,1], total_error, pred_lr [B,N,1], errors dict).
        """
        img_sr, feats_lr, feat_hr = self.encode(images_lr, train=train)

        preds_lr = self.query_mr(feats_lr, feat_hr, points_hr, calibs,
                                 transforms)
        preds_hr = self.query_sr(feats_lr, feat_hr, points_lr, calibs,
                                 preds_lr, transforms)

        errors: Dict[str, jnp.ndarray] = {}
        total = 0.0
        if labels_hr is not None and labels_lr is not None:
            # intermediate-supervision MSE, averaged over stacks
            # (SuRSNet.py:196-214)
            e_mlp1 = sum(jnp.mean((p - labels_hr) ** 2) for p in preds_lr)
            e_mlp1 = e_mlp1 / len(preds_lr)
            e_mlp2 = sum(jnp.mean((p - labels_lr) ** 2) for p in preds_hr)
            e_mlp2 = e_mlp2 / len(preds_hr)
            # L1 image super-resolution loss (SuRSNet.py:216-226)
            e_sr = jnp.mean(jnp.abs(img_sr - images_hr))
            # displacement loss (SuRSNet.py:228-236)
            disp_gt = labels_lr - labels_hr
            disp_pred = preds_hr[-1] - preds_lr[-1]
            e_disp = jnp.mean((disp_gt - disp_pred) ** 2)
            total = (self.w_mlp1 * e_mlp1 + self.w_mlp2 * e_mlp2 +
                     self.w_sr * e_sr + self.w_disp * e_disp)
            errors = {"mlp1": e_mlp1, "mlp2": e_mlp2, "sr": e_sr,
                      "disp": e_disp, "total": total}

        return preds_hr[-1], total, preds_lr[-1], errors


def surs_net_from_config(cfg) -> SuRSNet:
    """Build a SuRSNet from a :class:`surs_tpu.config.SuRSConfig`.

    ``cfg.dtype == 'auto'`` resolves against the live backend here (bf16
    conv trunks on TPU, f32 on CPU) so every entry point — train/eval
    CLIs, serve, benchmarks — gets the backend-correct trunk dtype even
    when it never calls resolve_backend_defaults.
    """
    from ..config import resolve_auto
    return SuRSNet(
        num_stack_lr=cfg.num_stack_lr, num_stack_hr=cfg.num_stack_hr,
        hg_depth=cfg.hg_depth, hg_dim=cfg.hg_dim, norm=cfg.norm,
        mlp_dim_lr=tuple(cfg.mlp_dim_lr), mlp_dim_hr=tuple(cfg.mlp_dim_hr),
        mlp_res_layers_lr=tuple(cfg.mlp_res_layers_lr),
        mlp_res_layers_hr=tuple(cfg.mlp_res_layers_hr),
        no_residual=cfg.no_residual, num_views=cfg.num_views,
        n_block=tuple(cfg.n_block), residual=cfg.residual, scale=cfg.scale,
        load_size=cfg.loadSize, z_size=cfg.z_size,
        w_mlp1=cfg.mlp1, w_mlp2=cfg.mlp2, w_sr=cfg.srweight,
        w_disp=cfg.dispweight, dtype=resolve_auto("dtype", cfg.dtype),
        remat=cfg.remat,
        remat_encoder=getattr(cfg, "remat_encoder", False))
