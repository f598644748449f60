"""Legacy PIFu capability surface, rebuilt functional.

The reference carries several inherited-but-broken PIFu components
(SURVEY.md §2.2): ``ConvPIFuNet`` with a backbone zoo
(lib/model/ConvPIFuNet.py:10, lib/model/ConvFilters.py), the norm-layer
point ``MLP`` (lib/model/MLP.py:7), the visual-hull debug net
(lib/model/VhullPIFuNet.py:7) and the ResBlk color branch
(lib/model/ResBlkPIFuNet.py:11). Here they are re-implemented as working
Flax modules sharing the SuRS-TPU ops layer, so the framework offers the
full model-family surface:

  * MultiConvFilter / VGGStyleFilter / ResNetStyleFilter — image encoders
  * ConvPIFuNet — single-scale pixel-aligned implicit net
  * MLP — point MLP with group/batch norm between layers
  * VhullNet — a *fake* oracle predicting the visual hull from masks;
    used as the end-to-end test fixture (the reference's own debugging
    pattern, lib/model/VhullPIFuNet.py:8-14)
  * ResBlkColorNet — per-point RGB regression branch
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..ops.geometry import PROJECTIONS, in_image_mask, normalize_depth
from ..ops.grid_sample import grid_sample_points
from .layers import conv, Norm, leaky_relu_001, conv_kernel_init
from .surface_classifier import SurfaceClassifier


class MultiConvFilter(nn.Module):
    """Stack of stride-2 convs, concatenating per-scale point features
    (lib/model/ConvFilters.py:8 MultiConv equivalent)."""
    # channel sum (512) + 1 depth feature matches the default
    # mlp_dim[0] = 513 of ConvPIFuNet (lib/options.py:92)
    channels: Sequence[int] = (64, 128, 128, 192)

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        feats = []
        h = x
        for i, c in enumerate(self.channels):
            h = conv(c, 4, stride=2, pad=1, name=f"conv{i}")(h)
            h = leaky_relu_001(h)
            feats.append(h)
        return feats


class VGGStyleFilter(nn.Module):
    """VGG16-topology encoder returning multi-stage features
    (lib/model/ConvFilters.py:35 Vgg16 equivalent, trained from scratch)."""
    stages: Sequence[Sequence[int]] = ((64, 64), (128, 128),
                                       (256, 256, 256))

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        feats = []
        h = x
        for si, stage in enumerate(self.stages):
            for ci, c in enumerate(stage):
                h = nn.relu(conv(c, 3, pad=1, name=f"s{si}_c{ci}")(h))
            feats.append(h)
            if si < len(self.stages) - 1:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        return feats


class ResNetStyleFilter(nn.Module):
    """ResNet-ish encoder (lib/model/ConvFilters.py:71 equivalent)."""
    channels: Sequence[int] = (64, 128, 256)

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        h = nn.relu(conv(64, 7, stride=2, pad=3, name="stem")(x))
        feats = [h]
        for i, c in enumerate(self.channels):
            inp = conv(c, 3, stride=2, pad=1, name=f"down{i}")(h)
            b = nn.relu(Norm("group", name=f"n{i}a")(inp))
            b = conv(c, 3, pad=1, name=f"conv{i}a")(b)
            b = nn.relu(Norm("group", name=f"n{i}b")(b))
            b = conv(c, 3, pad=1, name=f"conv{i}b")(b)
            h = inp + b
            feats.append(h)
        return feats


BACKBONES = {
    "multiconv": MultiConvFilter,
    "vgg16": VGGStyleFilter,
    "resnet": ResNetStyleFilter,
}


class MLP(nn.Module):
    """Point MLP with norm layers between convs (lib/model/MLP.py:7)."""
    filter_channels: Sequence[int]
    res_layers: Sequence[int] = ()
    norm: str = "group"
    last_op: str = "sigmoid"

    @nn.compact
    def __call__(self, feature: jnp.ndarray) -> jnp.ndarray:
        y = feature
        tmpy = feature
        n = len(self.filter_channels) - 1
        for i in range(n):
            inp = jnp.concatenate([y, tmpy], -1) if i in self.res_layers \
                else y
            y = nn.Dense(self.filter_channels[i + 1],
                         kernel_init=conv_kernel_init,
                         name=f"conv{i}")(inp)
            if i != n - 1:
                if self.norm == "group":
                    y = nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                     name=f"norm{i}")(y)
                y = leaky_relu_001(y)
        if self.last_op == "sigmoid":
            y = nn.sigmoid(y)
        elif self.last_op == "tanh":
            y = jnp.tanh(y)
        return y


class ConvPIFuNet(nn.Module):
    """Single-scale pixel-aligned implicit function network
    (lib/model/ConvPIFuNet.py:10 equivalent)."""
    backbone: str = "multiconv"
    mlp_dim: Sequence[int] = (513, 1024, 512, 256, 128, 1)
    projection_mode: str = "orthogonal"
    load_size: int = 512
    z_size: float = 200.0

    def setup(self):
        self.image_filter = BACKBONES[self.backbone]()
        self.surface_classifier = SurfaceClassifier(
            tuple(self.mlp_dim), res_layers=())

    def encode(self, images):
        return self.image_filter(images)

    def query(self, feat_list: List[jnp.ndarray], points, calibs,
              transforms=None):
        xyz = PROJECTIONS[self.projection_mode](points, calibs, transforms)
        xy = xyz[:, :2, :]
        z = xyz[:, 2:3, :]
        mask = in_image_mask(xy)[..., None]
        z_feat = jnp.swapaxes(
            normalize_depth(z, self.load_size, self.z_size), 1, 2)
        uv = jnp.swapaxes(xy, 1, 2)
        samples = [grid_sample_points(f, uv) for f in feat_list]
        pf = jnp.concatenate(samples + [z_feat], axis=-1)
        return mask * self.surface_classifier(pf)

    def __call__(self, images, points, calibs, transforms=None):
        feats = self.encode(images)
        return self.query(feats, points, calibs, transforms)


class VhullNet:
    """Visual-hull oracle: occupancy = point projects inside every view's
    mask. Not a learned module — the debug/test fixture replacing
    lib/model/VhullPIFuNet.py."""

    def __init__(self, projection_mode: str = "orthogonal"):
        self.projection = PROJECTIONS[projection_mode]

    def query(self, masks: jnp.ndarray, points: jnp.ndarray,
              calibs: jnp.ndarray) -> jnp.ndarray:
        """masks [V, H, W, 1]; points [1, 3, N]; calibs [V, 4, 4]."""
        V = masks.shape[0]
        pts = jnp.repeat(points, V, axis=0)
        xyz = self.projection(pts, calibs)
        uv = jnp.swapaxes(xyz[:, :2, :], 1, 2)
        inside = in_image_mask(xyz[:, :2, :])
        samp = grid_sample_points(masks, uv)[..., 0]     # [V, N]
        occ = (samp > 0.5) & (inside > 0.5)
        return jnp.prod(occ.astype(jnp.float32), axis=0)[None]  # [1, N]


class ResBlkColorNet(nn.Module):
    """Per-point color regression (ResBlkPIFuNet equivalent,
    lib/model/ResBlkPIFuNet.py:11): resnet-style filter + tanh color MLP."""
    mlp_dim_color: Sequence[int] = (513, 1024, 512, 256, 128, 3)
    projection_mode: str = "orthogonal"
    load_size: int = 512
    z_size: float = 200.0

    def setup(self):
        self.image_filter = ResNetStyleFilter(channels=(128, 256, 256))
        self.color_mlp = MLP(tuple(self.mlp_dim_color), norm="group",
                             last_op="tanh")

    def __call__(self, images, points, calibs, transforms=None):
        feats = self.image_filter(images)
        xyz = PROJECTIONS[self.projection_mode](points, calibs, transforms)
        uv = jnp.swapaxes(xyz[:, :2, :], 1, 2)
        z_feat = jnp.swapaxes(
            normalize_depth(xyz[:, 2:3, :], self.load_size, self.z_size),
            1, 2)
        pf = jnp.concatenate([grid_sample_points(feats[-1], uv), z_feat],
                             axis=-1)
        return self.color_mlp(pf)  # [B, N, 3] in [-1, 1]


# ---------------------------------------------------------------------------
# Reference-checkpoint-compatible color branch (netC).
#
# ResBlkColorNet above is the framework-native color net; the classes below
# reproduce the reference ResBlkPIFuNet's exact topology
# (lib/model/ResBlkPIFuNet.py:11-99,150-200) so that reference-trained netC
# checkpoints import tensor-for-tensor (compat/torch_import.py
# import_torch_color_state_dict).

def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch nn.InstanceNorm2d(affine=False) over NHWC: per-sample,
    per-channel spatial normalization; no learned parameters — matching
    the reference's default --norm_color instance (lib/options.py:72),
    whose checkpoints therefore carry no norm tensors."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def _reflect_pad(x: jnp.ndarray, p: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class RefResnetBlock(nn.Module):
    """ResnetBlock (lib/model/ResBlkPIFuNet.py:91-148): reflect-pad 3x3
    conv, instance norm, relu, reflect-pad 3x3 conv (+ norm unless
    ``last``), residual add."""
    dim: int
    last: bool = False

    @nn.compact
    def __call__(self, x):
        h = _reflect_pad(x, 1)
        h = conv(self.dim, 3, pad=0, name="conv1")(h)
        h = nn.relu(_instance_norm(h))
        h = _reflect_pad(h, 1)
        h = conv(self.dim, 3, pad=0, name="conv2")(h)
        if not self.last:
            h = _instance_norm(h)
        return x + h


class ResnetColorFilter(nn.Module):
    """ResnetFilter (lib/model/ResBlkPIFuNet.py:150-200): reflect-padded
    7x7 stem, two stride-2 downsamples (64->128->256), ``n_blocks``
    resnet blocks (the final one normless per ``last=True``)."""
    ngf: int = 64
    n_blocks: int = 6

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        h = _reflect_pad(x, 3)
        h = conv(self.ngf, 7, pad=0, name="stem")(h)
        h = nn.relu(_instance_norm(h))
        for i in range(2):
            h = conv(self.ngf * 2 ** (i + 1), 3, stride=2, pad=1,
                     name=f"down{i}")(h)
            h = nn.relu(_instance_norm(h))
        for i in range(self.n_blocks):
            h = RefResnetBlock(self.ngf * 4,
                               last=(i == self.n_blocks - 1),
                               name=f"block{i}")(h)
        return h


class RefColorNet(nn.Module):
    """Checkpoint-compatible netC (reference ResBlkPIFuNet,
    lib/model/ResBlkPIFuNet.py:11-99).

    ``attach`` semantics: the reference concatenates netG's pixel-aligned
    feature map with its own filter output before sampling
    (ResBlkPIFuNet.py:46-48); sampling is channelwise, so we sample each
    map separately and concatenate point features — identical math even
    when the maps' spatial resolutions differ. Input to the MLP:
    256 (netG) + 256 (own) + 1 (depth) = 513 = mlp_dim_color[0]
    (lib/options.py:92). The color MLP is the norm-free SurfaceClassifier
    chain with a tanh last op and no residual re-concats
    (ResBlkPIFuNet.py:28-33).
    """
    mlp_dim_color: Sequence[int] = (513, 1024, 512, 256, 128, 3)
    projection_mode: str = "orthogonal"
    load_size: int = 512
    z_size: float = 200.0

    def setup(self):
        self.image_filter = ResnetColorFilter()
        self.surface_classifier = SurfaceClassifier(
            tuple(self.mlp_dim_color), no_residual=False, res_layers=(),
            sigmoid=False, tanh=True)

    def __call__(self, images, im_feat, points, calibs, transforms=None):
        """images [B,S,S,3]; im_feat [B,h,w,256] = netG's last LR-stack
        feature map; points [B,3,N] -> rgb [B,N,3] in [-1,1]."""
        own = self.image_filter(images)
        xyz = PROJECTIONS[self.projection_mode](points, calibs, transforms)
        uv = jnp.swapaxes(xyz[:, :2, :], 1, 2)
        z_feat = jnp.swapaxes(
            normalize_depth(xyz[:, 2:3, :], self.load_size, self.z_size),
            1, 2)
        pf = jnp.concatenate([grid_sample_points(im_feat, uv),
                              grid_sample_points(own, uv), z_feat],
                             axis=-1)
        return self.surface_classifier(pf)
