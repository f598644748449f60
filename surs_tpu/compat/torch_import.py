"""PyTorch state-dict import shim.

The reference ships/loads flat ``torch.save(netG.state_dict())``
checkpoints (apps/eval_SuRS.py:55-64). This module maps those names onto
the SuRS-TPU Flax param tree so reference-trained weights drop in:

  * Conv2d [out,in,kh,kw]  -> kernel [kh,kw,in,out]
  * Conv1d [out,in,1]      -> Dense kernel [in,out]
  * GroupNorm weight/bias  -> gn scale/bias
  * BatchNorm              -> bn scale/bias (+ batch_stats mean/var)

Parameters the reference constructs but never uses — HGFilter's
conv1/bn1/conv3/conv4 stems and per-stack down convs
(lib/model/HGFilters.py:133-152), SuRSSR's MeanShift buffers
(lib/model/SuRSSR_v3.py:39-40), and the duplicated ``downsample.0``
aliases of ConvBlock's bn4 — are deliberately dropped (SURVEY.md §7).
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# state-dict keys that exist in reference checkpoints but have no live
# consumer in the forward pass
_DROP_PATTERNS = [
    r"^image_filter_hr\.(conv1|bn1|conv2|conv3|conv4|down_conv2)\.",
    # conv5 is constructed unconditionally but only consumed in
    # 'high_res' mode (HGFilters.py:153,180) — dead in the lr filter
    r"^image_filter_lr\.(conv1|bn1|conv3|conv4|conv5|down_conv2)\.",
    r"^super_resolution\.(sub_mean|add_mean)\.",
    r"\.downsample\.0\.",   # alias of bn4 (same tensor, HGFilters.py:48-53)
    r"^image_filter_hr\.(m\d+|top_m_\d+|conv_last\d+|bn_end\d+|l\d+|bl\d+"
    r"|al\d+)\.",           # hr hourglass stacks are dead in 'high_res' mode
]


def _is_dead_bn4(torch_key: str, state_dict) -> bool:
    """ConvBlock bn4 with no sibling downsample conv is constructed but
    never consumed (HGFilters.py:47-53) — drop it."""
    m = re.match(r"^(.*)\.bn4\.", torch_key)
    return bool(m) and f"{m.group(1)}.downsample.2.weight" not in state_dict


def _flax_path(torch_key: str) -> Optional[Tuple[str, ...]]:
    """Map a reference state-dict key to a path in our param tree
    (without the trailing leaf name), or None to drop."""
    for pat in _DROP_PATTERNS:
        if re.search(pat, torch_key):
            return None
    parts = torch_key.split(".")
    mod = parts[0]

    if mod in ("mlp_lr", "mlp_hr"):
        # mlp_lr.conv0.weight
        return (mod, parts[1])

    if mod == "super_resolution":
        sub = parts[1]
        # Sequential index -> our module names
        seq_idx = parts[2] if len(parts) > 3 else None
        if sub in ("head", "down1", "down2", "down3", "bottleneck",
                   "bott2", "ups2", "ups3", "ups4"):
            return ("super_resolution", sub, "conv")
        if sub.startswith("body"):
            # body1.0.body.0.weight -> body1_0/conv0
            blk = parts[2]
            conv_idx = {"0": "conv0", "2": "conv1"}[parts[4]]
            return ("super_resolution", f"{sub}_{blk}", conv_idx)
        if sub.startswith("tail"):
            # tail1.0 / tail1.2 -> tail1_0/conv, tail1_1/conv
            name = {"0": f"{sub}_0", "2": f"{sub}_1"}[seq_idx]
            return ("super_resolution", name, "conv")
        if sub == "last":
            if seq_idx == "0":
                return ("super_resolution", "last_0", "conv")
            return ("super_resolution", "last_1")
        return None  # pixel_shuffle / upsample have no params

    if mod in ("image_filter_lr", "image_filter_hr"):
        sub = parts[1]
        if sub == "conv5":
            return (mod, "conv5")
        if sub == "conv2":  # ConvBlock stem
            return (mod, "conv2") + _convblock_path(parts[2:])
        m = re.match(r"m(\d+)$", sub)
        if m:  # hourglass: image_filter_lr.m0.b1_2.conv1.weight
            return (mod, sub, parts[2]) + _convblock_path(parts[3:])
        m = re.match(r"top_m_(\d+)$", sub)
        if m:
            return (mod, sub) + _convblock_path(parts[2:])
        if re.match(r"(conv_last|l|bl|al)\d+$", sub):
            return (mod, sub)
        m = re.match(r"bn_end(\d+)$", sub)
        if m:
            return (mod, sub, _norm_leaf_dir(parts[-2:]))
        return None

    return None


def _convblock_path(parts) -> Tuple[str, ...]:
    """Path inside a ConvBlock: conv1..3, bn1..4, downsample.2."""
    head = parts[0]
    if head == "downsample":
        return ("downsample_conv",)
    if head.startswith("bn"):
        return (head, _norm_leaf_dir(parts))
    return (head,)


# Placeholder norm-submodule path element; resolved against the TARGET
# tree at assign time (models/layers.Norm builds exactly one of 'gn'
# (group, the reference default, lib/options.py:70) or 'bn' (batch)).
_NORM_DIR = "<norm>"


def _norm_leaf_dir(parts) -> str:
    """Norm layers live under 'gn' (group) or 'bn' (batch) submodules;
    which one exists depends on the live model's --norm, so the choice is
    deferred to assign time (see ``_resolve_norm_dir``)."""
    return _NORM_DIR


def _resolve_norm_dir(node, path, strict: bool):
    """Pick the norm submodule name actually present in ``node``."""
    for name in ("gn", "bn"):
        if name in node:
            return name
    if strict:
        raise KeyError(f"no norm submodule (gn/bn) at {'/'.join(path)}")
    return None


def _convert_leaf(torch_key: str, tensor: np.ndarray):
    """(leaf_name, value) for a state-dict entry."""
    leaf = torch_key.split(".")[-1]
    arr = np.asarray(tensor)
    if leaf == "weight":
        if arr.ndim == 4:       # Conv2d
            return "kernel", arr.transpose(2, 3, 1, 0)
        if arr.ndim == 3:       # Conv1d (1x1) -> Dense
            return "kernel", arr[:, :, 0].T
        return "scale", arr     # norm weight
    if leaf == "bias":
        return "bias", arr
    if leaf == "running_mean":
        return "mean", arr
    if leaf == "running_var":
        return "var", arr
    return None, None           # num_batches_tracked etc.


def import_torch_state_dict(state_dict: Dict[str, np.ndarray],
                            params, strict: bool = True,
                            batch_stats=None):
    """Merge a reference state dict into a Flax param tree (returns a new
    tree). ``state_dict`` values may be torch tensors or numpy arrays.

    Norm submodule names are resolved against the target tree ('gn' for
    group norm, 'bn' for batch), so checkpoints trained with either
    --norm import into a matching model. A batch-norm checkpoint also
    carries running_mean/running_var, which live in Flax's batch_stats
    collection — pass that tree via ``batch_stats`` to receive them
    (return becomes ``(params, batch_stats, n)``); without it, running
    stats in the checkpoint raise a clear error instead of being dropped.
    """
    flat = {}
    for key, val in state_dict.items():
        # dead bn4s (every live ConvBlock at the SuRS config is 256->256)
        if _is_dead_bn4(key, state_dict):
            continue
        path = _flax_path(key)
        if path is None:
            continue
        if hasattr(val, "detach"):
            val = val.detach().cpu().numpy()
        leaf, arr = _convert_leaf(key, val)
        if leaf is None:
            continue
        flat[path + (leaf,)] = arr

    def assign(tree, path, value):
        node = tree
        walked = []
        for p in path[:-1]:
            if p == _NORM_DIR:
                p = _resolve_norm_dir(node, path, strict)
                if p is None:
                    return False
            walked.append(p)
            if p not in node:
                if strict:
                    raise KeyError(f"no module {'/'.join(walked)} in tree")
                return False
            node = node[p]
        if path[-1] not in node:
            if strict:
                raise KeyError(f"no leaf {'/'.join(path)} in tree")
            return False
        expected = node[path[-1]]
        if expected.shape != value.shape:
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: "
                f"{expected.shape} vs {value.shape}")
        node[path[-1]] = jnp.asarray(value, dtype=expected.dtype)
        return True

    import copy
    import flax
    mutable = copy.deepcopy(flax.core.unfreeze(params))
    stats_mutable = None if batch_stats is None \
        else copy.deepcopy(flax.core.unfreeze(batch_stats))
    n = 0
    for path, val in flat.items():
        if path[-1] in ("mean", "var"):
            if stats_mutable is None:
                if strict:
                    raise ValueError(
                        f"checkpoint carries batch-norm running stats "
                        f"({'/'.join(p for p in path if p != _NORM_DIR)})"
                        f" — pass the model's batch_stats tree via the "
                        f"batch_stats argument to import them (Flax "
                        f"keeps them outside 'params')")
                continue      # lenient partial import: skip like any
                              # other unmatched leaf
            if assign(stats_mutable, path, val):
                n += 1
        elif assign(mutable, path, val):
            n += 1
    if stats_mutable is not None:
        return mutable, stats_mutable, n
    return mutable, n


def load_torch_checkpoint(path: str, params, strict: bool = True,
                          batch_stats=None):
    """Load a torch.save()'d state dict file and merge it."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return import_torch_state_dict(sd, params, strict=strict,
                                   batch_stats=batch_stats)


def load_params(cfg, model):
    """Resolve params for eval: orbax train-state dir, torch checkpoint
    file, or random init (in that order).

    For batch-norm models the return value is the full variables dict
    ``{'params': ..., 'batch_stats': ...}`` — the running statistics
    live outside 'params' in Flax and the eval forward needs them
    (Reconstructor threads either form). Group-norm models (the
    reference default) return the bare params tree as before.
    """
    import os
    from ..train.optim import make_optimizer
    from ..train.step import create_train_state
    from ..train.checkpoint import CheckpointManager

    has_bn = cfg.norm == "batch"
    rng = np.random.default_rng(cfg.seed)
    S = cfg.loadSize // 2
    sample = {
        "images_lr": jnp.asarray(
            rng.standard_normal((1, S, S, 3)).astype(np.float32)),
        "images_hr": jnp.asarray(
            rng.standard_normal((1, 2 * S, 2 * S, 3)).astype(np.float32)),
        "points_lr": jnp.asarray(
            (rng.random((1, 3, 8)) - 0.5).astype(np.float32)),
        "points_hr": jnp.asarray(
            (rng.random((1, 3, 8)) - 0.5).astype(np.float32)),
        "calibs": jnp.asarray(
            np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32))[None],
    }
    variables = jax.jit(
        lambda k: model.init(k, **sample, train=True))(
            jax.random.PRNGKey(cfg.seed))
    params = variables["params"]

    def pack(params, stats):
        if has_bn:
            return {"params": params, "batch_stats": stats}
        return params

    path = cfg.load_netG_checkpoint_path
    if not path:
        print("WARNING: no checkpoint given — using random init")
        return pack(params, variables.get("batch_stats"))
    if os.path.isdir(path):
        # an orbax train-state dir: .../<ckpt_root>/<name>/netG_{latest,
        # epoch_N}
        optimizer = make_optimizer(cfg)
        state = create_train_state(model, optimizer,
                                   jax.random.PRNGKey(0), sample)
        tag = os.path.basename(os.path.normpath(path))
        parent = os.path.dirname(os.path.abspath(os.path.normpath(path)))
        mgr = CheckpointManager(*os.path.split(parent))
        epoch = int(tag[len("netG_epoch_"):]) \
            if tag.startswith("netG_epoch_") else None
        state = mgr.restore(state, epoch)
        return pack(state.params, state.batch_stats)
    if has_bn:
        # running_mean/running_var live in the checkpoint too; importing
        # without them would silently eval on untrained statistics
        params, stats, n = load_torch_checkpoint(
            path, params, strict=False,
            batch_stats=variables["batch_stats"])
        print(f"imported {n} tensors from torch checkpoint {path}")
        return pack(params, stats)
    params, n = load_torch_checkpoint(path, params, strict=False)
    print(f"imported {n} tensors from torch checkpoint {path}")
    return params


# ---------------------------------------------------------------------------
# netC (color branch) import: reference ResBlkPIFuNet state dicts
# (lib/model/ResBlkPIFuNet.py) -> models.pifu_legacy.RefColorNet params.
#
# Sequential layout of ResnetFilter.model (ResBlkPIFuNet.py:174-197, with
# the default --norm_color instance => affine-free norms contribute no
# tensors): 1 = 7x7 stem conv, 4 / 7 = stride-2 downsample convs,
# 10+i = ResnetBlock i whose conv_block indices 1 and 5 are its two convs.

def _flax_path_netc(torch_key: str) -> Optional[Tuple[str, ...]]:
    parts = torch_key.split(".")
    if parts[0] == "surface_classifier":
        return ("surface_classifier", parts[1])
    if parts[0] == "image_filter" and parts[1] == "model":
        idx = int(parts[2])
        if idx == 1:
            return ("image_filter", "stem")
        if idx == 4:
            return ("image_filter", "down0")
        if idx == 7:
            return ("image_filter", "down1")
        if idx >= 10 and len(parts) >= 5 and parts[3] == "conv_block":
            blk = idx - 10
            cname = {1: "conv1", 5: "conv2"}.get(int(parts[4]))
            if cname is not None:
                return ("image_filter", f"block{blk}", cname)
    return None


def import_torch_color_state_dict(state_dict, params, strict: bool = True):
    """Merge a reference netC state dict into RefColorNet params.

    Unlike the netG shim there are no dead tensors to drop: every key
    must map (instance norm carries no parameters). ``strict`` raises on
    unknown keys — the eval CLI REFUSES rather than silently running a
    random color net.
    """
    flat = {}
    for key, val in state_dict.items():
        path = _flax_path_netc(key)
        if path is None:
            if strict:
                raise KeyError(
                    f"unmappable netC key {key!r} — only reference "
                    f"ResBlkPIFuNet checkpoints trained with the default "
                    f"--norm_color instance are importable")
            continue
        if hasattr(val, "detach"):
            val = val.detach().cpu().numpy()
        leaf, arr = _convert_leaf(key, val)
        if leaf is None:
            continue
        flat[path + (leaf,)] = arr

    import copy
    import flax
    mutable = copy.deepcopy(flax.core.unfreeze(params))
    n = 0
    for path, val in flat.items():
        node = mutable
        for p in path[:-1]:
            if p not in node:
                raise KeyError(f"no module {'/'.join(path)} in params")
            node = node[p]
        if path[-1] not in node:
            raise KeyError(f"no leaf {'/'.join(path)} in params")
        expected = node[path[-1]]
        if expected.shape != val.shape:
            raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                             f"{expected.shape} vs {val.shape}")
        node[path[-1]] = jnp.asarray(val, dtype=expected.dtype)
        n += 1
    return mutable, n
