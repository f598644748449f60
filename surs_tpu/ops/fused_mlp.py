"""Fused dual point-MLP Pallas kernel.

The reference's inference hot loop runs two 5-layer Conv1d MLPs per 50k
-point chunk (lib/mesh_util.py:20-28 -> lib/model/SurfaceClassifier.py:45).
Under plain XLA each layer's activation round-trips HBM (a [N, 1024] f32
tensor is ~200 MB per 50k chunk of traffic across the stack); this kernel
keeps the whole chain — coarse MLP, sigmoid, conditioning concat, fine
MLP — in VMEM, with all weights resident, so HBM traffic is just the
[N, C_in] input features and two [N] outputs.

Layout strategy: every channel dimension is zero-padded to a multiple of
128 lanes. Zero pad rows in the weights guarantee padded input columns
never contribute, so results are bit-identical to the unpadded math. The
residual re-concat of the original input (res_layers {2,3,4},
SurfaceClassifier.py:30-43) becomes an aligned VMEM concatenation.

The same padded weights drive a pure-XLA fallback (`fused_dual_mlp_xla`)
used on CPU and as the autodiff path.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round128(n: int) -> int:
    return ((n + 127) // 128) * 128


class MLPSpec(NamedTuple):
    dims: Tuple[int, ...]          # e.g. (321, 1024, 512, 256, 128, 1)
    res_layers: Tuple[int, ...]    # layers receiving the input re-concat
    base_segments: Tuple[int, ...]  # real widths of the base input parts
    # (lr: (321,); hr: (321, 1) — features and the coarse prediction)


class FusedWeights(NamedTuple):
    """Padded parameters for both MLPs.

    Registered as a custom pytree: the weight tuples are children (traced
    arrays), the MLPSpecs are static aux data — so a FusedWeights can be
    passed through jit boundaries without baking weights in as constants
    while specs keep driving Python-level layer construction.
    """
    lr_w: Tuple[jnp.ndarray, ...]
    lr_b: Tuple[jnp.ndarray, ...]
    hr_w: Tuple[jnp.ndarray, ...]
    hr_b: Tuple[jnp.ndarray, ...]
    spec_lr: MLPSpec
    spec_hr: MLPSpec


def _fw_flatten(fw: FusedWeights):
    return ((fw.lr_w, fw.lr_b, fw.hr_w, fw.hr_b),
            (fw.spec_lr, fw.spec_hr))


def _fw_unflatten(aux, children):
    return FusedWeights(*children, *aux)


jax.tree_util.register_pytree_node(FusedWeights, _fw_flatten, _fw_unflatten)


def _pad_layer(W: jnp.ndarray, b: jnp.ndarray, in_segments, out_pad: int,
               dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Zero-pad W [in, out] so each input segment starts on a 128 boundary.

    in_segments: list of (row_offset_in_W, real_width, padded_width).
    """
    out = W.shape[1]
    parts = []
    for off, real, padded in in_segments:
        seg = W[off:off + real]
        parts.append(jnp.pad(seg, ((0, padded - real), (0, 0))))
    Wp = jnp.concatenate(parts, axis=0)
    Wp = jnp.pad(Wp, ((0, 0), (0, out_pad - out)))
    bp = jnp.pad(b, (0, out_pad - out))
    return Wp.astype(dtype), bp.reshape(1, -1).astype(jnp.float32)


def _layer_segments(spec: MLPSpec, i: int):
    """Original-row -> padded-row mapping for layer i's input."""
    d_in = spec.dims[i]
    segs = [(0, d_in, _round128(d_in))]
    if i == 0:
        # base input is itself the concatenation of base_segments
        segs = []
        off = 0
        for real in spec.base_segments:
            segs.append((off, real, _round128(real)))
            off += real
    elif i in spec.res_layers:
        off = d_in
        for real in spec.base_segments:
            segs.append((off, real, _round128(real)))
            off += real
    return segs


def _pad_mlp(params, spec: MLPSpec, dtype):
    ws, bs = [], []
    n_layers = len(spec.dims) - 1
    for i in range(n_layers):
        W = jnp.asarray(params[f"conv{i}"]["kernel"])  # [in, out]
        b = jnp.asarray(params[f"conv{i}"]["bias"])
        out_pad = _round128(spec.dims[i + 1])
        Wp, bp = _pad_layer(W, b, _layer_segments(spec, i), out_pad, dtype)
        ws.append(Wp)
        bs.append(bp)
    return tuple(ws), tuple(bs)


def prepare_fused_weights(params_mlp_lr, params_mlp_hr,
                          dims_lr: Sequence[int], dims_hr: Sequence[int],
                          res_layers_lr: Sequence[int] = (2, 3, 4),
                          res_layers_hr: Sequence[int] = (2, 3, 4),
                          dtype=jnp.float32,
                          base_split: Sequence[int] | None = None
                          ) -> FusedWeights:
    """Extract + pad SurfaceClassifier params for the fused kernel.

    ``params_mlp_*`` are the Flax param subtrees (mlp_lr / mlp_hr of
    SuRSNet). dims_hr[0] must equal dims_lr[0] + 1 (feature + coarse pred).

    ``base_split``: optional partition of the base input's dims_lr[0]
    channels into segments (e.g. ``(256, 65)`` = lr features | hr
    features + depth). Each segment gets its own 128-aligned lane block,
    and the kernel then accepts the segments as SEPARATE arrays — the
    sampled feature tensors feed the MXU directly, with no [N, C_in]
    concatenation pass in HBM.
    """
    dims_lr = tuple(dims_lr)
    dims_hr = tuple(dims_hr)
    assert dims_hr[0] == dims_lr[0] + 1
    base = tuple(base_split) if base_split is not None else (dims_lr[0],)
    assert sum(base) == dims_lr[0], (base, dims_lr[0])
    spec_lr = MLPSpec(dims_lr, tuple(res_layers_lr), base)
    spec_hr = MLPSpec(dims_hr, tuple(res_layers_hr), base + (1,))
    lr_w, lr_b = _pad_mlp(params_mlp_lr, spec_lr, dtype)
    hr_w, hr_b = _pad_mlp(params_mlp_hr, spec_hr, dtype)
    return FusedWeights(lr_w, lr_b, hr_w, hr_b, spec_lr, spec_hr)


# --------------------------------------------------------------------------
def _mlp_chain(h_base_parts: List[jnp.ndarray], ws, bs, spec: MLPSpec,
               compute_dtype, split_concat: bool = False):
    """Shared layer chain used by both the kernel body and the XLA path.

    h_base_parts: padded base segments ([x_pad] or [x_pad, pred_pad]).
    Returns the final layer's padded output (real value in column 0).

    split_concat=True avoids materializing the residual input
    concatenations: each segment multiplies its own weight-row block and
    the partial products are summed (identical math — the padded weight
    rows are laid out segment-by-segment).
    """
    n_layers = len(spec.dims) - 1

    def seg_dot(parts, W, b):
        acc = None
        off = 0
        for p in parts:
            w_seg = W[off:off + p.shape[-1]]
            d = jnp.dot(p.astype(compute_dtype), w_seg,
                        preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
            off += p.shape[-1]
        return acc + b

    if split_concat:
        h = None
        for i in range(n_layers):
            if i == 0:
                parts = list(h_base_parts)
            elif i in spec.res_layers:
                parts = [h] + list(h_base_parts)
            else:
                parts = [h]
            h = seg_dot(parts, ws[i], bs[i])
            if i < n_layers - 1:
                h = jnp.where(h >= 0, h, 0.01 * h)
        return h

    h = jnp.concatenate(h_base_parts, axis=-1) if len(h_base_parts) > 1 \
        else h_base_parts[0]
    for i in range(n_layers):
        if i > 0 and i in spec.res_layers:
            inp = jnp.concatenate([h] + h_base_parts, axis=-1)
        else:
            inp = h
        h = jnp.dot(inp.astype(compute_dtype), ws[i],
                    preferred_element_type=jnp.float32) + bs[i]
        if i < n_layers - 1:
            h = jnp.where(h >= 0, h, 0.01 * h)  # leaky_relu(0.01)
    return h


def _kernel(*refs, n_x: int, n_lr: int, n_hr: int, spec_lr: MLPSpec,
            spec_hr: MLPSpec, compute_dtype, split_concat: bool):
    x_parts = [refs[i][:] for i in range(n_x)]     # [TN, Pi] each
    o = n_x
    lr_w = [refs[o + i][:] for i in range(n_lr)]
    lr_b = [refs[o + n_lr + i][:] for i in range(n_lr)]
    hr_w = [refs[o + 2 * n_lr + i][:] for i in range(n_hr)]
    hr_b = [refs[o + 2 * n_lr + n_hr + i][:] for i in range(n_hr)]
    out_hr_ref = refs[-2]
    out_lr_ref = refs[-1]

    logit_lr = _mlp_chain(x_parts, lr_w, lr_b, spec_lr, compute_dtype,
                          split_concat)
    pred_lr = jax.nn.sigmoid(logit_lr[:, :1])      # [TN, 1]
    pred_pad = jnp.pad(pred_lr, ((0, 0), (0, 127)))
    logit_hr = _mlp_chain(x_parts + [pred_pad], hr_w, hr_b, spec_hr,
                          compute_dtype, split_concat)
    pred_hr = jax.nn.sigmoid(logit_hr[:, :1])

    out_hr_ref[:] = jnp.pad(pred_hr, ((0, 0), (0, 127)))
    out_lr_ref[:] = jnp.pad(pred_lr, ((0, 0), (0, 127)))


def fused_dual_mlp(x, fw: FusedWeights, block_n: int = 512,
                   interpret: bool = False, split_concat: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run both occupancy MLPs over point features.

    x: [N, C_in] raw (unpadded) point features, C_in = dims_lr[0] —
    or a sequence of per-segment arrays [N, base_segments[i]] when the
    weights were prepared with ``base_split`` (each segment is lane
    -padded independently; no concatenated input tensor ever exists).
    Returns (pred_hr [N], pred_lr [N]) in [0, 1]. N is padded to a
    multiple of ``block_n`` internally.
    """
    segs = fw.spec_lr.base_segments
    parts = list(x) if isinstance(x, (list, tuple)) else [x]
    assert len(parts) == len(segs), (len(parts), segs)
    N = parts[0].shape[0]
    n_pad = -N % block_n
    Np = N + n_pad
    xps, part_widths = [], []
    for p, real in zip(parts, segs):
        assert p.shape == (N, real), (p.shape, (N, real))
        P = _round128(real)
        xps.append(jnp.pad(p, ((0, n_pad), (0, P - real))))
        part_widths.append(P)

    n_lr = len(fw.lr_w)
    n_hr = len(fw.hr_w)
    weight_arrays = (list(fw.lr_w) + list(fw.lr_b) +
                     list(fw.hr_w) + list(fw.hr_b))
    compute_dtype = fw.lr_w[0].dtype

    kernel = functools.partial(_kernel, n_x=len(xps), n_lr=n_lr,
                               n_hr=n_hr,
                               spec_lr=fw.spec_lr, spec_hr=fw.spec_hr,
                               compute_dtype=compute_dtype,
                               split_concat=split_concat)

    grid = (Np // block_n,)
    in_specs = [pl.BlockSpec((block_n, P), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
                for P in part_widths]
    for w in weight_arrays:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    out_specs = [pl.BlockSpec((block_n, 128), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] * 2

    out_hr, out_lr = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((Np, 128), jnp.float32)] * 2,
        interpret=interpret,
    )(*xps, *weight_arrays)
    return out_hr[:N, 0], out_lr[:N, 0]


def _kernel_train(xa_ref, xb_ref, ma_ref, *refs, n_lr: int, n_hr: int,
                  spec_lr: MLPSpec, spec_hr: MLPSpec, compute_dtype):
    """Training variant: the coarse MLP consumes xa (HR sample points),
    the fine MLP consumes xb (LR sample points) conditioned on the
    coarse prediction — the reference's train-time cross-wiring
    (lib/model/SuRSNet.py:240-266). The conditioning uses the MASKED
    coarse prediction (in-image mask in ma col 0): the reference stores
    ``in_img * pred`` in its intermediate list (SuRSNet.py:156) and the
    fine MLP concatenates that."""
    lr_w = [refs[i][:] for i in range(n_lr)]
    lr_b = [refs[n_lr + i][:] for i in range(n_lr)]
    hr_w = [refs[2 * n_lr + i][:] for i in range(n_hr)]
    hr_b = [refs[2 * n_lr + n_hr + i][:] for i in range(n_hr)]
    out_hr_ref = refs[-2]
    out_lr_ref = refs[-1]

    logit_lr = _mlp_chain([xa_ref[:]], lr_w, lr_b, spec_lr, compute_dtype)
    pred_lr = jax.nn.sigmoid(logit_lr[:, :1])
    pred_cond = pred_lr * ma_ref[:, :1]
    pred_pad = jnp.pad(pred_cond, ((0, 0), (0, 127)))
    logit_hr = _mlp_chain([xb_ref[:], pred_pad], hr_w, hr_b, spec_hr,
                          compute_dtype)
    pred_hr = jax.nn.sigmoid(logit_hr[:, :1])
    out_hr_ref[:] = jnp.pad(pred_hr, ((0, 0), (0, 127)))
    out_lr_ref[:] = jnp.pad(pred_lr, ((0, 0), (0, 127)))


def fused_dual_mlp_train(xa: jnp.ndarray, xb: jnp.ndarray,
                         mask_a: jnp.ndarray, fw: FusedWeights,
                         block_n: int = 512, interpret: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Train-time fused chain: coarse MLP on ``xa`` [N, C_in], fine MLP
    on ``xb`` [N, C_in] + (mask_a [N] * coarse prediction). Returns
    (pred_hr [N], pred_lr [N]), both UNMASKED (callers apply their own
    per-point-set masks). Weights must be single-segment."""
    assert len(fw.spec_lr.base_segments) == 1
    N, C = xa.shape
    assert xb.shape == (N, C) and C == fw.spec_lr.dims[0]
    P0 = _round128(C)
    n_pad = -N % block_n
    Np = N + n_pad
    xap = jnp.pad(xa, ((0, n_pad), (0, P0 - C)))
    xbp = jnp.pad(xb, ((0, n_pad), (0, P0 - C)))
    map_ = jnp.pad(mask_a.astype(jnp.float32)[:, None],
                   ((0, n_pad), (0, 127)))

    n_lr = len(fw.lr_w)
    n_hr = len(fw.hr_w)
    weight_arrays = (list(fw.lr_w) + list(fw.lr_b) +
                     list(fw.hr_w) + list(fw.hr_b))
    kernel = functools.partial(_kernel_train, n_lr=n_lr, n_hr=n_hr,
                               spec_lr=fw.spec_lr, spec_hr=fw.spec_hr,
                               compute_dtype=fw.lr_w[0].dtype)
    grid = (Np // block_n,)
    in_specs = [pl.BlockSpec((block_n, P0), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)] * 2
    in_specs.append(pl.BlockSpec((block_n, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    for w in weight_arrays:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    out_specs = [pl.BlockSpec((block_n, 128), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] * 2
    out_hr, out_lr = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((Np, 128), jnp.float32)] * 2,
        interpret=interpret,
    )(xap, xbp, map_, *weight_arrays)
    return out_hr[:N, 0], out_lr[:N, 0]


def fused_dual_mlp_train_xla(xa, xb, mask_a, fw: FusedWeights
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """XLA twin of :func:`fused_dual_mlp_train` (differentiable)."""
    C = fw.spec_lr.dims[0]
    P0 = _round128(C)
    xap = jnp.pad(xa, ((0, 0), (0, P0 - C)))
    xbp = jnp.pad(xb, ((0, 0), (0, P0 - C)))
    dt = fw.lr_w[0].dtype
    logit_lr = _mlp_chain([xap], fw.lr_w, fw.lr_b, fw.spec_lr, dt)
    pred_lr = jax.nn.sigmoid(logit_lr[:, :1])
    pred_cond = pred_lr * mask_a.astype(jnp.float32)[:, None]
    pred_pad = jnp.pad(pred_cond, ((0, 0), (0, 127)))
    logit_hr = _mlp_chain([xbp, pred_pad], fw.hr_w, fw.hr_b, fw.spec_hr,
                          dt)
    pred_hr = jax.nn.sigmoid(logit_hr[:, :1])
    return pred_hr[:, 0], pred_lr[:, 0]


def make_fused_dual_mlp_train_ad(block_n: int = 512,
                                 interpret: bool = False,
                                 use_pallas: bool = True):
    """custom_vjp train op: Pallas forward, XLA-recompute backward.

    The forward runs the VMEM-resident kernel; the backward re-derives
    gradients through the numerically identical XLA twin (activations
    are cheap to recompute at training's ~6k-sample chunks, and the
    padded-weight layout makes both paths bit-comparable). Gradients
    flow to the inputs AND the FusedWeights leaves — prepare the
    weights from Flax params inside the jit so grads reach the params.
    The mask operand is non-differentiated (zero cotangent).
    """
    @jax.custom_vjp
    def op(xa, xb, mask_a, fw):
        if use_pallas:
            return fused_dual_mlp_train(xa, xb, mask_a, fw,
                                        block_n=block_n,
                                        interpret=interpret)
        return fused_dual_mlp_train_xla(xa, xb, mask_a, fw)

    def op_fwd(xa, xb, mask_a, fw):
        return op(xa, xb, mask_a, fw), (xa, xb, mask_a, fw)

    def op_bwd(res, g):
        xa, xb, mask_a, fw = res
        _, vjp = jax.vjp(
            lambda xa, xb, fw: fused_dual_mlp_train_xla(xa, xb, mask_a,
                                                        fw),
            xa, xb, fw)
        dxa, dxb, dfw = vjp(g)
        return dxa, dxb, jnp.zeros_like(mask_a), dfw

    op.defvjp(op_fwd, op_bwd)
    return op


def prepare_cols_weights(params_mlp_lr, params_mlp_hr, cfg=None,
                         dims_lr=None, dims_hr=None, hg_dim: int = 256,
                         res_layers_lr=(2, 3, 4), res_layers_hr=(2, 3, 4),
                         dtype=jnp.bfloat16) -> FusedWeights:
    """FusedWeights for the column-shared kernel: the single source of
    the (C_lr, C_hr, 1) base split (lr features | hr features | depth)
    every cols-path call site needs. Pass ``cfg`` (SuRSConfig) or the
    explicit dims."""
    if cfg is not None:
        dims_lr = cfg.mlp_dim_lr
        dims_hr = cfg.mlp_dim_hr
        hg_dim = cfg.hg_dim
        res_layers_lr = cfg.mlp_res_layers_lr
        res_layers_hr = cfg.mlp_res_layers_hr
    return prepare_fused_weights(
        params_mlp_lr, params_mlp_hr, dims_lr, dims_hr,
        res_layers_lr, res_layers_hr, dtype=dtype,
        base_split=(hg_dim, tuple(dims_lr)[0] - hg_dim - 1, 1))


# --------------------------------------------------------------------------
# Column-shared evaluation (projective structure).
#
# Under an axis-aligned projection (the production eval calibration,
# recon/pipeline.eval_calibration) every z sample of a grid column (i, j)
# projects to the SAME (u, v): identical bilinear taps, identical sampled
# features — only the 1-channel depth feature varies. The per-point MLP
# input is therefore rank-structured, and the expensive parts factor out
# per column:
#
#   layer_i(x) = h @ W_h  +  [x_lr | x_hr] @ W_feat  (per COLUMN)
#                         +  z * w_z                 (rank-1 in z)
#                         +  (pred * w_pred)         (hr conditioning)
#
# The kernel computes the column part once per column and the z outer
# product once per evaluation, leaving only the h-chain matmuls per
# point: ~3.8x fewer MACs than the generic kernel (dual 1.38 vs 5.3
# MMAC/point at the reference config) and ~500x fewer gather bytes
# (one 4-tap sample per column instead of per point). Replaces the hot
# primitive chain of lib/geometry.py:4-12 + SurfaceClassifier.py:45-79
# for dense grid evaluation.
#
# Weights must be prepared with base_split=(C_lr, C_hr, 1): the lr
# features, hr features and depth each get their own 128-lane block, so
# the z rows of every consuming layer are addressable as single rows.


def _cols_layer_offsets(spec: MLPSpec, i: int):
    """(h_rows, seg_offsets, z_row, pred_row|None) inside padded W_i."""
    padded = [_round128(r) for r in spec.base_segments]
    n_base = len(spec.base_segments)
    has_pred = n_base == 4          # hr spec: (C_lr, C_hr, 1(z), 1(pred))
    if i == 0:
        h_rows = 0
        base_off = 0
    elif i in spec.res_layers:
        h_rows = _round128(spec.dims[i])
        base_off = h_rows
    else:
        return _round128(spec.dims[i]), None, None, None
    seg_offs = [base_off, base_off + padded[0]]
    z_row = base_off + padded[0] + padded[1]
    pred_row = z_row + padded[2] if has_pred else None
    return h_rows, seg_offs, z_row, pred_row


def _cols_chain(x_parts, z0s, ws, bs, spec: MLPSpec, Z: int,
                compute_dtype, pred=None, kf=None, expand=None):
    """One column's layer chain over its Z depth samples — the single
    source of truth for the column-shared layer math (the cols AND runs
    kernels both use it).

    x_parts: [rows, P] padded column features (lr, hr). z0s: {layer:
    [Z, out]} depth outer products. pred: [Z, 1] coarse conditioning
    (hr MLP). ``kf`` (runs kernel): [rows, 1] per-window depth offset,
    added via the depth-weight row before expansion. ``expand``: how a
    per-column [rows, out] term becomes Z rows — broadcast for the cols
    kernel (rows == 1), z-major tiling for the runs kernel. Returns the
    final padded logits [Z, out_pad]."""
    if expand is None:
        def expand(col):
            return jnp.broadcast_to(col, (Z, col.shape[-1]))
    n_layers = len(spec.dims) - 1
    h = None
    for i in range(n_layers):
        h_rows, seg_offs, z_row, pred_row = _cols_layer_offsets(spec, i)
        W = ws[i]
        if seg_offs is None:                      # plain layer: h only
            acc = jnp.dot(h.astype(compute_dtype), W[:h_rows],
                          preferred_element_type=jnp.float32)
        else:
            col = None
            for p, off in zip(x_parts, seg_offs):
                d = jnp.dot(p.astype(compute_dtype),
                            W[off:off + p.shape[-1]],
                            preferred_element_type=jnp.float32)
                col = d if col is None else col + d
            if kf is not None:
                col = col + kf * W[z_row:z_row + 1].astype(jnp.float32)
            acc = expand(col) + z0s[i].astype(jnp.float32)
            if i > 0:
                acc = acc + jnp.dot(h.astype(compute_dtype), W[:h_rows],
                                    preferred_element_type=jnp.float32)
            if pred_row is not None and pred is not None:
                wp = W[pred_row:pred_row + 1].astype(jnp.float32)
                acc = acc + pred * wp
        h = acc + bs[i]
        if i < n_layers - 1:
            h = jnp.where(h >= 0, h, 0.01 * h)    # leaky_relu(0.01)
    return h


def _kernel_cols(*refs, cb: int, Z: int, n_lr: int, n_hr: int,
                 lr_z_layers, hr_z_layers, spec_lr: MLPSpec,
                 spec_hr: MLPSpec, compute_dtype):
    x_lr_ref, x_hr_ref = refs[0], refs[1]
    o = 2
    z0_lr = {i: refs[o + k][:] for k, i in enumerate(lr_z_layers)}
    o += len(lr_z_layers)
    z0_hr = {i: refs[o + k][:] for k, i in enumerate(hr_z_layers)}
    o += len(hr_z_layers)
    lr_w = [refs[o + i][:] for i in range(n_lr)]
    lr_b = [refs[o + n_lr + i][:] for i in range(n_lr)]
    hr_w = [refs[o + 2 * n_lr + i][:] for i in range(n_hr)]
    hr_b = [refs[o + 2 * n_lr + n_hr + i][:] for i in range(n_hr)]
    out_hr_ref = refs[-2]
    out_lr_ref = refs[-1]

    for c in range(cb):                    # static unroll over columns
        parts = [x_lr_ref[c:c + 1, :], x_hr_ref[c:c + 1, :]]
        logit_lr = _cols_chain(parts, z0_lr, lr_w, lr_b, spec_lr, Z,
                               compute_dtype)
        pred_lr = jax.nn.sigmoid(logit_lr[:, :1])          # [Z, 1]
        logit_hr = _cols_chain(parts, z0_hr, hr_w, hr_b, spec_hr, Z,
                               compute_dtype, pred=pred_lr)
        pred_hr = jax.nn.sigmoid(logit_hr[:, :1])
        # narrow z-on-lanes rows: the output IS the [col, z] volume
        # layout (the [Z, 1] -> [Z] write is a sublane->lane relayout;
        # a wide [cb*Z, 128] block here costs 8 MB of double-buffered
        # VMEM and OOMs the 16 MB scoped budget)
        out_hr_ref[0, c, :] = pred_hr[:, 0]
        out_lr_ref[0, c, :] = pred_lr[:, 0]


def _cols_z_layers(spec: MLPSpec):
    return tuple(i for i in range(len(spec.dims) - 1)
                 if i == 0 or i in spec.res_layers)


def _cols_z0(zf, ws, spec: MLPSpec, dtype):
    """Depth outer products {layer: [Z, out_pad]} (zero weight-pad rows
    below the real z row make W[z_row] the exact depth column)."""
    out = {}
    for i in _cols_z_layers(spec):
        _, _, z_row, _ = _cols_layer_offsets(spec, i)
        out[i] = (zf[:, None].astype(jnp.float32)
                  * ws[i][z_row:z_row + 1].astype(jnp.float32)
                  ).astype(dtype)
    return out


def fused_dual_mlp_cols(x_lr: jnp.ndarray, x_hr: jnp.ndarray,
                        zf: jnp.ndarray, fw: FusedWeights,
                        col_block: int = 8, interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Column-shared dual-MLP evaluation.

    x_lr [Ncol, C_lr], x_hr [Ncol, C_hr]: per-COLUMN sampled features.
    zf [Z]: the shared normalized-depth feature of each z sample.
    Returns (pred_hr [Ncol, Z], pred_lr [Ncol, Z]) — directly the
    [column, depth] volume layout. Requires weights prepared with
    base_split=(C_lr, C_hr, 1). Ncol is padded to a multiple of
    col_block internally (col_block must be a multiple of 8 — Mosaic
    sublane tiling); Z must be a multiple of 128 on TPU (lane tiling).
    """
    segs = fw.spec_lr.base_segments
    assert len(segs) == 3 and segs[2] == 1, segs
    Ncol = x_lr.shape[0]
    Z = zf.shape[0]
    assert x_lr.shape == (Ncol, segs[0]) and x_hr.shape == (Ncol, segs[1])
    cb = col_block
    n_pad = -Ncol % cb
    Np = Ncol + n_pad
    x_lr_p = jnp.pad(x_lr, ((0, n_pad), (0, _round128(segs[0]) - segs[0])))
    x_hr_p = jnp.pad(x_hr, ((0, n_pad), (0, _round128(segs[1]) - segs[1])))

    compute_dtype = fw.lr_w[0].dtype
    z0_lr = _cols_z0(zf, fw.lr_w, fw.spec_lr, compute_dtype)
    z0_hr = _cols_z0(zf, fw.hr_w, fw.spec_hr, compute_dtype)
    lr_zl = _cols_z_layers(fw.spec_lr)
    hr_zl = _cols_z_layers(fw.spec_hr)

    n_lr = len(fw.lr_w)
    n_hr = len(fw.hr_w)
    weight_arrays = (list(fw.lr_w) + list(fw.lr_b) +
                     list(fw.hr_w) + list(fw.hr_b))
    z0_arrays = [z0_lr[i] for i in lr_zl] + [z0_hr[i] for i in hr_zl]

    # z sub-blocking: bounds the [zb, 1024] f32 chain activations and
    # keeps only a [zb, out] slice of each z0 array resident — the whole
    # -Z variant overflows the 16 MB scoped-VMEM budget at Z=512. The
    # per-column feature matmuls are recomputed per z-block (Z/zb x, a
    # few-percent overhead).
    # any Z > 256 admitted by callers (the pipeline gates on
    # Z % 128 == 0) must sub-block: Z=384 whole-Z would carry ~3/4 of
    # the footprint documented to overflow at 512
    if Z > 256 and Z % 256 == 0:
        zb = 256
    elif Z > 256 and Z % 128 == 0:
        zb = 128
    else:
        zb = Z
    kernel = functools.partial(
        _kernel_cols, cb=cb, Z=zb, n_lr=n_lr, n_hr=n_hr,
        lr_z_layers=lr_zl, hr_z_layers=hr_zl,
        spec_lr=fw.spec_lr, spec_hr=fw.spec_hr,
        compute_dtype=compute_dtype)

    grid = (Np // cb, Z // zb)
    in_specs = [pl.BlockSpec((cb, x_lr_p.shape[1]),
                             lambda i, iz: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cb, x_hr_p.shape[1]),
                             lambda i, iz: (i, 0),
                             memory_space=pltpu.VMEM)]
    for a in z0_arrays:
        in_specs.append(pl.BlockSpec((zb, a.shape[1]),
                                     lambda i, iz: (iz, 0),
                                     memory_space=pltpu.VMEM))
    for a in weight_arrays:
        in_specs.append(pl.BlockSpec(a.shape, lambda i, iz: (0, 0),
                                     memory_space=pltpu.VMEM))
    out_specs = [pl.BlockSpec((1, cb, zb), lambda i, iz: (i, 0, iz),
                              memory_space=pltpu.VMEM)] * 2

    out_hr, out_lr = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((Np // cb, cb, Z),
                                        jnp.float32)] * 2,
        interpret=interpret,
    )(x_lr_p, x_hr_p, *z0_arrays, *weight_arrays)
    return (out_hr.reshape(Np, Z)[:Ncol],
            out_lr.reshape(Np, Z)[:Ncol])


# --------------------------------------------------------------------------
# Window ("runs") evaluation — the octree-evaluator hot path.
#
# The octree's dirty set clusters in short z-runs along grid columns
# (the unpruned shell around the surface). Under the same axis-aligned
# projection the column kernel exploits, every point of a run shares its
# column's (u, v) — so the octree evaluator compacts dirty 8-point
# z-WINDOWS instead of points, gathers features once per window, and
# this kernel evaluates all zb=8 depths of a window against one set of
# column features. Per-point MACs drop to the h-chain plus 1/zb of the
# feature matmuls (~2.8x fewer than the generic kernel at the reference
# config), and gather traffic drops ~zb x. Replaces the per-point hot
# chain of lib/sdf.py:55-120 + lib/geometry.py:4-12 for octree levels.
#
# Depth handling: zf(k0 + t) = kf + zt[t] with kf = zf(k0) - zf(0) per
# window and zt = zf(0..zb) shared — exact because the depth feature is
# affine in the grid index. kf rides INSIDE the x_hr block's zero pad
# lanes (C_hr < 128; those weight rows are zero so the feature matmul
# is unpolluted) — no extra HBM input — and contributes via a VPU outer
# product with the depth weight row. zt enters as per-layer z0 tiles
# precomputed outside, expanded to the kernel's z-major row order
# (row m = t * run_block + r evaluates window r of the block, depth t).


def _kernel_runs(x_lr_ref, x_hrk_ref, *refs, rb: int, zb: int, c_hr: int,
                 n_lr: int, n_hr: int, lr_z_layers, hr_z_layers,
                 spec_lr: MLPSpec, spec_hr: MLPSpec, compute_dtype):
    o = 0
    z0_lr = {i: refs[o + k][:] for k, i in enumerate(lr_z_layers)}
    o += len(lr_z_layers)
    z0_hr = {i: refs[o + k][:] for k, i in enumerate(hr_z_layers)}
    o += len(hr_z_layers)
    lr_w = [refs[o + i][:] for i in range(n_lr)]
    lr_b = [refs[o + n_lr + i][:] for i in range(n_lr)]
    hr_w = [refs[o + 2 * n_lr + i][:] for i in range(n_hr)]
    hr_b = [refs[o + 2 * n_lr + n_hr + i][:] for i in range(n_hr)]
    out_hr_ref = refs[-2]
    out_lr_ref = refs[-1]

    x_parts = (x_lr_ref[:], x_hrk_ref[:])
    kf = x_hrk_ref[:, c_hr:c_hr + 1]          # [rb, 1] smuggled pad lane

    def tile_runs(col):                       # [rb, out] -> [zb*rb, out]
        return jnp.concatenate([col] * zb, axis=0)

    # the shared column layer chain, with the runs twists injected:
    # kf adds the per-window depth offset via the depth-weight row, and
    # expansion is z-major tiling of the [rb, out] column term
    logit_lr = _cols_chain(x_parts, z0_lr, lr_w, lr_b, spec_lr, zb * rb,
                           compute_dtype, kf=kf, expand=tile_runs)
    pred_lr = jax.nn.sigmoid(logit_lr[:, :1])        # [zb*rb, 1]
    logit_hr = _cols_chain(x_parts, z0_hr, hr_w, hr_b, spec_hr, zb * rb,
                           compute_dtype, pred=pred_lr, kf=kf,
                           expand=tile_runs)
    pred_hr = jax.nn.sigmoid(logit_hr[:, :1])
    # one [1, 1, zb*rb] output row per block; the out arrays are rank-3
    # so the block's LAST TWO dims (1, zb*rb) equal the array dims —
    # Mosaic's block-mapping rule rejects a (1, zb*rb) block on a rank-2
    # array (second-minor block dim 1 is neither 8-divisible nor full).
    # The [zb*rb, 1] -> row relayout is the same sublane->lane move the
    # cols kernel does.
    out_hr_ref[0, 0, :] = pred_hr[:, 0]
    out_lr_ref[0, 0, :] = pred_lr[:, 0]


def fused_dual_mlp_runs(x_lr: jnp.ndarray, x_hr: jnp.ndarray,
                        kf: jnp.ndarray, zt: jnp.ndarray,
                        fw: FusedWeights, run_block: int = 64,
                        interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate zb consecutive depths of NR column windows.

    x_lr [NR, C_lr], x_hr [NR, C_hr]: per-WINDOW column features (shared
    by the window's depths). kf [NR]: per-window depth offset
    zf(k0) - zf(0). zt [zb]: shared in-window depth features zf(0..zb).
    Row (w, t) evaluates depth feature kf[w] + zt[t]. Returns
    (pred_hr [NR, zb], pred_lr [NR, zb]). Requires weights prepared with
    base_split=(C_lr, C_hr, 1) (prepare_cols_weights) and a free pad
    lane in the hr block (C_hr not a multiple of 128).
    """
    segs = fw.spec_lr.base_segments
    assert len(segs) == 3 and segs[2] == 1, segs
    C_lr, C_hr = segs[0], segs[1]
    P0, P1 = _round128(C_lr), _round128(C_hr)
    assert C_hr < P1, ("the runs kernel carries the depth offset in an "
                       "hr pad lane; C_hr must not be 128-aligned")
    NR = x_lr.shape[0]
    zb = zt.shape[0]
    assert x_lr.shape == (NR, C_lr) and x_hr.shape == (NR, C_hr)
    rb = run_block
    n_pad = -NR % rb
    NRp = NR + n_pad
    # the kf depth offset rides in the hr pad lane, so it inherits
    # x_hr's dtype — at bf16 that silently quantizes the depth feature
    # (~0.4% relative) and breaks the documented Pallas/XLA parity;
    # callers upcast gathered features to f32 first (evaluator_runs)
    assert x_hr.dtype == jnp.float32, (
        "fused_dual_mlp_runs needs f32 sample rows (the kf depth "
        f"offset shares x_hr's dtype); got {x_hr.dtype}")
    x_lr_p = jnp.pad(x_lr, ((0, n_pad), (0, P0 - C_lr)))
    x_hrk = jnp.concatenate(
        [x_hr, kf[:, None].astype(x_hr.dtype),
         jnp.zeros((NR, P1 - C_hr - 1), x_hr.dtype)], axis=1)
    x_hrk = jnp.pad(x_hrk, ((0, n_pad), (0, 0)))

    compute_dtype = fw.lr_w[0].dtype
    lr_zl = _cols_z_layers(fw.spec_lr)
    hr_zl = _cols_z_layers(fw.spec_hr)

    def z0_exp(ws, spec):
        out = []
        for i in _cols_z_layers(spec):
            _, _, z_row, _ = _cols_layer_offsets(spec, i)
            z0 = (zt[:, None].astype(jnp.float32)
                  * ws[i][z_row:z_row + 1].astype(jnp.float32))
            out.append(jnp.repeat(z0, rb, axis=0).astype(compute_dtype))
        return out

    z0_arrays = z0_exp(fw.lr_w, fw.spec_lr) + z0_exp(fw.hr_w, fw.spec_hr)
    n_lr = len(fw.lr_w)
    n_hr = len(fw.hr_w)
    weight_arrays = (list(fw.lr_w) + list(fw.lr_b) +
                     list(fw.hr_w) + list(fw.hr_b))

    kernel = functools.partial(
        _kernel_runs, rb=rb, zb=zb, c_hr=C_hr, n_lr=n_lr, n_hr=n_hr,
        lr_z_layers=lr_zl, hr_z_layers=hr_zl,
        spec_lr=fw.spec_lr, spec_hr=fw.spec_hr,
        compute_dtype=compute_dtype)

    grid = (NRp // rb,)
    in_specs = [pl.BlockSpec((rb, P0), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rb, P1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for a in z0_arrays:
        in_specs.append(pl.BlockSpec(a.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for a in weight_arrays:
        in_specs.append(pl.BlockSpec(a.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    out_specs = [pl.BlockSpec((1, 1, zb * rb), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)] * 2

    out_hr, out_lr = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((NRp // rb, 1, zb * rb),
                                        jnp.float32)] * 2,
        interpret=interpret,
    )(x_lr_p, x_hrk, *z0_arrays, *weight_arrays)

    def to_wz(v):   # z-major block rows -> [NR, zb]
        v = v.reshape(NRp // rb, zb, rb)
        return jnp.swapaxes(v, 1, 2).reshape(NRp, zb)[:NR]

    return to_wz(out_hr), to_wz(out_lr)


def fused_dual_mlp_runs_xla(x_lr, x_hr, kf, zt, fw: FusedWeights
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """XLA twin of :func:`fused_dual_mlp_runs` (CPU fallback / parity
    oracle): expands windows to per-point segments and runs the generic
    padded chain."""
    NR = x_lr.shape[0]
    zb = zt.shape[0]
    zf = (kf[:, None].astype(jnp.float32)
          + zt[None, :].astype(jnp.float32))           # [NR, zb]
    x_lr_rep = jnp.repeat(x_lr, zb, axis=0)
    x_hr_rep = jnp.repeat(x_hr, zb, axis=0)
    hr, lr = fused_dual_mlp_xla(
        [x_lr_rep, x_hr_rep, zf.reshape(-1, 1)], fw)
    return hr.reshape(NR, zb), lr.reshape(NR, zb)


def fused_dual_mlp_cols_xla(x_lr, x_hr, zf, fw: FusedWeights
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """XLA twin of :func:`fused_dual_mlp_cols` (CPU fallback / parity
    oracle): expands columns to per-point segments and runs the generic
    padded chain — numerically identical math."""
    Ncol = x_lr.shape[0]
    Z = zf.shape[0]
    x_lr_rep = jnp.repeat(x_lr, Z, axis=0)
    x_hr_rep = jnp.repeat(x_hr, Z, axis=0)
    z_rep = jnp.tile(zf[:, None], (Ncol, 1))
    hr, lr = fused_dual_mlp_xla([x_lr_rep, x_hr_rep, z_rep], fw)
    return hr.reshape(Ncol, Z), lr.reshape(Ncol, Z)


def fused_dual_mlp_xla(x, fw: FusedWeights
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure-XLA evaluation with the same padded weights (CPU fallback /
    differentiable path). Numerically identical to the kernel. ``x`` may
    be a single [N, C_in] array or per-segment arrays (see
    :func:`fused_dual_mlp`)."""
    parts = list(x) if isinstance(x, (list, tuple)) else [x]
    segs = fw.spec_lr.base_segments
    assert len(parts) == len(segs), (len(parts), segs)
    xps = [jnp.pad(p, ((0, 0), (0, _round128(real) - real)))
           for p, real in zip(parts, segs)]
    compute_dtype = fw.lr_w[0].dtype
    logit_lr = _mlp_chain(xps, fw.lr_w, fw.lr_b, fw.spec_lr, compute_dtype)
    pred_lr = jax.nn.sigmoid(logit_lr[:, :1])
    pred_pad = jnp.pad(pred_lr, ((0, 0), (0, 127)))
    logit_hr = _mlp_chain(xps + [pred_pad], fw.hr_w, fw.hr_b, fw.spec_hr,
                          compute_dtype)
    pred_hr = jax.nn.sigmoid(logit_hr[:, :1])
    return pred_hr[:, 0], pred_lr[:, 0]
