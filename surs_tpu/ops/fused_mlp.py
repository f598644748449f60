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
