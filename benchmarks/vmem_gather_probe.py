"""Feasibility probe: per-point row gather from a VMEM-resident feature
map inside a Pallas TPU kernel (the round-2 VERDICT's "mega-kernel"
idea: lr map VMEM-resident inside a gather+MLP kernel).

Variants:
  A. vector gather: jnp.take(feat, idx_vec, axis=0) in-kernel
  B. fori_loop of scalar dynamic-slice row reads (idx in SMEM)
  C. baseline: XLA take_along_axis from HBM (the current query path)

RESULT (2026-08-17, axon TPU, jax in this image) — NEGATIVE:
  A fails to lower (Mosaic: "Shape mismatch in input, indices and
    output" — tpu dynamic_gather wants index shape == operand shape,
    i.e. same-shape permutes, not row gathers);
  B crashes the Mosaic compiler outright (remote compile HTTP 500,
    tpu_compile_helper exit 1);
  C (status quo) reads 1.90 ms per 49k-row chain step.
In-kernel VMEM row-gather is not expressible on this toolchain, so the
mega-kernel was abandoned in favor of a stronger structural idea that
sidesteps gathers entirely: projective COLUMN SHARING (all z points of
a grid column share uv taps and the layer-0/residual feature products;
see ops/fused_mlp.fused_dual_mlp_cols) — the round-3 query-path work.

Run with PROBE=interp on CPU for semantics; on the TPU it compiles each
variant and times a 20-deep device chain ending in a scalar fetch
(CLAUDE.md timing discipline).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

INTERP = os.environ.get("PROBE", "") == "interp"
if INTERP:
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

H = W = 128
C = 256
N = 49152          # 96 blocks of 512
BLOCK = 512
DTYPE = jnp.bfloat16


def kernel_vec(idx_ref, feat_ref, out_ref):
    idx = idx_ref[:]                       # [BLOCK] int32 in VMEM
    out_ref[:] = jnp.take(feat_ref[:], idx, axis=0)


def kernel_loop(idx_ref, feat_ref, out_ref):
    def body(i, _):
        row = idx_ref[i]
        out_ref[pl.ds(i, 1), :] = feat_ref[pl.ds(row, 1), :]
        return 0
    jax.lax.fori_loop(0, BLOCK, body, 0)


def build(variant):
    if variant == "vec":
        kern = kernel_vec
        idx_spec = pl.BlockSpec((BLOCK,), lambda i: (i,),
                                memory_space=pltpu.VMEM)
    else:
        kern = kernel_loop
        idx_spec = pl.BlockSpec((BLOCK,), lambda i: (i,),
                                memory_space=pltpu.SMEM)

    @jax.jit
    def run(feat, idx):
        return pl.pallas_call(
            kern,
            grid=(N // BLOCK,),
            in_specs=[idx_spec,
                      pl.BlockSpec((H * W, C), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BLOCK, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, C), DTYPE),
            interpret=INTERP,
        )(idx, feat)
    return run


@jax.jit
def run_xla(feat, idx):
    return jnp.take(feat, idx, axis=0)


def chain_time(fn, feat, idx, iters=20):
    """Each iteration's output perturbs the next call's indices —
    a data-dependent device chain; ends in a full-tensor fetch-sync."""
    @jax.jit
    def chained(feat, idx):
        def body(i, carry):
            idx_c, acc = carry
            out = fn(feat, idx_c)
            s = jnp.sum(out.astype(jnp.float32))
            idx_c = (idx_c + (s.astype(jnp.int32) & 1) + 1) % (H * W)
            return (idx_c, acc + s)
        (_, acc) = jax.lax.fori_loop(0, iters, body,
                                     (idx, jnp.float32(0.0)))[0:2]
        return acc
    t0 = time.time()
    float(chained(feat, idx))
    t_first = time.time() - t0
    t_best = 1e30
    for _ in range(3):
        t0 = time.time()
        float(chained(feat, idx))
        t_best = min(t_best, time.time() - t0)
    return t_first, t_best / iters


def main():
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((H * W, C)), DTYPE)
    idx = jnp.asarray(rng.integers(0, H * W, N), jnp.int32)

    ref = np.asarray(run_xla(feat, idx), np.float32)

    for variant in ("vec", "loop"):
        try:
            run = build(variant)
            out = np.asarray(run(feat, idx), np.float32)
            ok = np.array_equal(out, ref)
            print(f"[{variant}] compiles, correct={ok}")
            if not INTERP:
                tf, tb = chain_time(run, feat, idx)
                print(f"[{variant}] first {tf:.2f}s, steady "
                      f"{tb * 1e3:.3f} ms/iter ({N} rows)")
        except Exception as e:  # noqa: BLE001
            print(f"[{variant}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")

    if not INTERP:
        tf, tb = chain_time(run_xla, feat, idx)
        print(f"[xla-hbm] first {tf:.2f}s, steady {tb * 1e3:.3f} ms/iter")


if __name__ == "__main__":
    main()
