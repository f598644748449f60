import sys
import os
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))
"""Component timing of the query path at the production chunk size:
projection, each gather variant, and the MLP kernel in isolation.
Device-side fori chains with data dependencies (no dispatch elision).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from surs_tpu.models import SurfaceClassifier
from surs_tpu.ops.fused_mlp import prepare_fused_weights, fused_dual_mlp
from surs_tpu.ops.grid_sample import (grid_sample_points, pack_bilinear,
                                      grid_sample_points_packed)

N = 50176
ITERS = 20

rng = np.random.default_rng(0)
feat_lr = jnp.asarray(rng.standard_normal((1, 128, 128, 256))
                      .astype(np.float32))
feat_hr = jnp.asarray(rng.standard_normal((1, 512, 512, 64))
                      .astype(np.float32))
uv0 = jnp.asarray((rng.random((1, N, 2)) * 2 - 1).astype(np.float32))


def run(label, fn, *args):
    @jax.jit
    def chain(uv, *args):
        def body(i, carry):
            uv, acc = carry
            out = fn(uv, *args)
            # full-tensor reduce: a sliced dependency would let XLA
            # shrink the gather itself to the sliced rows (DCE)
            s = jnp.sum(out) * 1e-20
            return uv + s, acc + s
        return lax.fori_loop(0, ITERS, body, (uv, jnp.float32(0)))

    # block_until_ready can return before the dispatch queue is even
    # flushed on this backend — only a real fetch synchronizes. Fetch
    # the scalar accumulator to time, and subtract the fetch RPC floor
    # measured separately.
    float(chain(uv0, *args)[1])
    ts = []
    for k in (1, 2, 3):
        xin = uv0 * (1 - 0.001 * k)
        float(jnp.sum(xin))
        t0 = time.time()
        r = chain(xin, *args)
        float(r[1])
        ts.append((time.time() - t0) / ITERS * 1000)
    print(f"{label}: {min(ts):.2f} ms/iter (runs: "
          + ", ".join(f"{t:.2f}" for t in ts) + ")", flush=True)


for dname, fdt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
    fl = feat_lr.astype(fdt)
    fh = feat_hr.astype(fdt)
    flq = jax.jit(pack_bilinear)(fl)
    fhq = jax.jit(pack_bilinear)(fh)
    jax.block_until_ready((flq, fhq))
    run(f"4tap gather lr  {dname}",
        lambda uv, f: grid_sample_points(f, uv), fl)
    run(f"4tap gather hr  {dname}",
        lambda uv, f: grid_sample_points(f, uv), fh)
    run(f"packed gather lr {dname}",
        lambda uv, f: grid_sample_points_packed(f, uv), flq)
    run(f"packed gather hr {dname}",
        lambda uv, f: grid_sample_points_packed(f, uv), fhq)

# MLP kernel alone (bf16 weights)
DIMS_LR = (321, 1024, 512, 256, 128, 1)
DIMS_HR = (322, 1024, 512, 256, 128, 1)
mlp_lr = SurfaceClassifier(DIMS_LR)
mlp_hr = SurfaceClassifier(DIMS_HR)
p_lr = mlp_lr.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 321)))["params"]
p_hr = mlp_hr.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 322)))["params"]
fw = prepare_fused_weights(p_lr, p_hr, DIMS_LR, DIMS_HR,
                           dtype=jnp.bfloat16)
x0 = jnp.asarray(rng.standard_normal((N, 321)).astype(np.float32))


@jax.jit
def mlp_chain(x, fw):
    def body(i, carry):
        acc, _ = carry
        hr, lr = fused_dual_mlp(x + acc * 1e-20, fw)
        return (acc + hr[0], lr[0])
    return lax.fori_loop(0, ITERS, body, (jnp.float32(0), jnp.float32(0)))


float(mlp_chain(x0, fw)[0])
ts = []
for k in (1, 2, 3):
    xin = x0 * (1 - 0.001 * k)
    float(jnp.sum(xin))
    t0 = time.time()
    r = mlp_chain(xin, fw)
    float(r[0])
    ts.append((time.time() - t0) / ITERS * 1000)
print("MLP kernel bf16: " + ", ".join(f"{t:.2f}" for t in ts)
      + " ms/iter", flush=True)

# RPC floor: trivial chain, same sync pattern
@jax.jit
def tiny_chain(x):
    def body(i, c):
        return c * 1.0000001
    return lax.fori_loop(0, ITERS, body, x)

float(tiny_chain(jnp.float32(1.0)))
t0 = time.time()
float(tiny_chain(jnp.float32(1.1)))
print(f"sync floor: {(time.time() - t0) * 1000:.1f} ms total", flush=True)
