import sys
import os
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))
"""Full query-path throughput: projection + gather + fused dual MLP.

Compares the 4-tap gather path against the pack_bilinear single-gather
path (round-2 optimization) at the production chunk size, for f32 and
bf16 feature storage. Honest timing: device-side fori chain with a
data dependency from each iteration's output into the next iteration's
points, one dispatch per variant.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from surs_tpu.models import SurfaceClassifier
from surs_tpu.ops.fused_mlp import prepare_fused_weights
from surs_tpu.ops.grid_sample import pack_bilinear
from surs_tpu.ops.point_query import fused_query, fused_query_packed

DIMS_LR = (321, 1024, 512, 256, 128, 1)
DIMS_HR = (322, 1024, 512, 256, 128, 1)
N = 50176
ITERS = 20
LOAD = 512

mlp_lr = SurfaceClassifier(DIMS_LR)
mlp_hr = SurfaceClassifier(DIMS_HR)
p_lr = mlp_lr.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 321)))["params"]
p_hr = mlp_hr.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 322)))["params"]

rng = np.random.default_rng(0)
feat_lr = jnp.asarray(rng.standard_normal((1, 128, 128, 256))
                      .astype(np.float32))
feat_hr = jnp.asarray(rng.standard_normal((1, 512, 512, 64))
                      .astype(np.float32))
pts = jnp.asarray((rng.random((1, 3, N)) - 0.5).astype(np.float32))
calib = jnp.asarray(np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32))[None]


def run(label, call, f_lr, f_hr, fw):
    # features/weights flow through traced args — closure capture would
    # bake them into the program as constants (huge MLIR payloads on the
    # remote-compile backend, and no cross-subject program reuse)
    @jax.jit
    def chain(pts, f_lr, f_hr, fw):
        def body(i, carry):
            p, acc = carry
            hr, lr = call(fw, f_lr, f_hr, p)
            d = (hr[0, :1] + lr[0, :1]) * 1e-20
            return p + d[None, :, None], acc + hr[0, 0]
        return lax.fori_loop(0, ITERS, body, (pts, jnp.float32(0)))

    # fetch-based sync: block_until_ready can return pre-flush here
    t0 = time.time()
    float(chain(pts, f_lr, f_hr, fw)[1])
    tc = time.time() - t0
    dts = []
    for k in (1, 2):
        pin = pts * (1 - 0.001 * k)
        float(jnp.sum(pin))
        t0 = time.time()
        float(chain(pin, f_lr, f_hr, fw)[1])
        dts.append((time.time() - t0) / ITERS)
    dt = min(dts)
    print(f"{label}: {dt * 1000:.2f} ms/chunk ({N / dt / 1e6:.1f} Mq/s) "
          f"[compile {tc:.0f}s]", flush=True)


for dtype_name, fdt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
    f_lr = feat_lr.astype(fdt)
    f_hr = feat_hr.astype(fdt)
    fw = prepare_fused_weights(p_lr, p_hr, DIMS_LR, DIMS_HR,
                               dtype=jnp.bfloat16)
    run(f"4-tap   feat={dtype_name}",
        lambda fw, fl, fh, p: fused_query(fw, fl, fh, p, calib, LOAD,
                                          200.0),
        f_lr, f_hr, fw)

    fwp = prepare_fused_weights(p_lr, p_hr, DIMS_LR, DIMS_HR,
                                dtype=jnp.bfloat16, base_split=(256, 65))
    f_lr_q = jax.jit(pack_bilinear)(f_lr)
    jax.block_until_ready(f_lr_q)
    run(f"packed  feat={dtype_name}",
        lambda fw, fl, fh, p: fused_query_packed(fw, fl, fh, p, calib,
                                                 LOAD, 200.0),
        f_lr_q, f_hr, fwp)
