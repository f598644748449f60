import sys
import os
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))
"""Honest fused-kernel throughput: a device-side fori chain (each
iteration's input depends on the previous output), so the runtime can
neither elide nor overlap iterations. One dispatch per variant."""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from surs_tpu.models import SurfaceClassifier
from surs_tpu.ops.fused_mlp import prepare_fused_weights, fused_dual_mlp

DIMS_LR = (321, 1024, 512, 256, 128, 1)
DIMS_HR = (322, 1024, 512, 256, 128, 1)
N = 50176
ITERS = 20

mlp_lr = SurfaceClassifier(DIMS_LR)
mlp_hr = SurfaceClassifier(DIMS_HR)
p_lr = mlp_lr.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 321)))["params"]
p_hr = mlp_hr.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 322)))["params"]
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    (N, 321)).astype(np.float32))

for dtype_name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
    fw = prepare_fused_weights(p_lr, p_hr, DIMS_LR, DIMS_HR, dtype=dtype)
    for bn in (256, 512, 1024):
        @jax.jit
        def chain(x, fw=fw, bn=bn):
            def body(i, carry):
                acc, _ = carry
                hr, lr = fused_dual_mlp(x + acc * 1e-20, fw, block_n=bn)
                return (acc + hr[0], lr[0])
            return lax.fori_loop(0, ITERS, body,
                                 (jnp.float32(0), jnp.float32(0)))

        t0 = time.time()
        jax.block_until_ready(chain(x))
        tc = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(chain(x))
        dt = (time.time() - t0) / ITERS
        print(f"{dtype_name} block_n={bn}: {dt * 1000:.2f} ms/chunk "
              f"({N / dt / 1e6:.1f} Mq/s)  [compile {tc:.0f}s]",
              flush=True)
