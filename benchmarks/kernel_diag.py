import sys, os, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from surs_tpu.models import SurfaceClassifier
from surs_tpu.ops.fused_mlp import prepare_fused_weights, fused_dual_mlp, fused_dual_mlp_xla

DIMS_LR=(321,1024,512,256,128,1); DIMS_HR=(322,1024,512,256,128,1)
N=50176; 
mlp_lr = SurfaceClassifier(DIMS_LR); mlp_hr = SurfaceClassifier(DIMS_HR)
p_lr = mlp_lr.init(jax.random.PRNGKey(0), jnp.zeros((1,4,321)))["params"]
p_hr = mlp_hr.init(jax.random.PRNGKey(1), jnp.zeros((1,4,322)))["params"]
fw = prepare_fused_weights(p_lr, p_hr, DIMS_LR, DIMS_HR, dtype=jnp.bfloat16)
x = jnp.asarray(np.random.default_rng(0).standard_normal((N,321)).astype(np.float32))

def run(label, inner, iters):
    @jax.jit
    def chain(x):
        def body(i, carry):
            acc = carry
            out = inner(x + acc * 1e-20)
            return acc + out
        return lax.fori_loop(0, iters, body, jnp.float32(0))
    jax.block_until_ready(chain(x))
    t0=time.time(); jax.block_until_ready(chain(x))
    print(f"{label}: {(time.time()-t0)/iters*1000:.3f} ms/iter", flush=True)

# harness-only: trivial op
run("trivial (sum)", lambda xx: jnp.sum(xx) * 1e-20, 100)
# pallas kernel
run("pallas bn512", lambda xx: fused_dual_mlp(xx, fw, block_n=512)[0][0], 100)
# xla path
run("xla fused", lambda xx: fused_dual_mlp_xla(xx, fw)[0][0], 100)
# half the points
xh = x[:25088]
def run2(label, inner, iters, inp):
    @jax.jit
    def chain(x):
        def body(i, acc):
            return acc + inner(x + acc * 1e-20)
        return lax.fori_loop(0, iters, body, jnp.float32(0))
    jax.block_until_ready(chain(inp))
    t0=time.time(); jax.block_until_ready(chain(inp))
    print(f"{label}: {(time.time()-t0)/iters*1000:.3f} ms/iter", flush=True)
run2("pallas bn512 N/2", lambda xx: fused_dual_mlp(xx, fw, block_n=512)[0][0], 100, xh)
