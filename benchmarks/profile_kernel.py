import sys, os, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from surs_tpu.models import SurfaceClassifier
from surs_tpu.ops.fused_mlp import prepare_fused_weights, fused_dual_mlp

DIMS_LR=(321,1024,512,256,128,1); DIMS_HR=(322,1024,512,256,128,1)
N=50176
mlp_lr = SurfaceClassifier(DIMS_LR); mlp_hr = SurfaceClassifier(DIMS_HR)
p_lr = mlp_lr.init(jax.random.PRNGKey(0), jnp.zeros((1,4,321)))["params"]
p_hr = mlp_hr.init(jax.random.PRNGKey(1), jnp.zeros((1,4,322)))["params"]
fw = prepare_fused_weights(p_lr, p_hr, DIMS_LR, DIMS_HR, dtype=jnp.bfloat16)
x = jnp.asarray(np.random.default_rng(0).standard_normal((N,321)).astype(np.float32))

@jax.jit
def chain(x):
    def body(i, acc):
        hr, lr = fused_dual_mlp(x + acc * 1e-20, fw, block_n=512)
        return acc + hr[0]
    return lax.fori_loop(0, 10, body, jnp.float32(0))
jax.block_until_ready(chain(x))
os.makedirs("/tmp/xprof", exist_ok=True)
try:
    with jax.profiler.trace("/tmp/xprof"):
        jax.block_until_ready(chain(x))
    print("trace written", flush=True)
    for root, dirs, files in os.walk("/tmp/xprof"):
        for f in files:
            print(os.path.join(root, f), os.path.getsize(os.path.join(root, f)))
except Exception as e:
    print("profiler failed:", type(e).__name__, e, flush=True)
