import sys, os
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
import time, numpy as np, jax, jax.numpy as jnp
from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from surs_tpu.config import SuRSConfig
from surs_tpu.models import surs_net_from_config
from surs_tpu.recon.pipeline import Reconstructor
rng = np.random.default_rng(0)
S = 256
img = jnp.asarray(rng.standard_normal((1,S,S,3)).astype(np.float32))
pts0 = jnp.asarray((rng.random((1,3,8))-0.5).astype(np.float32))
calib = jnp.asarray(np.diag([2.,-2.,2.,1.]).astype(np.float32))[None]
img_hr0 = jnp.asarray(rng.standard_normal((1,2*S,2*S,3)).astype(np.float32))
for dt in ("float32", "bfloat16"):
    cfg = SuRSConfig(loadSize=512, residual=True, dtype=dt)
    model = surs_net_from_config(cfg)
    params = jax.jit(lambda k: model.init(k, img, img_hr0, pts0, pts0, calib, train=True))(jax.random.PRNGKey(0))["params"]
    rec = Reconstructor(model)
    out = jax.block_until_ready(rec.encode(params, img))
    t0=time.time()
    for _ in range(5):
        out = rec.encode(params, img)
    jax.block_until_ready(out)
    print(f"encode {dt}: {(time.time()-t0)/5*1000:.1f} ms", flush=True)
