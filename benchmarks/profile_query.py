import sys, os, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from surs_tpu.config import SuRSConfig
from surs_tpu.models import surs_net_from_config
from surs_tpu.ops.fused_mlp import prepare_fused_weights
from surs_tpu.ops.point_query import fused_query

cfg = SuRSConfig(loadSize=512, residual=True, b_min=[-0.5]*3, b_max=[0.5]*3)
model = surs_net_from_config(cfg)
rng = np.random.default_rng(0)
S = 256
img = jnp.asarray(rng.standard_normal((1,S,S,3)).astype(np.float32))
pts0 = jnp.asarray((rng.random((1,3,8))-0.5).astype(np.float32))
calib = jnp.asarray(np.diag([2.,-2.,2.,1.]).astype(np.float32))[None]
img_hr0 = jnp.asarray(rng.standard_normal((1,2*S,2*S,3)).astype(np.float32))
params = jax.jit(lambda k: model.init(k, img, img_hr0, pts0, pts0, calib, train=True))(jax.random.PRNGKey(0))["params"]
fw = prepare_fused_weights(params["mlp_lr"], params["mlp_hr"], cfg.mlp_dim_lr, cfg.mlp_dim_hr, dtype=jnp.bfloat16)
from surs_tpu.models import SuRSNet
_, feats_lr, feat_hr = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False, method=SuRSNet.encode))(params, img)
feats_lr = [f.astype(jnp.bfloat16) for f in feats_lr]
feat_hr = feat_hr.astype(jnp.bfloat16)
N = 50000
pts = jnp.asarray((rng.random((1,3,N))-0.5).astype(np.float32))

@jax.jit
def chain(pts):
    def body(i, acc):
        hr, lr = fused_query(fw, feats_lr[-1], feat_hr, pts + acc*1e-20,
                             calib, cfg.loadSize, cfg.z_size)
        return acc + hr[0,0]
    return lax.fori_loop(0, 10, body, jnp.float32(0))
jax.block_until_ready(chain(pts))
os.makedirs("/tmp/xprof_q", exist_ok=True)
with jax.profiler.trace("/tmp/xprof_q"):
    jax.block_until_ready(chain(pts))
import gzip, json, collections, glob
path = sorted(glob.glob("/tmp/xprof_q/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(path) as f:
    trace = json.load(f)
durs = collections.Counter()
for e in trace.get("traceEvents", []):
    if e.get("ph") == "X" and not e.get("name","").startswith("$"):
        durs[e.get("name","?")[:60]] += e.get("dur", 0)
for name, d in durs.most_common(15):
    print(f"{d/1000:8.2f} ms  {name}", flush=True)
