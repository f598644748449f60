import sys, os, time, gzip, json, collections, glob
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
import numpy as np, jax, jax.numpy as jnp
from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from surs_tpu.config import SuRSConfig
from surs_tpu.models import surs_net_from_config
from surs_tpu.ops.fused_mlp import prepare_fused_weights
from surs_tpu.ops.point_query import make_fused_query_fn
from surs_tpu.recon.pipeline import Reconstructor

cfg = SuRSConfig(loadSize=512, residual=True, resolution=256, num_samples=50000,
                 b_min=[-0.5]*3, b_max=[0.5]*3)
model = surs_net_from_config(cfg)
rng = np.random.default_rng(0)
S = 256
img = jnp.asarray(rng.standard_normal((1,S,S,3)).astype(np.float32))
pts0 = jnp.asarray((rng.random((1,3,8))-0.5).astype(np.float32))
calib = jnp.asarray(np.diag([2.,-2.,2.,1.]).astype(np.float32))[None]
img_hr0 = jnp.asarray(rng.standard_normal((1,2*S,2*S,3)).astype(np.float32))
params = jax.jit(lambda k: model.init(k, img, img_hr0, pts0, pts0, calib, train=True))(jax.random.PRNGKey(0))["params"]
fw = prepare_fused_weights(params["mlp_lr"], params["mlp_hr"], cfg.mlp_dim_lr, cfg.mlp_dim_hr, dtype=jnp.bfloat16)
qf = make_fused_query_fn(cfg.loadSize, cfg.z_size)
rec = Reconstructor(model, query_fn=qf, octree_mode="hostloop",
                    feature_dtype=jnp.bfloat16)
_, feats_lr, feat_hr = rec.encode(params, img)
args = (fw, feats_lr, feat_hr, np.asarray(calib), 256,
        np.asarray(cfg.b_min), np.asarray(cfg.b_max))
kw = dict(num_samples=50000, threshold=0.05, init_resolution=64)
hr, _, _ = rec.evaluate(*args, **kw); jax.block_until_ready(hr)
os.makedirs("/tmp/xprof_o", exist_ok=True)
with jax.profiler.trace("/tmp/xprof_o"):
    hr, _, _ = rec.evaluate(*args, **kw)
    jax.block_until_ready(hr)
path = sorted(glob.glob("/tmp/xprof_o/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(path) as f:
    trace = json.load(f)
durs = collections.Counter()
for e in trace.get("traceEvents", []):
    if e.get("ph") == "X" and not e.get("name","").startswith("$"):
        durs[e.get("name","?")[:55]] += e.get("dur", 0)
for name, d in durs.most_common(22):
    print(f"{d/1000:8.2f} ms  {name}", flush=True)
