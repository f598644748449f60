import sys, os
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
"""512^3 octree evaluation: hostloop vs fused mode, plus device MC.

Random weights = pruning worst case (every near-0.5 region stays
dirty). Steady-state timings on the second call; first call includes
remote compiles (persistent-cached across runs).
"""
import time, numpy as np, jax, jax.numpy as jnp
from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from surs_tpu.config import SuRSConfig
from surs_tpu.models import surs_net_from_config
from surs_tpu.ops.fused_mlp import prepare_fused_weights
from surs_tpu.ops.point_query import make_fused_query_fn
from surs_tpu.recon.pipeline import Reconstructor

MODE = os.environ.get("SURS_T512_MODE", "hostloop")
CHUNK = int(os.environ.get("SURS_T512_CHUNK", "262144"))
PACK = os.environ.get("SURS_T512_PACK", "1") == "1"

cfg = SuRSConfig(loadSize=512, residual=True, resolution=512,
                 num_samples=CHUNK, b_min=[-0.5]*3, b_max=[0.5]*3)
model = surs_net_from_config(cfg)
rng = np.random.default_rng(0)
S = 256
img = jnp.asarray(rng.standard_normal((1,S,S,3)).astype(np.float32))
pts0 = jnp.asarray((rng.random((1,3,8))-0.5).astype(np.float32))
calib = jnp.asarray(np.diag([2.,-2.,2.,1.]).astype(np.float32))[None]
img_hr0 = jnp.asarray(rng.standard_normal((1,2*S,2*S,3)).astype(np.float32))
params = jax.jit(lambda k: model.init(k, img, img_hr0, pts0, pts0, calib,
                                      train=True))(jax.random.PRNGKey(0))["params"]
base_split = (256, 65) if PACK else None
fw = prepare_fused_weights(params["mlp_lr"], params["mlp_hr"],
                           cfg.mlp_dim_lr, cfg.mlp_dim_hr,
                           dtype=jnp.bfloat16, base_split=base_split)
qf = make_fused_query_fn(cfg.loadSize, cfg.z_size, packed=PACK)
rec = Reconstructor(model, query_fn=qf, octree_mode=MODE,
                    feature_dtype=jnp.bfloat16, feature_pack=PACK)
_, feats_lr, feat_hr = rec.encode(params, img)

args = (fw, feats_lr, feat_hr, np.asarray(calib), 512,
        np.asarray(cfg.b_min), np.asarray(cfg.b_max))
kw = dict(num_samples=CHUNK, threshold=0.05, init_resolution=64)
stats = {} if MODE == "hostloop" else None
if stats is not None:
    kw["stats_out"] = stats

# block_until_ready can return pre-flush on this backend; a scalar
# fetch is the only reliable sync (one tiny jitted program, cached)
probe = jax.jit(lambda a: jnp.sum(a[:2, :2, :2]))

t0 = time.time()
sdf_hr, _, _ = rec.evaluate(*args, **kw)
float(probe(sdf_hr)); t1 = time.time()-t0
t0 = time.time()
sdf_hr, _, _ = rec.evaluate(*args, **kw)
float(probe(sdf_hr))
t2 = time.time()-t0
print(f"mode={MODE} chunk={CHUNK} pack={PACK}: first {t1:.1f}s, "
      f"steady {t2:.2f}s, stats {stats}", flush=True)

# device marching tetrahedra on a representative 512^3 human volume
from surs_tpu.recon.tetra_device import marching_tetrahedra_device
from surs_tpu.utils.synth import humanoid_volume
hvol = humanoid_volume(512)
float(jnp.sum(hvol[:2, :2, :2]))
t0 = time.time()
v, f = marching_tetrahedra_device(hvol, 0.5)
t1 = time.time()-t0
hvol2 = hvol * 1.0001
float(jnp.sum(hvol2[:2, :2, :2]))
t0 = time.time()
v, f = marching_tetrahedra_device(hvol2, 0.5)
t2 = time.time()-t0
print(f"device MC 512^3 humanoid: first {t1:.1f}s, steady {t2:.2f}s, "
      f"{v.shape[0]} verts {f.shape[0]} faces", flush=True)
