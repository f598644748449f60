"""Column-shared dense evaluator vs the generic query path on TPU.

Measures one full dense evaluation (hr+lr volumes) at the reference
operating point for both paths, fetch-synced (CLAUDE.md discipline).
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import numpy as np  # noqa: E402
import jax  # noqa: E402
from surs_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()
import jax.numpy as jnp  # noqa: E402

from surs_tpu.config import SuRSConfig  # noqa: E402
from surs_tpu.models import SuRSNet, surs_net_from_config  # noqa: E402
from surs_tpu.ops.fused_mlp import prepare_fused_weights  # noqa: E402
from surs_tpu.ops.point_query import make_fused_query_fn  # noqa: E402
from surs_tpu.recon.pipeline import Reconstructor  # noqa: E402

R = int(os.environ.get("COLS_R", "512"))

cfg = SuRSConfig(loadSize=512, residual=True, resolution=R,
                 num_samples=262144,
                 b_min=[-0.5, -0.5, -0.5], b_max=[0.5, 0.5, 0.5])
S = cfg.loadSize // 2
model = surs_net_from_config(cfg)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.standard_normal((1, S, S, 3)).astype(np.float32))
pts0 = jnp.asarray((rng.random((1, 3, 8)) - 0.5).astype(np.float32))
calib = np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32)[None]
img_hr0 = jnp.asarray(rng.standard_normal(
    (1, 2 * S, 2 * S, 3)).astype(np.float32))
params = jax.jit(lambda k: model.init(
    k, img, img_hr0, pts0, pts0, jnp.asarray(calib), train=True))(
        jax.random.PRNGKey(0))["params"]


def fetch(x):
    return float(jnp.asarray(x).reshape(-1)[0])


t0 = time.time()
enc = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False,
                                       method=SuRSNet.encode))
_, feats_lr, feat_hr = enc(params, img)
fetch(feat_hr[0, 0, 0, 0])
print(f"encode {time.time()-t0:.1f}s", flush=True)

# generic packed path
fw2 = prepare_fused_weights(params["mlp_lr"], params["mlp_hr"],
                            cfg.mlp_dim_lr, cfg.mlp_dim_hr,
                            dtype=jnp.bfloat16, base_split=(256, 65))
qf = make_fused_query_fn(cfg.loadSize, cfg.z_size, packed=True)
rec = Reconstructor(model, query_fn=qf, feature_dtype=jnp.bfloat16,
                    feature_pack=True)

# cols path
from surs_tpu.ops.fused_mlp import prepare_cols_weights  # noqa: E402
fw3 = prepare_cols_weights(params["mlp_lr"], params["mlp_hr"], cfg=cfg,
                           dtype=jnp.bfloat16)
rec_c = Reconstructor(model, feature_dtype=jnp.bfloat16,
                      cols_weights=fw3, load_size=cfg.loadSize,
                      z_size=cfg.z_size)

args = (calib, R, np.asarray(cfg.b_min), np.asarray(cfg.b_max))

from surs_tpu.recon.evaluator import eval_grid_dense_cols  # noqa: E402
from surs_tpu.recon.grid import grid_matrix  # noqa: E402
mat = grid_matrix((R, R, R), cfg.b_min, cfg.b_max)

for name, fn in (
    ("cols", lambda: rec_c.evaluate(fw3, feats_lr, feat_hr, *args,
                                    use_octree=False)),
    ("generic", lambda: rec.evaluate(fw2, feats_lr, feat_hr, *args,
                                     use_octree=False,
                                     num_samples=cfg.num_samples)),
):
    t0 = time.time()
    out = fn()
    fetch(out[0][0, 0, 0])
    print(f"[{name}] first (compile+run) {time.time()-t0:.1f}s",
          flush=True)
    best = 1e30
    for _ in range(3):
        t0 = time.time()
        out = fn()
        fetch(out[0][0, 0, 0])
        best = min(best, time.time() - t0)
    qps = R ** 3 / best
    print(f"[{name}] steady {best:.3f}s -> {qps/1e6:.2f} Mq/s", flush=True)
    if name == "cols":
        hr_c = out[0]
    else:
        # parity check on a slice (bf16 feature path both sides)
        d = np.asarray(out[0][R // 2]) - np.asarray(hr_c[R // 2])
        print(f"max |cols - generic| on mid-slice: "
              f"{np.abs(d).max():.4f}", flush=True)
