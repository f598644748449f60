import sys, os, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
"""Runs-mode (dirty column window) octree evaluator vs generic mono.

Measures, at the reference 512^3 operating point with random weights:
  * the runs kernel in isolation (Mosaic lowering smoke + rate)
  * octree eval steady-state: mono (per-point packed path) vs runs
    (window path), unpruned and with a disc-silhouette mask_prune.
All timings fetch-synced (CLAUDE.md discipline).
"""
import numpy as np, jax, jax.numpy as jnp
from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from surs_tpu.config import SuRSConfig
from surs_tpu.models import surs_net_from_config
from surs_tpu.ops.fused_mlp import (prepare_fused_weights,
                                    prepare_cols_weights,
                                    fused_dual_mlp_runs)
from surs_tpu.ops.point_query import make_fused_query_fn
from surs_tpu.recon.pipeline import Reconstructor

R = int(os.environ.get("RUNS_RES", "512"))
cfg = SuRSConfig(loadSize=512, residual=True, resolution=R,
                 num_samples=262144,
                 b_min=[-0.5] * 3, b_max=[0.5] * 3)
model = surs_net_from_config(cfg)
rng = np.random.default_rng(0)
S = 256
img = jnp.asarray(rng.standard_normal((1, S, S, 3)).astype(np.float32))
pts0 = jnp.asarray((rng.random((1, 3, 8)) - 0.5).astype(np.float32))
calib = jnp.asarray(np.diag([2., -2., 2., 1.]).astype(np.float32))[None]
img_hr0 = jnp.asarray(rng.standard_normal((1, 2 * S, 2 * S, 3)).astype(
    np.float32))
params = jax.jit(lambda k: model.init(k, img, img_hr0, pts0, pts0, calib,
                                      train=True))(
    jax.random.PRNGKey(0))["params"]


def fetch(x):
    return float(jnp.asarray(x).reshape(-1)[0])


# ---- kernel smoke + rate (Mosaic lowering check before the big jit) ----
fw3 = prepare_cols_weights(params["mlp_lr"], params["mlp_hr"], cfg=cfg,
                           dtype=jnp.bfloat16)
NR = 32768
x_lr = jnp.asarray(rng.standard_normal((NR, 256)).astype(np.float32))
x_hr = jnp.asarray(rng.standard_normal((NR, 64)).astype(np.float32))
kf = jnp.asarray(rng.standard_normal((NR,)).astype(np.float32))
zt = jnp.asarray(np.linspace(-0.3, 0.3, 8).astype(np.float32))


@jax.jit
def chain(x_lr):
    def body(c, carry):
        h, x = carry
        hr, lr = fused_dual_mlp_runs(x, x_hr, kf, zt, fw3)
        # full-tensor dependency so nothing is DCE-shrunk
        x = x + 1e-6 * jnp.sum(hr) + 1e-6 * jnp.sum(lr)
        return h + jnp.sum(hr), x
    h, _ = jax.lax.fori_loop(0, 20, body, (0.0, x_lr))
    return h


t0 = time.time()
h = chain(x_lr); fetch(h)
print(f"runs kernel compiled+ran in {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
fetch(chain(x_lr))
dt = (time.time() - t0) / 20
print(f"runs kernel: {dt*1e3:.2f} ms / {NR} windows "
      f"({NR*8/dt/1e6:.1f} Mq/s incl. pad points)", flush=True)

# ---- octree eval: mono vs runs ----
qf = make_fused_query_fn(cfg.loadSize, cfg.z_size, packed=True)
fw = prepare_fused_weights(params["mlp_lr"], params["mlp_hr"],
                           cfg.mlp_dim_lr, cfg.mlp_dim_hr,
                           dtype=jnp.bfloat16,
                           base_split=(cfg.hg_dim,
                                       cfg.mlp_dim_lr[0] - cfg.hg_dim))

Sm = 256
yy, xx = np.mgrid[:Sm, :Sm].astype(np.float32)
disc = ((((xx - Sm / 2) ** 2 + (yy - Sm / 2) ** 2)
         < (0.35 * Sm) ** 2)).astype(np.float32)

for mode, pack in (("mono", True), ("runs", False), ("runs", True)):
    rec = Reconstructor(model, query_fn=qf, octree_mode=mode,
                        feature_dtype=jnp.bfloat16, feature_pack=pack,
                        cols_weights=fw3, load_size=cfg.loadSize,
                        z_size=cfg.z_size)
    _, feats_lr, feat_hr = rec.encode(params, img)
    fetch(feat_hr[0, 0, 0, 0])
    for label, sil in (("unpruned", None),
                       ("mask_prune", jnp.asarray(disc))):
        args = (fw, feats_lr, feat_hr, np.asarray(calib), R,
                np.asarray(cfg.b_min), np.asarray(cfg.b_max))
        kw = dict(num_samples=cfg.num_samples, threshold=0.05,
                  init_resolution=64, silhouette=sil)
        t0 = time.time()
        hr, _, _ = rec.evaluate(*args, **kw)
        fetch(hr[0, 0, 0])
        t1 = time.time() - t0
        best = 1e30
        for _ in range(3):
            t0 = time.time()
            hr, _, _ = rec.evaluate(*args, **kw)
            fetch(hr[0, 0, 0])
            best = min(best, time.time() - t0)
        print(f"{mode:5s} pack={int(pack)} {label:10s}: "
              f"first {t1:.1f}s, steady {best:.3f}s", flush=True)
