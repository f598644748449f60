import sys, os, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
import numpy as np, jax, jax.numpy as jnp
from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from surs_tpu.config import SuRSConfig
from surs_tpu.models import surs_net_from_config
from surs_tpu.train import make_optimizer, create_train_state, make_train_step

DTYPE = sys.argv[1] if len(sys.argv) > 1 else "auto"  # auto|float32|bfloat16
cfg = SuRSConfig(loadSize=512, residual=True, num_sample_inout=6000,
                 batch_size=2, learning_rate=1e-3, dtype=DTYPE)
model = surs_net_from_config(cfg)
print("trunk dtype:", model.dtype, flush=True)
opt = make_optimizer(cfg)
rng = np.random.default_rng(0)
B, N, S = cfg.batch_size, cfg.num_sample_inout, cfg.loadSize // 2
batch = {
    "images_lr": jnp.asarray(rng.standard_normal((B, S, S, 3)).astype(np.float32)),
    "images_hr": jnp.asarray(rng.standard_normal((B, 2*S, 2*S, 3)).astype(np.float32)),
    "points_lr": jnp.asarray((rng.random((B, 3, N)) - 0.5).astype(np.float32)),
    "points_hr": jnp.asarray((rng.random((B, 3, N)) - 0.5).astype(np.float32)),
    "calibs": jnp.asarray(np.tile(np.diag([2.,-2.,2.,1.]).astype(np.float32), (B,1,1))),
    "labels_lr": jnp.asarray(rng.integers(0,2,(B,N,1)).astype(np.float32)),
    "labels_hr": jnp.asarray(rng.integers(0,2,(B,N,1)).astype(np.float32)),
}
t0=time.time()
state = create_train_state(model, opt, jax.random.PRNGKey(0), batch)
print("init:", round(time.time()-t0,1), "s", flush=True)
step = make_train_step(model, opt)
t0=time.time()
state, m = step(state, batch)
jax.block_until_ready(m["total"])
print("step compile+run:", round(time.time()-t0,1), "s", flush=True)
t0=time.time()
K=10
for _ in range(K):
    state, m = step(state, batch)
loss = float(m["total"])          # host fetch = the only reliable sync
dt=(time.time()-t0)/K
print(f"train step (loop, evolving state): {dt*1000:.0f} ms  "
      f"({1/dt:.2f} it/s, batch {B}, {N} pts, loadSize {cfg.loadSize}); "
      f"loss={loss:.4f}", flush=True)

# scan-chained steady state: 8 data-dependent steps inside ONE program,
# ending in a loss fetch — immune to per-dispatch enqueue latency
step_nojit = make_train_step(model, opt, donate=False, jit=False)

@jax.jit
def chain(state, batch):
    def body(s, _):
        s, m = step_nojit(s, batch)
        return s, m["total"]
    return jax.lax.scan(body, state, None, length=8)

state, losses = chain(state, batch)
float(losses[-1])                         # compile + warm
t0=time.time()
state, losses = chain(state, batch)
l=float(losses[-1])
dt=(time.time()-t0)/8
print(f"train step (8-step scan chain): {dt*1000:.1f} ms/step; "
      f"loss={l:.4f}", flush=True)
