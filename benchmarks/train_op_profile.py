import sys, os, time, gzip, json, collections, glob
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
"""Per-op xprof anatomy of one train step (VERDICT r4 next #4).

The steady-state train step reads ~113 ms at batch 2 / 6000 points —
1.2% MFU. Is that per-op dispatch latency across ~1000 fused ops, a
lane-starved conv trunk (the 32-channel SR convs), or something else?
Traces N steps of the production XLA train step at the reference
config, aggregates device op durations from the xprof trace, and
reports (a) the top ops by total self time, (b) a category rollup
(conv / dot / fusion / copy / other) with op counts and mean
duration, (c) the implied per-op overhead if the mean fused-op cost
is latency-dominated.

Env: TRAIN_PROF_B (2), TRAIN_PROF_N (6000), TRAIN_PROF_STEPS (3),
TRAIN_PROF_KIND (xla|fused|remat).
"""
import numpy as np, jax, jax.numpy as jnp
from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from surs_tpu.config import SuRSConfig
from surs_tpu.models import surs_net_from_config
from surs_tpu.train import (make_optimizer, create_train_state,
                            make_train_step)

B = int(os.environ.get("TRAIN_PROF_B", "2"))
N = int(os.environ.get("TRAIN_PROF_N", "6000"))
STEPS = int(os.environ.get("TRAIN_PROF_STEPS", "3"))
KIND = os.environ.get("TRAIN_PROF_KIND", "xla")

cfg = SuRSConfig(loadSize=512, residual=True,
                 remat=(KIND == "remat"),
                 dtype="float32")
S = cfg.loadSize // 2
rng = np.random.default_rng(1)
batch = {
    "images_lr": jnp.asarray(rng.standard_normal(
        (B, S, S, 3)).astype(np.float32)),
    "images_hr": jnp.asarray(rng.standard_normal(
        (B, 2 * S, 2 * S, 3)).astype(np.float32)),
    "points_lr": jnp.asarray((rng.random((B, 3, N)) - 0.5)
                             .astype(np.float32)),
    "points_hr": jnp.asarray((rng.random((B, 3, N)) - 0.5)
                             .astype(np.float32)),
    "calibs": jnp.asarray(np.tile(np.diag(
        [2.0, -2.0, 2.0, 1.0]).astype(np.float32)[None], (B, 1, 1))),
    "labels_lr": jnp.asarray(
        rng.integers(0, 2, (B, N, 1)).astype(np.float32)),
    "labels_hr": jnp.asarray(
        rng.integers(0, 2, (B, N, 1)).astype(np.float32)),
}
model = surs_net_from_config(cfg)
opt = make_optimizer(cfg)
state = create_train_state(model, opt, jax.random.PRNGKey(0), batch)
if KIND == "fused":
    from surs_tpu.train.fused_step import make_fused_train_step
    step = make_fused_train_step(model, opt)
else:
    step = make_train_step(model, opt)

# warm/compile
state, m = step(state, batch)
print(f"compiled; loss {float(m['total']):.4f}", flush=True)
t0 = time.time()
for _ in range(4):
    state, m = step(state, batch)
float(m["total"])
print(f"steady ~{(time.time()-t0)/4*1e3:.1f} ms/step (4-step wall, "
      f"enqueue-bound upper bound)", flush=True)

os.makedirs("/tmp/xprof_train", exist_ok=True)
with jax.profiler.trace("/tmp/xprof_train"):
    for _ in range(STEPS):
        state, m = step(state, batch)
    float(m["total"])

path = sorted(glob.glob(
    "/tmp/xprof_train/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(path) as f:
    trace = json.load(f)

# device-lane events only: pid names containing 'TPU'/'Device' lanes
pids_dev = set()
for e in trace.get("traceEvents", []):
    if e.get("ph") == "M" and e.get("name") == "process_name":
        nm = e.get("args", {}).get("name", "")
        if "TPU" in nm or "Device" in nm or "/device" in nm.lower():
            pids_dev.add(e.get("pid"))

durs = collections.Counter()
counts = collections.Counter()
for e in trace.get("traceEvents", []):
    if e.get("ph") != "X" or e.get("name", "").startswith("$"):
        continue
    if pids_dev and e.get("pid") not in pids_dev:
        continue
    name = e.get("name", "?")
    durs[name[:78]] += e.get("dur", 0)
    counts[name[:78]] += 1

total_us = sum(durs.values())
print(f"\n--- top 25 device ops over {STEPS} steps "
      f"(total {total_us/1000/STEPS:.1f} ms/step) ---", flush=True)
for name, d in durs.most_common(25):
    print(f"{d/1000/STEPS:8.3f} ms/step  x{counts[name]//STEPS:<4d} "
          f"{name}", flush=True)


def cat(name: str) -> str:
    n = name.lower()
    if "conv" in n:
        return "conv"
    if "dot" in n or "matmul" in n or "einsum" in n:
        return "dot"
    if n.startswith("fusion") or ".fusion" in n:
        return "fusion"
    if "copy" in n or "transpose" in n or "reshape" in n:
        return "copy/layout"
    if "all-reduce" in n or "collective" in n:
        return "collective"
    return "other"


cats_d = collections.Counter()
cats_c = collections.Counter()
for name, d in durs.items():
    cats_d[cat(name)] += d
    cats_c[cat(name)] += counts[name]
print(f"\n--- category rollup (per step) ---", flush=True)
for c, d in cats_d.most_common():
    nc = cats_c[c] // STEPS
    print(f"{d/1000/STEPS:8.2f} ms  x{nc:<5d} avg {d/max(cats_c[c],1):6.1f} us  {c}",
          flush=True)
print(f"\nops/step total: {sum(counts.values())//STEPS}; device-lane "
      f"busy {total_us/1000/STEPS:.1f} ms/step", flush=True)
