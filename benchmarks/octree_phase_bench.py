import sys, os, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
"""Octree-evaluator phase anatomy: bookkeeping vs queries.

Runs the mono octree at 512^3 with a NEAR-FREE implicit eval_fn (the
capsule humanoid, ~100 VPU flops/point vs ~350k MACs for the real MLP)
so the measured time is almost pure octree MACHINERY (dirty stencils,
hierarchical compaction, chunked scatter writes, prune/expand).
Each (level eval, prune+expand) pair is also jitted and timed
separately, fetch-synced, to locate the cost per level.
"""
import numpy as np, jax, jax.numpy as jnp
from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from surs_tpu.utils.synth import humanoid_sdf_jnp
import surs_tpu.recon.evaluator as ev

R = int(os.environ.get("OCT_PHASE_RES", "512"))
CHUNK = int(os.environ.get("OCT_PHASE_CHUNK", str(262144)))
INIT = 64
THRESH = 0.05

mat = np.diag([2.0 / (R - 1)] * 3 + [1.0]).astype(np.float32)
mat[:3, 3] = -1.0


def eval_fn(points, ctx):
    px, py, pz = points[0], points[1], points[2]
    d = humanoid_sdf_jnp(px, py, pz, detail=0.012)
    occ = jnp.clip(0.5 - 40.0 * d, 0.0, 1.0)   # steep occupancy ramp
    return occ, occ


def fetch(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def timed(label, fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    fetch(out[0] if isinstance(out, tuple) else out)
    best = 1e30
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        fetch(out[0] if isinstance(out, tuple) else out)
        best = min(best, time.time() - t0)
    print(f"  {label:<44s} {best*1e3:8.1f} ms", flush=True)
    return out

schedule = ev._level_schedule(R, INIT)
print(f"--- octree machinery anatomy at {R}^3 (near-free eval_fn), "
      f"schedule {schedule} ---", flush=True)

state = ev._octree_state(R, INIT)
for i, reso in enumerate(schedule):
    L = R // reso

    def level(state, reso=reso):
        vh, vl = ev._level_step(eval_fn, R, reso, CHUNK, mat, *state,
                                None, None)
        return (vh, vl) + state[2:]

    state = tuple(timed(f"level L={L} eval (stencil+compact+chunks)",
                        jax.jit(level), state))
    if reso <= 1:
        break

    def prune(state, reso=reso):
        return ev._prune_upsample(R, reso, THRESH, *state, None, None)

    state = tuple(timed(f"prune+expand L={L} -> {2 * L}",
                        jax.jit(prune), state))

n_ev = int(jax.device_get(jnp.sum(state[2][:R**3].astype(jnp.int32))))
print(f"  evaluated points total: {n_ev}", flush=True)

# fused reference: the whole schedule as one program
cache = {}
t0 = time.time()
vh, vl = ev.eval_grid_octree_mono(eval_fn, R, mat, THRESH, INIT, CHUNK,
                                  ctx=None, cache=cache)
fetch(vh[0, 0, 0])
print(f"  mono end-to-end first {time.time()-t0:.1f}s", flush=True)
best = 1e30
for _ in range(3):
    t0 = time.time()
    vh, vl = ev.eval_grid_octree_mono(eval_fn, R, mat, THRESH, INIT,
                                      CHUNK, ctx=None, cache=cache)
    fetch(vh[0, 0, 0])
    best = min(best, time.time() - t0)
print(f"  mono end-to-end steady {best*1e3:8.1f} ms", flush=True)
