import sys, os, time, gzip, json, collections, glob
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
"""xprof anatomy of the device isosurface extractor at 512^3.

Which ops inside _march_core carry the ~0.8-1.0 s device compute
observed on trained-subject fields (genmesh_profile.py)? Runs the
humanoid benchmark volume, traces one extraction per algorithm, and
aggregates op durations from the xprof trace.
"""
import numpy as np, jax, jax.numpy as jnp
from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from surs_tpu.utils.synth import humanoid_volume
from surs_tpu.recon.tetra_device import marching_tetrahedra_device

R = int(os.environ.get("MC_PROF_RES", "512"))
ALGO = os.environ.get("MC_PROF_ALGO", "cubes")
vol = humanoid_volume(R)
float(vol[0, 0, 0])

# warm (compile + bucket speculation)
verts, faces = marching_tetrahedra_device(vol, 0.5, algorithm=ALGO)
print(f"{ALGO}@{R}: {faces.shape[0]} faces {verts.shape[0]} verts",
      flush=True)
t0 = time.time()
marching_tetrahedra_device(vol, 0.5, algorithm=ALGO)
print(f"steady total {time.time()-t0:.2f}s", flush=True)

os.makedirs("/tmp/xprof_mc", exist_ok=True)
with jax.profiler.trace("/tmp/xprof_mc"):
    marching_tetrahedra_device(vol, 0.5, algorithm=ALGO)
path = sorted(glob.glob(
    "/tmp/xprof_mc/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(path) as f:
    trace = json.load(f)
durs = collections.Counter()
for e in trace.get("traceEvents", []):
    if e.get("ph") == "X" and not e.get("name", "").startswith("$"):
        durs[e.get("name", "?")[:70]] += e.get("dur", 0)
for name, d in durs.most_common(28):
    print(f"{d/1000:8.2f} ms  {name}", flush=True)
