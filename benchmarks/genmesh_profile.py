import sys, os, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
"""Stage anatomy of ONE trained-subject gen_mesh call at 512^3.

Where do the ~3.7 s of the round-3 single-call wall figure go?
Re-runs the subject_demo reconstruction with per-stage fetch-synced
timings (encode / silhouette masks / mono-octree eval / device MC
compute / wire transfer+decode / OBJ write, per field), then one full
`gen_mesh` wall call to tie the stages back to the measured total.

Requires the trained-params cache produced by subject_demo
(SURS_DEMO_STATE, default /tmp/surs_demo_state.npz); rebuilds the
subject + renders one view (no training, no sample cache).
"""
import tempfile
import numpy as np, jax, jax.numpy as jnp
from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from surs_tpu.config import SuRSConfig
from surs_tpu.models import surs_net_from_config
from surs_tpu.data import TrainDataset
from surs_tpu.recon.mesh_io import save_obj_mesh
from surs_tpu.recon.tetra import marching_tetrahedra
from surs_tpu.render.dataset_gen import render_dataset
from surs_tpu.utils.synth import humanoid_sdf_jnp

ON_TPU = jax.default_backend() != "cpu"
LOAD = 512 if ON_TPU else 64
RES = int(os.environ.get("SURS_PROF_RES", "512" if ON_TPU else "48"))
STATE = os.environ.get("SURS_DEMO_STATE", "/tmp/surs_demo_state.npz")
if not STATE.endswith(".npz"):
    STATE += ".npz"
if not os.path.exists(STATE):
    sys.exit(f"no trained-params cache at {STATE} — run subject_demo "
             f"with SURS_DEMO_STATE first")

root = tempfile.mkdtemp(prefix="gmprof_")
obj_dir = os.path.join(root, "GEO", "OBJ"); os.makedirs(obj_dir)


def implicit_mesh(path, detail, R=160, lo=-0.85, hi=1.0):
    g = np.linspace(lo, hi, R, dtype=np.float32)
    P = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    d = np.asarray(humanoid_sdf_jnp(
        jnp.asarray(P[:, 0]), jnp.asarray(P[:, 1]), jnp.asarray(P[:, 2]),
        detail=detail))
    verts, faces = marching_tetrahedra(-d.reshape(R, R, R), 0.0)
    verts = lo + verts * (hi - lo) / (R - 1)
    save_obj_mesh(path, verts, faces)


t0 = time.time()
implicit_mesh(os.path.join(obj_dir, "h0_HR.obj"), detail=0.012)
implicit_mesh(os.path.join(obj_dir, "h0_LR.obj"), detail=0.0)
open(os.path.join(root, "val.txt"), "w").write("")
render_dataset(obj_dir, root, load_size=LOAD, yaw_step=360, patch=16)
print(f"subject + 1 view rendered in {time.time()-t0:.1f}s", flush=True)

cfg = SuRSConfig(dataroot=root, name="gmprof", loadSize=LOAD,
                 residual=ON_TPU, num_sample_inout=0, batch_size=2,
                 num_stack_lr=3 if ON_TPU else 2, resolution=RES,
                 num_samples=262144 if ON_TPU else 4096,
                 octree_init_resolution=64 if ON_TPU else 16,
                 feature_dtype="bfloat16" if ON_TPU else "float32",
                 # trunk dtype pinned f32 by default: the cached demo
                 # state was trained with f32 trunks and cross-round
                 # stage timings must isolate extractor changes
                 dtype=os.environ.get("SURS_DTYPE", "float32"),
                 mask_prune=True, b_min=[-1.0]*3, b_max=[1.0]*3)
model = surs_net_from_config(cfg)
ds = TrainDataset(cfg, phase="train", yaw_list=[0])
item = ds.get_item(0)

# trained params from the subject_demo cache
data = np.load(STATE)
init = jax.jit(lambda k, img, img_hr, pts, calib: model.init(
    k, img, img_hr, pts, pts, calib, train=True))
rngn = np.random.default_rng(0)
S = LOAD // 2
params0 = init(jax.random.PRNGKey(0),
               jnp.asarray(rngn.standard_normal((1, S, S, 3)),
                           jnp.float32),
               jnp.asarray(rngn.standard_normal((1, LOAD, LOAD, 3)),
                           jnp.float32),
               jnp.asarray(rngn.random((1, 3, 8)), jnp.float32),
               jnp.asarray(np.eye(4, dtype=np.float32)[None]))["params"]
leaves, treedef = jax.tree_util.tree_flatten_with_path(params0)
params = jax.tree_util.tree_unflatten(
    treedef, [jnp.asarray(data["/".join(str(k.key) for k in p)])
              for p, _ in leaves])
print("trained params restored", flush=True)

from surs_tpu.ops.fused_mlp import prepare_fused_weights
from surs_tpu.ops.point_query import make_fused_query_fn
from surs_tpu.recon.pipeline import Reconstructor
from surs_tpu.recon.evaluator import silhouette_init_masks

if ON_TPU:
    fw = prepare_fused_weights(params["mlp_lr"], params["mlp_hr"],
                               cfg.mlp_dim_lr, cfg.mlp_dim_hr,
                               dtype=jnp.bfloat16, base_split=(256, 65))
    qf = make_fused_query_fn(cfg.loadSize, cfg.z_size, packed=True)
    rec = Reconstructor(model, query_fn=qf, octree_mode="mono",
                        feature_dtype=jnp.bfloat16, feature_pack=True)
    weights = fw
else:
    rec = Reconstructor(model)
    weights = params

img = jnp.asarray(item["img_LR"][None])
sil = jnp.asarray(item["mask_LR"])
calib = np.asarray(item["calib"])[None]
kw = dict(num_samples=cfg.num_samples, threshold=cfg.threshold,
          init_resolution=cfg.octree_init_resolution, silhouette=sil)


def timed(label, fn, reps=2):
    fn()                       # warm/compile
    best = 1e30
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    print(f"  {label:<42s} {best*1e3:8.1f} ms", flush=True)
    return out, best


print(f"--- stage anatomy at {RES}^3 (fetch-synced, min of 2) ---",
      flush=True)

enc_out = {}
def run_enc():
    _, feats_lr, feat_hr = rec.encode(params, img)
    float(jnp.sum(feat_hr[0, :2, :2, 0]))
    enc_out["f"] = (feats_lr, feat_hr)
    return feats_lr, feat_hr
(_, t_enc) = timed("encode (LR stacks + SR)", run_enc)
feats_lr, feat_hr = enc_out["f"]

from surs_tpu.recon.grid import grid_matrix
mat = grid_matrix((RES,) * 3, np.asarray(item["b_min"]),
                  np.asarray(item["b_max"]))


def run_sil():
    masks = silhouette_init_masks(sil, calib, RES, mat,
                                  init_resolution=cfg.octree_init_resolution,
                                  cache=rec._cache)
    float(jnp.sum(masks["lat"][1][:8].astype(jnp.float32)))
    return masks
(_, t_sil) = timed("silhouette init masks (all levels)", run_sil)

ev_out = {}
def run_eval():
    sdf_hr, sdf_lr, m = rec.evaluate(
        weights, feats_lr, feat_hr, calib, RES,
        np.asarray(item["b_min"]), np.asarray(item["b_max"]), **kw)
    float(jnp.sum(sdf_hr[:2, :2, :2]))
    ev_out["v"] = (sdf_hr, sdf_lr, m)
    return None
(_, t_eval) = timed("octree eval (mono, mask_prune)", run_eval)
sdf_hr, sdf_lr, mat = ev_out["v"]

if ON_TPU:
    from surs_tpu.recon.tetra_device import (
        marching_tetrahedra_device_begin)
    meshes = {}
    for name, vol in (("HR", sdf_hr), ("LR", sdf_lr)):
        fin_holder = {}
        def run_dev(vol=vol, h=fin_holder):
            t0 = time.time()
            # distinct per-mesh bucket tags, as in extract_pair — a
            # shared speculative bucket entry would recount+rerun the
            # larger mesh every call and skew the profiled stage
            h["fin"] = marching_tetrahedra_device_begin(
                vol, 0.5, algorithm="cubes", bucket_tag=name.lower())
            return time.time() - t0
        (_, t_dev) = timed(f"{name} device MC compute (begin+counts)",
                           run_dev)
        def run_fin(h=fin_holder):
            return h["fin"]()
        ((verts, faces), t_fin) = timed(
            f"{name} wire transfer + host decode (finish)", run_fin)
        print(f"    {name}: {faces.shape[0]} faces, "
              f"{verts.shape[0]} verts", flush=True)
        verts = verts @ np.asarray(mat[:3, :3]).T + np.asarray(mat[:3, 3])
        meshes[name] = (verts.astype(np.float32), faces)
    for name, (verts, faces) in meshes.items():
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "m.obj")
            (_, t_obj) = timed(f"{name} OBJ write ({faces.shape[0]} f)",
                               lambda: save_obj_mesh(p, verts, faces))

# full wall call to tie out
data_gm = {"img_LR": np.asarray(img), "mask_LR": np.asarray(sil),
           "calib": np.asarray(item["calib"]),
           "b_min": np.asarray(item["b_min"]),
           "b_max": np.asarray(item["b_max"])}
with tempfile.TemporaryDirectory() as td:
    p = os.path.join(td, "subject.obj")
    def run_gm():
        rec.gen_mesh(cfg, params, weights, data_gm, p)
        return None
    (_, t_gm) = timed("FULL gen_mesh wall (overlap live)", run_gm)
print(f"stage sum (no overlap): "
      f"{(t_enc + t_sil + t_eval)*1e3:.0f} ms + extract/write stages",
      flush=True)
