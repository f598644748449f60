import sys, os, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
"""North-star end-to-end demo at the reference operating point.

Builds a NON-SPHERE synthetic subject (an articulated humanoid implicit
with HR surface detail and a smoothed LR variant), renders a full
training layout at loadSize 512 with the JAX rasterizer, trains the
flagship SuRSNet on it (fused Pallas train step), then reconstructs at
512^3 with mask_prune + the packed bf16 query path + device marching
tetrahedra, reporting steady-state sec/mesh and Chamfer distance vs the
ground-truth mesh — the closest provable proxy to reference parity
until a shipped checkpoint/dataset exists (reference operating point:
README.md:38, lib/options.py:55).
"""
import json
import subprocess
import tempfile
import numpy as np, jax, jax.numpy as jnp
from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from surs_tpu.config import SuRSConfig
from surs_tpu.models import surs_net_from_config
from surs_tpu.train import make_optimizer, create_train_state, make_train_step
from surs_tpu.train.fused_step import make_fused_train_step
from surs_tpu.train.loop import batch_to_device
from surs_tpu.data import TrainDataset, DataLoader
from surs_tpu.data.sampling import MeshData, sample_points_and_labels
from surs_tpu.recon import load_obj
from surs_tpu.recon.mesh_io import save_obj_mesh
from surs_tpu.recon.tetra import marching_tetrahedra
from surs_tpu.render.dataset_gen import render_dataset
from surs_tpu.utils.metrics import chamfer_distance

ON_TPU = jax.default_backend() != "cpu"
LOAD = 512 if ON_TPU else 64
RES = 512 if ON_TPU else 48
ITERS_TRAIN = int(os.environ.get("SURS_DEMO_ITERS", "1500" if ON_TPU
                                 else "60"))

root = tempfile.mkdtemp(prefix="subject_")
obj_dir = os.path.join(root, "GEO", "OBJ"); os.makedirs(obj_dir)


# ---- subject: humanoid implicit (capsule union) ----
def capsule(p, a, b, r):
    a = np.asarray(a, np.float32); b = np.asarray(b, np.float32)
    ap = p - a
    ab = b - a
    t = np.clip((ap @ ab) / (ab @ ab), 0.0, 1.0)
    return np.linalg.norm(ap - t[:, None] * ab[None, :], axis=-1) - r


def humanoid_sdf(p, detail=0.0):
    """p [N, 3] (y up, subject in ~[-0.65, 0.85]^3) -> signed distance."""
    d = capsule(p, (0, 0.20, 0), (0, 0.55, 0), 0.17)            # torso
    d = np.minimum(d, capsule(p, (0, 0.60, 0), (0, 0.66, 0), 0.065))
    d = np.minimum(d, capsule(p, (0, 0.74, 0), (0, 0.76, 0), 0.115))
    for s in (-1, 1):                                            # arms
        d = np.minimum(d, capsule(p, (s * 0.17, 0.52, 0),
                                  (s * 0.40, 0.24, 0.05), 0.055))
        d = np.minimum(d, capsule(p, (s * 0.40, 0.24, 0.05),
                                  (s * 0.44, 0.02, 0.12), 0.05))
        d = np.minimum(d, capsule(p, (s * 0.09, 0.16, 0),      # legs
                                  (s * 0.12, -0.32, 0.02), 0.075))
        d = np.minimum(d, capsule(p, (s * 0.12, -0.32, 0.02),
                                  (s * 0.13, -0.62, 0.0), 0.06))
        d = np.minimum(d, capsule(p, (s * 0.13, -0.62, 0.0),   # feet
                                  (s * 0.13, -0.64, 0.12), 0.05))
    if detail > 0:
        d = d - detail * (np.sin(31.0 * p[:, 0]) * np.sin(29.0 * p[:, 1])
                          * np.sin(33.0 * p[:, 2]))
    return d


def implicit_mesh(path, detail, R=160, lo=-0.85, hi=1.0):
    g = np.linspace(lo, hi, R, dtype=np.float32)
    P = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    vol = -humanoid_sdf(P, detail).reshape(R, R, R)   # inside-positive
    verts, faces = marching_tetrahedra(vol, 0.0)
    verts = lo + verts * (hi - lo) / (R - 1)
    save_obj_mesh(path, verts, faces)
    return verts, faces


t0 = time.time()
implicit_mesh(os.path.join(obj_dir, "h0_HR.obj"), detail=0.012)
implicit_mesh(os.path.join(obj_dir, "h0_LR.obj"), detail=0.0)
open(os.path.join(root, "val.txt"), "w").write("")
print(f"subject meshes built in {time.time()-t0:.1f}s", flush=True)

# with cached trained params (SURS_DEMO_STATE) only view 0 is needed
RESTORING = bool(os.environ.get("SURS_DEMO_STATE", "")
                 and os.path.exists(os.environ["SURS_DEMO_STATE"]
                                    + ".npz"))
t0 = time.time()
render_dataset(obj_dir, root, load_size=LOAD,
               yaw_step=360 if RESTORING else 30, patch=16)
print(f"dataset rendered ({LOAD}px, 12 views) in {time.time()-t0:.1f}s",
      flush=True)

# sample cache with EXACT implicit labels (no mesh-containment noise)
cache_dir = os.path.join(root, "SAMPLE_CACHE"); os.makedirs(cache_dir)
mesh_hr = MeshData(*load_obj(os.path.join(obj_dir, "h0_HR.obj")))
mesh_lr = MeshData(*load_obj(os.path.join(obj_dir, "h0_LR.obj")))
N_INOUT = 6000 if ON_TPU else 512


def contains_fn(pts, m):
    detail = 0.012 if m is mesh_hr else 0.0
    return humanoid_sdf(np.asarray(pts, np.float32), detail) < 0


t0 = time.time()
for d in range(16):
    rngd = np.random.default_rng(1000 + d)
    out = sample_points_and_labels(mesh_hr, mesh_lr, N_INOUT, 0.025,
                                   np.array([-1.0]*3), np.array([1.0]*3),
                                   rngd, contains_fn=contains_fn)
    np.savez_compressed(os.path.join(cache_dir, f"h0_{d:03d}.npz"), **out)
print(f"sample cache built in {time.time()-t0:.1f}s", flush=True)

cfg = SuRSConfig(dataroot=root, name="subject", loadSize=LOAD,
                 residual=ON_TPU,
                 num_sample_inout=N_INOUT, sigma=0.025, batch_size=2,
                 num_stack_lr=3 if ON_TPU else 2,
                 learning_rate=4e-4, resolution=RES,
                 num_samples=262144 if ON_TPU else 4096,
                 octree_init_resolution=64 if ON_TPU else 16,
                 feature_dtype="bfloat16" if ON_TPU else "float32",
                 # trunk dtype pinned f32 by default so the cached
                 # trained state and the cross-round quality record stay
                 # comparable; SURS_DTYPE=bfloat16 opts into mixed
                 # precision
                 dtype=os.environ.get("SURS_DTYPE", "float32"),
                 mask_prune=True,
                 b_min=[-1.0]*3, b_max=[1.0]*3)
model = surs_net_from_config(cfg)
opt = make_optimizer(cfg)
ds = TrainDataset(cfg, phase="train",
                  yaw_list=[0] if RESTORING
                  else list(range(0, 360, 30)))
dl = DataLoader(ds, batch_size=2, shuffle=True, num_threads=2, seed=0)
from surs_tpu.data.loader import collate
init_b = batch_to_device(collate([ds[0], ds[0] if RESTORING else ds[1]]))
state = create_train_state(model, opt, jax.random.PRNGKey(0), init_b)
if ON_TPU:
    step = make_fused_train_step(model, opt)
else:
    step = make_train_step(model, opt)
# optional cross-run param cache (SURS_DEMO_STATE=/path/prefix): lets a
# re-run skip the ~30 min training stage and go straight to the timed
# reconstruction sections
STATE_CACHE = os.environ.get("SURS_DEMO_STATE", "")


def _save_params(params, path):
    flat = {"/".join(str(k.key) for k in p): np.asarray(v)
            for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    np.savez_compressed(path, **flat)


def _load_params(template, path):
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    out = [jnp.asarray(data["/".join(str(k.key) for k in p)])
           for p, _ in leaves]
    return jax.tree_util.tree_unflatten(treedef, out)


if STATE_CACHE and os.path.exists(STATE_CACHE + ".npz"):
    state = state.replace(params=_load_params(state.params,
                                              STATE_CACHE + ".npz"))
    first_loss = float("nan")
    m = {"total": float("nan")}
    print(f"restored trained params from {STATE_CACHE}.npz — "
          f"skipping training", flush=True)
else:
    # optional cosine LR decay (SURS_DEMO_LR_FINAL=<final_lr>): the
    # 4000-iter fixed-lr run trades projected-normal cosine for its
    # Chamfer win (BASELINE.md round 4); annealing to ~lr/10 converges
    # a smoother surface. Uses the injected-hyperparameter path
    # (train/optim.set_learning_rate) — no recompiles.
    lr_final = float(os.environ.get("SURS_DEMO_LR_FINAL", "0") or 0)
    from surs_tpu.train.optim import set_learning_rate
    t0 = time.time()
    it = 0
    first_loss = None
    while it < ITERS_TRAIN:
        for raw in dl:
            if lr_final and it % 50 == 0:
                frac = it / max(ITERS_TRAIN - 1, 1)
                lr = lr_final + 0.5 * (cfg.learning_rate - lr_final) * (
                    1.0 + np.cos(np.pi * frac))
                state = state.replace(
                    opt_state=set_learning_rate(state.opt_state, lr))
            b = batch_to_device(raw, quantize_images=True)
            state, m = step(state, b)
            if it == 0 or it % 250 == 0:
                loss = float(m["total"])
                first_loss = loss if first_loss is None else first_loss
                print(f"iter {it}: loss {loss:.4f} "
                      f"({time.time()-t0:.0f}s)", flush=True)
            it += 1
            if it >= ITERS_TRAIN:
                break
    print(f"trained {ITERS_TRAIN} iters in {time.time()-t0:.1f}s; loss "
          f"{first_loss:.3f} -> {float(m['total']):.3f}", flush=True)
    if STATE_CACHE:
        _save_params(state.params, STATE_CACHE + ".npz")
        print(f"saved trained params to {STATE_CACHE}.npz", flush=True)

# ---- 512^3 reconstruction with the production inference path ----
from surs_tpu.ops.fused_mlp import prepare_fused_weights
from surs_tpu.ops.point_query import make_fused_query_fn
from surs_tpu.recon.pipeline import Reconstructor

item = ds.get_item(0)
if ON_TPU:
    fw = prepare_fused_weights(state.params["mlp_lr"],
                               state.params["mlp_hr"],
                               cfg.mlp_dim_lr, cfg.mlp_dim_hr,
                               dtype=jnp.bfloat16, base_split=(256, 65))
    qf = make_fused_query_fn(cfg.loadSize, cfg.z_size, packed=True)
    rec = Reconstructor(model, query_fn=qf, feature_dtype=jnp.bfloat16,
                        feature_pack=True)
    weights = fw
else:
    rec = Reconstructor(model)
    weights = state.params
_, feats_lr, feat_hr = rec.encode(state.params,
                                  jnp.asarray(item["img_LR"][None]))
sil = jnp.asarray(item["mask_LR"])
kw = dict(num_samples=cfg.num_samples, threshold=cfg.threshold,
          init_resolution=cfg.octree_init_resolution)

record = {"source": "benchmarks/subject_demo.py", "resolution": RES,
          "train_iters": ITERS_TRAIN, "backend": jax.default_backend()}
try:
    record["git_commit"] = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
        text=True, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))).stdout.strip()
except Exception:
    pass

# mono is the production evaluator on TPU (config auto -> mono);
# hostloop rows are kept for cross-round continuity. Round 3 reported
# ONLY hostloop here, which overstated the shipping eval cost ~40%
# (VERDICT r3 weak #2 / next #5).
if ON_TPU:
    rec_mono = Reconstructor(model, query_fn=qf, octree_mode="mono",
                             feature_dtype=jnp.bfloat16,
                             feature_pack=True)
else:
    rec_mono = rec
for mode_tag, rec_mode in (("", rec), ("_mono", rec_mono)):
    if rec_mode is rec and mode_tag == "_mono":
        continue
    for use_sil in (False, True):
        stats = {}
        silh = sil if use_sil else None
        t0 = time.time()
        sdf_hr, _, mat = rec_mode.evaluate(
            weights, feats_lr, feat_hr, item["calib"][None], RES,
            item["b_min"], item["b_max"], silhouette=silh,
            stats_out=stats, **kw)
        float(jnp.sum(sdf_hr[:2, :2, :2]))
        t_first = time.time() - t0
        t_eval = 1e30
        for _ in range(2):
            t0 = time.time()
            sdf_hr, _, mat = rec_mode.evaluate(
                weights, feats_lr, feat_hr, item["calib"][None], RES,
                item["b_min"], item["b_max"], silhouette=silh,
                stats_out=stats, **kw)
            float(jnp.sum(sdf_hr[:2, :2, :2]))
            t_eval = min(t_eval, time.time() - t0)
        mode = stats.get("mode", "hostloop")
        print(f"{RES}^3 eval [{mode}] (mask_prune={use_sil}): first "
              f"{t_first:.1f}s, steady {t_eval:.2f}s, queries "
              f"{stats.get('queries', 0)}", flush=True)
        tag = mode_tag + ("_mask_prune" if use_sil else "")
        record[f"eval_sec{tag}"] = round(t_eval, 3)
        if stats.get("queries"):
            record[f"queries{tag}"] = int(stats.get("queries", 0))

# ---- the headline: ONE measured gen_mesh wall call (mono octree +
# packed bf16 + device cubes + native OBJ, extract/write overlap live)
rec_m = rec_mono   # mono programs already warm from the eval rows
gen_cfg = cfg
data_gm = {"img_LR": np.asarray(item["img_LR"][None]),
           "mask_LR": np.asarray(item["mask_LR"]),
           "calib": np.asarray(item["calib"]),
           "b_min": np.asarray(item["b_min"]),
           "b_max": np.asarray(item["b_max"])}
with tempfile.TemporaryDirectory() as td:
    p = os.path.join(td, "subject.obj")
    rec_m.gen_mesh(gen_cfg, state.params, weights, data_gm, p)   # warm
    t_gm = 1e30
    for _ in range(2):
        t0 = time.time()
        rec_m.gen_mesh(gen_cfg, state.params, weights, data_gm, p)
        t_gm = min(t_gm, time.time() - t0)
print(f"gen_mesh single wall call: {t_gm:.2f}s (mask_prune, "
      f"{'mono octree + device MC' if ON_TPU else 'host paths'})",
      flush=True)
record["gen_mesh_wall_sec"] = round(t_gm, 3)
record["subjects_per_min"] = round(60.0 / t_gm, 2)

# single-chip sequential serving capacity at 256^3 (VERDICT r2 #10)
if ON_TPU:
    import dataclasses as _dc
    cfg256 = _dc.replace(cfg, resolution=256, octree_init_resolution=64)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "s256.obj")
        rec_m.gen_mesh(cfg256, state.params, weights, data_gm, p)  # warm
        t256 = 1e30
        for _ in range(2):
            t0 = time.time()
            rec_m.gen_mesh(cfg256, state.params, weights, data_gm, p)
            t256 = min(t256, time.time() - t0)
    print(f"gen_mesh 256^3 single wall call: {t256:.2f}s "
          f"({60.0/t256:.1f} subjects/min)", flush=True)
    record["gen_mesh_wall_sec_256"] = round(t256, 3)
    record["subjects_per_min_256"] = round(60.0 / t256, 2)

# extract the HR mesh for the quality metrics (cubes — the gen_mesh
# production tessellation). Stage timing lives in gen_mesh_wall_sec
# above; this is NOT re-composed into a sec/mesh figure.
if ON_TPU:
    from surs_tpu.recon.tetra_device import marching_tetrahedra_device
    t0 = time.time()
    verts, faces = marching_tetrahedra_device(sdf_hr, 0.5,
                                              algorithm="cubes")
    t_mc = time.time() - t0
else:
    from surs_tpu.recon.marching import extract_isosurface
    t0 = time.time()
    verts, faces = extract_isosurface(np.asarray(sdf_hr), 0.5)
    t_mc = time.time() - t0
verts = verts @ np.asarray(mat[:3, :3]).T + np.asarray(mat[:3, 3])
out_path = os.path.join(root, "recon_HR.obj")
save_obj_mesh(out_path, verts.astype(np.float32), faces)
print(f"HR mesh for metrics: {faces.shape[0]} faces (cubes, first-call "
      f"extract {t_mc:.2f}s)", flush=True)

if verts.shape[0] > 10:
    from surs_tpu.utils.metrics import (point_to_surface,
                                        projected_normal_error)
    rec_mesh = MeshData(verts.astype(np.float32), faces)
    ch, ab, ba = chamfer_distance(mesh_hr, rec_mesh, n_samples=4000)
    p2s = point_to_surface(np.asarray(rec_mesh.verts[
        np.random.default_rng(0).choice(
            rec_mesh.verts.shape[0], min(4000, rec_mesh.verts.shape[0]),
            replace=False)]), mesh_hr, n_surface=50000)
    # orientation: save_obj_mesh mirrors the reference's reversed
    # 'f v0 v2 v1' winding (recon/mesh_io.py), so the OBJ-roundtripped
    # GT mesh comes back inward-oriented while the in-memory
    # reconstruction is outward — flip GT so the normal metric compares
    # like with like (the paper protocol reads both sides from OBJ,
    # where the flips cancel)
    gt_nrm = MeshData(mesh_hr.verts, mesh_hr.faces[:, ::-1].copy())
    n_l2, n_cos = projected_normal_error(
        rec_mesh, gt_nrm,
        calib=np.asarray(item["calib"]).reshape(4, 4),
        res=min(RES, 512))
    print(f"chamfer vs GT humanoid: {ch:.4f} (gt->rec {ab:.4f}, "
          f"rec->gt {ba:.4f}; subject scale ~1.7 => "
          f"{100*ch/1.7:.2f}% of scale)", flush=True)
    print(f"P2S (rec verts -> GT surface): {p2s:.4f}; normal error "
          f"L2 {n_l2:.4f}, cos {n_cos:.4f}", flush=True)
    record.update(chamfer=round(ch, 5), chamfer_gt_to_rec=round(ab, 5),
                  chamfer_rec_to_gt=round(ba, 5),
                  chamfer_pct_of_scale=round(100 * ch / 1.7, 3),
                  p2s=round(p2s, 5), normal_l2=round(n_l2, 4),
                  normal_cos=round(n_cos, 4), faces=int(faces.shape[0]))
else:
    print("EMPTY MESH — training did not converge", flush=True)
    record["empty_mesh"] = True

out_json = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_subject.json")
with open(out_json, "w") as f:
    json.dump(record, f, indent=1)
print(f"wrote {out_json}", flush=True)
