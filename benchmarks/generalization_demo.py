import sys, os, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
"""Multi-subject training with held-out generalization (VERDICT r4 #2).

The reference's operative workload is many-subject training with a
val.txt split (lib/data/TrainDataset_LR_v2.py:179-189) and per-epoch
mesh generation on *test* subjects (apps/train_SuRS.py:195-221); every
prior quality number in this repo was a single-subject overfit. This
demo closes that gap with the synthetic subject family
(surs_tpu/utils/synth.humanoid_variant):

  * N_TRAIN distinct humanoid subjects (varied pose/size/radii/detail)
    + 1 held-out subject listed in val.txt,
  * one model trained across all train subjects x 12 views,
  * at each milestone: 512^3 reconstruction + Chamfer/P2S/normal_cos
    for (a) a TRAIN subject at a training view, (b) the TRAIN subject
    at a HELD-OUT view (yaw 15, never rendered for training), and
    (c) the HELD-OUT subject — the generalization number.

Writes BENCH_generalization.json (bench.py surfaces the final val row).
Env: SURS_GEN_ITERS (default 6000), SURS_GEN_SUBJECTS (default 4),
SURS_GEN_STATE (param-cache prefix; '<prefix>_<iters>.npz' per
milestone lets a rerun skip straight to evaluation).
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
from surs_tpu.train.loop import batch_to_device, batch_host_arrays
from surs_tpu.train.pack import pack_arrays, make_packed_step
from surs_tpu.data import TrainDataset, DataLoader
from surs_tpu.data.loader import collate
from surs_tpu.data.sampling import MeshData, sample_points_and_labels
from surs_tpu.data.image import process_render
from surs_tpu.data.calib import calib_from_param, AugParams
from surs_tpu.recon import load_obj
from surs_tpu.recon.mesh_io import save_obj_mesh
from surs_tpu.recon.tetra import marching_tetrahedra
from surs_tpu.render.dataset_gen import render_dataset, render_views
from surs_tpu.utils.synth import humanoid_variant, humanoid_sdf_np
from surs_tpu.utils.metrics import (chamfer_distance, point_to_surface,
                                    projected_normal_error)

ON_TPU = jax.default_backend() != "cpu"
LOAD = 512 if ON_TPU else 64
RES = 512 if ON_TPU else 48
ITERS = int(os.environ.get("SURS_GEN_ITERS", "6000" if ON_TPU else "40"))
N_TRAIN = int(os.environ.get("SURS_GEN_SUBJECTS", "4"))
MILESTONES = sorted({ITERS * k // 4 for k in (1, 2, 3, 4)} - {0}) \
    if ON_TPU else [ITERS]
STATE = os.environ.get("SURS_GEN_STATE", "")
HELD_OUT_YAW = 15          # never in the 30-degree training yaw grid
N_INOUT = 6000 if ON_TPU else 512
SCALE = 1.7                # subject height, for chamfer %-of-scale


def _transient(e: Exception) -> bool:
    """Tunneled-backend RPC flakes (remote_compile body cut, deadline,
    connection reset) — retryable; anything else re-raises."""
    s = str(e)
    return any(m in s for m in ("remote_compile", "read body",
                                "DEADLINE", "UNAVAILABLE",
                                "connection", "Connection"))


def _retry(fn, *args, attempts: int = 4, wait: float = 15.0):
    for k in range(attempts):
        try:
            return fn(*args)
        except jax.errors.JaxRuntimeError as e:  # type: ignore[attr-defined]
            if k == attempts - 1 or not _transient(e):
                raise
            print(f"  transient backend error ({str(e)[:120]}) — "
                  f"retry {k + 1}/{attempts - 1} in {wait:.0f}s",
                  flush=True)
            time.sleep(wait)


# reusable dataset dir (SURS_GEN_DATA): a killed run's render/cache work
# survives; the .complete sentinel gates the build stages
root = os.environ.get("SURS_GEN_DATA") or tempfile.mkdtemp(prefix="gen_")
os.makedirs(root, exist_ok=True)
_built = os.path.exists(os.path.join(root, ".complete"))
obj_dir = os.path.join(root, "GEO", "OBJ")
os.makedirs(obj_dir, exist_ok=True)
subjects = [f"h{i}" for i in range(N_TRAIN + 1)]   # last one held out
variants = {s: humanoid_variant(i) for i, s in enumerate(subjects)}
val_subject = subjects[-1]


def implicit_mesh(path, caps, detail, freqs, R=160, lo=-0.85, hi=1.0):
    g = np.linspace(lo, hi, R, dtype=np.float32)
    P = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    vol = -humanoid_sdf_np(P, caps, detail, freqs).reshape(R, R, R)
    verts, faces = marching_tetrahedra(vol, 0.0)
    verts = lo + verts * (hi - lo) / (R - 1)
    save_obj_mesh(path, verts, faces)


if not _built:
    t0 = time.time()
    for s in subjects:
        caps, detail, freqs = variants[s]
        implicit_mesh(os.path.join(obj_dir, f"{s}_HR.obj"), caps, detail,
                      freqs)
        implicit_mesh(os.path.join(obj_dir, f"{s}_LR.obj"), caps, 0.0,
                      freqs)
    open(os.path.join(root, "val.txt"), "w").write(val_subject + "\n")
    print(f"{len(subjects)} subject meshes built in {time.time()-t0:.1f}s"
          f" (val: {val_subject})", flush=True)

    t0 = time.time()
    render_dataset(obj_dir, root, load_size=LOAD, yaw_step=30, patch=16)
    print(f"dataset rendered ({LOAD}px, 12 views x {len(subjects)}) in "
          f"{time.time()-t0:.1f}s", flush=True)
else:
    print(f"reusing built dataset at {root}", flush=True)

# exact implicit labels (no mesh-containment noise), per subject
cache_dir = os.path.join(root, "SAMPLE_CACHE")
os.makedirs(cache_dir, exist_ok=True)
meshes = {s: (MeshData(*load_obj(os.path.join(obj_dir, f"{s}_HR.obj"))),
              MeshData(*load_obj(os.path.join(obj_dir, f"{s}_LR.obj"))))
          for s in subjects}
t0 = time.time()
for s in [] if _built else subjects:
    caps, detail, freqs = variants[s]
    mesh_hr, mesh_lr = meshes[s]

    def contains_fn(pts, m, caps=caps, detail=detail, freqs=freqs,
                    hr=mesh_hr):
        d = 0.0 if m is not hr else detail
        return humanoid_sdf_np(np.asarray(pts, np.float32), caps, d,
                               freqs) < 0

    n_draws = 12 if s != val_subject else 2
    for d in range(n_draws):
        rngd = np.random.default_rng(9000 + 100 * int(s[1:]) + d)
        out = sample_points_and_labels(mesh_hr, mesh_lr, N_INOUT, 0.025,
                                       np.array([-1.0]*3),
                                       np.array([1.0]*3), rngd,
                                       contains_fn=contains_fn)
        np.savez_compressed(os.path.join(cache_dir, f"{s}_{d:03d}.npz"),
                            **out)
if not _built:
    print(f"sample cache built in {time.time()-t0:.1f}s", flush=True)
    open(os.path.join(root, ".complete"), "w").write("ok\n")

cfg = SuRSConfig(dataroot=root, name="gen", loadSize=LOAD,
                 residual=ON_TPU, num_sample_inout=N_INOUT, sigma=0.025,
                 batch_size=2, num_stack_lr=3 if ON_TPU else 2,
                 learning_rate=4e-4, resolution=RES,
                 num_samples=262144 if ON_TPU else 4096,
                 octree_init_resolution=64 if ON_TPU else 16,
                 feature_dtype="bfloat16" if ON_TPU else "float32",
                 dtype="float32", mask_prune=True,
                 b_min=[-1.0]*3, b_max=[1.0]*3)
model = surs_net_from_config(cfg)
opt = make_optimizer(cfg)
ds_train = TrainDataset(cfg, phase="train",
                        yaw_list=list(range(0, 360, 30)))
ds_val = TrainDataset(cfg, phase="test",
                      yaw_list=list(range(0, 360, 30)))
assert val_subject in ds_val.subjects
assert val_subject not in [os.path.splitext(s)[0]
                           for s in ds_train.subjects]
dl = DataLoader(ds_train, batch_size=2, shuffle=True, num_threads=2,
                seed=0)
print(f"train items: {len(ds_train)} ({len(ds_train.subjects)} subjects "
      f"x 12 views); val subject: {val_subject}", flush=True)

init_b = batch_to_device(collate([ds_train[0], ds_train[1]]))
state = create_train_state(model, opt, jax.random.PRNGKey(0), init_b)
if ON_TPU:
    step = make_packed_step(make_fused_train_step(model, opt, jit=False))
else:
    step = make_packed_step(make_train_step(model, opt, jit=False))


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


# ---- reconstruction + metrics machinery ----
from surs_tpu.ops.fused_mlp import prepare_fused_weights
from surs_tpu.ops.point_query import make_fused_query_fn
from surs_tpu.recon.pipeline import Reconstructor

if ON_TPU:
    qf = make_fused_query_fn(cfg.loadSize, cfg.z_size, packed=True)
    rec = Reconstructor(model, query_fn=qf, octree_mode="mono",
                        feature_dtype=jnp.bfloat16, feature_pack=True)
else:
    rec = Reconstructor(model)


def eval_item_for(subject, yaw):
    """(img_LR [1,S,S,3], mask_LR, calib [1,4,4]) for any subject/yaw,
    rendered + processed exactly like the training pipeline."""
    verts, faces = load_obj(os.path.join(obj_dir, f"{subject}_HR.obj"))
    from PIL import Image
    for _, rgb, m, param in render_views(verts, faces, LOAD, [yaw],
                                         patch=16):
        calib, _ = calib_from_param(param, LOAD, AugParams())
        _, img_lr, _, mask_lr = process_render(
            Image.fromarray(rgb), Image.fromarray(m), LOAD, False,
            AugParams())
        return (img_lr[None], mask_lr, calib[None].astype(np.float32))


def reconstruct_metrics(params, subject, yaw, tag):
    caps, detail, freqs = variants[subject]
    mesh_hr = meshes[subject][0]
    img_lr, mask_lr, calib = eval_item_for(subject, yaw)
    if ON_TPU:
        weights = prepare_fused_weights(
            params["mlp_lr"], params["mlp_hr"], cfg.mlp_dim_lr,
            cfg.mlp_dim_hr, dtype=jnp.bfloat16, base_split=(256, 65))
    else:
        weights = params
    _, feats_lr, feat_hr = rec.encode(params, jnp.asarray(img_lr))
    t0 = time.time()
    sdf_hr, _, mat = rec.evaluate(
        weights, feats_lr, feat_hr, calib, RES,
        np.array([-1.0]*3), np.array([1.0]*3),
        num_samples=cfg.num_samples, threshold=cfg.threshold,
        init_resolution=cfg.octree_init_resolution,
        silhouette=jnp.asarray(mask_lr))
    float(jnp.sum(sdf_hr[:2, :2, :2]))
    t_eval = time.time() - t0
    if ON_TPU:
        from surs_tpu.recon.tetra_device import marching_tetrahedra_device
        verts, faces = marching_tetrahedra_device(sdf_hr, 0.5,
                                                  algorithm="cubes")
    else:
        from surs_tpu.recon.marching import extract_isosurface
        verts, faces = extract_isosurface(np.asarray(sdf_hr), 0.5)
    row = {"tag": tag, "subject": subject, "yaw": yaw,
           "eval_sec": round(t_eval, 3), "faces": int(faces.shape[0])}
    if faces.shape[0] < 10:
        row["empty_mesh"] = True
        return row
    verts = verts @ np.asarray(mat[:3, :3]).T + np.asarray(mat[:3, 3])
    rec_mesh = MeshData(verts.astype(np.float32), faces)
    ch, ab, ba = chamfer_distance(mesh_hr, rec_mesh, n_samples=4000)
    p2s = point_to_surface(np.asarray(rec_mesh.verts[
        np.random.default_rng(0).choice(
            rec_mesh.verts.shape[0], min(4000, rec_mesh.verts.shape[0]),
            replace=False)]), mesh_hr, n_surface=50000)
    gt_nrm = MeshData(mesh_hr.verts, mesh_hr.faces[:, ::-1].copy())
    n_l2, n_cos = projected_normal_error(
        rec_mesh, gt_nrm, calib=np.asarray(calib).reshape(4, 4),
        res=min(RES, 512))
    row.update(chamfer=round(ch, 5),
               chamfer_pct_of_scale=round(100 * ch / SCALE, 3),
               p2s=round(p2s, 5), normal_l2=round(n_l2, 4),
               normal_cos=round(n_cos, 4))
    return row


record = {"source": "benchmarks/generalization_demo.py",
          "backend": jax.default_backend(),
          "n_train_subjects": N_TRAIN, "n_views": 12,
          "val_subject": val_subject, "held_out_yaw": HELD_OUT_YAW,
          "iters": ITERS, "rows": []}
try:
    record["git_commit"] = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
        text=True, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))).stdout.strip()
except Exception:
    pass

out_json = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_generalization.json")


def milestone_eval(params, it):
    for subject, yaw, tag in ((subjects[0], 0, "train_subject"),
                              (subjects[0], HELD_OUT_YAW, "held_out_view"),
                              (val_subject, 0, "held_out_subject")):
        t0 = time.time()
        try:
            row = _retry(lambda: reconstruct_metrics(params, subject,
                                                     yaw, tag))
        except Exception as e:  # one bad row must not kill the run
            row = {"tag": tag, "subject": subject, "yaw": yaw,
                   "error": str(e)[:200]}
        row["iters"] = it
        record["rows"].append(row)
        print(f"  [{it}] {tag} ({subject}@{yaw}): "
              + (f"chamfer {row['chamfer_pct_of_scale']}% "
                 f"normal_cos {row['normal_cos']} p2s {row['p2s']}"
                 if "chamfer" in row else
                 ("ERROR " + row["error"][:80] if "error" in row
                  else "EMPTY MESH"))
              + f" ({time.time()-t0:.0f}s)", flush=True)
    # refresh the record file at every milestone (long runs can be cut)
    val_rows = [r for r in record["rows"]
                if r["tag"] == "held_out_subject" and "chamfer" in r]
    if val_rows:
        record["val_chamfer_pct_of_scale"] = \
            val_rows[-1]["chamfer_pct_of_scale"]
        record["val_normal_cos"] = val_rows[-1]["normal_cos"]
    with open(out_json, "w") as f:
        json.dump(record, f, indent=1)


t_train0 = time.time()
it = 0
done_milestones = []
while it < ITERS:
    for raw in dl:
        target = next((m for m in MILESTONES if m > it), ITERS)
        if STATE and os.path.exists(f"{STATE}_{target}.npz") and \
                target not in done_milestones:
            state = state.replace(params=_load_params(
                state.params, f"{STATE}_{target}.npz"))
            print(f"restored cached params at iter {target}", flush=True)
            it = target
            done_milestones.append(target)
            milestone_eval(state.params, target)
            break
        host = batch_host_arrays(raw, quantize_images=True)
        payload, spec = pack_arrays(host)
        state, m = _retry(lambda: step(state, jnp.asarray(payload),
                                       spec))
        it += 1
        if it % 250 == 0 or it == 1:
            print(f"iter {it}: loss {float(m['total']):.4f} "
                  f"({time.time()-t_train0:.0f}s)", flush=True)
        if it in MILESTONES and it not in done_milestones:
            done_milestones.append(it)
            if STATE:
                _save_params(state.params, f"{STATE}_{it}.npz")
            print(f"milestone {it} ({time.time()-t_train0:.0f}s train)",
                  flush=True)
            milestone_eval(state.params, it)
        if it >= ITERS:
            break

record["train_wall_sec"] = round(time.time() - t_train0, 1)
with open(out_json, "w") as f:
    json.dump(record, f, indent=1)
print(f"wrote {out_json}", flush=True)
