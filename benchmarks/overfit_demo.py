import sys, os, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
"""End-to-end learning sanity on real hardware: render a synthetic
subject with the JAX rasterizer, train SuRSNet to overfit it, and verify
the reconstructed mesh converges to the ground-truth shape (Chamfer)."""
import tempfile
import numpy as np, jax, jax.numpy as jnp
from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from surs_tpu.config import SuRSConfig
from surs_tpu.models import surs_net_from_config
from surs_tpu.train import make_optimizer, create_train_state, make_train_step
from surs_tpu.train.loop import batch_to_device
from surs_tpu.data import TrainDataset, DataLoader
from surs_tpu.data.sampling import MeshData
from surs_tpu.recon import gen_mesh, load_obj
from surs_tpu.recon.mesh_io import save_obj_mesh
from surs_tpu.recon.tetra import marching_tetrahedra
from surs_tpu.render.dataset_gen import render_dataset
from surs_tpu.utils.metrics import chamfer_distance

root = tempfile.mkdtemp(prefix="overfit_")
obj_dir = os.path.join(root, "GEO", "OBJ"); os.makedirs(obj_dir)

def make_sphere(path, radius_vox, R=24, scale=1.0/12):
    g = np.mgrid[:R,:R,:R].astype(np.float64) - (R-1)/2
    vol = (radius_vox - np.sqrt((g**2).sum(0))).astype(np.float32)
    verts, faces = marching_tetrahedra(vol, 0.0)
    verts = (verts - (R-1)/2) * scale
    save_obj_mesh(path, verts, faces)

make_sphere(os.path.join(obj_dir, "s0_HR.obj"), 9.0)
make_sphere(os.path.join(obj_dir, "s0_LR.obj"), 7.5)
open(os.path.join(root, "val.txt"), "w").write("")
render_dataset(obj_dir, root, load_size=64, yaw_step=45, patch=32)
print("dataset rendered", flush=True)

# precompute sample draws (the offline cache path) so training is not
# bound by per-item containment sampling
from surs_tpu.data.sampling import sample_points_and_labels
cache_dir = os.path.join(root, "SAMPLE_CACHE"); os.makedirs(cache_dir)
mesh_hr = MeshData(*load_obj(os.path.join(obj_dir, "s0_HR.obj")))
mesh_lr = MeshData(*load_obj(os.path.join(obj_dir, "s0_LR.obj")))
for d in range(24):
    rngd = np.random.default_rng(1000 + d)
    out = sample_points_and_labels(mesh_hr, mesh_lr, 512, 0.03,
                                   np.array([-1.0]*3), np.array([1.0]*3), rngd)
    np.savez_compressed(os.path.join(cache_dir, f"s0_{d:03d}.npz"), **out)
print("sample cache built", flush=True)

cfg = SuRSConfig(dataroot=root, name="overfit", loadSize=64,
                 num_sample_inout=512, sigma=0.03, batch_size=2,
                 num_stack_lr=2, learning_rate=4e-4, resolution=48,
                 num_samples=4096, octree_init_resolution=16,
                 b_min=[-1.0]*3, b_max=[1.0]*3)
model = surs_net_from_config(cfg)
opt = make_optimizer(cfg)
ds = TrainDataset(cfg, phase="train", yaw_list=list(range(0, 360, 45)))
dl = DataLoader(ds, batch_size=2, shuffle=True, num_threads=2, seed=0)
from surs_tpu.data.loader import collate
init_b = batch_to_device(collate([ds[0], ds[1]]))
state = create_train_state(model, opt, jax.random.PRNGKey(0), init_b)
step = make_train_step(model, opt)
t0 = time.time()
losses = []
it = 0
TARGET = 2500
while it < TARGET:
    for raw in dl:
        b = batch_to_device(raw, quantize_images=True)
        state, m = step(state, b)
        if it % 50 == 0:
            losses.append(float(m["total"]))
            if it % 250 == 0:
                print(f"iter {it}: loss {losses[-1]:.4f}", flush=True)
        it += 1
        if it >= TARGET:
            break
print(f"trained {TARGET} iters in {time.time()-t0:.1f}s; loss {losses[0]:.3f} -> {float(m['total']):.3f}", flush=True)

# reconstruct with the item's own camera calibration (the demo trains in
# the renderer's world frame, not the eval datasets' uv-normalized frame)
from surs_tpu.recon.pipeline import Reconstructor
item = ds.get_item(0)
rec = Reconstructor(model)
_, feats_lr, feat_hr = rec.encode(state.params,
                                  jnp.asarray(item["img_LR"][None]))
verts, faces, _, _ = rec.reconstruct(
    state.params, feats_lr, feat_hr, item["calib"][None], cfg.resolution,
    item["b_min"], item["b_max"], num_samples=cfg.num_samples,
    threshold=cfg.threshold, init_resolution=cfg.octree_init_resolution)
out_path = os.path.join(root, "recon_HR.obj")
save_obj_mesh(out_path, verts, faces)
print("recon mesh:", verts.shape, faces.shape, flush=True)
gt = MeshData(*load_obj(os.path.join(obj_dir, "s0_HR.obj")))
if verts.shape[0] > 10:
    rec_mesh = MeshData(verts, faces)
    ch, ab, ba = chamfer_distance(gt, rec_mesh, n_samples=4000)
    print(f"chamfer vs GT sphere (r=0.75): {ch:.4f} (gt->rec {ab:.4f}, rec->gt {ba:.4f})", flush=True)
else:
    print("EMPTY MESH — training did not converge", flush=True)

# (512^3 timing lives in benchmarks/test512.py; at this demo's config a
# local-XLA compile pathology was observed for the 512^3/262144-chunk
# combination — see TODO.md measurement notes.)
