"""Full-pipeline integration: render a synthetic dataset with the JAX
rasterizer, train the real loop on it, resume from checkpoint, and run
the eval dataset path. This is the framework's end-to-end smoke test
(SURVEY.md §4 test plan)."""

import os

import numpy as np
import pytest

from surs_tpu.config import SuRSConfig
from surs_tpu.recon.mesh_io import save_obj_mesh
from surs_tpu.recon.tetra import marching_tetrahedra
from surs_tpu.render.dataset_gen import render_dataset


def make_sphere_obj(path, radius_vox, R=16, scale=1.0 / 8):
    """Sphere mesh from a volume (centered at origin, world units)."""
    g = np.mgrid[:R, :R, :R].astype(np.float64) - (R - 1) / 2
    vol = (radius_vox - np.sqrt((g ** 2).sum(0))).astype(np.float32)
    verts, faces = marching_tetrahedra(vol, 0.0)
    verts = (verts - (R - 1) / 2) * scale
    save_obj_mesh(path, verts, faces)
    return verts, faces


@pytest.fixture(scope="module")
def synthetic_dataroot(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_data")
    obj_dir = root / "GEO" / "OBJ"
    os.makedirs(obj_dir)
    make_sphere_obj(str(obj_dir / "subj0_HR.obj"), 6.0)
    make_sphere_obj(str(obj_dir / "subj0_LR.obj"), 5.0)
    (root / "val.txt").write_text("")
    render_dataset(str(obj_dir), str(root), load_size=32, yaw_step=180,
                   patch=32)
    return str(root)


def test_rendered_dataset_layout(synthetic_dataroot):
    root = synthetic_dataroot
    assert os.path.exists(os.path.join(root, "RENDER", "subj0",
                                       "0_0_00.jpg"))
    assert os.path.exists(os.path.join(root, "MASK", "subj0", "0_0_00.png"))
    param = np.load(os.path.join(root, "PARAM", "subj0", "0_0_00.npy"),
                    allow_pickle=True).item()
    assert set(param) == {"ortho_ratio", "scale", "center", "R"}


def test_train_loop_end_to_end(synthetic_dataroot, tmp_path):
    cfg = SuRSConfig(
        dataroot=synthetic_dataroot, name="itest", loadSize=32,
        num_sample_inout=32, sigma=0.05, batch_size=1,
        num_stack_lr=2, num_epoch=1, freq_plot=1, freq_save=100,
        freq_save_ply=100, no_gen_mesh=True, resolution=16,
        num_samples=256, octree_init_resolution=8,
        b_min=[-1.0, -1.0, -1.0], b_max=[1.0, 1.0, 1.0],
        checkpoints_path=str(tmp_path / "ckpt"),
        results_path=str(tmp_path / "res"))
    from surs_tpu.train.loop import train
    train(cfg, max_iters=2, yaw_list=[0, 180])
    assert os.path.isdir(os.path.join(cfg.checkpoints_path, "itest",
                                      "netG_latest"))
    # PLY sample dumps written on iter 0
    assert os.path.exists(os.path.join(cfg.results_path, "itest",
                                       "0pred.ply"))
    # resume (reference continue_train==0 convention) runs more iters
    cfg2 = SuRSConfig(**{**cfg.__dict__, "continue_train": 0})
    train(cfg2, max_iters=1, yaw_list=[0, 180])


def test_train_dataset_multiview(synthetic_dataroot):
    from surs_tpu.data import TrainDataset
    cfg = SuRSConfig(dataroot=synthetic_dataroot, loadSize=32,
                     num_sample_inout=16, sigma=0.05, num_views=2,
                     b_min=[-1.0] * 3, b_max=[1.0] * 3)
    ds = TrainDataset(cfg, phase="train", yaw_list=[0, 180])
    item = ds[0]
    assert item["img_LR"].shape == (2, 16, 16, 3)
    assert item["calib"].shape == (2, 4, 4)
    from surs_tpu.train.loop import batch_to_device
    from surs_tpu.data.loader import collate
    batch = batch_to_device(collate([item]))
    assert batch["images_lr"].shape == (2, 16, 16, 3)   # B*V collapse
    assert batch["points_hr"].shape[0] == 2             # repeated per view
