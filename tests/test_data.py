"""Data-pipeline tests: calibration math, containment, sampling, loader."""

import numpy as np
import pytest

from surs_tpu.data import (AugParams, calib_from_param, sample_surface,
                           sample_points_and_labels, MeshData, DataLoader)
from surs_tpu.ops.containment import contains


def cube_mesh(half=1.0, center=(0.0, 0.0, 0.0)):
    """Axis-aligned cube triangle mesh (12 tris, outward normals)."""
    c = np.asarray(center, dtype=np.float32)
    v = np.array([[x, y, z] for x in (-half, half) for y in (-half, half)
                  for z in (-half, half)], dtype=np.float32) + c
    # faces with outward orientation (vertex ids: bit2=x, bit1=y, bit0=z)
    f = np.array([
        [0, 1, 3], [0, 3, 2],      # x = -h
        [4, 6, 7], [4, 7, 5],      # x = +h
        [0, 4, 5], [0, 5, 1],      # y = -h
        [2, 3, 7], [2, 7, 6],      # y = +h
        [0, 2, 6], [0, 6, 4],      # z = -h
        [1, 5, 7], [1, 7, 3],      # z = +h
    ], dtype=np.int64)
    return MeshData(v, f)


def ref_calib(param, load_size, flip=False):
    """Independent restatement of lib/data/TrainDataset_LR_v2.py:242-316."""
    R = param["R"]
    center = np.asarray(param["center"]).reshape(3)
    translate = -R @ center.reshape(3, 1)
    ext = np.concatenate([R, translate], 1)
    ext = np.concatenate([ext, np.array([[0, 0, 0, 1.0]])], 0)
    sc = np.identity(4)
    s = param["scale"] / param["ortho_ratio"]
    sc[0, 0] = -s if flip else s
    sc[1, 1] = -s
    sc[2, 2] = s
    uv = np.identity(4)
    uv[0, 0] = uv[1, 1] = uv[2, 2] = 1.0 / (load_size // 2)
    return uv @ sc @ ext


def test_calib_matches_reference_formula(rng):
    theta = 0.3
    param = {
        "ortho_ratio": 0.4,
        "scale": 100.0,
        "center": rng.standard_normal(3),
        "R": np.array([[np.cos(theta), 0, np.sin(theta)],
                       [0, 1, 0],
                       [-np.sin(theta), 0, np.cos(theta)]]),
    }
    calib, ext = calib_from_param(param, 512)
    np.testing.assert_allclose(calib, ref_calib(param, 512), rtol=1e-5,
                               atol=1e-6)
    calib_f, _ = calib_from_param(param, 512, AugParams(flip=True))
    np.testing.assert_allclose(calib_f, ref_calib(param, 512, flip=True),
                               rtol=1e-5, atol=1e-6)


def test_calib_translation_aug(rng):
    param = {"ortho_ratio": 0.4, "scale": 100.0,
             "center": np.zeros(3), "R": np.eye(3)}
    calib, _ = calib_from_param(param, 512, AugParams(dx=10, dy=-6))
    base, _ = calib_from_param(param, 512)
    np.testing.assert_allclose(calib[0, 3] - base[0, 3], -10 / 256.0,
                               atol=1e-7)
    np.testing.assert_allclose(calib[1, 3] - base[1, 3], 6 / 256.0,
                               atol=1e-7)


def test_contains_cube():
    mesh = cube_mesh(half=0.5)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    inside = contains(pts, mesh.verts, mesh.faces)
    expected = (np.abs(pts) < 0.5).all(axis=1)
    np.testing.assert_array_equal(inside, expected)


def test_sample_surface_on_cube(rng):
    mesh = cube_mesh(half=1.0)
    pts = sample_surface(mesh, 2000, rng)
    # every sample lies on the cube surface: max |coord| == 1
    np.testing.assert_allclose(np.abs(pts).max(axis=1), 1.0, atol=1e-5)


def test_sample_points_and_labels_semantics(rng):
    mesh_hr = cube_mesh(half=0.5)
    mesh_lr = cube_mesh(half=0.4)   # LR strictly inside HR
    N = 200
    out = sample_points_and_labels(mesh_hr, mesh_lr, N, sigma=0.1,
                                   b_min=np.array([-1.0] * 3),
                                   b_max=np.array([1.0] * 3), rng=rng)
    assert out["samples_HR"].shape == (3, N)
    assert out["samples_LR"].shape == (3, N)
    assert out["labels_HR"].shape == (1, N)
    assert out["labels_disp"].shape == (1, N)
    # labels_HR: first half inside (1), second half outside (0)
    s_hr = out["samples_HR"].T
    inside_true = (np.abs(s_hr) < 0.5).all(axis=1)
    np.testing.assert_array_equal(out["labels_HR"][0], inside_true)
    # disp labels = HR occupancy at the LR-ordered samples
    s_lr = out["samples_LR"].T
    np.testing.assert_array_equal(
        out["labels_disp"][0], (np.abs(s_lr) < 0.5).all(axis=1))
    # every LR-inside point (first section) is inside HR -> disp label 1
    n_in_lr = int((np.abs(s_lr) < 0.4).all(axis=1).sum())
    assert out["labels_disp"][0, :n_in_lr].min() == 1.0


class _ToyDataset:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        return {"x": np.full((2, 2), i, dtype=np.float32), "name": str(i)}


@pytest.mark.parametrize("threads", [1, 2])
def test_loader_batching(threads):
    dl = DataLoader(_ToyDataset(), batch_size=4, shuffle=False,
                    num_threads=threads, prefetch=2)
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0]["x"].shape == (4, 2, 2)
    assert batches[0]["name"] == ["0", "1", "2", "3"]


def test_loader_shuffles_between_epochs():
    dl = DataLoader(_ToyDataset(), batch_size=10, shuffle=True, seed=1)
    e1 = list(dl)[0]["name"]
    e2 = list(dl)[0]["name"]
    assert e1 != e2


class _FlakyDataset:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        if i % 2 == 1:
            raise IOError(f"missing file for {i}")
        return {"x": np.full((2,), i, dtype=np.float32)}


def test_loader_resamples_on_error():
    dl = DataLoader(_FlakyDataset(), batch_size=5, shuffle=False,
                    resample_on_error=True, seed=3)
    batch = list(dl)[0]
    assert batch["x"].shape == (5, 2)
    assert (batch["x"][:, 0] % 2 == 0).all()  # only even items survive


def test_loader_process_workers_match_single_process():
    """num_workers>0 builds batches in worker PROCESSES; epoch order and
    contents are identical to the in-process loader (VERDICT r1 #5)."""
    kw = dict(batch_size=4, shuffle=True, seed=12)
    ref = list(DataLoader(_ToyDataset(), **kw))
    got = list(DataLoader(_ToyDataset(), num_workers=3, prefetch=2, **kw))
    assert len(got) == len(ref) == 2
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a["x"], b["x"])
        assert a["name"] == b["name"]


def test_loader_process_workers_resample_and_errors():
    dl = DataLoader(_FlakyDataset(), batch_size=5, shuffle=False,
                    resample_on_error=True, seed=3, num_workers=2)
    batch = list(dl)[0]
    assert (batch["x"][:, 0] % 2 == 0).all()
    # without resampling the worker's exception must surface in the parent
    dl = DataLoader(_FlakyDataset(), batch_size=5, shuffle=False,
                    num_workers=2)
    with pytest.raises(IOError):
        list(dl)


def test_loader_fork_fallback_warns_when_jax_initialized():
    """Building a fork worker pool after the JAX runtime initialized
    must fall back to spawn (fork children can deadlock inheriting XLA
    runtime threads' locks) and say so."""
    import jax.numpy as jnp
    float(jnp.zeros(()).sum())  # force backend initialization
    with pytest.warns(UserWarning, match="spawn"):
        dl = DataLoader(_ToyDataset(), batch_size=4, shuffle=False,
                        num_workers=1)
    try:
        assert len(list(dl)) == 2  # the spawn pool actually works
    finally:
        dl.close()


def test_sample_surface_colors(rng):
    from surs_tpu.data.sampling import sample_surface_colors
    mesh = cube_mesh(half=1.0)
    colors = (mesh.verts + 1.0) / 2.0  # position-coded colors in [0, 1]
    out = sample_surface_colors(mesh, colors, 500, sigma=0.0, rng=rng)
    assert out["color_samples"].shape == (3, 500)
    assert out["rgbs"].shape == (3, 500)
    # with sigma 0 samples lie on the surface, and color == position code
    pts = out["color_samples"].T
    np.testing.assert_allclose(np.abs(pts).max(axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(out["rgbs"].T, pts, atol=1e-5)


def test_contains_open_mesh_graceful():
    """Winding numbers degrade gracefully on a non-watertight mesh: the
    deep-interior region behind the opening is still classified inside."""
    mesh = cube_mesh(half=0.5)
    open_faces = mesh.faces[2:]  # remove the x=-0.5 wall
    pts = np.array([[0.0, 0.0, 0.0],       # center: mostly enclosed
                    [2.0, 0.0, 0.0]], np.float32)  # far outside
    inside = contains(pts, mesh.verts, open_faces)
    assert bool(inside[0]) is True
    assert bool(inside[1]) is False
