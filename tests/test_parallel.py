"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from surs_tpu.config import SuRSConfig
from surs_tpu.models import SuRSNet
from surs_tpu.parallel import (make_mesh, replicate_tree,
                               batch_sharding, point_sharding)
from surs_tpu.train import make_optimizer, create_train_state, \
    make_train_step
from tests.test_train import tiny_model, tiny_batch


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh(n_data=4, n_points=2)
    assert mesh2.shape == {"data": 4, "points": 2}


def test_data_parallel_train_step_matches_single(rng):
    model = tiny_model()
    cfg = SuRSConfig(learning_rate=1e-3)
    opt = make_optimizer(cfg)
    batch = tiny_batch(rng, B=8, N=8)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, opt, donate=False)

    # single-device result
    _, m_single = step(state, batch)

    # data-parallel: batch sharded over 8 devices, params replicated
    mesh = make_mesh(n_data=8, n_points=1)
    sharded_batch = {k: jax.device_put(v, batch_sharding(mesh, v.ndim))
                     for k, v in batch.items()}
    sharded_state = replicate_tree(state, mesh)
    new_state, m_shard = step(sharded_state, sharded_batch)

    np.testing.assert_allclose(float(m_shard["total"]),
                               float(m_single["total"]), rtol=1e-4)
    # params stay replicated and finite after the update
    leaf = jax.tree.leaves(new_state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_point_sharded_query(rng):
    """Query-point axis sharded over the mesh (SP analog)."""
    model = tiny_model()
    batch = tiny_batch(rng, B=1, N=4)
    variables = model.init(jax.random.PRNGKey(0), batch["images_lr"],
                           batch["images_hr"], batch["points_lr"],
                           batch["points_hr"], batch["calibs"], train=True)
    params = variables["params"]
    _, feats_lr, feat_hr = model.apply({"params": params},
                                       batch["images_lr"], train=False,
                                       method=SuRSNet.encode)
    pts = jnp.asarray((np.random.default_rng(7).random((1, 3, 64)) - 0.5)
                      .astype(np.float32))
    calib = batch["calibs"][:1]

    def query(p):
        return model.apply({"params": params}, feats_lr, feat_hr, p, calib,
                           method=SuRSNet.query)

    ref_hr, ref_lr = jax.jit(query)(pts)

    mesh = make_mesh(n_data=1, n_points=8)
    pts_sharded = jax.device_put(pts, point_sharding(mesh, 2, 3))
    got_hr, got_lr = jax.jit(query)(pts_sharded)
    np.testing.assert_allclose(np.asarray(got_hr), np.asarray(ref_hr),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_lr), np.asarray(ref_lr),
                               rtol=1e-4, atol=1e-5)


def test_point_sharded_reconstructor_matches(rng):
    """Single-subject octree with the chunk's point axis sharded over 8
    devices matches the unsharded evaluation exactly."""
    from surs_tpu.recon.pipeline import Reconstructor
    model = tiny_model()
    batch = tiny_batch(rng, B=1, N=4)
    params = model.init(jax.random.PRNGKey(0), *[
        batch[k] for k in ("images_lr", "images_hr", "points_lr",
                           "points_hr", "calibs")], train=True)["params"]
    _, feats_lr, feat_hr = model.apply({"params": params},
                                       batch["images_lr"], train=False,
                                       method=SuRSNet.encode)
    calib = np.asarray(batch["calibs"][:1])
    args = (params, feats_lr, feat_hr, calib, 16,
            np.array([-0.5] * 3), np.array([0.5] * 3))
    kw = dict(num_samples=256, threshold=0.05, init_resolution=8)

    base = Reconstructor(model)
    hr0, lr0, _ = base.evaluate(*args, **kw)

    mesh = make_mesh(n_data=1, n_points=8)
    sharded = Reconstructor(model, point_mesh=mesh)
    hr1, lr1, _ = sharded.evaluate(*args, **kw)
    np.testing.assert_allclose(np.asarray(hr1), np.asarray(hr0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lr1), np.asarray(lr0),
                               rtol=1e-4, atol=1e-5)


def test_dense_cols_sharded_matches_single(rng):
    """Column-sharded dense evaluation over the 8-device mesh == the
    single-device column evaluator (and hence the generic path)."""
    from surs_tpu.ops.fused_mlp import prepare_fused_weights
    from surs_tpu.recon.grid import grid_matrix
    from surs_tpu.recon.evaluator import (eval_grid_dense_cols,
                                          eval_grid_dense_cols_sharded)

    model = SuRSNet(load_size=32, num_stack_lr=2)
    S = 16
    img = jnp.asarray(rng.standard_normal((1, S, S, 3)).astype(np.float32))
    img_hr = jnp.asarray(
        rng.standard_normal((1, 2 * S, 2 * S, 3)).astype(np.float32))
    pts0 = jnp.asarray((rng.random((1, 3, 4)) - 0.5).astype(np.float32))
    calib = np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32)[None]
    params = model.init(jax.random.PRNGKey(0), img, img_hr, pts0, pts0,
                        jnp.asarray(calib), train=True)["params"]
    _, feats_lr, feat_hr = model.apply({"params": params}, img,
                                       train=False,
                                       method=SuRSNet.encode)
    fw3 = prepare_fused_weights(
        params["mlp_lr"], params["mlp_hr"],
        (321, 1024, 512, 256, 128, 1), (322, 1024, 512, 256, 128, 1),
        base_split=(256, 64, 1))
    R = 16
    mat = grid_matrix((R, R, R), np.array([-0.5] * 3), np.array([0.5] * 3))
    hr1, lr1 = eval_grid_dense_cols(fw3, feats_lr[-1], feat_hr, calib,
                                    R, mat, 32, 200.0)
    mesh = make_mesh(n_data=1, n_points=8)
    hr8, lr8 = eval_grid_dense_cols_sharded(
        fw3, feats_lr[-1], feat_hr, calib, R, mat, 32, 200.0, mesh)
    np.testing.assert_allclose(np.asarray(hr8), np.asarray(hr1),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(lr8), np.asarray(lr1),
                               atol=1e-6)


def _sphere_vol(n, center, r):
    g = np.stack(np.meshgrid(*([np.arange(n)] * 3), indexing="ij"), -1)
    d = np.sqrt(((g - np.asarray(center)) ** 2).sum(-1))
    return (0.5 + (r - d)).astype(np.float32)


def _canon_mesh(verts, faces):
    """Winding-preserving order-independent mesh key set."""
    q = np.rint(np.asarray(verts, np.float64) * 4096.0).astype(np.int64)
    out = []
    for f in np.asarray(faces):
        keys = [tuple(q[i]) for i in f]
        r = keys.index(min(keys))
        out.append(tuple(keys[r:] + keys[:r]))
    return sorted(out), sorted(map(tuple, q))


@pytest.mark.parametrize("algorithm", ["cubes", "tets"])
def test_sharded_extraction_matches_single_device(algorithm):
    """8-slab sharded extraction == single-device extractor: identical
    vertex set and face set (windings preserved), across slab
    boundaries (sphere) and on a noise field (every case, heavy
    boundary traffic)."""
    from surs_tpu.parallel import make_mesh, extract_isosurface_sharded
    from surs_tpu.recon.tetra_device import marching_tetrahedra_device

    mesh = make_mesh(n_data=1, n_points=8)
    rng = np.random.default_rng(5)
    fields = [
        _sphere_vol(32, (15.3, 16.2, 14.9), 11.5),
        rng.normal(0.5, 0.4, (32, 32, 32)).astype(np.float32),
    ]
    for vol in fields:
        vs, fs = extract_isosurface_sharded(
            vol, 0.5, mesh=mesh, axis="points", algorithm=algorithm,
            cell_chunk=1 << 10)
        vd, fd = marching_tetrahedra_device(
            vol, 0.5, max_cells=1 << 16, max_tris=1 << 19,
            max_verts=1 << 18, cell_chunk=1 << 10, algorithm=algorithm)
        assert fs.shape == fd.shape and vs.shape == vd.shape
        faces_s, verts_s = _canon_mesh(vs, fs)
        faces_d, verts_d = _canon_mesh(vd, fd)
        assert verts_s == verts_d
        assert faces_s == faces_d


def test_sharded_extraction_empty_field():
    from surs_tpu.parallel import make_mesh, extract_isosurface_sharded
    mesh = make_mesh(n_data=1, n_points=8)
    vol = np.zeros((32, 32, 32), np.float32)
    vs, fs = extract_isosurface_sharded(vol, 0.5, mesh=mesh,
                                        axis="points")
    assert vs.shape[0] == 0 and fs.shape[0] == 0


def test_extract_pair_sharded_backend_matches_host():
    """Reconstructor.extract_pair(mc_backend='sharded') == host
    extraction, world coordinates included."""
    from surs_tpu.parallel import make_mesh
    from surs_tpu.recon.pipeline import Reconstructor
    from surs_tpu.recon.marching import extract_isosurface

    mesh = make_mesh(n_data=1, n_points=8)
    mat = np.diag([2.0 / 31, 2.0 / 31, 2.0 / 31, 1.0]).astype(np.float32)
    mat[:3, 3] = -1.0
    sdf_hr = _sphere_vol(32, (15.3, 16.2, 14.9), 11.5)
    sdf_lr = _sphere_vol(32, (16.0, 15.5, 16.5), 9.0)
    got = list(Reconstructor.extract_pair(
        sdf_hr, sdf_lr, mat, mc_backend="sharded",
        mc_caps={"mesh": mesh, "axis": "points", "algorithm": "tets",
                 "cell_chunk": 1 << 10}))
    for (vs, fs), vol in zip(got, (sdf_hr, sdf_lr)):
        vh, fh = extract_isosurface(vol, 0.5)
        vh = (vh @ mat[:3, :3].T + mat[:3, 3]).astype(np.float32)
        assert fs.shape == fh.shape and vs.shape == vh.shape
        faces_s, verts_s = _canon_mesh(vs, fs)
        faces_h, verts_h = _canon_mesh(vh, fh)
        assert verts_s == verts_h and faces_s == faces_h


def test_reconstruct_subject_sharded_end_to_end(rng):
    """Single-subject multi-chip flow (column-sharded dense eval chained
    into slab-sharded extraction, volumes never replicated) == the
    single-device dense-cols + device-extractor path, world coords."""
    from surs_tpu.ops.fused_mlp import prepare_fused_weights
    from surs_tpu.recon.grid import grid_matrix
    from surs_tpu.recon.evaluator import eval_grid_dense_cols
    from surs_tpu.recon.tetra_device import marching_tetrahedra_device
    from surs_tpu.parallel import reconstruct_subject_sharded

    model = SuRSNet(load_size=32, num_stack_lr=2)
    S = 16
    img = jnp.asarray(rng.standard_normal((1, S, S, 3)).astype(np.float32))
    img_hr = jnp.asarray(
        rng.standard_normal((1, 2 * S, 2 * S, 3)).astype(np.float32))
    pts0 = jnp.asarray((rng.random((1, 3, 4)) - 0.5).astype(np.float32))
    calib = np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32)[None]
    params = model.init(jax.random.PRNGKey(0), img, img_hr, pts0, pts0,
                        jnp.asarray(calib), train=True)["params"]
    _, feats_lr, feat_hr = model.apply({"params": params}, img,
                                       train=False,
                                       method=SuRSNet.encode)
    fw3 = prepare_fused_weights(
        params["mlp_lr"], params["mlp_hr"],
        (321, 1024, 512, 256, 128, 1), (322, 1024, 512, 256, 128, 1),
        base_split=(256, 64, 1))
    R = 32
    b_min, b_max = np.array([-0.5] * 3), np.array([0.5] * 3)
    mesh = make_mesh(n_data=1, n_points=8)

    vh, fh, vl, fl = reconstruct_subject_sharded(
        fw3, feats_lr[-1], feat_hr, calib, R, b_min, b_max, 32, 200.0,
        mesh, cell_chunk=1 << 10)

    mat = grid_matrix((R,) * 3, b_min, b_max)
    sdf_hr, sdf_lr = eval_grid_dense_cols(fw3, feats_lr[-1], feat_hr,
                                          calib, R, mat, 32, 200.0)

    def single(vol):
        v, f = marching_tetrahedra_device(
            np.asarray(vol), 0.5, max_cells=1 << 16, max_tris=1 << 19,
            max_verts=1 << 18, cell_chunk=1 << 10, algorithm="cubes")
        v = v @ np.asarray(mat[:3, :3]).T + np.asarray(mat[:3, 3])
        return v.astype(np.float32), f

    for (vs, fs), vol in (((vh, fh), sdf_hr), ((vl, fl), sdf_lr)):
        vd, fd = single(vol)
        assert fs.shape == fd.shape and vs.shape == vd.shape
        faces_s, verts_s = _canon_mesh(vs, fs)
        faces_d, verts_d = _canon_mesh(vd, fd)
        assert verts_s == verts_d
        assert faces_s == faces_d
