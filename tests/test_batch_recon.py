"""Sharded multi-subject reconstruction on the 8-device virtual mesh."""

import numpy as np
import jax.numpy as jnp

from surs_tpu.parallel import make_mesh
from surs_tpu.parallel.batch_recon import ShardedReconstructor
from surs_tpu.recon import eval_grid_octree
from surs_tpu.recon.grid import grid_matrix


def per_subject_sphere_eval(points, ctx):
    """ctx = {'radius': scalar}: per-subject sphere size."""
    r = jnp.linalg.norm(points, axis=0)
    return ((r < ctx["radius"]).astype(jnp.float32),
            (r < ctx["radius"] * 0.8).astype(jnp.float32))


def test_sharded_octree_matches_single_device():
    R, thr, init_res = 16, 0.05, 8
    b_min = np.array([-0.5] * 3)
    b_max = np.array([0.5] * 3)
    mesh = make_mesh(n_data=8, n_points=1)
    radii = np.linspace(0.15, 0.45, 8).astype(np.float32)

    srec = ShardedReconstructor(per_subject_sphere_eval, mesh, R, b_min,
                                b_max, threshold=thr,
                                init_resolution=init_res, num_samples=256)
    ctx = {"radius": jnp.asarray(radii)}
    sdf_hr, sdf_lr = srec.evaluate(ctx)
    assert sdf_hr.shape == (8, R, R, R)

    mat = grid_matrix((R, R, R), b_min, b_max)
    for b in [0, 3, 7]:
        ref_hr, ref_lr = eval_grid_octree(
            per_subject_sphere_eval, R, mat, thr,
            init_resolution=init_res, num_samples=256,
            ctx={"radius": jnp.asarray(radii[b])})
        np.testing.assert_allclose(np.asarray(sdf_hr[b]),
                                   np.asarray(ref_hr), atol=1e-6)
        np.testing.assert_allclose(np.asarray(sdf_lr[b]),
                                   np.asarray(ref_lr), atol=1e-6)


def test_sharded_reconstruct_meshes():
    R = 16
    mesh = make_mesh(n_data=8, n_points=1)
    srec = ShardedReconstructor(per_subject_sphere_eval, mesh, R,
                                np.array([-0.5] * 3), np.array([0.5] * 3),
                                init_resolution=8, num_samples=256)
    radii = np.full(8, 0.35, np.float32)
    meshes = srec.reconstruct({"radius": jnp.asarray(radii)})
    assert len(meshes) == 8
    vh, fh, vl, fl = meshes[0]
    assert vh.shape[0] > 0 and fh.shape[0] > 0
    # vertices sit near their respective sphere radii
    assert abs(np.linalg.norm(vh, axis=1).mean() - 0.35) < 0.05
    assert abs(np.linalg.norm(vl, axis=1).mean() - 0.28) < 0.05
