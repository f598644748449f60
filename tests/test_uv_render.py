"""First-party UV-space rendering (render/uv.py).

The reference produces UV_RENDER/UV_MASK/UV_POS/UV_NORMAL with a
UV-mode GL pass (lib/renderer/gl/data/prt_uv.vs, prt_render.py uv_mode);
these tests pin our rasterizer-based equivalent: chart consistency
(every covered texel maps to one surface point with linearly-consistent
attributes) and the full loop dataset -> get_color_sampling -> netC
training step, with no external data.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_data import cube_mesh


def test_uv_maps_attribute_consistency():
    """Position-coded vertex colors: every covered texel's albedo must
    equal the position code of its interpolated 3-D position (both
    interpolate over the same barycentrics), positions lie on the cube
    surface, normals are unit."""
    from surs_tpu.render.uv import render_uv_maps

    half = 0.4
    mesh = cube_mesh(half=half)
    colors = (mesh.verts / (2 * half) + 0.5).astype(np.float32)
    pos, nrm, albedo, mask = render_uv_maps(mesh.verts, mesh.faces,
                                            colors=colors, uv_size=96)
    assert mask.sum() > 500
    p = pos[mask]
    a = albedo[mask]
    n = nrm[mask]
    np.testing.assert_allclose(a, p / (2 * half) + 0.5, atol=1e-4)
    # interpolated positions lie on the cube surface
    assert np.all(np.abs(p).max(axis=1) <= half + 1e-5)
    assert np.all(np.abs(np.abs(p).max(axis=1) - half) < 1e-5)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)


def test_uv_dataset_feeds_color_sampling_and_netc(tmp_path):
    """VERDICT r2 #3 'done' criterion: synthetic subject -> first-party
    UV renders -> get_color_sampling -> netC training step loss
    decreases, no external data."""
    import optax
    from PIL import Image
    from surs_tpu.config import SuRSConfig
    from surs_tpu.data import TrainDataset
    from surs_tpu.models.pifu_legacy import ResBlkColorNet
    from surs_tpu.recon.mesh_io import save_obj_mesh_with_color
    from surs_tpu.render.uv import render_uv_dataset
    from surs_tpu.train.color import (create_color_state,
                                      make_color_train_step)

    root = str(tmp_path)
    subj = "h0"
    obj_dir = os.path.join(root, "GEO", "OBJ")
    os.makedirs(obj_dir)
    os.makedirs(os.path.join(root, "RENDER", subj))
    open(os.path.join(root, "val.txt"), "w").write("")
    Image.new("RGB", (8, 8)).save(
        os.path.join(root, "RENDER", subj, "0_0_00.jpg"))

    half = 0.4
    mesh = cube_mesh(half=half)
    colors = (mesh.verts / (2 * half) + 0.5).astype(np.float32)
    save_obj_mesh_with_color(os.path.join(obj_dir, subj + "_HR.obj"),
                             mesh.verts, mesh.faces, colors)

    render_uv_dataset(obj_dir, root, uv_size=64, yaw_step=180)
    for d, fn in (("UV_RENDER", "0_0_00.jpg"), ("UV_RENDER", "180_0_00.jpg"),
                  ("UV_MASK", "00.png"), ("UV_POS", "00.exr"),
                  ("UV_NORMAL", "00.png")):
        assert os.path.exists(os.path.join(root, d, subj, fn)), (d, fn)

    cfg = SuRSConfig(dataroot=root, num_sample_color=48, sigma=0.01,
                     num_sample_inout=0)
    ds = TrainDataset(cfg, phase="train", yaw_list=[0, 180])
    assert ds.has_uv_renders()
    col = ds.get_color_sampling(subj, 0, 0,
                                rng=np.random.default_rng(7))
    pts = col["color_samples"]                      # [3, N]
    assert pts.shape == (3, 48)
    # samples lie within ~3 sigma + quantization of the cube surface
    d_surf = np.abs(np.abs(pts).max(axis=0) - half)
    assert np.percentile(d_surf, 90) < 0.05

    net = ResBlkColorNet(load_size=16, mlp_dim_color=(257, 64, 32, 3))
    opt = optax.adam(1e-3)
    rng = np.random.default_rng(4)
    batch = {
        "images": jnp.asarray(
            rng.standard_normal((1, 16, 16, 3)).astype(np.float32)),
        "points": jnp.asarray(pts[None]),
        "calibs": jnp.asarray(np.diag(
            [2.0, -2.0, 2.0, 1.0]).astype(np.float32))[None],
        "rgbs": jnp.asarray(col["rgbs"].T[None]),
    }
    state = create_color_state(net, opt, jax.random.PRNGKey(0), batch)
    step = make_color_train_step(net, opt)
    losses = []
    for _ in range(4):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
