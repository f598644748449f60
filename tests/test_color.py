"""Color branch: training step decreases loss; colored-mesh output."""

import numpy as np
import jax
import jax.numpy as jnp

from surs_tpu.config import SuRSConfig
from surs_tpu.models.pifu_legacy import ResBlkColorNet
from surs_tpu.train import make_optimizer
from surs_tpu.train.color import (create_color_state,
                                  make_color_train_step,
                                  colorize_vertices)
from surs_tpu.data.sampling import sample_surface_colors
from tests.test_data import cube_mesh


def make_batch(rng, B=1, N=64, S=32):
    mesh = cube_mesh(half=0.5)
    colors = (mesh.verts + 0.5)  # position-coded colors in [0, 1]
    out = sample_surface_colors(mesh, colors, N, sigma=0.0, rng=rng)
    return {
        "images": jnp.asarray(
            rng.standard_normal((B, S, S, 3)).astype(np.float32)),
        "points": jnp.asarray(out["color_samples"])[None],
        "calibs": jnp.asarray(
            np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32))[None],
        "rgbs": jnp.asarray(out["rgbs"].T)[None],
    }


def test_color_train_step_decreases_loss(rng):
    net = ResBlkColorNet(load_size=32)
    cfg = SuRSConfig(learning_rate=1e-3)
    opt = make_optimizer(cfg)
    batch = make_batch(rng)
    state = create_color_state(net, opt, jax.random.PRNGKey(0), batch)
    step = make_color_train_step(net, opt, loss_type="l1")
    state, l0 = step(state, batch)
    for _ in range(8):
        state, loss = step(state, batch)
    assert float(loss) < float(l0)


def test_colorize_vertices(rng):
    net = ResBlkColorNet(load_size=32)
    batch = make_batch(rng)
    params = net.init(jax.random.PRNGKey(0), batch["images"],
                      batch["points"], batch["calibs"])["params"]
    verts = rng.random((37, 3)).astype(np.float32) - 0.5
    rgb = colorize_vertices(net, params, batch["images"], verts,
                            batch["calibs"], chunk=16)
    assert rgb.shape == (37, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0


def test_load_obj_vertex_colors(tmp_path):
    from surs_tpu.recon.mesh_io import (save_obj_mesh_with_color, load_obj)
    verts = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
    faces = np.array([[0, 1, 2]])
    colors = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    p = str(tmp_path / "c.obj")
    save_obj_mesh_with_color(p, verts, faces, colors)
    v, f, c = load_obj(p, with_colors=True)
    np.testing.assert_allclose(c, colors, atol=1e-4)
    v2, f2 = load_obj(p)  # color-less path still works
    assert v2.shape == (3, 3)
