"""Fused (Pallas custom_vjp) train step == Flax-path train step.

Pins loss values AND gradients: one optimizer step from identical
state must produce the same parameters through both paths (VERDICT
round-1 item: the flagship kernel must not create a train/inference
numerics split)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from surs_tpu.models import SuRSNet
from surs_tpu.train.step import make_train_step, create_train_state
from surs_tpu.train.fused_step import make_fused_train_step


@pytest.fixture(scope="module")
def setup():
    model = SuRSNet(load_size=32, num_stack_lr=2)
    rng = np.random.default_rng(3)
    B, S, N = 1, 16, 96
    batch = {
        "images_lr": jnp.asarray(
            rng.standard_normal((B, S, S, 3)).astype(np.float32)),
        "images_hr": jnp.asarray(
            rng.standard_normal((B, 2 * S, 2 * S, 3)).astype(np.float32)),
        "points_lr": jnp.asarray(
            (rng.random((B, 3, N)) - 0.5).astype(np.float32) * 1.4),
        "points_hr": jnp.asarray(
            (rng.random((B, 3, N)) - 0.5).astype(np.float32) * 1.4),
        "calibs": jnp.asarray(np.tile(np.diag(
            [2.0, -2.0, 2.0, 1.0]).astype(np.float32), (B, 1, 1))),
        "labels_lr": jnp.asarray(
            rng.random((B, N, 1)).astype(np.float32)),
        "labels_hr": jnp.asarray(
            (rng.random((B, N, 1)) > 0.5).astype(np.float32)),
    }
    opt = optax.sgd(1.0)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), batch)
    return model, opt, state, batch


def test_fused_step_matches_flax_step(setup):
    model, opt, state, batch = setup
    step_ref = make_train_step(model, opt, donate=False)
    step_fused = make_fused_train_step(model, opt, block_n=128,
                                       interpret=True, donate=False)
    s_ref, m_ref = step_ref(state, batch)
    s_fused, m_fused = step_fused(state, batch)

    for k in ("mlp1", "mlp2", "sr", "disp", "total"):
        np.testing.assert_allclose(np.asarray(m_fused[k]),
                                   np.asarray(m_ref[k]),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m_fused["pred_hr"]),
                               np.asarray(m_ref["pred_hr"]),
                               rtol=1e-5, atol=1e-6)
    # gradient parity: identical SGD(1.0) step -> identical params
    flat_ref = jax.tree_util.tree_leaves_with_path(s_ref.params)
    flat_fused = jax.tree_util.tree_flatten(s_fused.params)[0]
    assert len(flat_ref) == len(flat_fused)
    for (path, a), b in zip(flat_ref, flat_fused):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-6,
            err_msg=jax.tree_util.keystr(path))
