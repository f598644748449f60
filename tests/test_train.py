"""Training-layer tests: optimizers, schedule, train step, checkpointing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from surs_tpu.config import SuRSConfig
from surs_tpu.models import SuRSNet
from surs_tpu.train import (make_optimizer, lr_for_epoch, set_learning_rate,
                            create_train_state, make_train_step,
                            CheckpointManager)


def tiny_model():
    return SuRSNet(load_size=32, num_stack_lr=2)


def tiny_batch(rng, B=2, N=16, S=16):
    return {
        "images_lr": jnp.asarray(
            rng.standard_normal((B, S, S, 3)).astype(np.float32)),
        "images_hr": jnp.asarray(
            rng.standard_normal((B, 2 * S, 2 * S, 3)).astype(np.float32)),
        "points_lr": jnp.asarray(
            (rng.random((B, 3, N)) - 0.5).astype(np.float32)),
        "points_hr": jnp.asarray(
            (rng.random((B, 3, N)) - 0.5).astype(np.float32)),
        "calibs": jnp.asarray(np.tile(
            np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32),
            (B, 1, 1))),
        "labels_lr": jnp.asarray(
            rng.integers(0, 2, (B, N, 1)).astype(np.float32)),
        "labels_hr": jnp.asarray(
            rng.integers(0, 2, (B, N, 1)).astype(np.float32)),
    }


@pytest.mark.parametrize("opt_name", ["SGD", "ADAM", "RMSprop", "AMSgrad"])
def test_optimizer_factory(opt_name):
    cfg = SuRSConfig(optimizer=opt_name, learning_rate=1e-3)
    opt = make_optimizer(cfg)
    params = {"w": jnp.ones((3,))}
    state = opt.init(params)
    updates, _ = opt.update({"w": jnp.ones((3,))}, state, params)
    assert jnp.all(jnp.isfinite(updates["w"]))


def test_lr_schedule_matches_reference_semantics():
    # decay applied at END of epochs 60, 80 (apps/train_SuRS.py:192)
    assert lr_for_epoch(1.0, 0, [60, 80], 0.1) == 1.0
    assert lr_for_epoch(1.0, 60, [60, 80], 0.1) == 1.0
    assert lr_for_epoch(1.0, 61, [60, 80], 0.1) == pytest.approx(0.1)
    assert lr_for_epoch(1.0, 80, [60, 80], 0.1) == pytest.approx(0.1)
    assert lr_for_epoch(1.0, 81, [60, 80], 0.1) == pytest.approx(0.01)


def test_train_step_decreases_loss(rng):
    model = tiny_model()
    cfg = SuRSConfig(learning_rate=1e-3)
    opt = make_optimizer(cfg)
    batch = tiny_batch(rng)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, opt, donate=False)
    state, m0 = step(state, batch)
    losses = [float(m0["total"])]
    for _ in range(5):
        state, m = step(state, batch)
        losses.append(float(m["total"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 6


def test_train_step_bf16_trunk_learns(rng):
    """Mixed-precision training (bf16 conv trunks, f32 params/MLPs/loss,
    the TPU-auto default) optimizes: loss decreases, params stay finite,
    and the first-step loss matches the f32 step loosely."""
    cfg = SuRSConfig(learning_rate=1e-3)
    opt = make_optimizer(cfg)
    batch = tiny_batch(rng)
    m32 = tiny_model()
    m16 = SuRSNet(load_size=32, num_stack_lr=2, dtype="bfloat16")
    state = create_train_state(m32, opt, jax.random.PRNGKey(0), batch)
    s32, l32 = make_train_step(m32, opt, donate=False)(state, batch)
    state16, losses = state, []
    step16 = make_train_step(m16, opt, donate=False)
    for _ in range(6):
        state16, m = step16(state16, batch)
        losses.append(float(m["total"]))
    assert abs(losses[0] - float(l32["total"])) < 0.15
    assert losses[-1] < losses[0]
    leaves = jax.tree_util.tree_leaves(state16.params)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert all(x.dtype == jnp.float32 for x in leaves)


def test_config_dtype_auto_resolves_per_backend():
    from surs_tpu.config import resolve_auto, resolve_backend_defaults
    from surs_tpu.models import surs_net_from_config
    cfg = SuRSConfig()
    assert cfg.dtype == "auto"
    assert resolve_auto("dtype", cfg.dtype, "cpu") == "float32"
    assert resolve_auto("dtype", cfg.dtype, "axon") == "bfloat16"
    assert resolve_backend_defaults(cfg, "tpu").dtype == "bfloat16"
    # explicit values win
    assert resolve_auto("dtype", "float32", "tpu") == "float32"
    # from_config resolves against the live (CPU in tests) backend
    assert surs_net_from_config(cfg).dtype == "float32"


def test_set_learning_rate_no_recompile(rng):
    model = tiny_model()
    cfg = SuRSConfig(learning_rate=1e-3)
    opt = make_optimizer(cfg)
    batch = tiny_batch(rng, B=1, N=4)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, opt, donate=False)
    state, _ = step(state, batch)
    state = state.replace(
        opt_state=set_learning_rate(state.opt_state, 1e-4))
    state, _ = step(state, batch)  # same compiled fn, new lr
    assert float(state.opt_state.hyperparams["learning_rate"]) == \
        pytest.approx(1e-4)


def test_checkpoint_roundtrip(tmp_path, rng):
    model = tiny_model()
    cfg = SuRSConfig(learning_rate=1e-3)
    opt = make_optimizer(cfg)
    batch = tiny_batch(rng, B=1, N=4)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, opt, donate=False)
    state, _ = step(state, batch)

    mgr = CheckpointManager(str(tmp_path), "exp")
    mgr.save(state, epoch=3)
    assert mgr.exists(3) and mgr.exists(None)

    restored = mgr.restore(state, epoch=3)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b),
                 jax.tree.map(np.asarray, state.params),
                 jax.tree.map(np.asarray, restored.params))
    assert int(restored.step) == 1


def test_uint8_image_wire_format():
    """batch_to_device(quantize_images=True) + the device-side
    denormalization: symmetric quantization within 1/254 everywhere and
    EXACT at -1, 0 (masked background — the eval path sees exactly 0
    there, so any bias would be a systematic train/eval skew) and +1.
    The wire format is 4x smaller than f32."""
    import numpy as np
    import jax.numpy as jnp
    from surs_tpu.train.loop import batch_to_device
    from surs_tpu.train.step import denormalize_images

    rng = np.random.default_rng(0)
    k = rng.integers(0, 256, (1, 8, 8, 3))
    img = (k / 255.0 * 2.0 - 1.0).astype(np.float32)
    img[0, :4, :4, :] = 0.0          # mask-multiplied background
    img[0, 4, 4, :] = [-1.0, 0.0, 1.0]
    raw = {"img_LR": img, "img_HR": img.copy(),
           "calib": np.eye(4, dtype=np.float32)[None],
           "samples_LR": np.zeros((1, 3, 4), np.float32),
           "samples_HR": np.zeros((1, 3, 4), np.float32),
           "labels_disp": np.zeros((1, 1, 4), np.float32),
           "labels_HR": np.zeros((1, 1, 4), np.float32)}
    b = batch_to_device(raw, quantize_images=True)
    assert b["images_lr"].dtype == jnp.uint8
    d = np.asarray(denormalize_images(b)["images_lr"])
    np.testing.assert_allclose(d, img, atol=0.5 / 127.0)
    np.testing.assert_array_equal(d[0, :4, :4, :], 0.0)
    np.testing.assert_array_equal(d[0, 4, 4, :], [-1.0, 0.0, 1.0])


def test_pack_roundtrip_mixed_dtypes():
    """pack_arrays -> device unpack_arrays is byte-exact for every dtype
    class the batch ships (uint8 images, f32 points/calib/labels) plus
    the wider types a future batch might add."""
    from surs_tpu.train.pack import pack_arrays, unpack_arrays
    r = np.random.default_rng(0)
    arrays = {
        "u8": r.integers(0, 255, (2, 3, 5)).astype(np.uint8),
        "f32": r.standard_normal((4, 7)).astype(np.float32),
        "f64": r.standard_normal((3,)).astype(np.float64),
        "i32": r.integers(-5, 5, (2, 2)).astype(np.int32),
        "mask": r.integers(0, 2, (3, 4)).astype(np.bool_),
    }
    payload, spec = pack_arrays(arrays)
    assert payload.dtype == np.uint8
    out = jax.jit(unpack_arrays, static_argnums=1)(
        jnp.asarray(payload), spec)
    for k, a in arrays.items():
        # pack canonicalizes dtypes exactly like jnp.asarray (f64->f32
        # without x64), so compare against the per-array wire format
        ref = np.asarray(jnp.asarray(a))
        got = np.asarray(out[k])
        assert got.shape == ref.shape and got.dtype == ref.dtype
        np.testing.assert_array_equal(got, ref)


def test_packed_step_matches_plain_step(rng):
    """The single-payload train step (cfg.pack_h2d, train/pack.py) is
    numerically the plain step: same loss, same updated params."""
    from surs_tpu.train.pack import pack_arrays, make_packed_step
    model = tiny_model()
    opt = make_optimizer(SuRSConfig(learning_rate=1e-3))
    batch = tiny_batch(rng)
    host = {k: np.asarray(v) for k, v in batch.items()}
    # quantized-image wire format, as the train loop ships it
    for k in ("images_lr", "images_hr"):
        host[k] = np.clip(np.rint(host[k] * 127.0) + 127.0, 0,
                          254).astype(np.uint8)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), batch)
    plain = make_train_step(model, opt, donate=False)
    s_plain, m_plain = plain(state, {k: jnp.asarray(v)
                                     for k, v in host.items()})
    payload, spec = pack_arrays(host)
    packed = make_packed_step(make_train_step(model, opt, jit=False),
                              donate=False)
    s_pack, m_pack = packed(state, jnp.asarray(payload), spec)
    assert float(m_pack["total"]) == pytest.approx(
        float(m_plain["total"]), rel=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-6),
        s_plain.params, s_pack.params)
    assert int(s_pack.step) == int(s_plain.step) == 1
