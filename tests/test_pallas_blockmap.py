"""Mosaic block-mapping regression guard (the round-3 lesson).

``interpret=True`` executes a Pallas kernel's MATH on CPU but never
checks Mosaic's BLOCK-MAPPING rules, so a BlockSpec that real-TPU
Mosaic rejects can survive the entire CPU suite. That is exactly how
the runs kernel shipped broken for a round: its (1, zb*rb) output
block on a rank-2 array violates the (8, 128) tiling rule (a block's
second-minor dim must be a sublane multiple or cover the array dim)
and only failed on real hardware (commit cd5c660).

This test intercepts every ``pl.pallas_call`` issued by
``ops.fused_mlp`` at PRODUCTION block sizes and statically validates
each input/output BlockSpec against the rule, pinning the invariant
without a TPU in the loop:

  * minor (lane) dim:   block[-1] % 128 == 0  or  block[-1] == array[-1]
  * second-minor dim:   block[-2] % 8  == 0   or  block[-2] == array[-2]

(8 is the f32 sublane count — the weakest requirement; bf16/int8 need
more, but every kernel here keeps sub-array blocks f32-shaped or
full-array, so the f32 rule is the binding one.)
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental import pallas as pl

import surs_tpu.ops.fused_mlp as fm


def _block_ok(block, shape):
    b = tuple(int(x) for x in block)
    s = tuple(int(x) for x in shape)
    if len(b) != len(s):
        return False                    # Pallas itself rejects this
    if len(b) == 0:
        return True
    if not (b[-1] % 128 == 0 or b[-1] == s[-1]):
        return False
    if len(b) >= 2 and not (b[-2] % 8 == 0 or b[-2] == s[-2]):
        return False
    return True


@pytest.fixture
def spec_auditor(monkeypatch):
    """Patch pl.pallas_call to validate every BlockSpec against the
    actual operand/out shapes; violations collect in the returned list."""
    violations = []
    real_call = pl.pallas_call

    def checked_call(kernel, **kw):
        inner = real_call(kernel, **kw)

        @functools.wraps(inner)
        def run(*args):
            in_specs = kw.get("in_specs") or []
            for k, (spec, a) in enumerate(zip(in_specs, args)):
                if spec.block_shape is not None and \
                        not _block_ok(spec.block_shape, a.shape):
                    violations.append(
                        ("in", k, tuple(spec.block_shape), a.shape))
            outs = kw.get("out_shape")
            outs = outs if isinstance(outs, (list, tuple)) else [outs]
            out_specs = kw.get("out_specs") or []
            out_specs = (out_specs if isinstance(out_specs, (list, tuple))
                         else [out_specs])
            for k, (spec, o) in enumerate(zip(out_specs, outs)):
                if spec.block_shape is not None and \
                        not _block_ok(spec.block_shape, o.shape):
                    violations.append(
                        ("out", k, tuple(spec.block_shape), o.shape))
            return inner(*args)

        return run

    monkeypatch.setattr(pl, "pallas_call", checked_call)
    return violations


DIMS_LR = (321, 1024, 512, 256, 128, 1)
DIMS_HR = (322, 1024, 512, 256, 128, 1)


@pytest.fixture(scope="module")
def params():
    from surs_tpu.models.surface_classifier import SurfaceClassifier
    mlp_lr = SurfaceClassifier(DIMS_LR, res_layers=(2, 3, 4))
    mlp_hr = SurfaceClassifier(DIMS_HR, res_layers=(2, 3, 4))
    p_lr = mlp_lr.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 4, DIMS_LR[0])))["params"]
    p_hr = mlp_hr.init(jax.random.PRNGKey(1),
                       jnp.zeros((1, 4, DIMS_HR[0])))["params"]
    return p_lr, p_hr


def test_rule_rejects_the_round3_regression():
    # the exact shape pair that broke on real TPU: (1, zb*rb) block on
    # a rank-2 (NRp//rb, zb*rb) array
    assert not _block_ok((1, 512), (8, 512))
    # and the shipped fix: rank-3 with the last two dims covering
    assert _block_ok((1, 1, 512), (8, 1, 512))


def test_fused_kernel_blockmaps(params, spec_auditor):
    p_lr, p_hr = params
    rng = np.random.default_rng(0)
    fw = fm.prepare_fused_weights(p_lr, p_hr, DIMS_LR, DIMS_HR)
    x = jnp.asarray(rng.standard_normal((512, 321)).astype(np.float32))
    fm.fused_dual_mlp(x, fw, block_n=512, interpret=True)
    assert spec_auditor == [], spec_auditor


def test_fused_train_kernel_blockmaps(params, spec_auditor):
    p_lr, p_hr = params
    rng = np.random.default_rng(1)
    fw = fm.prepare_fused_weights(p_lr, p_hr, DIMS_LR, DIMS_HR)
    xa = jnp.asarray(rng.standard_normal((512, 321)).astype(np.float32))
    xb = jnp.asarray(rng.standard_normal((512, 321)).astype(np.float32))
    m = jnp.ones((512,), jnp.float32)
    fm.fused_dual_mlp_train(xa, xb, m, fw, block_n=512, interpret=True)
    assert spec_auditor == [], spec_auditor


def test_cols_kernel_blockmaps(params, spec_auditor):
    p_lr, p_hr = params
    rng = np.random.default_rng(2)
    fw = fm.prepare_fused_weights(p_lr, p_hr, DIMS_LR, DIMS_HR,
                                  base_split=(256, 64, 1))
    # production shape family: col_block=8; Z covers both the whole-Z
    # (128) and the z-sub-blocked (512 -> zb=256) grids
    for Z in (128, 512):
        x_lr = jnp.asarray(rng.standard_normal((16, 256)).astype(
            np.float32))
        x_hr = jnp.asarray(rng.standard_normal((16, 64)).astype(
            np.float32))
        zf = jnp.asarray(np.linspace(-1, 1, Z).astype(np.float32))
        fm.fused_dual_mlp_cols(x_lr, x_hr, zf, fw, col_block=8,
                               interpret=True)
    assert spec_auditor == [], spec_auditor


def test_runs_kernel_blockmaps(params, spec_auditor):
    p_lr, p_hr = params
    rng = np.random.default_rng(3)
    fw = fm.prepare_fused_weights(p_lr, p_hr, DIMS_LR, DIMS_HR,
                                  base_split=(256, 64, 1))
    NR, zb = 64, 8
    x_lr = jnp.asarray(rng.standard_normal((NR, 256)).astype(np.float32))
    x_hr = jnp.asarray(rng.standard_normal((NR, 64)).astype(np.float32))
    kf = jnp.asarray(rng.standard_normal((NR,)).astype(np.float32))
    zt = jnp.asarray(np.linspace(-0.3, 0.3, zb).astype(np.float32))
    fm.fused_dual_mlp_runs(x_lr, x_hr, kf, zt, fw, run_block=64,
                           interpret=True)
    assert spec_auditor == [], spec_auditor
