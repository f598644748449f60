"""Key-complete torch checkpoint import proof at the REAL config.

The fixture ``tests/fixtures/ref_netG_state_spec.json`` records every
state-dict key (and shape) a reference ``torch SuRSNet(opt)`` emits at
the default/README config (3 LR stacks + 1 HR stack, hg_depth 2, group
norm, residual SR n_block [2,2,2], loadSize 512) — generated once by
``tools/gen_ref_state_spec.py`` from the read-only reference mount,
including the dead parameters the reference constructs but never uses
(lib/model/HGFilters.py:133-152, lib/model/SuRSSR_v3.py:39-40).

Proven here:
  (i)   every reference key either imports or matches a documented
        drop pattern — zero unexpected-unmapped keys;
  (ii)  every live leaf of OUR full-config param tree is written by the
        import — zero silently-random leaves;
  (iii) a fixed input produces identical occupancy through an
        independent torch re-implementation of one query
        (lib/geometry.py:4-31, lib/model/DepthNormalizer.py:11-19,
        lib/model/SurfaceClassifier.py:45-79, lib/model/SuRSNet.py:
        131-187).
"""

import json
import os
import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from surs_tpu.models import SuRSNet
from surs_tpu.compat import import_torch_state_dict
from surs_tpu.compat.torch_import import (_DROP_PATTERNS, _flax_path,
                                          _is_dead_bn4)

SPEC_PATH = os.path.join(os.path.dirname(__file__), "fixtures",
                         "ref_netG_state_spec.json")


def load_spec():
    with open(SPEC_PATH) as f:
        return json.load(f)


def make_synthetic_sd(spec, seed=7):
    rng = np.random.default_rng(seed)
    return {k: (rng.standard_normal(shape).astype(np.float32) * 0.05
                + 0.01)
            for k, shape in spec.items()}


def full_model_and_zero_params():
    """Full reference config; params as a zeros tree (shapes via
    eval_shape — no compute), so 'leaf changed' == 'leaf nonzero'."""
    model = SuRSNet(residual=True, load_size=512)
    S = 256
    img = jax.ShapeDtypeStruct((1, S, S, 3), jnp.float32)
    img_hr = jax.ShapeDtypeStruct((1, 2 * S, 2 * S, 3), jnp.float32)
    pts = jax.ShapeDtypeStruct((1, 3, 8), jnp.float32)
    calib = jax.ShapeDtypeStruct((1, 4, 4), jnp.float32)
    shapes = jax.eval_shape(
        lambda k, a, b, p, q, c: model.init(k, a, b, p, q, c, train=True),
        jax.random.PRNGKey(0), img, img_hr, pts, pts, calib)["params"]
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    return model, params


def test_spec_fixture_is_full_config():
    spec = load_spec()
    assert len(spec) == 553
    # the dead reference weights are present in the fixture
    assert "image_filter_lr.conv1.weight" in spec
    assert "image_filter_hr.m0.b1_1.conv1.weight" in spec  # dead hr stack
    assert "super_resolution.sub_mean.weight" in spec
    # full config markers: 3 LR stacks, residual SR bodies
    assert "image_filter_lr.m2.b1_2.conv1.weight" in spec
    assert "super_resolution.body3.1.body.2.weight" in spec
    # MLP dims at the real config
    assert spec["mlp_lr.conv0.weight"] == [1024, 321, 1]
    assert spec["mlp_hr.conv0.weight"] == [1024, 322, 1]
    assert spec["mlp_lr.conv2.weight"] == [256, 512 + 321, 1]  # res concat


def test_every_reference_key_mapped_or_documented_drop():
    """(i) zero unexpected-unmapped keys at the full config."""
    spec = load_spec()
    unmapped = []
    dropped = mapped = ignored = 0
    for key in spec:
        if _is_dead_bn4(key, spec):
            dropped += 1
        elif _flax_path(key) is not None:
            mapped += 1
        elif any(re.search(p, key) for p in _DROP_PATTERNS):
            dropped += 1
        elif key.endswith("num_batches_tracked"):
            ignored += 1
        else:
            unmapped.append(key)
    assert not unmapped, f"unexpected unmapped keys: {unmapped[:20]}"
    assert mapped + dropped + ignored == len(spec)
    assert mapped > 300 and dropped > 100  # sanity on the split


def test_full_config_import_covers_every_live_leaf():
    """(ii) strict import succeeds and writes every leaf of the tree."""
    spec = load_spec()
    sd = make_synthetic_sd(spec)
    model, zeros = full_model_and_zero_params()
    params, n = import_torch_state_dict(sd, zeros, strict=True)
    mapped = sum(_flax_path(k) is not None and not _is_dead_bn4(k, spec)
                 for k in spec)
    assert n == mapped

    untouched = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if float(jnp.abs(leaf).max()) == 0.0:
            untouched.append(jax.tree_util.keystr(path))
    assert not untouched, (
        f"live leaves not covered by the reference checkpoint: "
        f"{untouched[:20]}")


def torch_reference_query(sd, feat_lr_nchw, feat_hr_nchw, points, calib,
                          load_size=512, z_size=200.0,
                          res_layers=(2, 3, 4)):
    """Independent torch re-implementation of one inference query.

    Mirrors lib/geometry.py:4-31 (orthogonal + grid_sample), lib/model/
    DepthNormalizer.py:11-19, lib/model/SurfaceClassifier.py:45-79 and
    the query_mr/query_sr wiring of lib/model/SuRSNet.py:131-187.
    Returns (pred_hr [B,N], pred_lr [B,N]) numpy.
    """
    import torch
    import torch.nn.functional as F

    with torch.no_grad():
        pts = torch.baddbmm(calib[:, :3, 3:4], calib[:, :3, :3], points)
        xy = pts[:, :2, :]
        z = pts[:, 2:3, :]
        in_img = ((xy[:, 0] >= -1.0) & (xy[:, 0] <= 1.0)
                  & (xy[:, 1] >= -1.0) & (xy[:, 1] <= 1.0))
        z_feat = z * (load_size // 2) / z_size

        def index(feat, uv):
            uv2 = uv.transpose(1, 2).unsqueeze(2)          # [B,N,1,2]
            s = F.grid_sample(feat, uv2, mode="bilinear",
                              padding_mode="zeros", align_corners=True)
            return s[:, :, :, 0]                           # [B,C,N]

        pf = torch.cat([index(feat_lr_nchw, xy),
                        index(feat_hr_nchw, xy), z_feat], 1)

        def mlp(prefix, x):
            y = x
            n_layers = 5
            for i in range(n_layers):
                w = torch.as_tensor(sd[f"{prefix}.conv{i}.weight"])
                b = torch.as_tensor(sd[f"{prefix}.conv{i}.bias"])
                inp = torch.cat([y, x], 1) if i in res_layers else y
                y = F.conv1d(inp, w, b)
                if i < n_layers - 1:
                    y = F.leaky_relu(y)
            return torch.sigmoid(y)

        pred_lr = in_img[:, None].float() * mlp("mlp_lr", pf)
        pf_hr = torch.cat([pf, pred_lr], 1)
        pred_hr = in_img[:, None].float() * mlp("mlp_hr", pf_hr)
    return pred_hr[:, 0].numpy(), pred_lr[:, 0].numpy()


def test_imported_query_matches_torch_reference():
    """(iii) numerical parity of one query through imported weights."""
    torch = pytest.importorskip("torch")
    spec = load_spec()
    sd = make_synthetic_sd(spec)
    model, zeros = full_model_and_zero_params()
    params, _ = import_torch_state_dict(sd, zeros, strict=True)

    rng = np.random.default_rng(3)
    # feature maps at the real eval shapes (loadSize 512: f_lr@128, f_hr@512
    # would be slow on CPU — spatially smaller maps exercise identical math)
    feat_lr = rng.standard_normal((1, 24, 24, 256)).astype(np.float32)
    feat_hr = rng.standard_normal((1, 48, 48, 64)).astype(np.float32)
    points = (rng.random((1, 3, 512)).astype(np.float32) - 0.5) * 1.2
    calib = np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32)[None]

    got_hr, got_lr = jax.jit(
        lambda p, fl, fh, pts, cal: model.apply(
            {"params": p}, [fl], fh, pts, cal, method=SuRSNet.query)
    )(params, jnp.asarray(feat_lr), jnp.asarray(feat_hr),
      jnp.asarray(points), jnp.asarray(calib))

    ref_hr, ref_lr = torch_reference_query(
        sd, torch.as_tensor(feat_lr.transpose(0, 3, 1, 2)),
        torch.as_tensor(feat_hr.transpose(0, 3, 1, 2)),
        torch.as_tensor(points), torch.as_tensor(calib))

    np.testing.assert_allclose(np.asarray(got_lr), ref_lr, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_hr), ref_hr, atol=2e-5)


# ---------------------------------------------------------------------------
# netC (color branch) import proof: reference ResBlkPIFuNet checkpoints
# -> models.pifu_legacy.RefColorNet, pinned by the generated key spec
# (tools/gen_ref_netc_spec.py) and a torch re-implementation.

NETC_SPEC_PATH = os.path.join(os.path.dirname(__file__), "fixtures",
                              "ref_netC_state_spec.json")


def test_netc_import_covers_every_leaf():
    from surs_tpu.models.pifu_legacy import RefColorNet
    from surs_tpu.compat.torch_import import import_torch_color_state_dict
    with open(NETC_SPEC_PATH) as f:
        spec = json.load(f)
    assert len(spec) == 40  # convs only: instance norm is affine-free
    sd = make_synthetic_sd(spec, seed=11)

    net = RefColorNet(load_size=32)
    img = jax.ShapeDtypeStruct((1, 16, 16, 3), jnp.float32)
    feat = jax.ShapeDtypeStruct((1, 8, 8, 256), jnp.float32)
    pts = jax.ShapeDtypeStruct((1, 3, 8), jnp.float32)
    calib = jax.ShapeDtypeStruct((1, 4, 4), jnp.float32)
    shapes = jax.eval_shape(
        lambda k, a, b, c, d: net.init(k, a, b, c, d),
        jax.random.PRNGKey(0), img, feat, pts, calib)["params"]
    zeros = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    params, n = import_torch_color_state_dict(sd, zeros, strict=True)
    assert n == len(spec)
    untouched = [jax.tree_util.keystr(p)
                 for p, leaf in jax.tree_util.tree_flatten_with_path(
                     params)[0]
                 if float(jnp.abs(leaf).max()) == 0.0]
    assert not untouched, untouched[:10]


def test_netc_import_refuses_unknown_keys():
    from surs_tpu.compat.torch_import import import_torch_color_state_dict
    with pytest.raises(KeyError):
        import_torch_color_state_dict(
            {"image_filter.model.2.weight": np.zeros(64, np.float32)},
            {}, strict=True)


def test_netc_query_matches_torch_reference():
    """Imported netC produces the same colors as an independent torch
    re-implementation of ResBlkPIFuNet (filter ResBlkPIFuNet.py:150-200,
    attach+query :46-75, instance norm affine-free)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from surs_tpu.models.pifu_legacy import RefColorNet
    from surs_tpu.compat.torch_import import import_torch_color_state_dict

    with open(NETC_SPEC_PATH) as f:
        spec = json.load(f)
    sd = make_synthetic_sd(spec, seed=13)

    load_size, z_size = 32, 200.0
    net = RefColorNet(load_size=load_size)
    rng = np.random.default_rng(5)
    img = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    gfeat = rng.standard_normal((1, 8, 8, 256)).astype(np.float32)
    points = (rng.random((1, 3, 64)).astype(np.float32) - 0.5) * 1.2
    calib = np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32)[None]

    shapes = jax.eval_shape(
        lambda k, a, b, c, d: net.init(k, a, b, c, d),
        jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(gfeat),
        jnp.asarray(points), jnp.asarray(calib))["params"]
    zeros = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    params, _ = import_torch_color_state_dict(sd, zeros, strict=True)

    got = np.asarray(jax.jit(
        lambda p, a, b, c, d: net.apply({"params": p}, a, b, c, d))(
        params, jnp.asarray(img), jnp.asarray(gfeat),
        jnp.asarray(points), jnp.asarray(calib)))

    with torch.no_grad():
        t = lambda k: torch.as_tensor(sd[k])
        h = torch.as_tensor(img.transpose(0, 3, 1, 2))
        h = F.pad(h, (3, 3, 3, 3), mode="reflect")
        h = F.conv2d(h, t("image_filter.model.1.weight"),
                     t("image_filter.model.1.bias"))
        h = F.relu(F.instance_norm(h))
        for i, idx in enumerate((4, 7)):
            h = F.conv2d(h, t(f"image_filter.model.{idx}.weight"),
                         t(f"image_filter.model.{idx}.bias"),
                         stride=2, padding=1)
            h = F.relu(F.instance_norm(h))
        for i in range(6):
            b = F.pad(h, (1, 1, 1, 1), mode="reflect")
            b = F.conv2d(b, t(f"image_filter.model.{10+i}.conv_block.1.weight"),
                         t(f"image_filter.model.{10+i}.conv_block.1.bias"))
            b = F.relu(F.instance_norm(b))
            b = F.pad(b, (1, 1, 1, 1), mode="reflect")
            b = F.conv2d(b, t(f"image_filter.model.{10+i}.conv_block.5.weight"),
                         t(f"image_filter.model.{10+i}.conv_block.5.bias"))
            if i < 5:
                b = F.instance_norm(b)
            h = h + b
        own = h

        cal = torch.as_tensor(calib)
        pts = torch.baddbmm(cal[:, :3, 3:4], cal[:, :3, :3],
                            torch.as_tensor(points))
        xy = pts[:, :2, :]
        z_feat = pts[:, 2:3, :] * (load_size // 2) / z_size

        def index(feat, uv):
            uv2 = uv.transpose(1, 2).unsqueeze(2)
            s = F.grid_sample(feat, uv2, mode="bilinear",
                              padding_mode="zeros", align_corners=True)
            return s[:, :, :, 0]

        pf = torch.cat([index(torch.as_tensor(
            gfeat.transpose(0, 3, 1, 2)), xy), index(own, xy), z_feat], 1)
        y = pf
        for i in range(5):
            y = F.conv1d(y, t(f"surface_classifier.conv{i}.weight"),
                         t(f"surface_classifier.conv{i}.bias"))
            if i < 4:
                y = F.leaky_relu(y)
        ref = torch.tanh(y).transpose(1, 2).numpy()

    np.testing.assert_allclose(got, ref, atol=3e-5)
