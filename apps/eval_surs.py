#!/usr/bin/env python
"""Evaluate SuRS-TPU: one OBJ pair per test image.

CLI-compatible with the reference's ``apps/eval_SuRS.py``:

  python apps/eval_surs.py --dataroot <dir with image_final/mask_final> \
      --name exp --load_netG_checkpoint_path <ckpt> --resolution 512 \
      --num_samples 50000 --threshold 0.05
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))



def main():
    import jax
    import jax.numpy as jnp
    from surs_tpu.config import (parse_config, print_config,
                                 resolve_backend_defaults)
    from surs_tpu.data import EvalDataset
    from surs_tpu.models import surs_net_from_config
    from surs_tpu.ops.fused_mlp import prepare_fused_weights
    from surs_tpu.ops.point_query import make_fused_query_fn
    from surs_tpu.recon.pipeline import _get_reconstructor
    from surs_tpu.compat.torch_import import load_params

    # pin the 'auto' performance knobs for the live backend: a stock TPU
    # run takes the fast paths (bf16 packed features, mono octree,
    # device marching cubes) — the flags are opt-outs
    cfg = resolve_backend_defaults(parse_config())
    print(print_config(cfg))

    dataset = EvalDataset(cfg, phase="test")
    print("test data size:", len(dataset))

    model = surs_net_from_config(cfg)
    params = load_params(cfg, model)

    query_fn = None
    fw = cols_w = None
    pack = bool(getattr(cfg, "feature_pack", False))
    fdt = jnp.bfloat16 \
        if getattr(cfg, "feature_dtype", "float32") == "bfloat16" else None
    kdt = jnp.bfloat16 if fdt is not None else jnp.float32
    if cfg.use_pallas and jax.default_backend() != "cpu":
        base_split = (cfg.hg_dim, cfg.mlp_dim_lr[0] - cfg.hg_dim) \
            if pack else None
        fw = prepare_fused_weights(
            params["mlp_lr"], params["mlp_hr"], cfg.mlp_dim_lr,
            cfg.mlp_dim_hr, cfg.mlp_res_layers_lr, cfg.mlp_res_layers_hr,
            dtype=kdt, base_split=base_split)
        query_fn = make_fused_query_fn(cfg.loadSize, cfg.z_size,
                                       packed=pack)
        if not cfg.use_octree:
            # --no_use_octree: dense evaluation takes the column-shared
            # kernel whenever the calib is axis-aligned (recon/
            # evaluator.eval_grid_dense_cols, ~3.8x fewer MACs/query)
            from surs_tpu.ops.fused_mlp import prepare_cols_weights
            cols_w = prepare_cols_weights(
                params["mlp_lr"], params["mlp_hr"], cfg=cfg, dtype=kdt)
    else:
        pack = False
    if cols_w is None and cfg.use_octree \
            and getattr(cfg, "octree_mode", "hostloop") == "runs":
        # --octree_mode runs: dirty-column-window octree evaluation
        # (recon/evaluator_runs.py; falls back to mono off the
        # separable-calib geometry). Works on CPU via the XLA twin.
        from surs_tpu.ops.fused_mlp import prepare_cols_weights
        cols_w = prepare_cols_weights(
            params["mlp_lr"], params["mlp_hr"], cfg=cfg, dtype=kdt)

    rec = _get_reconstructor(
        model, query_fn, feature_dtype=fdt, feature_pack=pack,
        octree_mode=getattr(cfg, "octree_mode", "hostloop"),
        cols_weights=cols_w, load_size=cfg.loadSize, z_size=cfg.z_size)
    weights = fw if fw is not None else params

    # optional color branch (netC): --with_color +
    # --load_netC_checkpoint_path. A torch netC checkpoint (reference
    # ResBlkPIFuNet) imports strictly into RefColorNet — an unmappable
    # checkpoint is an ERROR, never a silent random color net. A
    # directory/param tree loads into the framework-native ResBlkColorNet.
    color_net = color_params = None
    color_is_ref = False
    if cfg.with_color and cfg.load_netC_checkpoint_path:
        import torch as _torch
        from surs_tpu.models.pifu_legacy import ResBlkColorNet, RefColorNet
        sd = _torch.load(cfg.load_netC_checkpoint_path,
                         map_location="cpu", weights_only=False)
        is_torch_sd = isinstance(sd, dict) and any(
            hasattr(v, "detach") for v in sd.values())
        if is_torch_sd:
            from surs_tpu.compat.torch_import import \
                import_torch_color_state_dict
            color_is_ref = True
            color_net = RefColorNet(
                load_size=cfg.loadSize,
                mlp_dim_color=tuple(cfg.mlp_dim_color))
            shapes = jax.eval_shape(
                lambda k, a, b, c, d: color_net.init(k, a, b, c, d),
                jax.random.PRNGKey(0),
                jax.ShapeDtypeStruct(
                    (1, cfg.loadSize // 2, cfg.loadSize // 2, 3),
                    jnp.float32),
                jax.ShapeDtypeStruct(
                    (1, cfg.loadSize // 4, cfg.loadSize // 4, cfg.hg_dim),
                    jnp.float32),
                jax.ShapeDtypeStruct((1, 3, 8), jnp.float32),
                jax.ShapeDtypeStruct((1, 4, 4), jnp.float32))["params"]
            zeros = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes)
            color_params, n = import_torch_color_state_dict(
                sd, zeros, strict=True)
            print(f"imported {n} netC tensors (reference ResBlkPIFuNet)")
        else:
            color_net = ResBlkColorNet(
                load_size=cfg.loadSize,
                mlp_dim_color=tuple(cfg.mlp_dim_color))
            color_params = sd  # orbax/numpy param tree

    out_dir = os.path.join(cfg.results_path, cfg.name)
    os.makedirs(out_dir, exist_ok=True)
    print("generate mesh (test) ...")
    for idx in range(len(dataset)):
        data = dataset[idx]
        save_path = os.path.join(out_dir, f"{data['name']}.obj")
        p_hr, p_lr = rec.gen_mesh(cfg, params, weights, data, save_path,
                                  use_octree=cfg.use_octree)
        if color_net is not None:
            from surs_tpu.train.color import (colorize_vertices,
                                              colorize_vertices_ref)
            from surs_tpu.recon.mesh_io import (load_obj,
                                                save_obj_mesh_with_color)
            verts, faces = load_obj(p_hr)
            if verts.shape[0] == 0:
                print(f"empty HR mesh for {data['name']} — skip color")
            else:
                img = jnp.asarray(data["img_LR"])
                if color_is_ref:
                    _, feats_lr, _ = rec.encode(params, img)
                    rgb = colorize_vertices_ref(
                        color_net, color_params, img, feats_lr[-1], verts,
                        jnp.asarray(data["calib"]))
                else:
                    rgb = colorize_vertices(
                        color_net, color_params, img, verts,
                        jnp.asarray(data["calib"]))
                save_obj_mesh_with_color(p_hr[:-4] + "_color.obj", verts,
                                         faces, rgb)
        print("saved", save_path)


if __name__ == "__main__":
    main()
