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
    from surs_tpu.config import parse_config, print_config
    from surs_tpu.data import EvalDataset
    from surs_tpu.models import surs_net_from_config
    from surs_tpu.ops.fused_mlp import prepare_fused_weights
    from surs_tpu.ops.point_query import make_fused_query_fn
    from surs_tpu.recon import gen_mesh
    from surs_tpu.compat.torch_import import load_params

    cfg = parse_config()
    print(print_config(cfg))

    dataset = EvalDataset(cfg, phase="test")
    print("test data size:", len(dataset))

    model = surs_net_from_config(cfg)
    params = load_params(cfg, model)

    query_fn = None
    fw = None
    if cfg.use_pallas and jax.default_backend() != "cpu":
        fw = prepare_fused_weights(
            params["mlp_lr"], params["mlp_hr"], cfg.mlp_dim_lr,
            cfg.mlp_dim_hr, cfg.mlp_res_layers_lr, cfg.mlp_res_layers_hr)
        query_fn = make_fused_query_fn(cfg.loadSize, cfg.z_size)

    # optional color branch (netC): --with_color +
    # --load_netC_checkpoint_path (torch or orbax color-net params)
    color_net = color_params = None
    if cfg.with_color and cfg.load_netC_checkpoint_path:
        import jax.numpy as jnp
        import jax as _jax
        from surs_tpu.models.pifu_legacy import ResBlkColorNet
        color_net = ResBlkColorNet(load_size=cfg.loadSize,
                                   mlp_dim_color=tuple(cfg.mlp_dim_color))
        img0 = jnp.zeros((1, cfg.loadSize // 2, cfg.loadSize // 2, 3))
        pts0 = jnp.zeros((1, 3, 8))
        cal0 = jnp.eye(4)[None]
        color_params = _jax.jit(lambda k: color_net.init(
            k, img0, pts0, cal0))(_jax.random.PRNGKey(0))["params"]
        import numpy as _np
        import torch as _torch
        sd = _torch.load(cfg.load_netC_checkpoint_path,
                         map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and any(
                hasattr(v, "detach") for v in sd.values()):
            print("WARNING: torch netC import not name-mapped; "
                  "using random color net")
        else:
            color_params = sd  # orbax/numpy param tree

    out_dir = os.path.join(cfg.results_path, cfg.name)
    os.makedirs(out_dir, exist_ok=True)
    print("generate mesh (test) ...")
    for idx in range(len(dataset)):
        data = dataset[idx]
        save_path = os.path.join(out_dir, f"{data['name']}.obj")
        p_hr, p_lr = gen_mesh(cfg, model, params, data, save_path,
                              use_octree=cfg.use_octree, query_fn=query_fn,
                              query_weights=fw)
        if color_net is not None:
            import jax.numpy as jnp
            from surs_tpu.train.color import colorize_vertices
            from surs_tpu.recon.mesh_io import (load_obj,
                                                save_obj_mesh_with_color)
            verts, faces = load_obj(p_hr)
            rgb = colorize_vertices(
                color_net, color_params, jnp.asarray(data["img_LR"]),
                verts, jnp.asarray(data["calib"]))
            save_obj_mesh_with_color(p_hr[:-4] + "_color.obj", verts,
                                     faces, rgb)
        print("saved", save_path)


if __name__ == "__main__":
    main()
