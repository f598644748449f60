"""Benchmark: occupancy-query throughput + end-to-end mesh time.

Runs the flagship SuRSNet (reference default config: 3 LR hourglass
stacks, residual SR branch, 512 loadSize) with random weights on the
available accelerator, and measures:

  * occupancy queries/sec — fused Pallas point-query path (projection +
    pixel-aligned gather + dual 5-layer MLP) on 50k-point chunks, the
    hot loop of 512^3 reconstruction;
  * sec/mesh — full single-image reconstruction at the configured
    resolution (octree evaluation + marching tetrahedra + OBJ write).

Prints ONE JSON line. vs_baseline compares against the reference
-architecture PyTorch-CPU implementation of the same query chunk
(measured on this host; see BASELINE.md for the procedure and numbers).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

# Measured reference-architecture PyTorch-CPU query throughput on this
# host (BASELINE.md): queries/sec for the identical (grid_sample x2 +
# dual 5-layer MLP) chunk evaluation.
BASELINE_QPS = float(os.environ.get("SURS_BASELINE_QPS", "15811"))


def main():
    import jax
    from surs_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from surs_tpu.config import SuRSConfig
    from surs_tpu.models import SuRSNet, surs_net_from_config
    from surs_tpu.ops.fused_mlp import prepare_fused_weights
    from surs_tpu.ops.point_query import make_fused_query_fn

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)

    if on_tpu:
        cfg = SuRSConfig(loadSize=512, residual=True, resolution=256,
                         num_samples=50000,
                         b_min=[-0.5, -0.5, -0.5], b_max=[0.5, 0.5, 0.5])
        S = cfg.loadSize // 2           # 256^2 LR input
    else:                               # smoke mode for CPU-only runs
        cfg = SuRSConfig(loadSize=64, residual=True, resolution=64,
                         num_samples=4096, octree_init_resolution=16,
                         b_min=[-0.5, -0.5, -0.5], b_max=[0.5, 0.5, 0.5])
        S = cfg.loadSize // 2

    model = surs_net_from_config(cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, S, S, 3)).astype(np.float32))

    t0 = time.time()
    enc = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False,
                                           method=SuRSNet.encode))
    # init only the encode path params lazily via full init on tiny points
    pts0 = jnp.asarray((rng.random((1, 3, 8)) - 0.5).astype(np.float32))
    calib = jnp.asarray(np.diag([2.0, -2.0, 2.0, 1.0]).astype(
        np.float32))[None]
    img_hr0 = jnp.asarray(rng.standard_normal(
        (1, 2 * S, 2 * S, 3)).astype(np.float32))
    init = jax.jit(lambda k: model.init(k, img, img_hr0, pts0, pts0,
                                        calib, train=True))
    params = init(jax.random.PRNGKey(0))["params"]
    _, feats_lr, feat_hr = jax.block_until_ready(enc(params, img))
    t_encode = time.time() - t0
    log(f"encode compiled+ran in {t_encode:.1f}s on {backend}")

    fw = prepare_fused_weights(params["mlp_lr"], params["mlp_hr"],
                               cfg.mlp_dim_lr, cfg.mlp_dim_hr,
                               cfg.mlp_res_layers_lr, cfg.mlp_res_layers_hr)
    query_fn = make_fused_query_fn(cfg.loadSize, cfg.z_size,
                                   use_pallas=on_tpu)

    # ---- queries/sec on 50k chunks (the production query program —
    # shared with the octree evaluator's compile cache) ----
    from surs_tpu.recon.pipeline import Reconstructor
    rec = Reconstructor(model, query_fn=query_fn,
                        feature_dtype=jnp.bfloat16 if on_tpu else None)
    weights = fw if query_fn is not None else params
    chunk = cfg.num_samples
    pts = jnp.asarray((rng.random((3, chunk)) - 0.5).astype(np.float32))

    t0 = time.time()
    jax.block_until_ready(
        rec.query_points(weights, feats_lr, feat_hr, calib, pts))
    log(f"query compiled in {time.time() - t0:.1f}s")

    # ---- primary metric: dense occupancy-query throughput ----
    # one compiled program (fori_loop over 50k chunks) evaluating every
    # point of a fixed R_dense^3 grid — workload-independent, no dispatch
    # or elision artifacts
    R_dense = 128 if on_tpu else 32
    dense_args = (weights, feats_lr, feat_hr, calib_b := np.asarray(calib),
                  R_dense, np.asarray(cfg.b_min), np.asarray(cfg.b_max))
    t0 = time.time()
    d_hr, d_lr, _ = rec.evaluate(*dense_args, use_octree=False,
                                 num_samples=chunk)
    jax.block_until_ready(d_hr)
    log(f"dense eval compiled+ran in {time.time() - t0:.1f}s")
    t0 = time.time()
    d_hr, d_lr, _ = rec.evaluate(*dense_args, use_octree=False,
                                 num_samples=chunk)
    jax.block_until_ready(d_hr)
    t_dense = time.time() - t0
    qps = R_dense ** 3 / t_dense
    log(f"dense qps = {qps:.0f} ({R_dense}^3 points / {t_dense:.2f}s)")

    # ---- end-to-end mesh: device field evaluation (real model) +
    # host marching tetrahedra / OBJ write on a realistic surface.
    # (A random-weight occupancy field hovers at 0.5 everywhere, which
    # would make every cell surface-active — a degenerate MC workload —
    # so the host stages are timed on a sphere of the same resolution.)
    from surs_tpu.recon.marching import extract_isosurface
    from surs_tpu.recon.mesh_io import save_obj_mesh
    t0 = time.time()
    sdf_hr, sdf_lr, mat = rec.evaluate(
        weights, feats_lr, feat_hr,
        calib_b, cfg.resolution, np.asarray(cfg.b_min),
        np.asarray(cfg.b_max), num_samples=cfg.num_samples,
        threshold=cfg.threshold,
        init_resolution=cfg.octree_init_resolution)
    jax.block_until_ready(sdf_hr)
    log(f"field eval (first, incl. compiles) {time.time() - t0:.1f}s")
    t0 = time.time()
    sdf_hr, sdf_lr, mat = rec.evaluate(
        weights, feats_lr, feat_hr,
        calib_b, cfg.resolution, np.asarray(cfg.b_min),
        np.asarray(cfg.b_max), num_samples=cfg.num_samples,
        threshold=cfg.threshold,
        init_resolution=cfg.octree_init_resolution)
    jax.block_until_ready(sdf_hr)
    t_eval = time.time() - t0
    log(f"field eval (steady-state) {t_eval:.2f}s")
    stats = {}
    t0 = time.time()
    sdf_hr, sdf_lr, mat = rec.evaluate(
        weights, feats_lr, feat_hr,
        calib_b, cfg.resolution, np.asarray(cfg.b_min),
        np.asarray(cfg.b_max), num_samples=cfg.num_samples,
        threshold=cfg.threshold,
        init_resolution=cfg.octree_init_resolution, stats_out=stats)
    jax.block_until_ready(sdf_hr)
    t_eval = time.time() - t0
    oct_queries = stats.get("queries", 0)
    log(f"octree: {oct_queries} queries in {t_eval:.2f}s")

    R = cfg.resolution
    g = np.mgrid[:R, :R, :R].astype(np.float32) - (R - 1) / 2
    sphere = 0.5 + (R * 0.35 - np.sqrt((g ** 2).sum(0))).astype(np.float32)
    t0 = time.time()
    verts, faces = extract_isosurface(sphere, 0.5)
    t_mc = time.time() - t0
    with tempfile.TemporaryDirectory() as td:
        t0 = time.time()
        save_obj_mesh(os.path.join(td, "bench.obj"), verts, faces)
        t_obj = time.time() - t0
    # x2: the pipeline extracts and writes both the HR and LR meshes
    t_mesh = t_eval + 2 * (t_mc + t_obj)
    log(f"sec/mesh = {t_mesh:.2f} (eval {t_eval:.2f} + 2x(mc {t_mc:.2f} "
        f"+ obj {t_obj:.2f})), {faces.shape[0]} faces")

    result = {
        "metric": "occupancy_queries_per_sec",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / BASELINE_QPS, 2),
        "extras": {
            "backend": backend,
            "sec_per_mesh": round(t_mesh, 3),
            "resolution": cfg.resolution,
            "encode_sec_first_call": round(t_encode, 3),
            "chunk": chunk,
            "dense_grid": R_dense,
            "octree_queries": oct_queries,
            "octree_eval_sec": round(t_eval, 3),
            "feature_dtype": "bfloat16" if on_tpu else "float32",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
