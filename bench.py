"""Benchmark: occupancy-query throughput + end-to-end mesh time.

Runs the flagship SuRSNet (reference default config: 3 LR hourglass
stacks, residual SR branch, 512 loadSize) with random weights on the
available accelerator, and measures:

  * occupancy queries/sec — fused Pallas point-query path (projection +
    packed single-gather pixel-aligned sampling + dual 5-layer MLP),
    measured as ONE dense 512^3 field evaluation (134M queries) — the
    hot loop of 512^3 reconstruction, label and measurement agree;
  * sec/mesh — ONE measured wall-clock `Reconstructor.gen_mesh` call at
    the REFERENCE OPERATING POINT (resolution 512, lib/options.py:55):
    encode + mono-octree field evaluation + device marching cubes +
    both OBJ writes, exploiting the pipeline's extract/transfer/write
    overlap (recon/pipeline.extract_pair) — not a sum of stage times;
  * train_step_ms — steady-state full train step (fused Pallas vs XLA
    query stage) at the reference train config, device-side chained.

Timing discipline (see CLAUDE.md): this backend's block_until_ready can
return before the dispatch queue is flushed, so every timing ends in a
scalar FETCH; throughput loops are single compiled fori/scan programs.

Prints ONE JSON line. vs_baseline compares against the reference
-architecture PyTorch-CPU implementation of the same query chunk
(measured on this host; see BASELINE.md for the procedure and numbers).
If benchmarks/subject_demo.py has produced a trained-subject record
(BENCH_subject.json), its measured trained-weight numbers are carried
in extras.trained_subject (mask_prune's production win shows there;
random-weight fields mostly prune themselves).
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


def probe_device(timeout_s: int = 900) -> bool:
    """Fail fast with a clear message instead of hanging forever when
    the remote-TPU tunnel is down (observed: a dead tunnel blocks the
    first device op indefinitely, with no exception). A trivial jit op
    runs in a watchdog subprocess: a healthy-but-cold service answers
    in seconds-to-minutes, a dead tunnel never answers. Skip with
    SURS_BENCH_PROBE=0 or under a forced-CPU run."""
    if os.environ.get("SURS_BENCH_PROBE", "1") == "0" \
            or os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return True
    import subprocess
    code = ("import jax, jax.numpy as jnp;"
            "print(float(jax.jit(lambda a: a*2)(jnp.ones((8,8))).sum()))")
    log(f"probing device reachability (watchdog {timeout_s}s)...")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=timeout_s, capture_output=True)
        ok = r.returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    if not ok:
        log("DEVICE UNREACHABLE: the probe op did not complete — the "
            "remote TPU tunnel appears down. Refusing to start a bench "
            "that would hang; re-run when the device answers "
            "(SURS_BENCH_PROBE=0 skips this probe).")
    return ok


REPO = os.path.dirname(os.path.abspath(__file__))


# Sources a record must match per record kind. gen_mesh's path is
# encode (models) + query (ops) + octree/extract/write (recon) +
# config defaults — a train-loop- or data-only commit does NOT stale a
# reconstruction record (VERDICT r4 weak #2).
GEN_MESH_PATHS = ("surs_tpu/recon", "surs_tpu/ops", "surs_tpu/models",
                  "surs_tpu/config.py")
TRAIN_PATHS = GEN_MESH_PATHS + ("surs_tpu/train", "surs_tpu/data")
ALL_PATHS = ("surs_tpu", "apps")


def record_staleness(commit: str, paths=ALL_PATHS) -> str:
    """'' when a benchmark record taken at ``commit`` still describes
    the shipping pipeline, else a reason string. Fresh means: the
    commit is known to this repo AND nothing under the record's
    pipeline sources changed between it and the current working tree —
    lineage alone is not enough (every past commit is an ancestor;
    what goes stale is the code the record measured)."""
    import subprocess

    def git(*args):
        return subprocess.run(["git", *args], cwd=REPO,
                              capture_output=True, text=True)
    if not commit:
        return "no git_commit in record"
    if git("rev-parse", "--verify", f"{commit}^{{commit}}").returncode:
        return f"unknown commit {commit}"
    # diff against the WORKING TREE (not HEAD): uncommitted pipeline
    # edits stale a record just as surely as committed ones
    d = git("diff", "--quiet", commit, "--", *paths)
    if d.returncode:
        return f"pipeline sources changed since {commit}"
    return ""


def load_record(name: str, log, check_commit: bool = True,
                paths=ALL_PATHS):
    """Load a benchmark record JSON from the repo root, annotating it
    with staleness against the current tree. Returns None if absent.
    ``check_commit=False`` skips the staleness gate for records whose
    measured pipeline lives outside this tree (the torch-CPU baseline)."""
    path = os.path.join(REPO, name)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            rec = json.load(f)
    except Exception:  # noqa: BLE001
        return None
    if check_commit:
        reason = record_staleness(rec.get("git_commit", ""), paths)
        if reason:
            rec["stale"] = reason
            log(f"{name}: STALE record ({reason})")
    rec["_file"] = name
    return rec


def slim(rec, keys):
    """Compact summary of a sub-record for the printed JSON line: the
    source filename, the named scalar keys, and the stale flag if set.
    The full record stays on disk (its own file + BENCH_full.json) —
    the printed line must stay well under the driver's tail capture
    (VERDICT r4 weak #1)."""
    if rec is None:
        return None
    out = {"file": rec.get("_file")}
    for k in keys:
        if rec.get(k) is not None:
            v = rec[k]
            out[k] = round(v, 4) if isinstance(v, float) else v
    if rec.get("stale"):
        out["stale"] = True
    return out


def main():
    if not probe_device():
        sys.exit(2)
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
        cfg = SuRSConfig(loadSize=512, residual=True, resolution=512,
                         num_samples=262144,
                         feature_dtype="bfloat16", feature_pack=True,
                         octree_mode="mono", mc_backend="auto",
                         mc_algorithm="cubes", mask_prune=True,
                         b_min=[-0.5, -0.5, -0.5], b_max=[0.5, 0.5, 0.5])
        S = cfg.loadSize // 2           # 256^2 LR input
    else:                               # smoke mode for CPU-only runs
        cfg = SuRSConfig(loadSize=64, residual=True, resolution=64,
                         num_samples=4096, octree_init_resolution=16,
                         feature_dtype="float32", feature_pack=False,
                         octree_mode="hostloop", mc_backend="host",
                         mc_algorithm="tets", mask_prune=True,
                         b_min=[-0.5, -0.5, -0.5], b_max=[0.5, 0.5, 0.5])
        S = cfg.loadSize // 2

    model = surs_net_from_config(cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, S, S, 3)).astype(np.float32))

    def fetch(x):
        """Reliable sync: materialize a scalar on the host."""
        return float(jnp.asarray(x).reshape(-1)[0])

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
    _, feats_lr, feat_hr = enc(params, img)
    fetch(feat_hr[0, 0, 0, 0])
    t_encode = time.time() - t0
    log(f"encode compiled+ran in {t_encode:.1f}s on {backend}")

    # packed single-gather query path: weights split (C_lr, C_hr + 1)
    base_split = (cfg.hg_dim, cfg.mlp_dim_lr[0] - cfg.hg_dim) \
        if on_tpu else None
    fw = prepare_fused_weights(params["mlp_lr"], params["mlp_hr"],
                               cfg.mlp_dim_lr, cfg.mlp_dim_hr,
                               cfg.mlp_res_layers_lr,
                               cfg.mlp_res_layers_hr,
                               dtype=jnp.bfloat16 if on_tpu
                               else jnp.float32,
                               base_split=base_split)
    query_fn = make_fused_query_fn(cfg.loadSize, cfg.z_size,
                                   use_pallas=on_tpu, packed=on_tpu)

    from surs_tpu.recon.pipeline import Reconstructor
    # column-shared dense weights (base_split (C_lr, C_hr, 1)): the
    # dense evaluator's fast path (evaluator.eval_grid_dense_cols)
    from surs_tpu.ops.fused_mlp import prepare_cols_weights
    fw3 = prepare_cols_weights(
        params["mlp_lr"], params["mlp_hr"], cfg=cfg,
        dtype=jnp.bfloat16) if on_tpu else None
    rec = Reconstructor(model, query_fn=query_fn,
                        feature_dtype=jnp.bfloat16 if on_tpu else None,
                        feature_pack=on_tpu,
                        cols_weights=fw3, load_size=cfg.loadSize,
                        z_size=cfg.z_size)
    # mono mode runs the whole octree schedule as ONE program — the
    # timed production path; hostloop provides the query-count stats
    # (one compiled chunk program, host-driven)
    rec_fused = Reconstructor(model, query_fn=query_fn,
                              octree_mode="mono" if on_tpu
                              else "hostloop",
                              feature_dtype=jnp.bfloat16 if on_tpu
                              else None,
                              feature_pack=on_tpu) if on_tpu else rec
    weights = fw
    chunk = cfg.num_samples
    pts = jnp.asarray((rng.random((3, min(chunk, 50000))) - 0.5)
                      .astype(np.float32))

    t0 = time.time()
    q_hr, _ = rec.query_points(weights, feats_lr, feat_hr, calib, pts)
    fetch(q_hr[0])
    log(f"query compiled in {time.time() - t0:.1f}s")

    # ---- primary metric: dense occupancy-query throughput at 512^3 ----
    # one compiled program (fori_loop over chunks) evaluating every
    # point of the full resolution^3 grid — the metric's label and its
    # measurement agree (VERDICT r2 #8)
    R_dense = cfg.resolution
    dense_args = (weights, feats_lr, feat_hr, calib_b := np.asarray(calib),
                  R_dense, np.asarray(cfg.b_min), np.asarray(cfg.b_max))
    t0 = time.time()
    d_hr, d_lr, _ = rec.evaluate(*dense_args, use_octree=False,
                                 num_samples=chunk)
    fetch(d_hr[0, 0, 0])
    log(f"dense eval compiled+ran in {time.time() - t0:.1f}s")
    t_dense = 1e30
    for _ in range(2):
        t0 = time.time()
        d_hr, d_lr, _ = rec.evaluate(*dense_args, use_octree=False,
                                     num_samples=chunk)
        fetch(d_hr[0, 0, 0])
        t_dense = min(t_dense, time.time() - t0)
    del d_hr, d_lr
    qps = R_dense ** 3 / t_dense
    log(f"dense qps = {qps:.0f} ({R_dense}^3 points / {t_dense:.2f}s)")

    # generic (per-point packed-gather) path for the delta story —
    # rec_fused has no cols weights so it takes the per-point evaluator
    qps_generic = None
    if on_tpu:
        t0 = time.time()
        g_hr, _, _ = rec_fused.evaluate(*dense_args, use_octree=False,
                                        num_samples=chunk)
        fetch(g_hr[0, 0, 0])
        t0 = time.time()
        g_hr, _, _ = rec_fused.evaluate(*dense_args, use_octree=False,
                                        num_samples=chunk)
        fetch(g_hr[0, 0, 0])
        qps_generic = R_dense ** 3 / (time.time() - t0)
        del g_hr
        log(f"dense qps [generic per-point path] = {qps_generic:.0f}")

    # ---- octree field evaluation at the reference operating point ----
    def timed_eval(label, silhouette=None):
        stats = {}
        kw = dict(num_samples=cfg.num_samples, threshold=cfg.threshold,
                  init_resolution=cfg.octree_init_resolution,
                  silhouette=silhouette)
        # query counts from the hostloop evaluator (identical fields)
        sdf_hr, sdf_lr, mat = rec.evaluate(
            weights, feats_lr, feat_hr, calib_b, cfg.resolution,
            np.asarray(cfg.b_min), np.asarray(cfg.b_max),
            stats_out=stats, **kw)
        fetch(sdf_hr[0, 0, 0])
        queries = stats.get("queries", 0)
        # timing from the fused evaluator (one program per level)
        t0 = time.time()
        sdf_hr, sdf_lr, mat = rec_fused.evaluate(
            weights, feats_lr, feat_hr, calib_b, cfg.resolution,
            np.asarray(cfg.b_min), np.asarray(cfg.b_max), **kw)
        fetch(sdf_hr[0, 0, 0])
        t_first = time.time() - t0
        t_best = 1e30
        for _ in range(2):
            t0 = time.time()
            sdf_hr, sdf_lr, mat = rec_fused.evaluate(
                weights, feats_lr, feat_hr, calib_b, cfg.resolution,
                np.asarray(cfg.b_min), np.asarray(cfg.b_max), **kw)
            fetch(sdf_hr[0, 0, 0])
            t_best = min(t_best, time.time() - t0)
        log(f"octree eval [{label}]: first {t_first:.1f}s, steady "
            f"{t_best:.2f}s, {queries} queries")
        return t_best, queries

    t_eval, oct_queries = timed_eval("random weights, no pruning")
    # mask_prune: a centered disc silhouette (visual-hull pre-pruning).
    # NOTE: random-weight fields largely prune themselves (the octree
    # already skips far-from-surface blocks), so the query deltas here
    # UNDERSTATE mask_prune's production value — the trained-subject
    # record (extras.trained_subject) is the demonstration that counts.
    Sm = cfg.loadSize // 2
    yy, xx = np.mgrid[:Sm, :Sm].astype(np.float32)
    disc = ((((xx - Sm / 2) ** 2 + (yy - Sm / 2) ** 2)
             < (0.35 * Sm) ** 2)).astype(np.float32)
    t_eval_mask, oct_queries_mask = timed_eval(
        "random weights + mask_prune", silhouette=jnp.asarray(disc))

    # ---- sec/mesh: ONE measured gen_mesh wall call (VERDICT r2 #1) ----
    # encode + octree eval + isosurface x2 + OBJ write x2 through the
    # production pipeline, with the extract/transfer/write overlap live.
    #
    # A random-weight field is a DEGENERATE extraction workload: its
    # occupancy hovers at 0.5, so the visual-hull boundary plus the
    # smooth zero-logit sheet yield millions of faces (an un-masked
    # 512^3 random field can grind host-fallback extraction for
    # minutes). The in-run number below is therefore an UPPER BOUND;
    # the representative single-call wall figure is the trained-weight
    # record (extras.trained_subject.gen_mesh_wall_sec, produced by
    # benchmarks/subject_demo.py on this same rig), which extras
    # surface as sec_per_mesh when present.
    img_np = np.asarray(img)
    data = {"img_LR": img_np, "mask_LR": disc[..., None],
            "b_min": np.asarray(cfg.b_min), "b_max": np.asarray(cfg.b_max)}
    faces_total = {}

    def timed_gen_mesh(label, d, reps=2):
        best = 1e30
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "bench.obj")
            rec_fused.gen_mesh(cfg, params, weights, d, p)     # warm
            for _ in range(reps):
                t0 = time.time()
                p_hr, p_lr = rec_fused.gen_mesh(cfg, params, weights, d, p)
                best = min(best, time.time() - t0)
            from surs_tpu.recon.mesh_io import load_obj
            _, fhr = load_obj(p_hr)
            faces_total[label] = int(fhr.shape[0])
        log(f"gen_mesh [{label}]: {best:.2f}s wall "
            f"({faces_total[label]} HR faces)")
        return best

    t_mesh_random = timed_gen_mesh("mask_prune random-weight", data)

    # ---- isosurface extraction stage timings on a realistic surface
    # (comparable across rounds; a human-shaped ~200k-active-cell field)
    if on_tpu:
        from surs_tpu.utils.synth import humanoid_volume
        from surs_tpu.recon.tetra_device import (
            marching_tetrahedra_device, marching_tetrahedra_device_begin)
        svol = humanoid_volume(cfg.resolution)
        fetch(svol[0, 0, 0])
        t_by_algo = {}
        for algo in ("tets", "cubes"):
            marching_tetrahedra_device(svol, 0.5, algorithm=algo)
            t_mc_a = t_dev_a = 1e30
            nf = 0
            for _ in range(2):
                t0 = time.time()
                fin = marching_tetrahedra_device_begin(svol, 0.5,
                                                       algorithm=algo)
                t_d = time.time() - t0   # device compute + counts
                verts, faces = fin()     # host-link transfer + decode
                t_mc_a = min(t_mc_a, time.time() - t0)
                t_dev_a = min(t_dev_a, t_d)
                nf = faces.shape[0]
            t_by_algo[algo] = (t_mc_a, t_dev_a, nf)
            log(f"device MC [{algo}]: {t_mc_a:.2f}s total "
                f"({t_dev_a:.2f}s device), {nf} faces")
        t_mc, t_mc_dev, _ = t_by_algo["cubes"]
        mc_backend = "device-cubes"
    else:
        from surs_tpu.recon.marching import extract_isosurface
        R = cfg.resolution
        g = np.mgrid[:R, :R, :R].astype(np.float32) - (R - 1) / 2
        sphere = 0.5 + (R * 0.35
                        - np.sqrt((g ** 2).sum(0))).astype(np.float32)
        t0 = time.time()
        verts, faces = extract_isosurface(sphere, 0.5)
        t_mc = time.time() - t0
        t_mc_dev = t_mc
        t_by_algo = {"tets": (t_mc, t_mc, faces.shape[0])}
        mc_backend = "host"

    # ---- train step: fused Pallas vs XLA query stage (VERDICT r2 #5).
    # A scan-chained program of TRAIN_STEPS steps (state evolves -> real
    # data dependencies, no dispatch elision), timed per step.
    train_ms = {}
    if on_tpu:
        train_ms = bench_train_step(cfg, log)

    # trained-subject record (benchmarks/subject_demo.py), if the repo
    # carries one — the measured trained-weight 512^3 numbers. A record
    # predating pipeline-source changes is carried but NOT promoted to
    # the sec/mesh headline (the round-3 headline was silently 2
    # commits of extractor rework out of date — VERDICT r3 weak #1).
    trained = load_record("BENCH_subject.json", log,
                          paths=GEN_MESH_PATHS)

    t_mesh = t_mesh_random
    mesh_src = "random_weights_in_run_upper_bound"
    if trained and trained.get("gen_mesh_wall_sec") \
            and trained.get("resolution") == cfg.resolution:
        if trained.get("stale"):
            mesh_src = "random_upper_bound(trained record stale)"
        else:
            t_mesh = float(trained["gen_mesh_wall_sec"])
            mesh_src = "trained_subject_record"

    # pipelined-serving record (benchmarks/serve_bench.py), if present
    serving = load_record("BENCH_serve.json", log)
    serving_slim = None
    if serving:
        serving_slim = {"file": serving.get("_file")}
        for rk, run in (serving.get("runs") or {}).items():
            serving_slim[f"speedup_{rk}"] = run.get("speedup")
            serving_slim[f"spm_{rk}"] = run.get("pipelined_spm")
        if serving.get("stale"):
            serving_slim["stale"] = True

    # reference-shaped torch-CPU sec/mesh (benchmarks/baseline_torch.py
    # --mesh): anchors the end-to-end speedup factor, not just the
    # query-chunk one. The CPU baseline measures the REFERENCE pipeline
    # shape, so our source tree cannot stale it — no commit gate.
    cpu_base = load_record("BENCH_cpu_baseline.json", log,
                           check_commit=False)
    vs_mesh = None
    if cpu_base:
        cpu_key = f"sec_per_mesh_cpu_{cfg.resolution}"
        if cpu_base.get(cpu_key):
            vs_mesh = round(float(cpu_base[cpu_key]) / t_mesh, 1)

    result = {
        "metric": "occupancy_queries_per_sec",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / BASELINE_QPS, 2),
        "extras": {
            "backend": backend,
            "sec_per_mesh": round(t_mesh, 3),
            "sec_per_mesh_source": mesh_src,
            "sec_per_mesh_random_upper_bound": round(t_mesh_random, 3),
            "sec_per_mesh_is_single_wall_call": True,
            "resolution": cfg.resolution,
            "octree_eval_sec": round(t_eval, 3),
            "octree_eval_sec_mask_prune": round(t_eval_mask, 3),
            "octree_queries": oct_queries,
            "octree_queries_mask_prune": oct_queries_mask,
            "mc_backend": mc_backend,
            "mc_sec": round(t_mc, 3),
            "mc_sec_device_compute": round(t_mc_dev, 3) if on_tpu
            else None,
            "mc_sec_tets": round(t_by_algo["tets"][0], 3),
            "mc_faces_tets": t_by_algo["tets"][2],
            "obj_faces_hr": faces_total,
            "encode_sec_first_call": round(t_encode, 3),
            "chunk": chunk,
            "dense_grid": R_dense,
            "dense_evaluator": "cols" if on_tpu else "generic",
            "qps_generic_path": round(qps_generic, 1)
            if qps_generic else None,
            "feature_dtype": cfg.feature_dtype,
            "feature_pack": bool(cfg.feature_pack),
            "train_step_ms": train_ms or None,
            "trained_subject": slim(trained, (
                "gen_mesh_wall_sec", "eval_sec_mono_mask_prune",
                "chamfer_pct_of_scale", "normal_cos", "train_iters",
                "git_commit")),
            "generalization": slim(
                load_record("BENCH_generalization.json", log,
                            paths=TRAIN_PATHS),
                ("val_chamfer_pct_of_scale", "val_normal_cos",
                 "n_train_subjects", "git_commit")),
            "serving": serving_slim,
            "vs_baseline_mesh": vs_mesh,
            "cpu_baseline": slim(cpu_base, ("sec_per_mesh_cpu_512",
                                            "sec_per_mesh_cpu_256")),
            "datafed_train": slim(
                load_record("BENCH_datafed.json", log,
                            paths=TRAIN_PATHS),
                ("steps_per_sec_ex_save", "steps_per_sec",
                 "data_wait_sec", "git_commit")),
            "train_scaling": slim_scaling(
                load_record("BENCH_train_scaling.json", log,
                            paths=TRAIN_PATHS)),
        },
    }
    # full sub-records live on disk; the printed line carries scalars
    # + filenames only (the driver's tail capture is ~2000 chars and
    # round 4's embedded-record line outgrew it — VERDICT r4 weak #1)
    with open(os.path.join(REPO, "BENCH_full.json"), "w") as f:
        json.dump({"result": result, "records": {
            "trained_subject": trained, "serving": serving,
            "cpu_baseline": cpu_base}}, f, indent=1)
    keep = ("backend", "sec_per_mesh", "sec_per_mesh_source",
            "resolution", "octree_eval_sec_mask_prune", "mc_backend",
            "mc_sec", "dense_evaluator", "train_step_ms",
            "trained_subject", "generalization", "serving",
            "vs_baseline_mesh", "cpu_baseline", "datafed_train",
            "train_scaling")
    printed = dict(result, extras={
        k: result["extras"][k] for k in keep
        if result["extras"].get(k) is not None})
    printed["extras"]["full"] = "BENCH_full.json"
    line = json.dumps(printed)
    if len(line) > 1500:
        log(f"WARNING: bench line is {len(line)} chars (>1500 target)")
    print(line)


def slim_scaling(rec):
    """One-line summary of the train-scaling table: row count, the
    best-MFU row, the largest point count that stepped."""
    if rec is None:
        return None
    rows = [r for r in rec.get("rows", []) if r.get("ms_per_step")]
    out = {"file": rec.get("_file"), "rows_ok": len(rows),
           "rows_failed": len(rec.get("rows", [])) - len(rows)}
    if rows:
        best = max(rows, key=lambda r: r.get("mfu_pct") or 0.0)
        out["best_mfu_pct"] = best.get("mfu_pct")
        out["best_mfu_row"] = (f"{best['kind']}:b{best['batch']}:"
                               f"n{best['points']}")
        big = max(rows, key=lambda r: r["points"] * r["batch"])
        out["max_row"] = (f"{big['kind']}:b{big['batch']}:"
                          f"n{big['points']}:{big['ms_per_step']}ms")
    if rec.get("stale"):
        out["stale"] = True
    return out


def bench_train_step(cfg, log, n_steps: int = 8):
    """Steady-state ms/step for the fused (Pallas custom_vjp) and XLA
    train steps at the reference train config, via a scan-chained
    n_steps program ending in a loss fetch."""
    import jax
    import jax.numpy as jnp
    from surs_tpu.models import surs_net_from_config
    from surs_tpu.train import (make_optimizer, create_train_state,
                                make_train_step)
    from surs_tpu.train.fused_step import make_fused_train_step

    rng = np.random.default_rng(1)
    S = cfg.loadSize // 2
    B, N = 2, 6000
    batch = {
        "images_lr": jnp.asarray(rng.standard_normal(
            (B, S, S, 3)).astype(np.float32)),
        "images_hr": jnp.asarray(rng.standard_normal(
            (B, 2 * S, 2 * S, 3)).astype(np.float32)),
        "points_lr": jnp.asarray((rng.random((B, 3, N)) - 0.5)
                                 .astype(np.float32)),
        "points_hr": jnp.asarray((rng.random((B, 3, N)) - 0.5)
                                 .astype(np.float32)),
        "calibs": jnp.asarray(np.tile(np.diag(
            [2.0, -2.0, 2.0, 1.0]).astype(np.float32)[None], (B, 1, 1))),
        "labels_lr": jnp.asarray(
            rng.integers(0, 2, (B, N, 1)).astype(np.float32)),
        "labels_hr": jnp.asarray(
            rng.integers(0, 2, (B, N, 1)).astype(np.float32)),
    }
    model = surs_net_from_config(cfg)
    opt = make_optimizer(cfg)
    state0 = create_train_state(model, opt, jax.random.PRNGKey(0), batch)

    out = {}
    for name, step in (("fused", make_fused_train_step(model, opt)),
                       ("xla", make_train_step(model, opt))):
        @jax.jit
        def chained(state, batch, jitter, step=step):
            # jitter breaks dispatch identity between repeats (this
            # backend elides repeated identical dispatches, CLAUDE.md)
            batch = dict(batch,
                         points_lr=batch["points_lr"] + jitter)
            def body(carry, _):
                st, _ = carry
                st, m = step(st, batch)
                return (st, m["total"]), None
            (st, loss), _ = jax.lax.scan(body, (state, jnp.float32(0.0)),
                                         None, length=n_steps)
            return loss
        t0 = time.time()
        float(chained(state0, batch, jnp.float32(0.0)))
        log(f"train[{name}] compiled+ran in {time.time() - t0:.1f}s")
        best = 1e30
        for rep in range(2):
            t0 = time.time()
            float(chained(state0, batch, jnp.float32(1e-6 * (rep + 1))))
            best = min(best, time.time() - t0)
        out[name] = round(best / n_steps * 1e3, 2)
        log(f"train[{name}] steady {out[name]} ms/step")
    return out


if __name__ == "__main__":
    main()
