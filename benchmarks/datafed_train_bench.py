import sys, os
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                '..')))
"""End-to-end DATA-FED training throughput (VERDICT r3 missing #3).

Until now the train-step figure (113 ms/step) was measured on in-memory
synthetic batches; this bench drives real train steps through
``train/loop.train`` fed by the real ``TrainDataset`` + process
``DataLoader`` with the precomputed SAMPLE_CACHE (the path that removes
the containment bottleneck — apps/precompute_samples.py), and reports:

  * cached-loader items/s (loader alone, inline and 4 workers),
  * end-to-end wall steps/s for >=200 steps through train/loop.py,
  * the breakdown train() returns (data-wait / enqueue / ckpt-save).

Process discipline: the synthetic dataset is rendered in a SUBPROCESS
(JAX CPU) so THIS process can build the worker pool BEFORE any JAX
backend initializes — the loader's fork path, not the spawn fallback
(data/loader.py module docstring). Reference counterpart: torch
DataLoader(num_workers=12) feeding TrainDataset_LR_v2
(/root/reference/apps/train_SuRS.py:40-49,122).

Usage:
  python benchmarks/datafed_train_bench.py            # full bench
  python benchmarks/datafed_train_bench.py --build D  # (internal) build
Env: DATAFED_ITERS (default 200), DATAFED_WORKERS (default 4).
"""

import json
import shutil
import subprocess
import tempfile
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def build_dataset(root: str, load_size: int = 512) -> None:
    """(subprocess mode) Render 2 subjects x 12 yaws at ``load_size``
    and precompute an 8-draw sample cache. Runs under JAX CPU."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_integration import make_sphere_obj
    from surs_tpu.render.dataset_gen import render_dataset
    from surs_tpu.recon.mesh_io import load_obj
    from surs_tpu.data.sampling import MeshData, sample_points_and_labels
    import numpy as np

    obj_dir = os.path.join(root, "GEO", "OBJ")
    os.makedirs(obj_dir, exist_ok=True)
    for s in range(2):
        make_sphere_obj(os.path.join(obj_dir, f"subj{s}_HR.obj"),
                        6.0 - 0.5 * s)
        make_sphere_obj(os.path.join(obj_dir, f"subj{s}_LR.obj"),
                        5.0 - 0.5 * s)
    open(os.path.join(root, "val.txt"), "w").close()
    t0 = time.time()
    render_dataset(obj_dir, root, load_size=load_size, yaw_step=30,
                   patch=min(load_size, 128))
    print(f"[build] rendered 24 views in {time.time() - t0:.1f}s",
          flush=True)

    cache = os.path.join(root, "SAMPLE_CACHE")
    os.makedirs(cache, exist_ok=True)
    t0 = time.time()
    for s in range(2):
        mesh_hr = MeshData(*load_obj(
            os.path.join(obj_dir, f"subj{s}_HR.obj")))
        mesh_lr = MeshData(*load_obj(
            os.path.join(obj_dir, f"subj{s}_LR.obj")))
        for d in range(8):
            rng = np.random.default_rng(1991 + d * 100003 + s)
            out = sample_points_and_labels(
                mesh_hr, mesh_lr, 6000, 0.05,
                np.array([-8.0] * 3), np.array([8.0] * 3), rng)
            np.savez_compressed(
                os.path.join(cache, f"subj{s}_{d:03d}.npz"), **out)
    print(f"[build] sample cache (16 draws) in {time.time() - t0:.1f}s",
          flush=True)


YAWS = list(range(0, 360, 30))      # matches the build's yaw_step=30


def measure_loader(cfg, n_items: int = 24):
    """Cached-loader items/s, inline and 4-worker (pre-JAX, fork path)."""
    from surs_tpu.data import TrainDataset, DataLoader
    ds = TrainDataset(cfg, phase="train", yaw_list=YAWS)
    out = {}
    for tag, kw in [("inline", dict(num_threads=1)),
                    ("workers4", dict(num_workers=4))]:
        dl = DataLoader(ds, batch_size=2, shuffle=True, seed=0, **kw)
        it = iter(dl)
        next(it)                      # warm: mesh/cache-path first touch
        t0 = time.perf_counter()
        n = 0
        while n < n_items:
            for b in dl:
                n += b["img_LR"].shape[0]
                if n >= n_items:
                    break
        ips = n / (time.perf_counter() - t0)
        dl.close()
        out[tag] = round(ips, 2)
        print(f"[loader/cached] {tag:9s} {ips:6.2f} items/s", flush=True)
    return out


def main():
    load_size = int(os.environ.get("DATAFED_LOAD", "512"))
    if "--build" in sys.argv:
        build_dataset(sys.argv[sys.argv.index("--build") + 1],
                      load_size=load_size)
        return

    iters = int(os.environ.get("DATAFED_ITERS", "200"))
    workers = int(os.environ.get("DATAFED_WORKERS", "4"))
    if os.environ.get("DATAFED_CPU") == "1":
        # sitecustomize force-registers axon; config must override it
        # for a CPU smoke run (CLAUDE.md environment rules)
        import jax
        jax.config.update("jax_platforms", "cpu")
    root = tempfile.mkdtemp(prefix="datafed_")
    ckpt_dir = tempfile.mkdtemp(prefix="datafed_ckpt_")
    res_dir = tempfile.mkdtemp(prefix="datafed_res_")
    try:
        # stage A: dataset + sample cache in a subprocess (keeps JAX
        # uninitialized HERE so the loader pool can fork)
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--build", root], cwd=REPO)
        assert r.returncode == 0, "dataset build failed"

        # stage B: loader-only throughput with the sample cache,
        # measured BEFORE JAX init (pure host path)
        from surs_tpu.config import SuRSConfig
        cfg = SuRSConfig(dataroot=root, name="datafed", loadSize=load_size,
                         residual=True, num_stack_lr=3,
                         num_sample_inout=6000, sigma=0.05,
                         batch_size=2, learning_rate=1e-3,
                         num_workers=workers, freq_plot=25,
                         freq_save=10 ** 9, freq_save_ply=0,
                         no_gen_mesh=True, num_epoch=10 ** 6,
                         checkpoints_path=ckpt_dir,
                         results_path=res_dir,
                         # DATAFED_PACK=0 re-measures the per-array H2D
                         # path the packed default replaced
                         pack_h2d=os.environ.get("DATAFED_PACK",
                                                 "1") == "1",
                         b_min=[-8.0] * 3, b_max=[8.0] * 3)
        loader_ips = measure_loader(cfg)

        # stage C: >=200 real steps through train/loop.py; train()
        # builds its DataLoader before the first JAX op -> fork pool
        from surs_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()   # config-only: must NOT init the backend
        import jax
        from surs_tpu.train.loop import train
        t0 = time.time()
        summary = train(cfg, max_iters=iters, yaw_list=YAWS)
        wall = time.time() - t0
        backend = jax.default_backend()   # after train(): keeps fork pool
        # subtract one-time setup (state init + first-step compile +
        # final save) via the steady tail: wall of the LOOP is
        # summary['wall_sec'] minus dataset/state construction; report
        # both raw and loop-only rates
        loop_wall = summary["wall_sec"]
        sps = summary["iters"] / loop_wall
        # ex-save rate: this bench's 12-item epochs hit the (reference-
        # parity) per-epoch netG_latest Orbax save ~17x in 200 steps —
        # real epochs are thousands of items, so the amortized-save rate
        # is the representative steady-state figure
        sps_ex = summary["iters"] / max(loop_wall - summary["save_sec"],
                                        1e-9)
        resid = (loop_wall - summary["data_sec"]
                 - summary["enqueue_sec"] - summary["save_sec"]
                 - summary.get("log_sec", 0.0)
                 - summary.get("prep_sec", 0.0)
                 - summary.get("ply_sec", 0.0))
        print(f"[datafed] {summary['iters']} steps in {loop_wall:.1f}s "
              f"train() wall ({wall:.1f}s incl. imports) = "
              f"{sps:.2f} steps/s end-to-end ({sps_ex:.2f} ex-save); "
              f"data-wait {summary['data_sec']:.1f}s, enqueue "
              f"{summary['enqueue_sec']:.1f}s, saves "
              f"{summary['save_sec']:.1f}s, log-fetch "
              f"{summary.get('log_sec', 0.0):.1f}s, "
              f"prep {summary.get('prep_sec', 0.0):.1f}s, "
              f"unattributed {resid:.1f}s", flush=True)

        rec = {"source": "benchmarks/datafed_train_bench.py",
               "backend": backend, "iters": summary["iters"],
               "batch_size": 2, "num_workers": workers,
               "load_size": load_size, "sample_cache": True,
               "pack_h2d": cfg.pack_h2d,
               "loader_items_per_sec": loader_ips,
               "train_wall_sec": round(loop_wall, 2),
               "steps_per_sec": round(sps, 3),
               "steps_per_sec_ex_save": round(sps_ex, 3),
               "items_per_sec_end_to_end": round(2 * sps, 2),
               "data_wait_sec": round(summary["data_sec"], 2),
               "enqueue_sec": round(summary["enqueue_sec"], 2),
               "save_sec": round(summary["save_sec"], 2),
               "log_fetch_sec": round(summary.get("log_sec", 0.0), 2),
               "prep_sec": round(summary.get("prep_sec", 0.0), 2),
               "ply_sec": round(summary.get("ply_sec", 0.0), 2),
               "unattributed_sec": round(resid, 2)}
        try:
            rec["git_commit"] = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, cwd=REPO).stdout.strip()
        except Exception:  # noqa: BLE001
            pass
        out = os.path.join(REPO, "BENCH_datafed.json")
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)
        print(json.dumps(rec))
        print(f"wrote {out}", flush=True)
    finally:
        for d in (root, ckpt_dir, res_dir):
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
