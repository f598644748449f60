import sys, os
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                '..')))
"""Data-loader throughput: single-process vs worker processes.

Measures items/s of the REAL TrainDataset __getitem__ (JPEG/PNG decode,
resize chain, surface point sampling against the in-RAM mesh) through
surs_tpu.data.DataLoader at num_workers = 0 / 2 / 4, on a synthetic
dataset rendered at the reference loadSize (512). The reference's
equivalent is torch DataLoader(num_workers=12) feeding
TrainDataset_LR_v2 (apps/train_SuRS.py:40-49).

CAVEAT (document, don't hide): this rig exposes ONE CPU core, so
process workers time-slice the same core — numbers here bound loader
OVERHEAD (queueing, pickling, re-ordering), not parallel speedup. On a
multi-core trainer host the worker path scales like any fork pool; the
overhead measured here is what it costs at worst. Because this script
initializes JAX (the synthetic dataset is rasterized) before building
the loaders, the worker pools run under the loader's spawn fallback —
the first-batch latency for workersN rows includes each child's
interpreter + import startup.

Usage: python benchmarks/loader_bench.py [load_size] [n_items]
"""

import json
import shutil
import tempfile
import time

# CPU-only bench: the loader never touches the accelerator, but the
# rasterizer building the synthetic dataset runs jnp ops — force CPU so
# this works (and is fair) even when the remote TPU backend is present.
# sitecustomize overrides JAX_PLATFORMS, so set the config too.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np

from surs_tpu.config import SuRSConfig
from surs_tpu.data import TrainDataset
from surs_tpu.data.loader import DataLoader

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))
from test_integration import make_sphere_obj  # noqa: E402

from surs_tpu.render.dataset_gen import render_dataset  # noqa: E402


def build_root(load_size: int) -> str:
    root = tempfile.mkdtemp(prefix="loader_bench_")
    obj_dir = os.path.join(root, "GEO", "OBJ")
    os.makedirs(obj_dir)
    # Two subjects x 4 yaws gives 8 items per epoch pass.
    for s in range(2):
        make_sphere_obj(os.path.join(obj_dir, f"subj{s}_HR.obj"),
                        6.0 - 0.5 * s)
        make_sphere_obj(os.path.join(obj_dir, f"subj{s}_LR.obj"),
                        5.0 - 0.5 * s)
    with open(os.path.join(root, "val.txt"), "w"):
        pass
    render_dataset(obj_dir, root, load_size=load_size, yaw_step=90,
                   patch=min(load_size, 128))
    return root


def run(ds, n_items: int, batch_size: int, **loader_kw):
    dl = DataLoader(ds, batch_size=batch_size, shuffle=True, seed=0,
                    **loader_kw)
    # One warm pass primes the mesh cache (first touch reads the OBJ).
    it = iter(dl)
    next(it)
    done = 1 * batch_size
    t0 = time.perf_counter()
    t_first = None
    n = 0
    while n < n_items:
        for b in dl:
            if t_first is None:
                t_first = time.perf_counter() - t0
            n += b["img_LR"].shape[0]
            if n >= n_items:
                break
    dt = time.perf_counter() - t0
    dl.close()
    del done
    return n / dt, t_first


def main():
    load_size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_items = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    root = build_root(load_size)
    try:
        cfg = SuRSConfig(dataroot=root, loadSize=load_size,
                         num_sample_inout=6000, sigma=0.05,
                         b_min=[-1.0] * 3, b_max=[1.0] * 3)
        ds = TrainDataset(cfg, phase="train",
                          yaw_list=[0, 90, 180, 270])
        out = {"load_size": load_size, "n_items": n_items,
               "cpu_count": os.cpu_count()}
        for tag, kw in [
            ("inline", dict(num_threads=1)),
            ("thread_prefetch", dict(num_threads=2, prefetch=2)),
            ("workers2", dict(num_workers=2)),
            ("workers4", dict(num_workers=4)),
        ]:
            ips, t_first = run(ds, n_items, batch_size=2, **kw)
            out[tag] = {"items_per_sec": round(ips, 2),
                        "first_batch_sec": round(t_first, 3)}
            print(f"[loader] {tag:16s} {ips:7.2f} items/s "
                  f"(first batch {t_first:.3f}s)", flush=True)
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
