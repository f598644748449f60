"""Production serving: a persistent reconstruction service.

The reference's only inference entry point is a batch CLI that rebuilds
everything per run (apps/eval_SuRS.py). For deployment, this service
loads the model once, pre-compiles the encode/query programs, and then
turns (image, mask) pairs into OBJ mesh pairs at steady-state latency:

    service = SuRSService(cfg)
    service.warmup((256, 256))
    paths = service.reconstruct(image_rgb, mask, "subject", out_dir)

Images are HxWx3 uint8/float arrays (masked + normalized internally, the
EvalDataset contract, lib/data/EvalDataset_LR_v2.py:227-243).
"""

from __future__ import annotations

import os
import time
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .config import SuRSConfig
from .models import surs_net_from_config
from .compat.torch_import import load_params
from .ops.fused_mlp import prepare_fused_weights
from .ops.point_query import make_fused_query_fn
from .recon.pipeline import Reconstructor, eval_calibration
from .recon.mesh_io import save_obj_mesh
from .utils.cache import enable_compilation_cache


def normalize_image(image: np.ndarray, mask: Optional[np.ndarray]
                    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """uint8/float image -> masked, [-1, 1]-normalized float32 NHWC."""
    arr = np.asarray(image, np.float32)
    if arr.max() > 1.5:
        arr = arr / 255.0
    arr = (arr - 0.5) / 0.5
    m = None
    if mask is not None:
        m = np.asarray(mask, np.float32)
        if m.max() > 1.5:
            m = m / 255.0
        if m.ndim == 2:
            m = m[..., None]
        arr = arr * m
    return arr[None], m


class SuRSService:
    def __init__(self, cfg: SuRSConfig, params=None,
                 compilation_cache: bool = True):
        if compilation_cache:
            enable_compilation_cache()
        from .config import resolve_backend_defaults
        cfg = resolve_backend_defaults(cfg)
        self.cfg = cfg
        self.model = surs_net_from_config(cfg)
        self.params = params if params is not None \
            else load_params(cfg, self.model)
        query_fn = None
        cols_w = None
        self.weights = self.params
        pack = bool(getattr(cfg, "feature_pack", False))
        fdt = jnp.bfloat16 if cfg.feature_dtype == "bfloat16" else None
        if cfg.use_pallas and jax.default_backend() != "cpu":
            kdt = jnp.bfloat16 if fdt is not None else jnp.float32
            base_split = (cfg.hg_dim, cfg.mlp_dim_lr[0] - cfg.hg_dim) \
                if pack else None
            self.weights = prepare_fused_weights(
                self.params["mlp_lr"], self.params["mlp_hr"],
                cfg.mlp_dim_lr, cfg.mlp_dim_hr, cfg.mlp_res_layers_lr,
                cfg.mlp_res_layers_hr, dtype=kdt, base_split=base_split)
            query_fn = make_fused_query_fn(cfg.loadSize, cfg.z_size,
                                           packed=pack)
            if not cfg.use_octree:
                # dense serving takes the column-shared evaluator when
                # the calib is axis-aligned (recon/evaluator.py)
                from .ops.fused_mlp import prepare_cols_weights
                cols_w = prepare_cols_weights(
                    self.params["mlp_lr"], self.params["mlp_hr"],
                    cfg=cfg, dtype=kdt)
        else:
            pack = False
        if cols_w is None and cfg.use_octree \
                and getattr(cfg, "serve_octree_mode",
                            "hostloop") == "runs":
            # dirty-column-window octree serving (evaluator_runs.py);
            # works on CPU via the XLA twin, falls back to mono off
            # the separable-calib geometry
            from .ops.fused_mlp import prepare_cols_weights
            cols_w = prepare_cols_weights(
                self.params["mlp_lr"], self.params["mlp_hr"], cfg=cfg,
                dtype=jnp.bfloat16 if fdt is not None else jnp.float32)
        self.rec = Reconstructor(self.model, query_fn=query_fn,
                                 feature_dtype=fdt, feature_pack=pack,
                                 octree_mode=getattr(
                                     cfg, "serve_octree_mode",
                                     "hostloop"),
                                 cols_weights=cols_w,
                                 load_size=cfg.loadSize,
                                 z_size=cfg.z_size)

    def warmup(self, image_hw: Tuple[int, int]) -> float:
        """Pre-compile all programs for an input shape; returns seconds."""
        t0 = time.time()
        img = np.zeros((1, image_hw[0], image_hw[1], 3), np.float32)
        data = {"img_LR": img, "b_min": np.asarray(self.cfg.b_min),
                "b_max": np.asarray(self.cfg.b_max)}
        import tempfile
        with tempfile.TemporaryDirectory() as td:
            self.rec.gen_mesh(self.cfg, self.params, self.weights, data,
                              os.path.join(td, "warmup.obj"),
                              use_octree=self.cfg.use_octree)
        return time.time() - t0

    def reconstruct(self, image: np.ndarray, mask: Optional[np.ndarray],
                    name: str, out_dir: str) -> Tuple[str, str]:
        """One subject -> (<name>_HR.obj path, <name>_LR.obj path)."""
        img, m = normalize_image(image, mask)
        data = {"img_LR": img, "b_min": np.asarray(self.cfg.b_min),
                "b_max": np.asarray(self.cfg.b_max)}
        if m is not None and self.cfg.mask_prune:
            data["mask_LR"] = m
        os.makedirs(out_dir, exist_ok=True)
        return self.rec.gen_mesh(self.cfg, self.params, self.weights,
                                 data, os.path.join(out_dir, name + ".obj"),
                                 use_octree=self.cfg.use_octree)

    def reconstruct_many(self, items, out_dir: str,
                         writer_thread: Optional[bool] = None,
                         depth: int = 2,
                         pipeline: Optional[bool] = None):
        """Batch serving: ``items`` iterates ``(image, mask, name)``;
        returns the list of (HR, LR) OBJ path pairs, in order.

        ``pipeline=None`` (auto) picks the measured-fastest mode for
        the configured resolution (BENCH_serve.json on the 1-core
        tunneled rig): pipelined at >=512³ (1.45× over sequential —
        the per-subject device work is big enough to hide the host's
        mesh merge/write), plain sequential ``reconstruct`` calls
        below (at 256³ the pipeline's extra bookkeeping LOSES ~1.6×;
        the whole subject is near the enqueue floor). Pass
        ``pipeline=True/False`` to force a mode.

        Runs a software pipeline: subject i+1's device programs
        (encode + evaluation) are ENQUEUED before subject i's
        extraction/merge/OBJ-write syncs, so the chip never idles while
        the host writes meshes — steady-state throughput approaches
        max(device_time, host_time) per subject instead of their sum.

        ``writer_thread=True``: the finish stage — wire fetch, decode,
        native OBJ write — runs on ONE worker thread; those calls sit
        in GIL-releasing numpy/ctypes/file I/O, so they can overlap
        the main thread's program enqueues. Measured SLOWER than the
        inline finish on the 1-core rig at every resolution
        (BENCH_serve.json round 5: 1.25× vs 1.45× at 512³ — the
        handoff costs more than the overlap buys when one core runs
        both sides), so the auto default is False; the knob remains
        for multi-core hosts. ``depth`` bounds subjects in flight
        beyond the one being enqueued (each holds device mesh
        buffers). Per-subject results are identical to sequential
        :meth:`reconstruct` calls (the pipeline only reorders work).
        """
        os.makedirs(out_dir, exist_ok=True)
        if pipeline is None:
            pipeline = self.cfg.resolution >= 512
        if writer_thread is None:
            writer_thread = False
        if not pipeline:
            return [self.reconstruct(image, mask, name, out_dir)
                    for image, mask, name in items]

        def begin(image, mask, name):
            img, m = normalize_image(image, mask)
            data = {"img_LR": img, "b_min": np.asarray(self.cfg.b_min),
                    "b_max": np.asarray(self.cfg.b_max)}
            if m is not None and self.cfg.mask_prune:
                data["mask_LR"] = m
            return self.rec.gen_mesh_begin(
                self.cfg, self.params, self.weights, data,
                os.path.join(out_dir, name + ".obj"),
                use_octree=self.cfg.use_octree)

        if not writer_thread:
            results, pending = [], None
            for image, mask, name in items:
                work = begin(image, mask, name)
                if pending is not None:
                    results.append(pending())
                pending = work
            if pending is not None:
                results.append(pending())
            return results

        from concurrent.futures import ThreadPoolExecutor
        futures = []
        with ThreadPoolExecutor(max_workers=1,
                                thread_name_prefix="surs-writer") as ex:
            for image, mask, name in items:
                futures.append(ex.submit(begin(image, mask, name)))
                if len(futures) > depth:
                    futures[len(futures) - 1 - depth].result()
            return [f.result() for f in futures]

    def fields(self, image: np.ndarray, mask: Optional[np.ndarray]):
        """Raw (sdf_hr, sdf_lr) occupancy volumes for a subject (for
        downstream consumers that do their own extraction)."""
        img, m = normalize_image(image, mask)
        _, feats_lr, feat_hr = self.rec.encode(self.params,
                                               jnp.asarray(img))
        calib = eval_calibration(1)
        sil = jnp.asarray(m) if (m is not None and self.cfg.mask_prune) \
            else None
        sdf_hr, sdf_lr, _ = self.rec.evaluate(
            self.weights, feats_lr, feat_hr, calib, self.cfg.resolution,
            np.asarray(self.cfg.b_min), np.asarray(self.cfg.b_max),
            use_octree=self.cfg.use_octree,
            num_samples=self.cfg.num_samples,
            threshold=self.cfg.threshold,
            init_resolution=self.cfg.octree_init_resolution,
            silhouette=sil)
        return sdf_hr, sdf_lr
