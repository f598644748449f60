"""End-to-end reconstruction pipeline.

Equivalent of the reference's ``reconstruction`` (lib/mesh_util.py:8-49)
and ``gen_mesh`` (lib/train_util.py:53-85): encode image features once,
evaluate the (HR, LR) occupancy fields over the bounding grid —
coarse-to-fine on device — then extract both meshes on the host and write
``*_HR.obj`` / ``*_LR.obj``.

Compared with the reference, the device/host boundary is crossed exactly
twice per subject (one occupancy volume each) instead of once per
50k-point chunk (lib/mesh_util.py:20-28), and every device program
(encode, per-level evaluation, pruning) is compiled once per shape by the
persistent :class:`Reconstructor` and reused across subjects — features
and weights flow through traced arguments, never as baked-in constants.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..models.surs_net import SuRSNet
from .grid import grid_matrix, require_diagonal
from .evaluator import (eval_grid_octree, eval_grid_octree_hostloop,
                        eval_grid_octree_mono, eval_grid_dense,
                        silhouette_init_masks)
from .marching import extract_isosurface
from .mesh_io import save_obj_mesh


def eval_calibration(batch: int = 1) -> np.ndarray:
    """The fixed orthographic eval calibration diag(2, -2, 2, 1)
    (lib/train_util.py:63-66, lib/data/EvalDataset_LR_v2.py:221-224)."""
    calib = np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32)
    return np.tile(calib[None], (batch, 1, 1))


class Reconstructor:
    """Compiled reconstruction engine for one model configuration.

    ``query_fn(weights, feats_lr, feat_hr, points, calibs)`` overrides the
    model's query (e.g. the fused Pallas path,
    ops/point_query.make_fused_query_fn); ``weights`` is then whatever
    pytree that query consumes (FusedWeights), passed per call.
    """

    def __init__(self, model: SuRSNet,
                 query_fn: Optional[Callable] = None,
                 octree_mode: str = "hostloop",
                 feature_dtype=None, point_mesh=None,
                 feature_pack: bool = False,
                 cols_weights=None, load_size: Optional[int] = None,
                 z_size: Optional[float] = None):
        self.model = model
        self.query_fn = query_fn
        # optional column-shared dense path: FusedWeights prepared with
        # base_split=(C_lr, C_hr, 1) + the model's load_size/z_size.
        # evaluate(use_octree=False) then uses the column-shared kernel
        # whenever the calibration is axis-aligned (the production eval
        # calib) — ~3.8x fewer MACs per query (evaluator.py)
        self.cols_weights = cols_weights
        self.cols_meta = (load_size, z_size)
        # 'hostloop': one compiled query program re-dispatched per chunk
        # (fast compile); 'fused': one program per level; 'mono': the
        # whole schedule as ONE program (one dispatch per evaluation)
        self.octree_mode = octree_mode
        # optional bf16 storage for the pixel-aligned feature maps:
        # halves gather traffic in the query hot loop (~+30% qps);
        # bilinear weighting and the MLPs still run f32
        self.feature_dtype = feature_dtype
        # pack_bilinear the (last-stack) feature maps once per subject so
        # each query needs one contiguous quad gather per map; requires a
        # query_fn built with make_fused_query_fn(packed=True) and
        # base_split-prepared weights (ops/point_query.py)
        self.feature_pack = feature_pack
        self._cache: Dict = {}

        def variables(params):
            # params may be a bare 'params' tree or a full variables
            # dict carrying 'batch_stats' (batch-norm eval: Flax keeps
            # running statistics outside 'params' and the encode
            # forward needs the collection — compat.load_params returns
            # the dict form for norm='batch')
            return params if "params" in params else {"params": params}

        def encode(params, images):
            return model.apply(variables(params), images, train=False,
                               method=SuRSNet.encode)
        self._encode = jax.jit(encode)

        def eval_fn(points, ctx):
            pts = points[None]  # [1, 3, C]
            if self.query_fn is not None:
                hr, lr = self.query_fn(ctx["weights"], ctx["feats_lr"],
                                       ctx["feat_hr"], pts, ctx["calib"])
            else:
                hr, lr = model.apply(
                    variables(ctx["weights"]), ctx["feats_lr"],
                    ctx["feat_hr"], pts, ctx["calib"],
                    method=SuRSNet.query)
            return hr[0], lr[0]
        if point_mesh is not None:
            # single-subject SP: shard each chunk's point axis over the
            # mesh's 'points' axis (parallel/batch_recon.py)
            from ..parallel.batch_recon import shard_eval_fn_over_points
            eval_fn = shard_eval_fn_over_points(eval_fn, point_mesh)
        self._eval_fn = eval_fn

    # ------------------------------------------------------------------
    def encode(self, params, images: jnp.ndarray):
        """images [B, S, S, 3] -> (img_sr, feats_lr, feat_hr), jitted."""
        return self._encode(params, images)

    def _make_ctx(self, weights, feats_lr, feat_hr, calib):
        if self.feature_pack:
            # one jitted program: dtype cast + quad packing of the lr
            # map (the hr map stays 4-tap — faster for its thin rows)
            key = ("ctx-pack", feats_lr[-1].shape, feat_hr.shape)
            if key not in self._cache:
                from ..ops.grid_sample import pack_bilinear
                fdt = self.feature_dtype

                def prep(f_lr, f_hr):
                    if fdt is not None:
                        f_lr = f_lr.astype(fdt)
                        f_hr = f_hr.astype(fdt)
                    return pack_bilinear(f_lr), f_hr
                self._cache[key] = jax.jit(prep)
            f_lr_q, f_hr_c = self._cache[key](feats_lr[-1], feat_hr)
            return {"weights": weights, "feats_lr": [f_lr_q],
                    "feat_hr": f_hr_c, "calib": jnp.asarray(calib)}
        if self.feature_dtype is not None:
            feats_lr = [f.astype(self.feature_dtype) for f in feats_lr]
            feat_hr = feat_hr.astype(self.feature_dtype)
        return {"weights": weights, "feats_lr": feats_lr,
                "feat_hr": feat_hr, "calib": jnp.asarray(calib)}

    def query_points(self, weights, feats_lr, feat_hr, calib,
                     points: jnp.ndarray):
        """Evaluate (hr, lr) occupancy at points [3, C] with the same
        compiled program the host-loop octree evaluator uses (shared
        cache entry — one compile serves both)."""
        key = ("hl-query", points.shape[1])
        if key not in self._cache:
            self._cache[key] = jax.jit(
                lambda pts, ctx: self._eval_fn(pts, ctx))
        return self._cache[key](
            points, self._make_ctx(weights, feats_lr, feat_hr, calib))

    def evaluate(self, weights, feats_lr, feat_hr, calib, resolution: int,
                 b_min, b_max, use_octree: bool = True,
                 num_samples: int = 50000, threshold: float = 0.05,
                 init_resolution: int = 64,
                 transform: Optional[np.ndarray] = None,
                 silhouette: Optional[jnp.ndarray] = None,
                 silhouette_dilate: int = 3,
                 stats_out: Optional[Dict] = None):
        """Evaluate both occupancy fields; returns (sdf_hr, sdf_lr, mat).

        ``silhouette``: optional [H, W(, 1)] binary mask enabling visual
        -hull pre-pruning — voxels projecting outside it are never
        queried (occupancy 0)."""
        mat = grid_matrix((resolution,) * 3, b_min, b_max)
        if transform is not None:
            mat = require_diagonal(np.asarray(transform) @ mat,
                                   "Reconstructor.evaluate(transform=)")
        if not use_octree and self.cols_weights is not None:
            from .evaluator import (dense_cols_separable,
                                    eval_grid_dense_cols)
            # the Pallas kernel's z sub-blocking is validated for
            # lane-aligned depths (production 128/256/512); odd
            # resolutions keep the generic per-point path on TPU
            # (the CPU XLA twin handles any R)
            res_ok = (resolution % 128 == 0
                      or jax.default_backend() == "cpu")
            if res_ok and dense_cols_separable(calib, mat):
                # features go in at their native dtype: the column path
                # gathers once per COLUMN (R^2 gathers, not R^3), so the
                # bf16 storage cast that pays for itself on the
                # per-point paths is pure eager-dispatch overhead here
                # (the kernel upcasts to f32 after the gather anyway)
                sdf_hr, sdf_lr = eval_grid_dense_cols(
                    self.cols_weights, feats_lr[-1], feat_hr, calib,
                    resolution, mat, self.cols_meta[0],
                    self.cols_meta[1], cache=self._cache)
                if stats_out is not None:
                    # dense: every grid point is evaluated, by design
                    stats_out["mode"] = "dense-cols"
                    stats_out["queries"] = resolution ** 3
                return sdf_hr, sdf_lr, mat
        init_dirty = None
        # only the octree evaluators consume init_dirty — computing the
        # per-level masks on the dense path would pay one compiled mask
        # program + dispatch per level for nothing. The mono evaluator
        # computes the masks INSIDE its single program when the 2-D
        # projection fast path applies (one dispatch instead of ~14);
        # other modes/calibrations get the precomputed per-level dict.
        from .evaluator import _sil_null_axis
        sil_inline = (silhouette is not None and use_octree
                      and self.octree_mode in ("mono", "runs")
                      and _sil_null_axis(np.asarray(calib), mat)
                      is not None)
        if silhouette is not None and use_octree and (
                not sil_inline or self.octree_mode == "runs"):
            # 'runs' may still take eval_grid_octree_runs, which
            # consumes the precomputed dict; its mono fallback below
            # prefers the inline path
            init_dirty = silhouette_init_masks(
                silhouette, np.asarray(calib), resolution, mat,
                init_resolution=init_resolution,
                dilate=silhouette_dilate, cache=self._cache)
        if use_octree and self.octree_mode == "runs" \
                and self.cols_weights is not None:
            from .evaluator_runs import (eval_grid_octree_runs,
                                         runs_supported)
            if runs_supported(calib, mat, resolution, init_resolution,
                              cols_weights=self.cols_weights):
                # dirty-column-window evaluation: features gathered
                # once per 8-point z-window, column-shared kernel
                # (~2.8x fewer MACs / ~8x fewer gather bytes per query
                # than the generic point path — evaluator_runs.py)
                sdf_hr, sdf_lr = eval_grid_octree_runs(
                    self.cols_weights, feats_lr[-1], feat_hr, calib,
                    resolution, mat, threshold, self.cols_meta[0],
                    self.cols_meta[1], init_resolution=init_resolution,
                    feature_dtype=self.feature_dtype,
                    feature_pack=self.feature_pack,
                    cache=self._cache, init_dirty=init_dirty)
                if stats_out is not None:
                    # query counts live device-side in the mono-style
                    # programs; mark the mode so a zero-queries read is
                    # attributable ('unsupported here', not 'no work')
                    stats_out["mode"] = "octree-runs"
                return sdf_hr, sdf_lr, mat
        ctx = self._make_ctx(weights, feats_lr, feat_hr, calib)
        if use_octree:
            # 'runs' falls back to the generic mono program when the
            # geometry/weights don't support the window path
            octree = {"hostloop": eval_grid_octree_hostloop,
                      "fused": eval_grid_octree,
                      "mono": eval_grid_octree_mono,
                      "runs": eval_grid_octree_mono}[self.octree_mode]
            kw = {"stats_out": stats_out} \
                if self.octree_mode == "hostloop" else {}
            if stats_out is not None and self.octree_mode != "hostloop":
                stats_out["mode"] = f"octree-{self.octree_mode}"
            if sil_inline and octree is eval_grid_octree_mono:
                kw.update(silhouette=silhouette,
                          silhouette_calib=np.asarray(calib),
                          silhouette_dilate=silhouette_dilate)
            else:
                kw["init_dirty"] = init_dirty
            sdf_hr, sdf_lr = octree(
                self._eval_fn, resolution, mat, threshold,
                init_resolution=init_resolution, num_samples=num_samples,
                ctx=ctx, cache=self._cache, **kw)
        else:
            sdf_hr, sdf_lr = eval_grid_dense(
                self._eval_fn, resolution, mat, num_samples=num_samples,
                ctx=ctx, cache=self._cache)
        return sdf_hr, sdf_lr, mat

    def reconstruct(self, weights, feats_lr, feat_hr, calib,
                    resolution: int, b_min, b_max, use_octree: bool = True,
                    num_samples: int = 50000, threshold: float = 0.05,
                    init_resolution: int = 64,
                    transform: Optional[np.ndarray] = None,
                    level: float = 0.5,
                    silhouette: Optional[jnp.ndarray] = None,
                    mc_backend: str = "host",
                    mc_caps: Optional[Dict] = None):
        """Full evaluation + isosurface extraction.

        ``mc_backend``: 'host' ships the occupancy volume to the host
        extractor (reference behavior, lib/mesh_util.py:36-46);
        'device' runs marching tetrahedra on the accelerator
        (recon/tetra_device.py) so only the packed mesh crosses the
        wire — at 512^3 this replaces two 536 MB field transfers plus
        seconds of host work; 'auto' tries device and falls back to
        host on capacity overflow (noise-like fields).
        Returns (verts_hr, faces_hr, verts_lr, faces_lr), world coords.
        """
        sdf_hr, sdf_lr, mat = self.evaluate(
            weights, feats_lr, feat_hr, calib, resolution, b_min, b_max,
            use_octree, num_samples, threshold, init_resolution, transform,
            silhouette=silhouette)

        out = []
        for verts, faces in self.extract_pair(sdf_hr, sdf_lr, mat, level,
                                              mc_backend, mc_caps):
            out += [verts, faces]
        return tuple(out)

    @staticmethod
    def extract_pair(sdf_hr, sdf_lr, mat, level=0.5, mc_backend="host",
                     mc_caps=None):
        """Yield (verts, faces) for the HR then LR field, world coords.

        Device backend: both extractions are STARTED before the first
        is finished, so the LR mesh's device compute overlaps the HR
        mesh's device->host transfer; and because this is a generator,
        whatever the caller does between items (e.g. writing the HR
        OBJ) overlaps the LR transfer.
        """
        mat = np.asarray(mat)

        def to_world(verts, faces):
            verts = verts @ mat[:3, :3].T + mat[:3, 3]
            return verts.astype(np.float32), faces

        if mc_backend == "sharded":
            # multi-chip: one x-slab per device of the caller's mesh
            # (mc_caps carries mesh=/axis=/algorithm=), halo over ICI,
            # host merge by canonical global edge id — same welded mesh
            # as the single-device backend (parallel/sharded_mc.py)
            from ..parallel.sharded_mc import \
                extract_isosurface_sharded_begin
            # keep only the sharded extractor's kwargs so one mc_caps
            # dict can be shared across backends (device caps like
            # max_cells/max_tris don't apply per-slab)
            allowed = ("mesh", "axis", "algorithm", "cell_chunk",
                       "max_cells_shard", "max_tris_shard")
            kw = {k: v for k, v in (mc_caps or {}).items()
                  if k in allowed}
            # same staging as the device branch below: both count
            # programs enqueue before either counts-sync, and the LR
            # wire transfer streams while the HR mesh is merged/written
            res_hr = extract_isosurface_sharded_begin(
                sdf_hr, level, defer_sync=True, **kw)
            res_lr = extract_isosurface_sharded_begin(
                sdf_lr, level, defer_sync=True, **kw)
            fin_hr = res_hr()
            fin_lr = res_lr()
            yield to_world(*fin_hr())
            yield to_world(*fin_lr())
            return

        if mc_backend in ("device", "auto"):
            from .tetra_device import marching_tetrahedra_device_begin
            # filter to this backend's kwargs (mirrors the sharded
            # branch) so one mc_caps dict can be shared across backends
            # — a stray 'mesh'/'axis' key would otherwise raise
            # TypeError, which the 'auto' host fallback below does NOT
            # catch (it only catches capacity ValueErrors)
            allowed = ("algorithm", "max_cells", "max_tris", "max_verts",
                       "max_pts", "cell_chunk")
            dev_caps = {k: v for k, v in (mc_caps or {}).items()
                        if k in allowed}
            try:
                # distinct bucket tags: the HR/LR surfaces differ in
                # size systematically, so sharing one speculative
                # bucket entry would recount+rerun the larger mesh on
                # every call (tetra_device.marching_tetrahedra_device_begin)
                #
                # defer_sync: both extraction cores are ENQUEUED before
                # either counts-sync, so the device pipelines them;
                # resolving LR before fetching HR starts the LR
                # device->host copies streaming while the HR mesh is
                # decoded/written on the host
                res_hr = marching_tetrahedra_device_begin(
                    sdf_hr, level, bucket_tag="hr", defer_sync=True,
                    **dev_caps)
                res_lr = marching_tetrahedra_device_begin(
                    sdf_lr, level, bucket_tag="lr", defer_sync=True,
                    **dev_caps)
                fin_hr = res_hr()
                fin_lr = res_lr()
                yield to_world(*fin_hr())
                yield to_world(*fin_lr())
                return
            except ValueError:
                if mc_backend == "device":
                    raise
        yield to_world(*extract_isosurface(np.asarray(sdf_hr), level))
        yield to_world(*extract_isosurface(np.asarray(sdf_lr), level))

    def gen_mesh_begin(self, cfg, params, weights, data: dict,
                       save_path: str, use_octree: bool = True):
        """Enqueue one subject's device work; returns ``finish()``.

        The encode and (mono/runs/fused-mode) evaluation programs are
        dispatched here WITHOUT a device sync; every sync — extraction
        counts, wire transfers, OBJ writes — happens inside the returned
        ``finish() -> (path_hr, path_lr)``. A serving loop can therefore
        begin subject i+1 before finishing subject i, overlapping the
        host-side merge/write of one subject with the device compute of
        the next (SuRSService.reconstruct_many). On host-loop evaluator
        modes (the CPU default) evaluation itself syncs, so begin() is
        effectively eager there — results are identical either way.
        """
        img_lr = jnp.asarray(data["img_LR"])
        _, feats_lr, feat_hr = self.encode(params, img_lr)
        # EvalDataset ships the fixed ortho calibration; synthetic /
        # train-time subjects may carry their own render calib
        if "calib" in data:
            calib = np.asarray(data["calib"],
                               np.float32).reshape(-1, 4, 4)
        else:
            calib = eval_calibration(img_lr.shape[0])
        silhouette = None
        if getattr(cfg, "mask_prune", False) and "mask_LR" in data:
            silhouette = jnp.asarray(data["mask_LR"])
        sdf_hr, sdf_lr, mat = self.evaluate(
            weights, feats_lr, feat_hr, calib, cfg.resolution,
            data["b_min"], data["b_max"], use_octree=use_octree,
            num_samples=cfg.num_samples, threshold=cfg.threshold,
            init_resolution=cfg.octree_init_resolution,
            silhouette=silhouette)
        stem = os.path.splitext(save_path)[0]
        path_hr = stem + "_HR.obj"
        path_lr = stem + "_LR.obj"
        paths = [path_hr, path_lr]
        from ..config import resolve_auto
        mc_caps = {"algorithm": resolve_auto(
            "mc_algorithm", getattr(cfg, "mc_algorithm", "tets"))}
        mc_backend = resolve_auto(
            "mc_backend", getattr(cfg, "mc_backend", "host"))

        def finish() -> Tuple[str, str]:
            # streamed: the HR OBJ write overlaps the LR mesh transfer
            for path, (verts, faces) in zip(paths, self.extract_pair(
                    sdf_hr, sdf_lr, mat, mc_backend=mc_backend,
                    mc_caps=mc_caps)):
                save_obj_mesh(path, verts, faces)
            return path_hr, path_lr

        return finish

    def gen_mesh(self, cfg, params, weights, data: dict, save_path: str,
                 use_octree: bool = True) -> Tuple[str, str]:
        """Per-subject inference driver (reference gen_mesh,
        lib/train_util.py:53-85). ``params`` feeds encode; ``weights``
        feeds the query path (== params unless a query_fn swaps in
        prepared kernel weights)."""
        return self.gen_mesh_begin(cfg, params, weights, data, save_path,
                                   use_octree)()


# --------------------------------------------------------------------------
# Functional wrappers (stable public API; reuse a cached Reconstructor).
# Keyed on the model/query_fn OBJECTS (kept alive by the cache itself), not
# id(): ids are recycled after GC, so a long-lived process creating and
# dropping models could otherwise hit a stale Reconstructor built for a
# different topology.
_RECON_CACHE: Dict = {}


def _get_reconstructor(model: SuRSNet, query_fn, feature_dtype=None,
                       feature_pack: bool = False,
                       octree_mode: str = "hostloop",
                       cols_weights=None, load_size=None,
                       z_size=None) -> Reconstructor:
    # id() is safe for cols_weights here: the cached Reconstructor keeps
    # the object alive, so its id cannot be recycled while the entry
    # exists (unlike the free-floating id() keys this cache avoids)
    key = (model, query_fn, str(feature_dtype), feature_pack,
           octree_mode,
           None if cols_weights is None else id(cols_weights),
           load_size, z_size)
    if key not in _RECON_CACHE:
        _RECON_CACHE[key] = Reconstructor(model, query_fn,
                                          octree_mode=octree_mode,
                                          feature_dtype=feature_dtype,
                                          feature_pack=feature_pack,
                                          cols_weights=cols_weights,
                                          load_size=load_size,
                                          z_size=z_size)
    return _RECON_CACHE[key]


def reconstruction(model: SuRSNet, params, feats_lr, feat_hr,
                   calib, resolution: int, b_min, b_max,
                   use_octree: bool = True, num_samples: int = 50000,
                   threshold: float = 0.05, init_resolution: int = 64,
                   transform: Optional[np.ndarray] = None,
                   query_fn: Optional[Callable] = None,
                   query_weights=None, level: float = 0.5):
    """Evaluate both occupancy fields and extract both meshes."""
    rec = _get_reconstructor(model, query_fn)
    weights = query_weights if query_weights is not None else params
    return rec.reconstruct(weights, feats_lr, feat_hr, calib, resolution,
                           b_min, b_max, use_octree, num_samples,
                           threshold, init_resolution, transform, level)


def gen_mesh(cfg, model: SuRSNet, params, data: dict, save_path: str,
             use_octree: bool = True, query_fn: Optional[Callable] = None,
             query_weights=None) -> Tuple[str, str]:
    """Reference-shaped one-shot API; prefer Reconstructor for loops."""
    from ..config import resolve_auto
    fdt_name = resolve_auto("feature_dtype",
                            getattr(cfg, "feature_dtype", "float32"))
    fdt = jnp.bfloat16 if fdt_name == "bfloat16" else None
    # feature_pack requires a query_fn built with packed=True and
    # base_split-prepared weights (apps/eval_surs.py wires all three)
    rec = _get_reconstructor(
        model, query_fn, feature_dtype=fdt,
        feature_pack=bool(getattr(cfg, "feature_pack", False)
                          and query_fn is not None),
        octree_mode=resolve_auto(
            "octree_mode", getattr(cfg, "octree_mode", "hostloop")))
    weights = query_weights if query_weights is not None else params
    return rec.gen_mesh(cfg, params, weights, data, save_path, use_octree)


def make_point_eval(model: SuRSNet, params, feats_lr, feat_hr,
                    calib: jnp.ndarray,
                    query_fn: Optional[Callable] = None):
    """Standalone traceable [3, C] -> (hr [C], lr [C]) evaluator (test
    helper; closes over the given arrays)."""
    def eval_fn(points):
        pts = points[None]
        if query_fn is not None:
            hr, lr = query_fn(params, feats_lr, feat_hr, pts, calib)
        else:
            hr, lr = model.apply({"params": params}, feats_lr, feat_hr,
                                 pts, calib, method=SuRSNet.query)
        return hr[0], lr[0]
    return eval_fn
