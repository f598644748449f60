"""Multi-subject batched reconstruction across a device mesh.

BASELINE.json config 5 ("stretch: multi-subject batch reconstruction
pmapped across a TPU mesh"): subjects are sharded one-per-device over the
``data`` axis with ``shard_map``; every device runs the full
coarse-to-fine octree evaluation on its own subject concurrently —
per-device ``lax.while_loop`` trip counts diverge freely because the
evaluation contains no cross-device collectives. Host marching cubes then
runs per subject on the fetched volumes.

The per-device program is exactly recon.evaluator's level/prune steps, so
single-subject and batched paths share semantics and tests.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..recon.evaluator import (_level_step, _prune_upsample,
                               _level_schedule, _octree_state, EvalFn)
from ..recon.grid import grid_matrix
from ..recon.marching import extract_isosurface
from .mesh import DATA_AXIS


def _batched_spec(ndim: int) -> P:
    return P(DATA_AXIS, *([None] * (ndim - 1)))


def shard_eval_fn_over_points(eval_fn: EvalFn, mesh: Mesh) -> EvalFn:
    """Wrap a point evaluator so each chunk's point axis is sharded over
    the mesh's ``points`` axis — single-subject model parallelism over
    queries (the SP analog, SURVEY.md §5). ``ctx`` (features, weights,
    calib) is replicated; each device evaluates its slice of the chunk
    with the fused kernel, results concatenate along the point axis with
    no collectives inside the hot loop.

    Chunk sizes must be divisible by mesh.shape['points'].
    """
    from ..parallel.mesh import POINT_AXIS

    n_pts_axis = mesh.shape[POINT_AXIS]

    def wrapped(points: jnp.ndarray, ctx: Any):
        if n_pts_axis == 1:
            return eval_fn(points, ctx)

        def per_shard(pts_local, ctx):
            return eval_fn(pts_local, ctx)

        return shard_map(
            per_shard, mesh=mesh,
            in_specs=(P(None, POINT_AXIS), P()),
            out_specs=(P(POINT_AXIS), P(POINT_AXIS)),
            check_vma=False)(points, ctx)

    return wrapped


class ShardedReconstructor:
    """Evaluate B subjects' occupancy fields, one subject per device.

    ``eval_fn(points, ctx)`` as in recon.evaluator; ``ctx`` leaves must
    carry a leading batch axis of size B == mesh['data'] size.
    """

    def __init__(self, eval_fn: EvalFn, mesh: Mesh, resolution: int,
                 b_min, b_max, threshold: float = 0.05,
                 init_resolution: int = 64, num_samples: int = 50000):
        self.eval_fn = eval_fn
        self.mesh = mesh
        self.R = resolution
        self.threshold = threshold
        self.init_resolution = init_resolution
        self.num_samples = num_samples
        self.mat = grid_matrix((resolution,) * 3, b_min, b_max)
        self.n_data = mesh.shape[DATA_AXIS]
        self._level_jits: Dict = {}
        self._prune_jits: Dict = {}

    def _level(self, reso: int):
        if reso not in self._level_jits:
            base = functools.partial(_level_step, self.eval_fn, self.R,
                                     reso, self.num_samples, self.mat)

            def per_shard(val_hr, val_lr, evald, rfh, rfl, ctx):
                # strip the local batch axis (1 subject per device)
                ctx0 = jax.tree.map(lambda x: x[0], ctx)
                out = base(val_hr[0], val_lr[0], evald[0], rfh[0],
                           rfl[0], ctx0)
                return tuple(o[None] for o in out)

            ctx_spec = P(DATA_AXIS)  # leading batch axis on every leaf
            fn = shard_map(
                per_shard, mesh=self.mesh,
                in_specs=(_batched_spec(2),) * 5 + (ctx_spec,),
                out_specs=(_batched_spec(2),) * 2,
                check_vma=False)
            self._level_jits[reso] = jax.jit(fn)
        return self._level_jits[reso]

    def _prune(self, reso: int):
        if reso not in self._prune_jits:
            def base(vh, vl, ev, rfh, rfl):
                return _prune_upsample(self.R, reso, self.threshold,
                                       vh, vl, ev, rfh, rfl, None, None)

            def per_shard(val_hr, val_lr, evald, rfh, rfl):
                out = base(val_hr[0], val_lr[0], evald[0], rfh[0],
                           rfl[0])
                return tuple(o[None] for o in out)

            fn = shard_map(per_shard, mesh=self.mesh,
                           in_specs=(_batched_spec(2),) * 5,
                           out_specs=(_batched_spec(2),) * 5,
                           check_vma=False)
            self._prune_jits[reso] = jax.jit(fn)
        return self._prune_jits[reso]

    def evaluate(self, ctx: Any) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """ctx leaves: [B, ...] per-subject arrays. Returns
        (sdf_hr [B,R,R,R], sdf_lr [B,R,R,R])."""
        B, R = self.n_data, self.R
        sharding2 = NamedSharding(self.mesh, _batched_spec(2))
        state = _octree_state(R, self.init_resolution)
        val_hr, val_lr, evald, rfh, rfl = (
            jax.device_put(jnp.tile(x[None], (B, 1)), sharding2)
            for x in state)
        ctx = jax.tree.map(
            lambda x: jax.device_put(
                x, NamedSharding(self.mesh, _batched_spec(np.ndim(x)))),
            ctx)

        schedule = _level_schedule(R, self.init_resolution)
        for reso in schedule:
            val_hr, val_lr = self._level(reso)(val_hr, val_lr, evald,
                                               rfh, rfl, ctx)
            if reso <= 1:
                break
            val_hr, val_lr, evald, rfh, rfl = self._prune(reso)(
                val_hr, val_lr, evald, rfh, rfl)
        return (val_hr.reshape(B, R, R, R), val_lr.reshape(B, R, R, R))

    def reconstruct(self, ctx: Any, level: float = 0.5
                    ) -> List[Tuple[np.ndarray, np.ndarray,
                                    np.ndarray, np.ndarray]]:
        """Returns per-subject (verts_hr, faces_hr, verts_lr, faces_lr)."""
        sdf_hr, sdf_lr = self.evaluate(ctx)
        sdf_hr = np.asarray(sdf_hr)
        sdf_lr = np.asarray(sdf_lr)
        out = []
        for b in range(self.n_data):
            def extract(vol):
                verts, faces = extract_isosurface(vol, level)
                verts = verts @ self.mat[:3, :3].T + self.mat[:3, 3]
                return verts.astype(np.float32), faces
            vh, fh = extract(sdf_hr[b])
            vl, fl = extract(sdf_lr[b])
            out.append((vh, fh, vl, fl))
        return out
