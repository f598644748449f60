"""Device-mesh construction and sharding rules.

The reference is single-GPU with a dormant DataParallel hook
(lib/net_util.py:145-148, never engaged — SURVEY.md §2.3). Here data
parallelism and query-point sharding are first-class:

  * axis "data"  — batch dimension of training steps and batched
    reconstruction (DP); gradients all-reduce over ICI via the shardings
    XLA derives from replicated params + sharded batch.
  * axis "points" — the query-point axis of grid evaluation (the
    sequence-parallel analog for this workload, SURVEY.md §5): millions
    of occupancy queries split across chips.

Both axes live on one flat mesh by default; factory helpers let callers
pick the split.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
POINT_AXIS = "points"


def make_mesh(n_data: Optional[int] = None, n_points: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh over all (or given) devices: [data, points] axes."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_points
    assert n_data * n_points == len(devices), \
        f"{n_data}x{n_points} != {len(devices)} devices"
    arr = np.asarray(devices).reshape(n_data, n_points)
    return Mesh(arr, (DATA_AXIS, POINT_AXIS))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def point_sharding(mesh: Mesh, axis: int, ndim: int) -> NamedSharding:
    """Shard the point axis of a query tensor over the points axis."""
    spec = [None] * ndim
    spec[axis] = POINT_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put every array in a train batch with batch-axis sharding."""
    return {k: jax.device_put(v, batch_sharding(mesh, np.ndim(v)))
            for k, v in batch.items()}


def replicate_tree(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
