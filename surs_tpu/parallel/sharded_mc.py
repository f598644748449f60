"""Slab-sharded device isosurface extraction over a jax.sharding.Mesh.

The reference ships the full occupancy volume to the host and extracts
there (lib/mesh_util.py:40,45 — skimage marching cubes on one CPU). The
single-device TPU extractor (recon/tetra_device.py) already keeps
extraction on device; this module scales it ACROSS CHIPS: the volume is
split into x-slabs (one shard per mesh position), each device exchanges
a halo with its +x neighbor over ICI (lax.ppermute), runs the same
extraction core on its slab, and the host merges the per-shard wire
buffers by canonical GLOBAL edge id. The weld across slab boundaries is
bit-exact: both owners of a shared vertex compute its interpolation
parameter from the same two f32 field values with the same formula, so
the merge is an integer-key dedup, never an epsilon match.

Ownership discipline (what makes the union exact):

  * a CELL belongs to the shard containing its base plane — the
    per-shard active sets partition the global active set;
  * a canonical EDGE (min corner, delta) belongs to the shard
    containing its min corner; the first halo plane's points are
    (deliberately) detected by both neighbors and dedup'd by key;
  * the halo is HALO=4 planes so every slab edge stays a multiple of 4
    (the packed pair compaction's 4^3 dirty-block machinery needs it);
    the 3 extra planes are masked off via the extractor's x-limit
    stencil masks, and the LAST shard replaces its (circularly
    received, meaningless) halo with copies of its own last plane so
    no phantom crossings can form against it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..recon.tetra_device import _march_core, _count_cells, _ALGOS

HALO = 4
MC_AXIS = "mc"


def _slab_mesh(mesh: Optional[Mesh], axis: Optional[str]
               ) -> Tuple[Mesh, str]:
    if mesh is not None:
        return mesh, (axis or mesh.axis_names[-1])
    devs = jax.devices()
    return Mesh(np.asarray(devs), (MC_AXIS,)), MC_AXIS


def extract_isosurface_sharded(volume, level: float = 0.5,
                               mesh: Optional[Mesh] = None,
                               axis: Optional[str] = None,
                               algorithm: str = "cubes",
                               cell_chunk: int = 1 << 16,
                               max_cells_shard: int = 1 << 21,
                               max_tris_shard: Optional[int] = None
                               ) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the level isosurface of ``volume`` [X, Y, Z] with one
    x-slab per device of ``mesh[axis]``; returns host (verts [V, 3] f32
    grid coords, faces [F, 3] i64) — the SAME welded mesh as the
    single-device extractor (parity-tested), vertex order permuted.

    Requires X % n == 0, (X/n) % 4 == 0, X/n >= 4, Y % 4 == 0 and
    Z % 32 == 0 (the packed word stencil/compaction constraints at slab
    shape). Capacities are sized from a per-shard counting pass.
    """
    mesh, axis = _slab_mesh(mesh, axis)
    n = mesh.shape[axis]
    vol = jnp.asarray(volume, jnp.float32)
    X, Y, Z = vol.shape
    if X % n or (X // n) % 4 or X // n < HALO or Y % 4 or Z % 32:
        raise ValueError(
            f"sharded extraction needs X % {n} == 0, (X/n) % 4 == 0, "
            f"X/n >= {HALO}, Y % 4 == 0, Z % 32 == 0; got {vol.shape}")
    Xs = X // n
    spec = _ALGOS[algorithm]
    n_slots = spec["n_slots"]
    deltas = spec["deltas"]
    perm = [(i, (i - 1) % n) for i in range(n)]
    in_spec = P(*[axis if d == 0 else None for d in range(3)])
    lvl = jnp.float32(level)

    def slab_with_masks(vol_local):
        """[Xs, Y, Z] local slab -> ([Xs+HALO, Y, Z], x_act, x_pt)."""
        idx = lax.axis_index(axis)
        is_last = idx == n - 1
        halo = lax.ppermute(vol_local[:HALO], axis, perm)
        own = jnp.broadcast_to(vol_local[-1:], (HALO, Y, Z))
        halo = jnp.where(is_last, own, halo)
        slab = jnp.concatenate([vol_local, halo], axis=0)
        # interior shards own cells with base < Xs and points with
        # x <= Xs (the first halo plane: the +x neighbor detects the
        # same points — dedup'd by key); the last shard owns one plane
        # fewer of each (its halo is a duplicate plane, masked off)
        x_act = jnp.where(is_last, Xs - 1, Xs)
        x_pt = jnp.where(is_last, Xs, Xs + 1)
        # dx-carrying weld edges are real up to the slab end for
        # interior shards (their halo is the true neighbor volume) but
        # stop at the global max plane for the last shard — its
        # duplicated halo would register phantom DIAGONAL crossings
        # (duplicate-plane values differ once the delta shifts in y/z)
        x_edge = jnp.where(is_last, Xs - 1, Xs + HALO - 1)
        return slab, x_act, x_pt, x_edge

    @jax.jit
    def count(vol):
        def f(vol_local):
            slab, x_act, x_pt, _ = slab_with_masks(vol_local)
            nc, npt = _count_cells(slab.reshape(-1), lvl,
                                   (Xs + HALO, Y, Z), algorithm,
                                   x_act_limit=x_act, x_pt_limit=x_pt)
            return nc.reshape(1), npt.reshape(1)
        return shard_map(f, mesh=mesh, in_specs=in_spec,
                         out_specs=(P(axis), P(axis)),
                         check_rep=False)(vol)

    ncs, npts = jax.device_get(count(vol))
    mc = int(max(1, ncs.max()))
    mp = int(max(1, npts.max()))
    if mc > max_cells_shard:
        raise ValueError(f"sharded extraction: {mc} active cells in one "
                         f"slab > max_cells_shard {max_cells_shard}")
    if n_slots * mp > (1 << 21):
        raise ValueError("packed faces hold 21-bit vertex indices: "
                         "per-shard crossing points exceed the format")
    mt = min(spec["tris_per_cell"] * mc,
             max_tris_shard or spec["tris_per_cell"] * mc)
    mv = n_slots * mp

    def core(vol):
        def f(vol_local):
            slab, x_act, x_pt, x_edge = slab_with_masks(vol_local)
            out = _march_core(slab.reshape(-1), lvl, (Xs + HALO, Y, Z),
                              mc, mp, mt, mv, cell_chunk, algorithm,
                              x_act_limit=x_act, x_pt_limit=x_pt,
                              x_edge_limit=x_edge)
            return tuple(o.reshape((1,) + o.shape) for o in out)
        outs = shard_map(f, mesh=mesh, in_specs=in_spec,
                         out_specs=tuple([P(axis)] * 10),
                         check_rep=False)(vol)
        return outs

    outs = jax.device_get(core(vol))
    (vid_of, t_of, w0, w1, compact_p,
     n_verts, n_faces, n_cells, n_tris, n_pts) = outs
    if (n_cells > mc).any() or (n_pts > mp).any() \
            or (n_tris > mt).any() or (n_verts > mv).any():
        raise ValueError("sharded extraction capacity overflow "
                         f"(cells {n_cells.max()}/{mc}, pts "
                         f"{n_pts.max()}/{mp}, tris {n_tris.max()}/{mt})")

    # ---- host merge by canonical global edge id ----
    GXYZ = X * Y * Z
    keys, ts, faces = [], [], []
    voff = 0
    for s in range(n):
        nv = int(n_verts[s])
        nf = int(n_faces[s])
        vid = np.asarray(vid_of[s][:nv], np.int64)
        slot = vid // mp
        rank = vid % mp
        gid = np.asarray(compact_p[s], np.int64)[rank]   # slab-local
        ggid = gid + s * Xs * Y * Z   # same (Y*Z, Z, 1) strides globally
        keys.append(slot * GXYZ + ggid)
        ts.append(np.asarray(t_of[s][:nv], np.float32))
        w0h = np.asarray(w0[s][:nf]).view(np.uint32)
        w1h = np.asarray(w1[s][:nf]).view(np.uint32)
        f0 = (w0h & 0x1FFFFF).astype(np.int64)
        f1 = ((w0h >> 21) | ((w1h & 0x3FF) << 11)).astype(np.int64)
        f2 = ((w1h >> 10) & 0x1FFFFF).astype(np.int64)
        faces.append(np.stack([f0, f1, f2], axis=1) + voff)
        voff += nv
    key_all = np.concatenate(keys) if keys else np.zeros(0, np.int64)
    t_all = np.concatenate(ts) if ts else np.zeros(0, np.float32)
    uniq, first, inv = np.unique(key_all, return_index=True,
                                 return_inverse=True)
    slot_u = uniq // GXYZ
    gid_u = uniq % GXYZ
    lo = np.stack([gid_u // (Y * Z), (gid_u // Z) % Y, gid_u % Z],
                  axis=1).astype(np.float32)
    # replay lo + t * delta in f32 — bit-identical to the single-device
    # decode (recon/tetra_device.py finish())
    verts = lo + t_all[first][:, None].astype(np.float32) \
        * deltas[slot_u].astype(np.float32)
    faces_all = (np.concatenate(faces, axis=0) if faces
                 else np.zeros((0, 3), np.int64))
    return verts, inv[faces_all]
