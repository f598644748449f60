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

Compile discipline (remote backends pay 3-12 min per program): the
count and core programs are cached module-wide keyed on every static
(mesh devices, slab shape, algorithm, capacities, chunk), the level is
a traced argument, and capacities are BUCKETED to 2^15 quanta so nearby
surfaces of the same subject family reuse one compiled core.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..recon.tetra_device import (_march_core, _count_cells, _ALGOS,
                                  _bucket, unpack_wire_faces,
                                  replay_wire_vertices)

HALO = 4
MC_AXIS = "mc"

_PROGRAMS: Dict = {}   # static-key -> compiled count/core program


def _slab_mesh(mesh: Optional[Mesh], axis: Optional[str]
               ) -> Tuple[Mesh, str]:
    if mesh is not None:
        return mesh, (axis or mesh.axis_names[-1])
    devs = jax.devices()
    return Mesh(np.asarray(devs), (MC_AXIS,)), MC_AXIS


def _mesh_key(mesh: Mesh, axis: str):
    return (tuple(d.id for d in mesh.devices.flat), mesh.axis_names,
            axis)


def _slab_with_masks(vol_local, axis: str, n: int, Xs: int, Y: int,
                     Z: int):
    """[Xs, Y, Z] local slab -> ([Xs+HALO, Y, Z], x_act, x_pt, x_edge)."""
    idx = lax.axis_index(axis)
    is_last = idx == n - 1
    perm = [(i, (i - 1) % n) for i in range(n)]
    halo = lax.ppermute(vol_local[:HALO], axis, perm)
    own = jnp.broadcast_to(vol_local[-1:], (HALO, Y, Z))
    halo = jnp.where(is_last, own, halo)
    slab = jnp.concatenate([vol_local, halo], axis=0)
    # interior shards own cells with base < Xs and points with x <= Xs
    # (the first halo plane: the +x neighbor detects the same points —
    # dedup'd by key); the last shard owns one plane fewer of each (its
    # halo is a duplicate plane, masked off)
    x_act = jnp.where(is_last, Xs - 1, Xs)
    x_pt = jnp.where(is_last, Xs, Xs + 1)
    # dx-carrying weld edges are real up to the slab end for interior
    # shards (their halo is the true neighbor volume) but stop at the
    # global max plane for the last shard — its duplicated halo would
    # register phantom DIAGONAL crossings (duplicate-plane values DO
    # differ once the delta shifts in y/z)
    x_edge = jnp.where(is_last, Xs - 1, Xs + HALO - 1)
    return slab, x_act, x_pt, x_edge


def _count_program(mesh: Mesh, axis: str, n: int, Xs: int, Y: int,
                   Z: int, algorithm: str):
    key = ("count", _mesh_key(mesh, axis), Xs, Y, Z, algorithm)
    if key not in _PROGRAMS:
        in_spec = P(axis, None, None)

        def f(vol_local, lvl):
            slab, x_act, x_pt, _ = _slab_with_masks(vol_local, axis, n,
                                                    Xs, Y, Z)
            nc, npt = _count_cells(slab.reshape(-1), lvl,
                                   (Xs + HALO, Y, Z), algorithm,
                                   x_act_limit=x_act, x_pt_limit=x_pt)
            return nc.reshape(1), npt.reshape(1)

        _PROGRAMS[key] = jax.jit(shard_map(
            f, mesh=mesh, in_specs=(in_spec, P()),
            out_specs=(P(axis), P(axis)), check_vma=False))
    return _PROGRAMS[key]


def _core_program(mesh: Mesh, axis: str, n: int, Xs: int, Y: int,
                  Z: int, algorithm: str, mc: int, mp: int, mt: int,
                  mv: int, cell_chunk: int):
    key = ("core", _mesh_key(mesh, axis), Xs, Y, Z, algorithm,
           mc, mp, mt, mv, cell_chunk)
    if key not in _PROGRAMS:
        in_spec = P(axis, None, None)

        def f(vol_local, lvl):
            slab, x_act, x_pt, x_edge = _slab_with_masks(
                vol_local, axis, n, Xs, Y, Z)
            out = _march_core(slab.reshape(-1), lvl, (Xs + HALO, Y, Z),
                              mc, mp, mt, mv, cell_chunk, algorithm,
                              x_act_limit=x_act, x_pt_limit=x_pt,
                              x_edge_limit=x_edge)
            return tuple(o.reshape((1,) + o.shape) for o in out)

        _PROGRAMS[key] = jax.jit(shard_map(
            f, mesh=mesh, in_specs=(in_spec, P()),
            out_specs=tuple([P(axis)] * 10), check_vma=False))
    return _PROGRAMS[key]


def extract_isosurface_sharded_begin(volume, level: float = 0.5,
                                     mesh: Optional[Mesh] = None,
                                     axis: Optional[str] = None,
                                     algorithm: str = "cubes",
                                     cell_chunk: int = 1 << 16,
                                     max_cells_shard: int = 1 << 21,
                                     max_tris_shard: Optional[int] = None,
                                     defer_sync: bool = False):
    """Dispatch the sharded extraction of ``volume`` [X, Y, Z] — one
    x-slab per device of ``mesh[axis]`` — and return its result staged
    behind the same resolve()/finish() protocol as the single-device
    ``marching_tetrahedra_device_begin``:

      * the COUNT program is enqueued here; with ``defer_sync=True`` the
        caller gets ``resolve`` back before any device sync, so a second
        extraction (the LR field) can be enqueued back-to-back and the
        mesh pipelines both;
      * ``resolve()`` fetches the per-shard counts, sizes (bucketed)
        capacities, enqueues the core program and the bucketed wire
        slices, and returns ``finish``;
      * ``finish()`` fetches the slices and does the host merge by
        canonical global edge id.

    ``defer_sync=False`` returns ``resolve()()`` directly: host
    (verts [V, 3] f32 grid coords, faces [F, 3] i64) — the SAME welded
    mesh as the single-device extractor (parity-tested), vertex order
    permuted.

    Requires X % n == 0, (X/n) % 4 == 0, X/n >= 4, Y % 4 == 0 and
    Z % 32 == 0 (the packed word stencil/compaction constraints at slab
    shape).
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
    lvl = jnp.float32(level)

    counts_pend = _count_program(mesh, axis, n, Xs, Y, Z, algorithm)(
        vol, lvl)

    def resolve():
        ncs, npts = jax.device_get(counts_pend)
        nc = int(max(1, ncs.max()))
        npt = int(max(1, npts.max()))
        if nc > max_cells_shard:
            raise ValueError(
                f"sharded extraction: {nc} active cells in one "
                f"slab > max_cells_shard {max_cells_shard}")
        if n_slots * npt > (1 << 21):
            raise ValueError("packed faces hold 21-bit vertex indices: "
                             "per-shard crossing points exceed the format")
        # bucketed capacities: nearby surfaces reuse one compiled core
        mc = min(max_cells_shard, _bucket(nc, 1 << 15))
        mp = max(npt, min((1 << 21) // n_slots, _bucket(npt, 1 << 15)))
        mt = spec["tris_per_cell"] * mc
        if max_tris_shard is not None:
            mt = min(mt, max_tris_shard)
        mv = n_slots * mp

        outs = _core_program(mesh, axis, n, Xs, Y, Z, algorithm, mc, mp,
                             mt, mv, cell_chunk)(vol, lvl)
        # counts first (tiny), then only BUCKETED prefixes of the
        # per-shard wire buffers cross the host link (the capacity-sized
        # buffers can be 10x+ the live data; bucketing keeps the slice
        # programs reused across nearby surfaces, mirroring the
        # single-device resolve())
        n_verts, n_faces, n_cells, n_tris, n_pts = \
            jax.device_get(outs[5:10])
        if (n_cells > mc).any() or (n_pts > mp).any() \
                or (n_tris > mt).any() or (n_verts > mv).any():
            raise ValueError(
                "sharded extraction capacity overflow (cells "
                f"{n_cells.max()}/{mc}, pts {n_pts.max()}/{mp}, tris "
                f"{n_tris.max()}/{mt}, verts {n_verts.max()}/{mv})")
        bv = min(_bucket(int(max(1, n_verts.max()))), mv)
        bf = min(_bucket(int(max(1, n_faces.max()))), mt)
        bc = min(_bucket(int(max(1, n_pts.max()))), mp)
        slices = [outs[0][:, :bv], outs[1][:, :bv],
                  outs[2][:, :bf], outs[3][:, :bf], outs[4][:, :bc]]
        for s in slices:
            try:
                s.copy_to_host_async()
            except Exception:
                pass  # backend without async copies: finish() is sync

        def finish() -> Tuple[np.ndarray, np.ndarray]:
            vid_of, t_of, w0, w1, compact_p = map(jax.device_get, slices)
            # ---- host merge by canonical global edge id ----
            GXYZ = X * Y * Z
            keys, ts, faces = [], [], []
            voff = 0
            for s in range(n):
                nv = int(n_verts[s])
                nf = int(n_faces[s])
                vid = np.asarray(vid_of[s][:nv], np.int64)
                slot = vid // mp
                gid = np.asarray(compact_p[s], np.int64)[vid % mp]
                ggid = gid + s * Xs * Y * Z  # (Y*Z, Z, 1) strides global
                keys.append(slot * GXYZ + ggid)
                ts.append(np.asarray(t_of[s][:nv], np.float32))
                faces.append(unpack_wire_faces(
                    np.asarray(w0[s][:nf]).view(np.uint32),
                    np.asarray(w1[s][:nf]).view(np.uint32)) + voff)
                voff += nv
            key_all = np.concatenate(keys)
            t_all = np.concatenate(ts)
            uniq, first, inv = np.unique(key_all, return_index=True,
                                         return_inverse=True)
            verts = replay_wire_vertices(uniq % GXYZ, uniq // GXYZ,
                                         t_all[first], spec["deltas"],
                                         Y, Z)
            return verts, inv[np.concatenate(faces, axis=0)]

        return finish

    if defer_sync:
        return resolve
    return resolve()()


def extract_isosurface_sharded(volume, level: float = 0.5,
                               **kw) -> Tuple[np.ndarray, np.ndarray]:
    """One-call sharded extraction (see
    :func:`extract_isosurface_sharded_begin` for the staged protocol and
    the slab-shape requirements)."""
    return extract_isosurface_sharded_begin(volume, level, **kw)
