import sys, os, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
"""Phase anatomy of the device isosurface extractor.

Splits _march_core into its three phases (active-cell/point compaction,
triangle emission loop, slot-major vertex finalize + face remap), jits
each separately and times them fetch-synced on the humanoid volume, at
both the synthetic-benchmark scale (~200k cells) and a
trained-subject-like scale (detail cranked up, ~600-800k cells). Guides
kernel optimization; the production path stays the single fused
_march_core program.
"""
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from surs_tpu.utils.synth import humanoid_volume
import surs_tpu.recon.tetra_device as td

R = int(os.environ.get("MC_PHASE_RES", "512"))
ALGO = os.environ.get("MC_PHASE_ALGO", "cubes")
CHUNK = int(os.environ.get("MC_PHASE_CHUNK", str(1 << 16)))


def fetch(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def timed(label, fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    fetch(out[0] if isinstance(out, tuple) else out)
    best = 1e30
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        fetch(out[0] if isinstance(out, tuple) else out)
        best = min(best, time.time() - t0)
    print(f"  {label:<46s} {best*1e3:8.1f} ms", flush=True)
    return out


spec = td._ALGOS[ALGO]
n_slots = spec["n_slots"]
tpc = spec["tris_per_cell"]
deltas = spec["deltas"]

for detail, tag in ((0.012, "benchmark humanoid"),
                    (0.05, "rough trained-like")):
    vol = humanoid_volume(R, detail=detail)
    vol_flat = vol.reshape(-1)
    fetch(vol[0, 0, 0])
    X = Y = Z = R
    XYZ = R ** 3
    n_cells, n_pts = map(int, jax.device_get(
        td._count_cells(vol_flat, 0.5, (R, R, R), ALGO)))
    mc = td._bucket(n_cells, 1 << 15)
    mp = td._bucket(n_pts, 1 << 15)
    mt = tpc * mc
    mv = n_slots * mp
    n_vid = n_slots * mp
    print(f"--- {tag}: {n_cells} cells, {n_pts} pts, "
          f"buckets {mc}/{mp} ---", flush=True)

    @jax.jit
    def phase1(vol_flat):
        in3 = vol_flat.reshape(X, Y, Z) > jnp.float32(0.5)
        act = td._cells_active(in3).reshape(-1)
        pt = td._points_active(in3, deltas).reshape(-1)
        (compact, n_cells), (compact_p, n_pts) = \
            td._compact_capped_pair(act, pt, mc, mp)
        m = jnp.arange(mp, dtype=jnp.int32)
        ptgt = jnp.where(m < jnp.minimum(n_pts, mp), compact_p[:mp],
                         XYZ)
        rankp_lat = jnp.zeros((XYZ,), jnp.int32).at[ptgt].set(
            m, mode="drop")
        rankp_lat = rankp_lat | (td._case_lattice(in3).reshape(-1) << 24)
        return compact, compact_p, rankp_lat, n_cells, n_pts

    compact, compact_p, rankp_lat, nc, npts = timed(
        "phase1 active+compact x2 + rank lattice", phase1, vol_flat)

    @jax.jit
    def phase2(vol_flat, compact, rankp_lat, n_cells):
        na = jnp.minimum(n_cells, mc)
        num_chunks = (na + CHUNK - 1) // CHUNK
        fbuf0 = tuple(jnp.zeros((mt + 1,), jnp.int32) for _ in range(3))

        def body(carry):
            f0, f1, f2, n_tris, c = carry
            idx = c * CHUNK + jnp.arange(CHUNK, dtype=jnp.int32)
            cell_valid = idx < na
            gids = compact[jnp.minimum(idx, mc)]
            v0, v1, v2, valid = td._emit_cells(
                vol_flat, gids, cell_valid, rankp_lat, jnp.float32(0.5),
                (X, Y, Z), mp, ALGO, fold_case=True)
            pos = n_tris + jnp.cumsum(valid.astype(jnp.int32)) - 1
            ftgt = jnp.where(valid & (pos < mt), pos, mt)
            f0 = f0.at[ftgt].set(v0, mode="drop")
            f1 = f1.at[ftgt].set(v1, mode="drop")
            f2 = f2.at[ftgt].set(v2, mode="drop")
            n_tris = n_tris + jnp.sum(valid.astype(jnp.int32))
            return f0, f1, f2, n_tris, c + 1

        f0, f1, f2, n_tris, _ = lax.while_loop(
            lambda ca: ca[4] < num_chunks, body,
            fbuf0 + (jnp.int32(0), jnp.int32(0)))
        return f0, f1, f2, n_tris

    f0, f1, f2, n_tris = timed(f"phase2 emit loop (chunk {CHUNK})",
                               phase2, vol_flat, compact, rankp_lat, nc)

    if n_vid <= (1 << 21):
        # the production emit path since round-3 session 3: 2 packed
        # scatter streams instead of 3 (tetra_device._march_core)
        @jax.jit
        def phase2_packed(vol_flat, compact, rankp_lat, n_cells):
            na = jnp.minimum(n_cells, mc)
            num_chunks = (na + CHUNK - 1) // CHUNK
            fbuf0 = tuple(jnp.zeros((mt + 1,), jnp.int32)
                          for _ in range(2))

            def body(carry):
                e0, e1, n_tris, c = carry
                idx = c * CHUNK + jnp.arange(CHUNK, dtype=jnp.int32)
                cell_valid = idx < na
                gids = compact[jnp.minimum(idx, mc)]
                v0, v1, v2, valid = td._emit_cells(
                    vol_flat, gids, cell_valid, rankp_lat,
                    jnp.float32(0.5), (X, Y, Z), mp, ALGO,
                    fold_case=True)
                pos = n_tris + jnp.cumsum(valid.astype(jnp.int32)) - 1
                ftgt = jnp.where(valid & (pos < mt), pos, mt)
                e0 = e0.at[ftgt].set(v0 | (v1 << 21), mode="drop")
                e1 = e1.at[ftgt].set((v1 >> 11) | (v2 << 10),
                                     mode="drop")
                n_tris = n_tris + jnp.sum(valid.astype(jnp.int32))
                return e0, e1, n_tris, c + 1

            e0, e1, n_tris, _ = lax.while_loop(
                lambda ca: ca[3] < num_chunks, body,
                fbuf0 + (jnp.int32(0), jnp.int32(0)))
            return e0, e1, n_tris

        timed(f"phase2 emit loop PACKED 2-stream (chunk {CHUNK})",
              phase2_packed, vol_flat, compact, rankp_lat, nc)

    @jax.jit
    def phase3(vol_flat, compact_p, f0, f1, f2, n_tris, n_pts):
        # slot-major dense finalize over the compacted crossing points
        gidp = compact_p[:mp]
        pz = gidp % Z
        py = (gidp // Z) % Y
        px = gidp // (Y * Z)
        v0p = vol_flat[gidp]
        in0p = v0p > 0.5
        mp_ = jnp.arange(mp, dtype=jnp.int32)
        pok = mp_ < jnp.minimum(n_pts, mp)
        pres_parts, tq_parts = [], []
        for dx, dy, dz in deltas:
            step = (dx * Y + dy) * Z + dz
            inb = pok
            if dx:
                inb = inb & (px < X - 1)
            if dy:
                inb = inb & (py < Y - 1)
            if dz:
                inb = inb & (pz < Z - 1)
            vhi = vol_flat[jnp.where(inb, gidp + step, 0)]
            pres_parts.append(((vhi > 0.5) != in0p) & inb)
            denom = vhi - v0p
            denom = jnp.where(jnp.abs(denom) < 1e-12,
                              jnp.float32(1e-12), denom)
            tq_parts.append(jnp.clip((0.5 - v0p) / denom, 0.0, 1.0))
        present = jnp.concatenate(pres_parts)
        tq = jnp.concatenate(tq_parts)
        n_verts = jnp.sum(present.astype(jnp.int32))
        vpos = jnp.cumsum(present.astype(jnp.int32)) - 1
        remap = jnp.where(present, vpos, -1)
        vtgt = jnp.where(present & (vpos < mv), vpos, mv)
        vid_of = jnp.zeros((mv + 1,), jnp.int32).at[vtgt].set(
            jnp.arange(n_vid, dtype=jnp.int32), mode="drop")[:mv]
        t_of = jnp.zeros((mv + 1,), jnp.float32).at[vtgt].set(
            tq, mode="drop")[:mv]
        nt = jnp.minimum(n_tris, mt)
        g0 = remap[jnp.minimum(f0[:mt], n_vid - 1)]
        g1 = remap[jnp.minimum(f1[:mt], n_vid - 1)]
        g2 = remap[jnp.minimum(f2[:mt], n_vid - 1)]
        tri_ok = ((jnp.arange(mt) < nt)
                  & (g0 != g1) & (g1 != g2) & (g0 != g2))
        fpos = jnp.cumsum(tri_ok.astype(jnp.int32)) - 1
        ftgt = jnp.where(tri_ok, fpos, mt)
        w0 = g0 | (g1 << 21)
        w1 = (g1 >> 11) | (g2 << 10)
        fo = [jnp.zeros((mt + 1,), jnp.int32)
              .at[ftgt].set(w, mode="drop")[:mt] for w in (w0, w1)]
        n_faces = jnp.sum(tri_ok.astype(jnp.int32))
        return vid_of, t_of, fo[0], fo[1], n_verts, n_faces

    out = timed("phase3 finalize (verts + face remap)",
                phase3, vol_flat, compact_p, f0, f1, f2, n_tris, npts)
    print(f"  verts {int(jax.device_get(out[4]))} "
          f"faces {int(jax.device_get(out[5]))}", flush=True)

    # fused reference
    t0 = time.time()
    td.marching_tetrahedra_device(vol, 0.5, algorithm=ALGO)
    td._LAST_CELL_BUCKET.clear()
    t0 = time.time()
    td.marching_tetrahedra_device(vol, 0.5, algorithm=ALGO)
    print(f"  fused end-to-end (incl. count+wire+decode) "
          f"{(time.time()-t0)*1e3:8.1f} ms", flush=True)
