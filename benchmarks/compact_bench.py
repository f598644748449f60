import sys, os, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
"""Sub-phase probe of the hierarchical dirty compaction at L=512.

Builds the final-level dirty lattice of the humanoid octree run and
times: the dirty stencil, the block summary, one group point-compaction
(and its gather/cumsum/scatter parts), and the chunked eval loop with a
near-free field — to locate _level_step's cost before optimizing it.
"""
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from surs_tpu.utils.synth import humanoid_sdf_jnp
import surs_tpu.recon.evaluator as ev

R = 512
L = R // 1
CHUNK = 262144


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
    print(f"  {label:<52s} {best*1e3:8.1f} ms", flush=True)
    return out


# final-level dirty lattice: the ~1-2 voxel shell the octree leaves
# dirty at stride 1 — approximated by |d| < 2.5 voxels
@jax.jit
def make_lat():
    g = jnp.linspace(-1.0, 1.0, R, dtype=jnp.float32)
    px = jnp.repeat(g, R * R)
    py = jnp.tile(jnp.repeat(g, R), R)
    pz = jnp.tile(g, R * R)
    d = humanoid_sdf_jnp(px, py, pz, 0.012)
    return jnp.abs(d) < (2.5 * 2.0 / R)

lat = timed("dirty lattice (implicit shell)", make_lat)
nd = int(jax.device_get(jnp.sum(lat.astype(jnp.int32))))
GB = ev._GROUP_BLOCKS
print(f"  dirty points {nd} | _BLOCK={ev._BLOCK} _GROUP_BLOCKS={GB}",
      flush=True)

blkc, nb = timed("block summary (any-reduce + 2M-lattice compact)",
                 jax.jit(lambda lat: ev._block_summary(
                     lat, L, ev._BLOCK, GB)), lat)
print(f"  dirty blocks {int(jax.device_get(nb))}", flush=True)

out_len = GB * ev._BLOCK ** 3 + CHUNK
gc = jax.jit(lambda lat, blkc, nb: ev._group_compact(
    lat, blkc, 0, nb, L, ev._BLOCK, GB, out_len))
compact, na = timed(f"group point-compact (G={GB}, cand={GB*64})",
                    gc, lat, blkc, nb)
print(f"  compacted points {int(jax.device_get(na))}", flush=True)

# parts of group compact
Lb = L // ev._BLOCK
B3 = ev._BLOCK ** 3


@jax.jit
def part_gather(lat, blkc, nb):
    m = jnp.arange(GB, dtype=jnp.int32)
    b = blkc[m]
    bk = b % Lb
    bj = (b // Lb) % Lb
    bi = b // (Lb * Lb)
    t = jnp.arange(B3, dtype=jnp.int32)
    tk = t % ev._BLOCK
    tj = (t // ev._BLOCK) % ev._BLOCK
    ti = t // (ev._BLOCK * ev._BLOCK)
    li = bi[:, None] * ev._BLOCK + ti[None, :]
    lj = bj[:, None] * ev._BLOCK + tj[None, :]
    lk = bk[:, None] * ev._BLOCK + tk[None, :]
    gidx = (li * L + lj) * L + lk
    flags = lat[gidx] & (m < nb)[:, None]
    return jnp.sum(flags.astype(jnp.int32)), gidx[0, 0]

timed("  part: element gather of 4.2M flags", part_gather, lat, blkc, nb)


@jax.jit
def part_rowgather(lat_bm, blkc, nb):
    m = jnp.arange(GB, dtype=jnp.int32)
    b = blkc[m]
    rows = lat_bm[b] & (m < nb)[:, None]     # [G, 64] row gathers
    return jnp.sum(rows.astype(jnp.int32)), b[0]


@jax.jit
def to_block_major(lat):
    x = lat.reshape(Lb, ev._BLOCK, Lb, ev._BLOCK, Lb, ev._BLOCK)
    return x.transpose(0, 2, 4, 1, 3, 5).reshape(Lb ** 3, B3)

lat_bm = timed("  part: lattice -> block-major [2M, 64] transpose",
               to_block_major, lat)
timed("  part: ROW gather of 65536 x 64 flags", part_rowgather,
      lat_bm, blkc, nb)


@jax.jit
def part_scatter(flags_flat, gidx_flat):
    pos = jnp.cumsum(flags_flat.astype(jnp.int32)) - 1
    target = jnp.where(flags_flat, pos, out_len)
    return jnp.zeros((out_len,), jnp.int32).at[target].set(
        gidx_flat, mode="drop")

flags_demo = jnp.zeros((GB * B3,), bool).at[:nd].set(True)
gidx_demo = jnp.arange(GB * B3, dtype=jnp.int32)
timed("  part: cumsum+scatter of 4.2M candidates", part_scatter,
      flags_demo, gidx_demo)


def eval_fn(points, ctx):
    d = humanoid_sdf_jnp(points[0], points[1], points[2], 0.012)
    occ = jnp.clip(0.5 - 40.0 * d, 0.0, 1.0)
    return occ, occ


@jax.jit
def part_chunks(compact, na):
    R3 = R ** 3
    vh = jnp.zeros((R3,), jnp.float32)
    vl = jnp.zeros((R3,), jnp.float32)
    scale = jnp.float32(2.0 / (R - 1))

    def body(c2):
        vh, vl, c = c2
        idx = lax.dynamic_slice(compact, (c * CHUNK,), (CHUNK,))
        k = idx % L
        j = (idx // L) % L
        i = idx // (L * L)
        pts = jnp.stack([i, j, k]).astype(jnp.float32) * scale - 1.0
        hr, lr = eval_fn(pts, None)
        valid = (c * CHUNK + jnp.arange(CHUNK, dtype=jnp.int32)) < na
        tgt = jnp.where(valid, idx, R3)
        vh = vh.at[tgt].set(hr, mode="drop")
        vl = vl.at[tgt].set(lr, mode="drop")
        return vh, vl, c + 1

    nchunk = (na + CHUNK - 1) // CHUNK
    vh, vl, _ = lax.while_loop(lambda c2: c2[2] < nchunk, body,
                               (vh, vl, jnp.int32(0)))
    return vh, vl

timed("chunked eval+scatter loop (near-free field)", part_chunks,
      compact, na)
