import sys, os, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
"""Round 2 of the compaction probe: block-summary internals + variants.

Times the any-reduce and the 2M-lattice compaction separately, an
axis-ordered any-reduce variant, a 3-level (summary-of-summary) block
compaction, and the group point-compaction at smaller group sizes.
"""
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from surs_tpu.utils.synth import humanoid_sdf_jnp
import surs_tpu.recon.evaluator as ev

R = L = 512
B = 4
Lb = L // B
Lb3 = Lb ** 3


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
    print(f"  {label:<56s} {best*1e3:8.1f} ms", flush=True)
    return out


@jax.jit
def make_lat():
    g = jnp.linspace(-1.0, 1.0, R, dtype=jnp.float32)
    px = jnp.repeat(g, R * R)
    py = jnp.tile(jnp.repeat(g, R), R)
    pz = jnp.tile(g, R * R)
    d = humanoid_sdf_jnp(px, py, pz, 0.012)
    return jnp.abs(d) < (2.5 * 2.0 / R)

lat = make_lat()
fetch(lat[0])


@jax.jit
def any_6d(lat):
    x = lat.reshape(Lb, B, Lb, B, Lb, B)
    return x.any(axis=(1, 3, 5)).reshape(-1)

blk = timed("any-reduce, 6D axes (1,3,5) [current]", any_6d, lat)


@jax.jit
def any_seq(lat):
    # minor axis first (lanes), then progressively coarser
    x = lat.reshape(L, L, Lb, B).any(3)         # [L, L, Lb]
    x = x.reshape(L, Lb, B, Lb).any(2)          # [L, Lb, Lb]
    x = x.reshape(Lb, B, Lb, Lb).any(1)         # [Lb, Lb, Lb]
    return x.reshape(-1)

timed("any-reduce, sequential minor-first", any_seq, lat)


@jax.jit
def compact2m(blk):
    nb = jnp.sum(blk.astype(jnp.int32))
    pos = jnp.cumsum(blk.astype(jnp.int32)) - 1
    n_out = Lb3 + 65536
    target = jnp.where(blk, pos, n_out)
    out = jnp.zeros((n_out,), jnp.int32).at[target].set(
        jnp.arange(Lb3, dtype=jnp.int32), mode="drop")
    return out, nb

timed("2M block-lattice cumsum+scatter [current]", compact2m, blk)


@jax.jit
def compact_3level(blk):
    # summary-of-summary: compact the 2M block lattice hierarchically
    bc2, nb2 = ev._block_summary(blk, Lb, 4, 4096)      # 32k super blocks
    out_len = 4096 * 64 + 1
    comp, nb = ev._group_compact(blk, bc2, 0, nb2, Lb, 4, 4096, out_len)
    return comp, nb

timed("3-level block compaction (4096-super-groups)", compact_3level, blk)

for G in (16384, 8192):
    out_len = G * 64 + 262144

    @jax.jit
    def grouped(lat, blkc, nb, G=G, out_len=out_len):
        out = jnp.zeros((out_len,), jnp.int32)
        total = jnp.int32(0)

        def body(carry):
            out, total, g = carry
            comp_g, na_g = ev._group_compact(lat, blkc, g * G, nb, L,
                                             B, G, out_len)
            # consume (sum) instead of concatenating across groups
            return out + comp_g, total + na_g, g + 1

        out, total, _ = lax.while_loop(
            lambda ca: ca[2] * G < nb, body, (out, total, jnp.int32(0)))
        return out, total

    blkc, nb = ev._block_summary(lat, L, B, G)
    jax.block_until_ready(blkc)
    timed(f"group point-compact G={G} (while-loop groups)", grouped,
          lat, blkc, nb)

blkc, nb = ev._block_summary(lat, L, B, 65536)
jax.block_until_ready(blkc)
out_len = 65536 * 64 + 262144
gc = jax.jit(lambda lat, blkc, nb: ev._group_compact(
    lat, blkc, 0, nb, L, B, 65536, out_len))
timed("group point-compact G=65536 [current]", gc, lat, blkc, nb)
