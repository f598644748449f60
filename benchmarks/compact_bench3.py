import sys, os, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
"""Bit-packed vs per-point-bool compaction A/B at 512^3 (round 3).

Isolates the two round-3 compaction levers on the real humanoid
lattices:
  * extractor PAIR compaction: packed word-gather path
    (_pack_pair + _group_compact2_packed + 3-level block ids) vs the
    unpacked two-level loop it replaced;
  * octree single-lattice group compaction: _pack_bits +
    _group_compact_packed vs _group_compact, over the same dirty set.
Fetch-synced minima (CLAUDE.md discipline).
"""
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from surs_tpu.utils.synth import humanoid_volume
import surs_tpu.recon.tetra_device as td
from surs_tpu.recon import evaluator as ev

R = int(os.environ.get("CB3_RES", "512"))


def fetch(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def timed(label, fn, *args, reps=3):
    out = fn(*args)
    fetch(out[1])
    best = 1e30
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        fetch(out[1])
        best = min(best, time.time() - t0)
    print(f"  {label:<52s} {best*1e3:8.1f} ms", flush=True)
    return out


vol = humanoid_volume(R, detail=0.012)
deltas = td._ALGOS["cubes"]["deltas"]


@jax.jit
def lattices(vol):
    in3 = vol > jnp.float32(0.5)
    return (td._cells_active(in3).reshape(-1),
            td._points_active(in3, deltas).reshape(-1))


act, pt = lattices(vol)
n_act = int(jnp.sum(act.astype(jnp.int32)))
n_pt = int(jnp.sum(pt.astype(jnp.int32)))
mc = td._bucket(n_act, 1 << 15)
mp = td._bucket(n_pt, 1 << 15)
print(f"{R}^3 humanoid: {n_act} cells, {n_pt} crossing points, "
      f"buckets {mc}/{mp}", flush=True)

G = td._MC_GROUP_BLOCKS
S = G * 64


@jax.jit
def pair_packed(act, pt):
    (ca, na), (cp, npt) = td._compact_capped_pair(act, pt, mc, mp)
    return ca, na + npt


@jax.jit
def pair_unpacked(act, pt):
    """The replaced path: bool-gather group loop + direct block scatter."""
    L = R
    blk_compact, nb = ev._block_summary(act | pt, L, 4, G)
    outa0 = jnp.zeros((mc + S,), jnp.int32)
    outp0 = jnp.zeros((mp + S,), jnp.int32)

    def body(carry):
        outa, na, outp, npt, g = carry
        ca, na_g, cp, np_g = td._group_compact2(
            act, pt, blk_compact, g * G, nb, L, 4, G, S)
        outa = lax.dynamic_update_slice(outa, ca[:S],
                                        (jnp.minimum(na, mc),))
        outp = lax.dynamic_update_slice(outp, cp[:S],
                                        (jnp.minimum(npt, mp),))
        return outa, na + na_g, outp, npt + np_g, g + 1

    outa, na, outp, npt, _ = lax.while_loop(
        lambda c: c[4] * G < nb, body,
        (outa0, jnp.int32(0), outp0, jnp.int32(0), jnp.int32(0)))
    return outa, na + npt


a_p = timed("extractor pair compaction PACKED (production)",
            pair_packed, act, pt)
a_u = timed("extractor pair compaction unpacked (replaced)",
            pair_unpacked, act, pt)

# ---- octree-style single-lattice sweep over the union dirty set ----
EG = ev._GROUP_BLOCKS
ES = EG * 64


@jax.jit
def oct_packed(lat):
    words = ev._pack_bits(lat)
    blk, nb = ev._block_summary_packed(words, R, EG)

    def body(carry):
        acc, g = carry
        comp, na_g = ev._group_compact_packed(words, blk, g * EG, nb,
                                              R, EG, ES)
        return acc + na_g + comp[0], g + 1

    acc, _ = lax.while_loop(lambda c: c[1] * EG < nb, body,
                            (jnp.int32(0), jnp.int32(0)))
    return acc, acc


@jax.jit
def oct_unpacked(lat):
    blk, nb = ev._block_summary(lat, R, 4, EG)

    def body(carry):
        acc, g = carry
        comp, na_g = ev._group_compact(lat, blk, g * EG, nb, R, 4,
                                       EG, ES)
        return acc + na_g + comp[0], g + 1

    acc, _ = lax.while_loop(lambda c: c[1] * EG < nb, body,
                            (jnp.int32(0), jnp.int32(0)))
    return acc, acc


union = act | pt
o_p = timed("octree lattice summary+groups PACKED (production)",
            oct_packed, union)
o_u = timed("octree lattice summary+groups unpacked (replaced)",
            oct_unpacked, union)
assert int(o_p[0]) == int(o_u[0]), (int(o_p[0]), int(o_u[0]))
print("octree packed/unpacked checksums agree", flush=True)
