"""Microbenchmarks of the octree's per-level array ops at 512^3.

IMPORTANT: this backend elides repeated identical dispatches — even a
whole jitted chain re-dispatched with identical inputs returns the
cached result in ~0 ms. Every measurement below is therefore a single
jitted n-iteration fori_loop with data-dependent carries, AND the timed
call uses a different input than the warm-up call. Reported time =
total / n.
"""
import sys, os, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
import numpy as np, jax, jax.numpy as jnp
from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from jax import lax
from surs_tpu.recon import evaluator as ev

R = 512; R3 = R ** 3; C = 262144
N_IT = 4

rng = np.random.default_rng(0)
# surface-shell-like dirty mask: ~1.5% density around a sphere
ii = np.linspace(-1, 1, R, dtype=np.float32)
d = np.sqrt(ii[:, None, None]**2 + ii[None, :, None]**2 + ii[None, None, :]**2)
dirty_np = np.abs(d - 0.7) < 0.01
print(f"dirty density {dirty_np.mean():.4f} ({dirty_np.sum()/1e6:.2f}M pts)",
      flush=True)
dirty0 = jnp.asarray(dirty_np.reshape(-1))
dirty1 = jnp.asarray(np.roll(dirty_np.reshape(-1), 12345))


def timed(make_body, init_a, init_b, label, n=N_IT):
    @jax.jit
    def chain(init):
        return lax.fori_loop(0, n, make_body, init)
    jax.block_until_ready(chain(init_a))          # compile + warm
    t0 = time.time()
    jax.block_until_ready(chain(init_b))          # DIFFERENT input
    dt = (time.time() - t0) / n * 1000
    print(f"{label}: {dt:.1f} ms/iter", flush=True)


def perturb(flat, salt):
    return jnp.roll(flat, salt % 977)


# 1) OLD-style full-lattice compaction at L=512 (cumsum+scatter 134M)
def body_old(i, carry):
    flat, s = carry
    comp, na = ev._full_compact(flat, R3, R3 + C)
    s = s + na + comp[0]
    return perturb(flat, s), s
timed(body_old, (dirty0, jnp.int32(0)), (dirty1, jnp.int32(0)),
      "full compact 134M (old)")

# 2) NEW hierarchical: block summary + group0 compact (B=4, Mg=65536)
S = ev._GROUP_BLOCKS * ev._BLOCK ** 3 + C
def body_new(i, carry):
    flat, s = carry
    blk_compact, nb = ev._block_summary(flat, R, ev._BLOCK,
                                        ev._GROUP_BLOCKS)
    comp, na0 = ev._group_compact(flat, blk_compact, jnp.int32(0), nb,
                                  R, ev._BLOCK, ev._GROUP_BLOCKS, S)
    s = s + na0 + nb + comp[0]
    return perturb(flat, s), s
timed(body_new, (dirty0, jnp.int32(0)), (dirty1, jnp.int32(0)),
      "hierarchical summary+group0")

# sanity: same dirty count both ways
blk_compact, nb = jax.jit(
    lambda d: ev._block_summary(d, R, 4, 65536))(dirty0)
comp, na0 = jax.jit(lambda d, b, nb: ev._group_compact(
    d, b, jnp.int32(0), nb, R, 4, 65536, S))(dirty0, blk_compact, nb)
print(f"nb={int(nb)} blocks, na0={int(na0)} pts (true {dirty_np.sum()})",
      flush=True)

# 3) prune+upsample at the two biggest levels (L=256 -> 512, 128 -> 256)
def mk_prune(reso):
    L = R // reso
    L3 = L ** 3
    def body(i, carry):
        vh, vl, ev_f, rfh, rfl, s = carry
        vh, vl, ev_f, rfh, rfl = ev._prune_upsample(
            R, reso, 0.05, vh, vl, ev_f, rfh, rfl, None, None)
        # shrink back to the level's prefix with fresh-ish data so each
        # iteration does the same work (output feeds input: no CSE)
        s = s + (vh[0] > 0).astype(jnp.int32)
        vh = vh.at[:L3].set(jnp.roll(vh[L3:2 * L3], s % 977))
        ev_f = ev_f.at[:L3].set(False)
        rfh = rfh.at[:L3].set(False)
        rfl = rfl.at[:L3].set(False)
        return vh, vl, ev_f, rfh, rfl, s
    return body

vh0 = jnp.asarray(rng.random(R3).astype(np.float32))
vl0 = vh0 * 0.9
ev0 = jnp.zeros((R3,), bool)
rf0 = jnp.zeros((R3,), bool)
for reso in (2, 4):
    timed(mk_prune(reso), (vh0, vl0, ev0, rf0, rf0, jnp.int32(0)),
          (vh0 * 1.01, vl0, ev0, rf0, rf0, jnp.int32(1)),
          f"prune+upsample reso={reso} (L={R//reso})")

# 4) roll-perturbation overhead alone (subtract from the above)
def body_roll(i, carry):
    flat, s = carry
    s = s + flat[0].astype(jnp.int32)
    return perturb(flat, s), s
timed(body_roll, (dirty0, jnp.int32(0)), (dirty1, jnp.int32(0)),
      "perturb-only overhead")
