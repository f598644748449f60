"""Microbenchmarks of the octree's per-level array ops at 512^3.

IMPORTANT: this backend elides repeated identical dispatches, so every
measurement is a single jitted program containing an n-iteration
fori_loop whose carry perturbs the input each step (data dependence
defeats both runtime elision and XLA CSE). Reported time = total / n.
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
# surface-shell-like dirty mask: ~1.2% density clustered around a sphere
ii = np.linspace(-1, 1, R, dtype=np.float32)
d = np.sqrt(ii[:, None, None]**2 + ii[None, :, None]**2 + ii[None, None, :]**2)
dirty_np = np.abs(d - 0.7) < 0.01
print(f"dirty density {dirty_np.mean():.4f} ({dirty_np.sum()/1e6:.2f}M pts)",
      flush=True)
dirty0 = jnp.asarray(dirty_np)


def timed(make_body, init, label, n=N_IT):
    @jax.jit
    def chain(init):
        return lax.fori_loop(0, n, make_body, init)
    out = jax.block_until_ready(chain(init))      # compile + warm
    t0 = time.time()
    out = jax.block_until_ready(chain(init))
    dt = (time.time() - t0) / n * 1000
    print(f"{label}: {dt:.1f} ms/iter", flush=True)
    return out


def perturb(dirty, salt):
    """Roll the mask by a data-dependent shift (keeps density, breaks CSE)."""
    flat = dirty.reshape(-1)
    return jnp.roll(flat, salt % 977).reshape(dirty.shape)


# 1) OLD full-lattice compaction at L=512 (cumsum + scatter over 134M)
def body_old(i, carry):
    dirty, s = carry
    flat = dirty.reshape(-1)
    na = jnp.sum(flat.astype(jnp.int32))
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    target = jnp.where(flat, pos, R3 + C)
    comp = jnp.zeros((R3 + C,), jnp.int32).at[target].set(
        jnp.arange(R3, dtype=jnp.int32), mode="drop")
    s = s + na + comp[0]
    return perturb(dirty, s), s
timed(body_old, (dirty0, jnp.int32(0)), "old full compact (134M)")

# 1b) cumsum alone / scatter alone for attribution
def body_cumsum(i, carry):
    dirty, s = carry
    pos = jnp.cumsum(dirty.reshape(-1).astype(jnp.int32))
    s = s + pos[-1]
    return perturb(dirty, s), s
timed(body_cumsum, (dirty0, jnp.int32(0)), "cumsum 134M")

# 2) NEW hierarchical: block summary + group0 compact (B=4, Mg=65536)
S = ev._GROUP_BLOCKS * ev._BLOCK ** 3 + C
def body_new(i, carry):
    dirty, s = carry
    blk_compact, nb = ev._block_summary(dirty, R, ev._BLOCK, ev._GROUP_BLOCKS)
    comp, na0 = ev._group_compact(dirty.reshape(-1), blk_compact,
                                  jnp.int32(0), nb, R, ev._BLOCK,
                                  ev._GROUP_BLOCKS, S)
    s = s + na0 + nb + comp[0]
    return perturb(dirty, s), s
out = timed(body_new, (dirty0, jnp.int32(0)), "hierarchical summary+group0")

# sanity: same dirty count both ways
blk_compact, nb = jax.jit(lambda d: ev._block_summary(d, R, 4, 65536))(dirty0)
comp, na0 = jax.jit(lambda d, b, nb: ev._group_compact(
    d.reshape(-1), b, jnp.int32(0), nb, R, 4, 65536, S))(dirty0, blk_compact, nb)
print(f"nb={int(nb)} blocks, na0={int(na0)} pts (true {dirty_np.sum()})",
      flush=True)

# 3) prune at reso=2 and 4
import functools
sdfh0 = jnp.asarray(rng.random((R, R, R)).astype(np.float32))
def mk_prune(reso):
    def body(i, carry):
        sdfh, sdfl, dirty, s = carry
        sdfh, sdfl, dirty = ev._prune_step(R, reso, 0.05, sdfh, sdfl, dirty)
        s = s + dirty.reshape(-1)[0].astype(jnp.int32)
        # sdf outputs feed the next iteration (natural data dependence);
        # re-dirty the mask so each iteration does comparable work
        return sdfh, sdfl, perturb(dirty | (sdfh > 0.5), s + 1), s
    return body
timed(mk_prune(2), (sdfh0, sdfh0 * 0.9, dirty0, jnp.int32(0)), "prune reso=2")
timed(mk_prune(4), (sdfh0, sdfh0 * 0.9, dirty0, jnp.int32(0)), "prune reso=4")

# 4) roll-perturbation overhead alone (subtract from the above)
def body_roll(i, carry):
    dirty, s = carry
    s = s + dirty.reshape(-1)[0].astype(jnp.int32)
    return perturb(dirty, s), s
timed(body_roll, (dirty0, jnp.int32(0)), "perturb-only overhead")
