import sys, os, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
import numpy as np, jax, jax.numpy as jnp
from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from jax import lax

R = 512; R3 = R**3; C = 262144

def t(f, *a, n=3, label=""):
    out = jax.block_until_ready(f(*a))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(f(*a))
    print(f"{label}: {(time.time()-t0)/n*1000:.1f} ms", flush=True)
    return out

rng = np.random.default_rng(0)
dirty = jnp.asarray(rng.random((R,R,R)) < 0.05)

# compact v2 (cumsum + scatter into R3+C buffer)
@jax.jit
def compact(dirty):
    flat = dirty.reshape(-1)
    na = jnp.sum(flat.astype(jnp.int32))
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    target = jnp.where(flat, pos, R3)
    comp = jnp.zeros((R3 + C,), jnp.int32).at[target].set(
        jnp.arange(R3, dtype=jnp.int32), mode="drop")
    return comp, na
comp, na = t(compact, dirty, label="compact(cumsum+scatter 134M)")

# cumsum alone
@jax.jit
def just_cumsum(dirty):
    return jnp.cumsum(dirty.reshape(-1).astype(jnp.int32))
t(just_cumsum, dirty, label="cumsum 134M")

# scatter alone (134M targets)
pos = jnp.cumsum(dirty.reshape(-1).astype(jnp.int32)) - 1
target = jnp.where(dirty.reshape(-1), pos, R3)
@jax.jit
def just_scatter(target):
    return jnp.zeros((R3 + C,), jnp.int32).at[target].set(
        jnp.arange(R3, dtype=jnp.int32), mode="drop")
t(just_scatter, target, label="scatter 134M")

# chunk scatter (262k .at[i,j,k].set into 512^3)
idx = jnp.asarray(rng.integers(0, R3, C, dtype=np.int32))
vals = jnp.asarray(rng.random(C).astype(np.float32))
sdf = jnp.zeros((R,R,R), jnp.float32)
@jax.jit
def chunk_scatter(sdf, idx, vals):
    i = idx // (R*R); j = (idx // R) % R; k = idx % R
    return sdf.at[i, j, k].set(vals, mode="drop")
t(chunk_scatter, sdf, idx, vals, label="scatter 262k into 512^3")

# gather 262k
@jax.jit
def chunk_gather(compact_arr, s):
    return lax.dynamic_slice(compact_arr, (s,), (C,))
t(chunk_gather, comp, jnp.int32(0), label="dyn slice 262k")

# prune at reso=2
from surs_tpu.recon.evaluator import _prune_step
sdfh = jnp.asarray(rng.random((R,R,R)).astype(np.float32))
sdfl = sdfh * 0.9
import functools
pr = jax.jit(functools.partial(_prune_step, R, 2, 0.05))
t(pr, sdfh, sdfl, dirty, label="prune reso=2")
pr4 = jax.jit(functools.partial(_prune_step, R, 4, 0.05))
t(pr4, sdfh, sdfl, dirty, label="prune reso=4")

# searchsorted for comparison
pos_pad = jnp.cumsum(dirty.reshape(-1).astype(jnp.int32))
@jax.jit
def ss(pos_pad, s):
    j = s + jnp.arange(C, dtype=jnp.int32)
    return jnp.searchsorted(pos_pad, j + 1, side="left")
t(ss, pos_pad, jnp.int32(0), label="searchsorted 262k in 134M")

# gather 134M from small buffer (the merge pattern)
buf = jnp.asarray(rng.random(2*C).astype(np.float32))
take = jnp.minimum(pos_pad - 1, 2*C - 1).clip(0)
@jax.jit
def big_gather(buf, take):
    return buf[take]
t(big_gather, buf, take, label="gather 134M from small buf")
