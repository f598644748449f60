import sys, os, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))
"""Random gather/scatter rate model for this TPU.

What does one random access into an HBM-resident array actually cost?
Informs the device-MC kernel design: every phase of _march_core is a
mix of such accesses. Findings (v5e, see BASELINE.md):

  * single-element random gathers: ~14 ns/elem regardless of table
    size down to ~1M elems;
  * [N, row] row layouts with row < 128 are UNUSABLE on TPU (the
    (8, 128) tile pads the minor dim: [67M, 2] f32 allocates 34 GB);
    contiguous-row gathers must use 128-lane rows;
  * sorted (spatially coherent) indices vs uniform-random measured
    separately — the MC compact cell list is sorted.

Device-side fori chains with data-dependent indices defeat dispatch
elision; timings end in a scalar fetch.
"""
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

ITERS = 20


def _idx(seed, c, n_idx, n_rows, mode):
    r = (seed + c.astype(jnp.uint32) * jnp.uint32(2654435761)
         + jnp.arange(n_idx, dtype=jnp.uint32) * jnp.uint32(40503))
    if mode == "sorted":
        # coherent walk: consecutive indices land in a narrow window
        base = (jnp.arange(n_idx, dtype=jnp.uint32)
                * jnp.uint32(max(n_rows // n_idx, 1)))
        r = base + r % jnp.uint32(16)
    return (r % jnp.uint32(n_rows)).astype(jnp.int32)


def rate(table_rows, row, n_idx, mode="random", iters=ITERS):
    """ms per pass gathering n_idx rows of `row` f32."""
    tab = jnp.zeros((table_rows, row), jnp.float32) if row > 1 \
        else jnp.zeros((table_rows,), jnp.float32)

    @jax.jit
    def run(tab, seed):
        def body(c, acc):
            idx = _idx(seed, c, n_idx, table_rows, mode)
            g = tab[idx]
            return acc + jnp.sum(g)
        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(run(tab, jnp.uint32(1)))             # compile
    best = 1e30
    for rep in range(2):
        t0 = time.time()
        float(run(tab, jnp.uint32(7 + rep)))
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


def scatter_rate(table_elems, n_idx, iters=ITERS):
    tab = jnp.zeros(table_elems, dtype=jnp.float32)

    @jax.jit
    def run(tab, seed):
        def body(c, t):
            idx = _idx(seed, c, n_idx, table_elems, "random")
            return t.at[idx].set(jnp.float32(c))
        return jnp.sum(lax.fori_loop(0, iters, body, tab)[:8])

    float(run(tab, jnp.uint32(1)))
    best = 1e30
    for rep in range(2):
        t0 = time.time()
        float(run(tab, jnp.uint32(7 + rep)))
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


N = 1 << 20
print(f"{'rows':>10s} {'row':>4s} {'mode':>7s} {'ms/pass':>8s} "
      f"{'ns/row':>7s}", flush=True)
for rows, row in ((1 << 27, 1), (1 << 24, 1), (1 << 20, 1), (1 << 16, 1),
                  (1 << 20, 128), (1 << 17, 128), ((1 << 27) // 128, 128)):
    for mode in ("random", "sorted"):
        ms = rate(rows, row, N, mode)
        print(f"{rows:>10d} {row:>4d} {mode:>7s} {ms:8.2f} "
              f"{ms*1e6/N:7.1f}", flush=True)

print("scatter (f32 element .at[].set):", flush=True)
for table in (1 << 27, 1 << 20):
    ms = scatter_rate(table, N)
    print(f"{table:>10d} {'1':>4s} {'random':>7s} {ms:8.2f} "
          f"{ms*1e6/N:7.1f}", flush=True)
