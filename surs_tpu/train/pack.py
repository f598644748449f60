"""Single-transfer host->device batch shipping.

On a tunneled TPU link every `jnp.asarray` is its own transfer RPC with
a ~30-45 ms host enqueue floor; the 7-array training batch costs
~0.24 s/step of pure host time (BASELINE.md round-4 data-fed anatomy).
This module flattens the whole batch into ONE uint8 payload on the host
and unpacks it INSIDE the jitted train step — static slices plus
value-level bitcasts, zero extra dispatches — so a data-fed step pays
one transfer enqueue + one program enqueue instead of eight.

The reference has no counterpart (torch tensors hop to CUDA one
`.to(device)` at a time, apps/train_SuRS.py:122-131); this is a
TPU-remote-host concern. The unpack program is shape-static: the spec
(key, shape, dtype) tuple is part of the jit cache key, so steady-state
training reuses one compiled executable.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Spec = Tuple[Tuple[str, Tuple[int, ...], str], ...]


def pack_arrays(arrays: Dict[str, np.ndarray],
                key_order: Optional[Sequence[str]] = None
                ) -> Tuple[np.ndarray, Spec]:
    """Flatten a dict of host arrays into (uint8 payload, spec).

    The spec records (key, shape, numpy dtype str) per array in payload
    order; it is hashable so callers can key a jit cache on it. Multi-
    byte dtypes are written in native (little-endian) byte order — the
    device-side bitcast in :func:`unpack_arrays` assumes the same, which
    holds on every XLA platform this framework targets.
    """
    keys = tuple(sorted(arrays)) if key_order is None else tuple(key_order)
    parts, spec = [], []
    for k in keys:
        a = np.ascontiguousarray(arrays[k])
        # mirror jnp.asarray's dtype canonicalization (f64 -> f32 etc.
        # without x64) so the packed path ships exactly what the
        # per-array path would
        cd = jax.dtypes.canonicalize_dtype(a.dtype)
        if cd != a.dtype:
            a = np.ascontiguousarray(a.astype(cd))
        # bool travels as uint8 (XLA forbids bitcasting to PRED); the
        # spec marks it '|b1' so unpack restores it with a compare
        if a.dtype == np.bool_:
            spec.append((k, tuple(int(s) for s in a.shape), "|b1"))
            parts.append(a.astype(np.uint8).reshape(-1))
            continue
        spec.append((k, tuple(int(s) for s in a.shape), a.dtype.str))
        parts.append(a.reshape(-1).view(np.uint8))
    payload = (np.concatenate(parts) if parts
               else np.zeros((0,), np.uint8))
    return payload, tuple(spec)


def unpack_arrays(payload: jnp.ndarray, spec: Spec) -> Dict[str, jnp.ndarray]:
    """Traceable inverse of :func:`pack_arrays` (static slices, so the
    whole unpack folds into whatever program consumes it)."""
    out = {}
    off = 0
    for k, shape, dstr in spec:
        dt = np.dtype(dstr)
        n = int(np.prod(shape, dtype=np.int64)) * dt.itemsize
        seg = jax.lax.slice(payload, (off,), (off + n,))
        if dt == np.bool_:
            arr = (seg.reshape(shape) != 0)
        elif dt.itemsize == 1:
            arr = seg.reshape(shape)
            if dt != np.uint8:
                arr = jax.lax.bitcast_convert_type(arr, dt)
        else:
            arr = jax.lax.bitcast_convert_type(
                seg.reshape((-1, dt.itemsize)), dt).reshape(shape)
        out[k] = arr
        off += n
    return out


def make_packed_step(step_traceable, donate: bool = True):
    """Wrap a traceable train step (``make_train_step(..., jit=False)``)
    so it takes ``(state, payload, spec)`` with spec static. jit caches
    one executable per spec — fixed batch/load sizes reuse it across the
    whole run."""
    def packed(state, payload, spec):
        return step_traceable(state, unpack_arrays(payload, spec))

    return jax.jit(packed, static_argnums=(2,),
                   donate_argnums=(0,) if donate else ())
