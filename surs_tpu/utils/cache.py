"""Persistent XLA compilation cache.

On this class of TPU deployment, compilation goes through a remote
service and can take minutes for the big fused programs; the persistent
cache makes every subsequent process start warm. Call
:func:`enable_compilation_cache` before building any jitted program.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..",
                           ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> str | None:
    import jax

    # CPU executables are AOT-compiled against the build host's exact ISA
    # feature set; loading them on a different machine can SIGILL. Only
    # accelerator programs are worth caching anyway.
    #
    # Decide from the CONFIGURED platform when possible instead of
    # jax.default_backend(): the latter initializes the PJRT backend,
    # and a caller that still wants fork-based DataLoader workers (the
    # pool must be built before the JAX runtime exists — data/loader.py)
    # would lose them to the spawn fallback just by enabling the cache.
    # On this rig sitecustomize's register() sets jax_platforms="axon"
    # at import time, so the config answers without any init.
    platforms = (getattr(jax.config, "jax_platforms", None)
                 or os.environ.get("JAX_PLATFORMS", ""))
    first = platforms.split(",")[0].strip().lower()
    if first == "cpu":
        return None
    if not first and jax.default_backend() == "cpu":
        return None
    path = os.path.abspath(path or os.environ.get(
        "SURS_COMPILATION_CACHE", DEFAULT_DIR))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
