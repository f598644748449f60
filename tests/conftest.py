"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding is validated the standard JAX way — a host-platform
device count override — since real multi-chip hardware is unavailable in CI.

Note: this environment's sitecustomize force-registers a remote TPU
backend ("axon") and overrides the JAX_PLATFORMS env var, so we must also
override the config *after* importing jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1991)
