"""Test configuration: CPU-simulated 8-device mesh + x64 parity mode.

The reference's tests run fp64 on a single device (SURVEY.md §4). Here we
additionally simulate a multi-device TPU topology on CPU so the distributed
layer is unit-testable without a pod
(XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

import os

# Must be set before jax import. Hard override: the session environment pins
# JAX_PLATFORMS to the TPU tunnel, but unit tests always run on (virtual
# 8-device) CPU; only bench.py talks to the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is NOT honored by the axon TPU-tunnel plugin; the config
# update below is what actually pins tests to the virtual 8-device CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Compiles on this host are slow (~1-15s each); persist them across runs.
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
