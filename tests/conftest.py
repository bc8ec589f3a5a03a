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
# CPU tests get their OWN cache dir: the TPU-tunnel sessions sharing
# /tmp/jax_cache deposit XLA:CPU AOT entries compiled on the remote axon
# host (AMX-class CPU); loading those here warns "machine type ... doesn't
# match" and can SIGILL/segfault mid-suite.
os.makedirs("/tmp/jax_cache_cputests", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cputests")
# Persist only genuinely slow compiles. With min_compile_time 0 this host
# segfaults inside put_executable_and_time serializing certain tiny CPU
# executables (gather/scatter transpose programs), leaving truncated cache
# entries that then segfault on read in the next run.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import gc  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

_TESTS_RUN = 0


def pytest_runtest_teardown(item, nextitem):
    """Drop JAX executable caches every 40 tests.

    XLA:CPU keeps every compiled executable mmapped; across the full suite
    the process crosses vm.max_map_count (65530 default on this microVM)
    and XLA segfaults inside backend_compile (observed deterministically at
    ~153 tests, ~65k maps). Recompiles are amortized by the persistent
    disk cache.
    """
    global _TESTS_RUN
    _TESTS_RUN += 1
    if _TESTS_RUN % 40 == 0:
        jax.clear_caches()
        gc.collect()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
