"""Test configuration: run everything on CPU with 8 fake devices so the full
distributed path (shard_map, collectives, N-vs-1-device bit-exactness) is
exercised without TPU hardware (SURVEY.md §4.5)."""

import os

# Must be set before jax import anywhere in the test process.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize registers the remote-TPU platform and pins
# jax_platforms=axon at interpreter start; the env var alone cannot override
# it, but the config update after import can.  Tests run on the local CPU
# backend with 8 fake devices.
jax.config.update("jax_platforms", "cpu")

# XLA compilation in this sandbox is slow (~tens of seconds per executable);
# the persistent cache makes re-runs fast.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop JAX's in-memory executable caches after each test module.

    The full suite accumulates hundreds of live compiled executables in one
    process; past ~a-full-run's worth, jaxlib 0.9's CPU client segfaults
    inside a later XLA compile (observed deterministically in
    test_samples' matcher compile when the POA v2 suite grew).  Clearing
    per module keeps the live set small; the persistent .jax_cache keeps
    re-compiles cheap (deserialize, not rebuild)."""
    yield
    jax.clear_caches()
