"""Test configuration: force an 8-virtual-device CPU platform.

Tests run on CPU with XLA's host-platform device-count override so the
data-parallel mesh paths are exercised without TPU hardware (the TPU-native
substitute for a fake multi-node backend — SURVEY.md section 4).
Must run before jax is imported anywhere.
"""

import os

# The image's sitecustomize imports jax at interpreter start (axon TPU
# tunnel), so env vars set here are too late for jax's import-time config —
# use jax.config.update instead.  XLA_FLAGS is read lazily at backend init,
# which has not happened yet.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# CPU compiles are cached across test runs (the TPU tunnel's remote compile
# bypasses this cache, but CPU honors it) — big suite-time saver.
jax.config.update("jax_compilation_cache_dir", "/tmp/awm_tpu_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def speechlike(rng):
    """A 1-s 16 kHz clip with speech-like spectral tilt (deterministic)."""
    t = np.arange(16000) / 16000.0
    x = (
        0.3 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 680 * t + 0.7)
        + 0.1 * np.sin(2 * np.pi * 1500 * t + 1.3)
        + 0.02 * rng.standard_normal(16000)
    )
    return x.astype(np.float32)
