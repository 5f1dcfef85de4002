"""Test configuration: force an 8-device virtual CPU mesh so tests run fast
and sharding tests work without TPU hardware (the driver separately
dry-runs the multi-chip path; bench.py runs on the real chip)."""
import os

os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip())

import jax

# sitecustomize may have pre-imported jax with the TPU plugin; switching the
# platform before first backend use still selects CPU.
jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeated suite runs skip XLA recompiles
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
