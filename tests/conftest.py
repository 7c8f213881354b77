"""Test config: force CPU with 8 virtual devices so mesh/sharding tests run
without TPU hardware (SURVEY.md §4).

The environment pre-initializes the axon TPU plugin (JAX_PLATFORMS=axon is
exported before the interpreter starts), so env-var overrides from conftest
are too late; ``jax.config`` before first backend use is the reliable route.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the suite re-jits the same model graphs every
# run; a warm cache cuts full-suite wall time several-fold (VERDICT r1 weak#7).
import os as _os  # noqa: E402

_CACHE_DIR = _os.path.join(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
except Exception:
    pass  # cache is an optimization only

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
