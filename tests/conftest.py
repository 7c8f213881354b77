"""Test config: force CPU with 8 virtual devices so mesh/sharding tests run
without TPU hardware (SURVEY.md §4).

The environment pre-initializes the axon TPU plugin (JAX_PLATFORMS=axon is
exported before the interpreter starts), so env-var overrides from conftest
are too late; ``jax.config`` before first backend use is the reliable route.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
