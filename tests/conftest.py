"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI, so all sharding/mesh tests
run against XLA's host-platform device emulation.

Note: this environment's sitecustomize imports jax and registers a
remote TPU platform at interpreter start, so setting JAX_PLATFORMS via
os.environ here is too late — the value was captured at first jax
import. jax.config.update works as long as no backend has initialized
yet, and avoids the ~50 s/compile remote-TPU round trips during tests.
"""

import os
import re

# Force the 8-device count even when the environment already carries a
# different value (e.g. a developer's =1 debugging setting): the mesh
# tests hard-require 8 and would otherwise fail confusingly.
_flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                os.environ.get("XLA_FLAGS", ""))
os.environ["XLA_FLAGS"] = (
    _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, (
    "conftest expected 8 virtual CPU devices, got %d (platform %s) — "
    "was JAX initialized before conftest ran?" %
    (jax.device_count(), jax.devices()[0].platform))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_TEST_DATA = "/root/reference/test_data"


@pytest.fixture
def rng():
    return np.random.RandomState(42)


@pytest.fixture
def reference_test_data():
    if not os.path.isdir(REFERENCE_TEST_DATA):
        pytest.skip("reference test data not available")
    return REFERENCE_TEST_DATA
