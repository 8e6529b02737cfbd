"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective tests run
against 8 virtual CPU devices instead.  Setting the flags here (before any jax
import) guarantees every test sees the same topology.
"""

import os

# Force CPU even when a TPU backend (e.g. the axon plugin) is configured:
# tests need a deterministic virtual 8-device topology.  The site hook imports
# jax at interpreter startup, so plain env assignment here is too late — use
# jax.config.update, which takes effect until the first backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() >= 8, "expected 8 virtual CPU devices"

import pathlib

import numpy as np
import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_images():
    if not REFERENCE.exists():
        pytest.skip("reference artifacts not available")
    return REFERENCE / "images"


@pytest.fixture()
def rng():
    # Function-scoped: every test sees the same deterministic stream
    # regardless of execution order.
    return np.random.default_rng(0)
