"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective tests run
against 8 virtual CPU devices instead.  Setting the flags here (before any jax
import) guarantees every test sees the same topology.
"""

import os

# Force CPU even when a TPU backend (e.g. the axon plugin) is configured:
# tests need a deterministic virtual 8-device topology.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import numpy as np
import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_images():
    if not REFERENCE.exists():
        pytest.skip("reference artifacts not available")
    return REFERENCE / "images"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
