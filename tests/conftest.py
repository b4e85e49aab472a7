"""Test configuration.

Device tests run on a virtual 8-device CPU mesh so multi-chip sharding is
exercised without TPU hardware (the driver separately dry-runs the multichip
path). Must be set before jax initializes its backend.
"""

import os

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
# keep the suite off the user's shape-history file (tests that exercise
# the history opt in with a tmp path via monkeypatch)
os.environ.setdefault("KMTRICKS_SHAPE_HISTORY", "0")

import jax

# The axon sitecustomize force-registers the TPU backend and overrides
# jax_platforms via jax.config — env vars alone are not enough. Re-override
# here, before any backend initializes (lazily, at first device use).
jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_data():
    """Path to the reference repo's tests/data, if mounted."""
    p = REFERENCE / "tests" / "data"
    if not p.exists():
        pytest.skip("reference test data not available")
    return p
