"""Test configuration: force CPU with 8 virtual devices.

Multi-device (data/spatial parallel) correctness is testable without TPUs
via XLA's host-platform device-count override; set before jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

# The environment may import-and-register a TPU backend via sitecustomize
# before this file runs, which bakes in JAX_PLATFORMS from the parent env;
# override through jax.config (effective until a backend is initialized).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.device_count()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
