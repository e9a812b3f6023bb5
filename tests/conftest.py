"""Test harness: run everything on a virtual 8-device CPU mesh.

The shell exports ``JAX_PLATFORMS=axon`` (single tunneled TPU chip) and the
jaxtyping pytest plugin imports jax before this conftest, so mutating
``os.environ`` alone is not enough — we must update the jax config after
import (backends are still uninitialized at conftest time, so this is safe).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on CPU devices"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.RandomState(0)
