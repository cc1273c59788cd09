"""Test configuration: force the JAX CPU backend with 8 virtual devices.

Mirrors the reference's backend-switch fixture idea (reference:
tests/conftest.py:13-31 selects NumPy vs CuPy via --use-cupy): here the same
suite runs on the CPU backend by default — including an 8-device virtual mesh
for sharding tests — and runs unchanged on real TPU when
CL_TPU_TEST_PLATFORM=tpu is exported.

float64 is enabled so parity tests against the float64 NumPy oracle are exact.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

_platform = os.environ.get("CL_TPU_TEST_PLATFORM", "cpu")
jax.config.update("jax_platforms", _platform)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1995)


@pytest.fixture(scope="session")
def n_devices():
    return len(jax.devices())
