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
if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
    # float64 for exact parity against the float64 NumPy oracles
    jax.config.update("jax_enable_x64", True)
else:
    # Any other value leaves the environment's default platform in place
    # (remote TPUs may register under a plugin name such as 'axon', so
    # forcing 'tpu' would fail to initialize).  x64 stays OFF on
    # accelerators: Mosaic kernels don't lower under int64 index maps,
    # and TPU f64 is emulated anyway.  Tight f64-parity oracles may
    # exceed tolerance in this mode — the parity suite is CPU-targeted;
    # accelerator runs validate compilation and f32-level agreement.
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng(request):
    """Per-test deterministic generator.

    Seeded from the test's node id (stable across runs and machines), so
    each test's data is independent of execution order — a session-scoped
    shared stream made test data depend on which tests ran before, which
    surfaced as order-dependent flakes near f32 LUT-bin boundaries.
    """
    import zlib
    seed = zlib.crc32(request.node.nodeid.encode()) ^ 1995
    return np.random.default_rng(seed)


@pytest.fixture(scope="session")
def n_devices():
    return len(jax.devices())
