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

from pathlib import Path  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

if _platform != "cpu":
    # Accelerator mode: computation runs in float32 (Mosaic kernels do not
    # lower under x64, and TPU f64 is emulated), while the suite's oracles
    # are float64-exact NumPy implementations with rtol as tight as 1e-13.
    # Those tolerances assert accumulation-order identity, which is a
    # CPU/x64 parity property, not a correctness property of the f32
    # hardware path.  Instead of duplicating every assertion, accelerator
    # runs apply a FLOOR to assert_allclose tolerances: every comparison
    # still runs — against the same oracles — at f32-level strictness.
    # assert_array_equal and exact integer checks are untouched.  The CPU
    # run remains the bit-level parity gate.
    #
    # The floors are PER KERNEL FAMILY, ~10x the deviations MEASURED on
    # the real chip by benchmarks/error_budget.py (table in
    # docs/kernel_design.md "Round-4: measured f32 error budget"); the
    # fallback floor covers transcendental-heavy ops (exp/log/KDE), whose
    # own measured bound is 2.6e-4 where log(x) -> 0.
    _orig_allclose = np.testing.assert_allclose

    _FAMILY_FLOORS = {
        # merge kernels: measured max rel 1.3e-5 (config 2 std)
        "test_hdr_merge": (2e-4, 2e-6),
        "test_hdr_pallas2": (2e-4, 2e-6),
        "test_hdr_u8_chunked": (2e-4, 2e-6),
        "test_hdr_corrections": (2e-4, 2e-6),
        "test_merge_properties": (2e-4, 2e-6),
        # calibration energies: measured max rel 2.5e-7
        "test_linearity": (1e-4, 1e-6),
        "test_linearity_chunked": (1e-4, 1e-6),
        # Welford / video: measured max rel 2.4e-6 at 1000-frame depth
        "test_video": (5e-5, 1e-6),
    }
    _DEFAULT_FLOOR = (5e-4, 2e-6)
    _current_floor = [_DEFAULT_FLOOR]

    def _f32_floored_allclose(actual, desired, rtol=1e-7, atol=0, **kw):
        frtol, fatol = _current_floor[0]
        return _orig_allclose(actual, desired, rtol=max(rtol, frtol),
                              atol=max(atol, fatol), **kw)

    np.testing.assert_allclose = _f32_floored_allclose

    @pytest.fixture(autouse=True)
    def _select_f32_floor(request):
        name = request.node.path.stem if hasattr(request.node, "path") \
            else Path(str(request.node.fspath)).stem
        _current_floor[0] = _FAMILY_FLOORS.get(name, _DEFAULT_FLOOR)
        yield
        _current_floor[0] = _DEFAULT_FLOOR


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


@pytest.fixture(scope="session")
def ftype():
    """The canonical float dtype of the device under test (float64 on the
    CPU parity gate, float32 on accelerators).

    LUT-indexing tests must cast their inputs through this dtype so the
    NumPy oracle quantizes the SAME values the device sees — otherwise an
    input within f32-epsilon of a bin boundary rounds to different LUT
    entries on the two paths and the comparison sees a full bin-width
    error rather than a rounding error."""
    return jax.dtypes.canonicalize_dtype(np.float64)
