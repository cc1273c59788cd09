"""v2 fused-merge kernel (planar / NHWC, ops/hdr_pallas2.py) parity vs the
jnp reference path.

Runs in interpreter mode on CPU (the kernel auto-selects); the same code
compiles natively on TPU, where it is the merge_hdr default
(measured 588 MP/s on BASELINE config 2, benchmarks/RESULTS.md).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from camera_linearity_tpu.ops import hdr
from camera_linearity_tpu.ops.hdr_pallas2 import (merge_nhwc_fused,
                                                  merge_planar_fused)


@pytest.fixture
def inputs(rng):
    n, h, w, c = 4, 21, 60, 3  # ragged H: exercises grid-tail masking
    stack_val = rng.uniform(0.02, 0.98, (n, h, w, c)).astype(np.float32)
    stack_std = rng.uniform(0.001, 0.02, (n, h, w, c)).astype(np.float32)
    exposures = np.array([0.002, 0.004, 0.008, 0.016], np.float32)
    icrf = np.sort(rng.uniform(0, 1, (256, c)), axis=0).astype(np.float32)
    icrf[0], icrf[-1] = 0.0, 1.0
    icrf_diff = np.gradient(icrf.astype(np.float64), 2 / 255,
                            axis=0).astype(np.float32)
    return stack_val, stack_std, exposures, icrf, icrf_diff


@pytest.mark.parametrize("mode", ["corrected", "reference"])
def test_nhwc_fused_matches_jnp(inputs, mode):
    stack_val, stack_std, exposures, icrf, icrf_diff = inputs
    args = tuple(jnp.asarray(a) for a in
                 (stack_val, stack_std, exposures, icrf, icrf_diff))
    pv, ps = merge_nhwc_fused(*args, compat=mode, hb=8)
    jv, js = hdr.merge_stack(*args, compat=mode)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(jv), rtol=5e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(js), rtol=5e-4,
                               atol=1e-6)


def test_nhwc_fused_no_std(inputs):
    stack_val, _, exposures, icrf, icrf_diff = inputs
    args = (jnp.asarray(stack_val), None, jnp.asarray(exposures),
            jnp.asarray(icrf), jnp.asarray(icrf_diff))
    pv, ps = merge_nhwc_fused(*args, hb=8)
    assert ps is None
    jv, _ = hdr.merge_stack(*args)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(jv), rtol=5e-5,
                               atol=1e-6)


def test_nhwc_fused_uint8_stack(inputs, rng):
    _, stack_std, exposures, icrf, icrf_diff = inputs
    dn = rng.integers(0, 256, stack_std.shape).astype(np.uint8)
    args = (jnp.asarray(dn), jnp.asarray(stack_std),
            jnp.asarray(exposures), jnp.asarray(icrf),
            jnp.asarray(icrf_diff))
    pv, ps = merge_nhwc_fused(*args, hb=8)
    jv, js = hdr.merge_stack_u8(*args)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(jv), rtol=5e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(js), rtol=5e-4,
                               atol=1e-6)


def test_planar_matches_nhwc(inputs):
    stack_val, stack_std, exposures, icrf, icrf_diff = inputs
    args = tuple(jnp.asarray(a) for a in (exposures, icrf, icrf_diff))
    sv, ss = jnp.asarray(stack_val), jnp.asarray(stack_std)
    pv, ps = merge_planar_fused(jnp.transpose(sv, (0, 3, 1, 2)),
                                jnp.transpose(ss, (0, 3, 1, 2)),
                                *args, hb=8)
    nv, ns = merge_nhwc_fused(sv, ss, *args, hb=8)
    np.testing.assert_allclose(np.asarray(pv),
                               np.asarray(jnp.transpose(nv, (2, 0, 1))))
    np.testing.assert_allclose(np.asarray(ps),
                               np.asarray(jnp.transpose(ns, (2, 0, 1))))


def test_single_channel_and_grayscale(rng):
    n, h, w = 3, 16, 32
    stack_val = rng.uniform(0.05, 0.95, (n, h, w, 1)).astype(np.float32)
    stack_std = rng.uniform(0.001, 0.01, (n, h, w, 1)).astype(np.float32)
    exposures = np.array([0.001, 0.002, 0.004], np.float32)
    icrf = np.sort(rng.uniform(0, 1, (256, 1)), axis=0).astype(np.float32)
    icrf_diff = np.gradient(icrf.astype(np.float64), 2 / 255,
                            axis=0).astype(np.float32)
    args = tuple(jnp.asarray(a) for a in
                 (stack_val, stack_std, exposures, icrf, icrf_diff))
    pv, ps = merge_nhwc_fused(*args, hb=8)
    jv, js = hdr.merge_stack(*args)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(jv), rtol=5e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(js), rtol=5e-4,
                               atol=1e-6)


def test_rejects_non_256_tables(inputs):
    stack_val, stack_std, exposures, icrf, icrf_diff = inputs
    with pytest.raises(NotImplementedError):
        merge_nhwc_fused(jnp.asarray(stack_val), jnp.asarray(stack_std),
                         jnp.asarray(exposures),
                         jnp.asarray(icrf[:128]),
                         jnp.asarray(icrf_diff[:128]))


def _interp_tables(rng, bits, c):
    """256-point base curves + their np.interp expansions to ``bits``
    (the reference's >8-bit construction,
    ICRF_calibration_exposure.py:204-216)."""
    base = np.sort(rng.uniform(0, 1, (256, c)), axis=0).astype(np.float64)
    base[0], base[-1] = 0.0, 1.0
    diff_base = np.gradient(base, 2 / 255, axis=0)
    x = np.arange(bits) / (bits - 1)
    xb = np.arange(256) / 255.0
    icrf = np.stack([np.interp(x, xb, base[:, ch]) for ch in range(c)], 1)
    diff = np.stack([np.interp(x, xb, diff_base[:, ch]) for ch in range(c)],
                    1)
    return (base.astype(np.float32), diff_base.astype(np.float32),
            icrf.astype(np.float32), diff.astype(np.float32))


@pytest.mark.parametrize("bits", [1024, 4096, 16384, 65536])
def test_lerp_kernel_matches_expanded_radix(inputs, rng, bits):
    """Piecewise-linear kernel on base curves == jnp radix merge on the
    np.interp-expanded tables (merge semantics of 10/12/14/16-bit stacks;
    the reference supports arbitrary BIT_DEPTH, global_settings.py:36)."""
    from camera_linearity_tpu.ops.hdr_pallas2 import merge_nhwc_lerp
    stack_val, stack_std, exposures, _, _ = inputs
    c = stack_val.shape[-1]
    base, diff_base, icrf, diff = _interp_tables(rng, bits, c)
    pv, ps = merge_nhwc_lerp(
        jnp.asarray(stack_val), jnp.asarray(stack_std),
        jnp.asarray(exposures), jnp.asarray(base), jnp.asarray(diff_base),
        bits=bits, hb=8)
    jv, js = hdr.merge_stack(
        jnp.asarray(stack_val), jnp.asarray(stack_std),
        jnp.asarray(exposures), jnp.asarray(icrf), jnp.asarray(diff))
    np.testing.assert_allclose(np.asarray(pv), np.asarray(jv), rtol=2e-4,
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(js), rtol=1e-3,
                               atol=2e-6)


def test_lerp_kernel_int_dns_and_no_std(inputs, rng):
    from camera_linearity_tpu.ops.hdr_pallas2 import merge_nhwc_lerp
    _, stack_std, exposures, _, _ = inputs
    c = stack_std.shape[-1]
    bits = 4096
    base, diff_base, icrf, diff = _interp_tables(rng, bits, c)
    dn = rng.integers(0, bits, stack_std.shape).astype(np.int32)
    pv, ps = merge_nhwc_lerp(jnp.asarray(dn), None, jnp.asarray(exposures),
                             jnp.asarray(base), None, bits=bits, hb=8)
    assert ps is None
    jv, _ = hdr.merge_stack_u8(jnp.asarray(dn), None,
                               jnp.asarray(exposures), jnp.asarray(icrf),
                               jnp.asarray(diff))
    np.testing.assert_allclose(np.asarray(pv), np.asarray(jv), rtol=2e-4,
                               atol=2e-6)


def test_merge_hdr_routes_base_curves(inputs, rng, monkeypatch):
    """merge_hdr prefers the lerp kernel when base curves are given on TPU
    (here: assert the jnp fallback still runs on CPU and agrees)."""
    stack_val, stack_std, exposures, _, _ = inputs
    c = stack_val.shape[-1]
    base, diff_base, icrf, diff = _interp_tables(rng, 4096, c)
    v1, s1 = hdr.merge_hdr(jnp.asarray(stack_val), jnp.asarray(stack_std),
                           jnp.asarray(exposures), jnp.asarray(icrf),
                           jnp.asarray(diff), icrf_base=jnp.asarray(base),
                           icrf_diff_base=jnp.asarray(diff_base))
    v2, s2 = hdr.merge_stack(jnp.asarray(stack_val),
                             jnp.asarray(stack_std),
                             jnp.asarray(exposures), jnp.asarray(icrf),
                             jnp.asarray(diff))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=2e-4,
                               atol=2e-6)


def test_is_piecewise_linear_256(rng):
    from camera_linearity_tpu.ops.hdr_pallas2 import is_piecewise_linear_256
    base, _, icrf, _ = _interp_tables(rng, 4096, 2)
    assert is_piecewise_linear_256(icrf.astype(np.float64))
    raw = np.sort(rng.uniform(0, 1, (4096, 2)), axis=0)
    assert not is_piecewise_linear_256(raw)
    assert not is_piecewise_linear_256(base)  # <=256 never qualifies


@pytest.mark.parametrize("use_std", [True, False])
def test_lerp_bp_fused_matches_chain(rng, use_std):
    """Fused hot-pixel-repair merge == bad_pixel_filter chain + lerp merge
    (the one-kernel config-3 path), including image borders."""
    from camera_linearity_tpu.ops.hdr_pallas2 import (merge_nhwc_lerp,
                                                      merge_nhwc_lerp_bp)
    from camera_linearity_tpu.ops.filters import bad_pixel_filter
    import jax
    n, h, w, c = 3, 32, 40, 2   # h divides hb=16; borders exercised
    bits = 4096
    val = rng.uniform(0.05, 0.95, (n, h, w, c)).astype(np.float32)
    std = rng.uniform(0.001, 0.01, (n, h, w, c)).astype(np.float32) \
        if use_std else None
    # ~5% hot pixels, including corners
    dark = (rng.uniform(0, 1, (n, h, w, c)) > 0.95).astype(np.float32)
    dark[0, 0, 0, 0] = 1.0
    dark[1, -1, -1, -1] = 1.0
    exposures = np.array([0.002, 0.004, 0.008], np.float32)
    base, diff_base, _, _ = _interp_tables(rng, bits, c)
    thr = jnp.asarray(0.5, jnp.float32)

    pv, ps = merge_nhwc_lerp_bp(
        jnp.asarray(val), None if std is None else jnp.asarray(std),
        jnp.asarray(dark), jnp.asarray(exposures), jnp.asarray(base),
        jnp.asarray(diff_base) if use_std else None, thr, bits=bits)

    if use_std:
        fv, fs = jax.vmap(lambda v, s, d: bad_pixel_filter(
            v, s, d, thr, 3))(jnp.asarray(val), jnp.asarray(std),
                              jnp.asarray(dark))
    else:
        fv = jax.vmap(lambda v, d: bad_pixel_filter(
            v, None, d, thr, 3)[0])(jnp.asarray(val), jnp.asarray(dark))
        fs = None
    jv, js = merge_nhwc_lerp(fv, fs, jnp.asarray(exposures),
                             jnp.asarray(base),
                             jnp.asarray(diff_base) if use_std else None,
                             bits=bits)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(jv), rtol=1e-6,
                               atol=1e-7)
    if use_std:
        np.testing.assert_allclose(np.asarray(ps), np.asarray(js),
                                   rtol=1e-5, atol=1e-7)
    else:
        assert ps is None


def test_lerp_bp_uint8_mask_matches_dark_frames(rng):
    """A precomputed uint8 hot-pixel mask (hot_pixel_mask) produces
    bit-identical merges to the float dark-frame path, through BOTH the
    fused kernel and the bad_pixel_filter chain."""
    from camera_linearity_tpu.ops.hdr_pallas2 import merge_nhwc_lerp_bp
    from camera_linearity_tpu.ops.filters import (bad_pixel_filter,
                                                  hot_pixel_mask)
    import jax
    n, h, w, c = 3, 32, 40, 2
    bits = 4096
    val = rng.uniform(0.05, 0.95, (n, h, w, c)).astype(np.float32)
    std = rng.uniform(0.001, 0.01, (n, h, w, c)).astype(np.float32)
    dark = rng.uniform(0, 1, (n, h, w, c)).astype(np.float32)
    exposures = np.array([0.002, 0.004, 0.008], np.float32)
    base, diff_base, _, _ = _interp_tables(rng, bits, c)
    thr = jnp.asarray(0.6, jnp.float32)
    mask = hot_pixel_mask(jnp.asarray(dark), thr)
    assert mask.dtype == jnp.uint8

    dv, ds = merge_nhwc_lerp_bp(
        jnp.asarray(val), jnp.asarray(std), jnp.asarray(dark),
        jnp.asarray(exposures), jnp.asarray(base), jnp.asarray(diff_base),
        thr, bits=bits)
    mv, ms = merge_nhwc_lerp_bp(
        jnp.asarray(val), jnp.asarray(std), mask,
        jnp.asarray(exposures), jnp.asarray(base), jnp.asarray(diff_base),
        thr, bits=bits)
    np.testing.assert_array_equal(np.asarray(dv), np.asarray(mv))
    np.testing.assert_array_equal(np.asarray(ds), np.asarray(ms))

    fv, _ = jax.vmap(lambda v, s, d: bad_pixel_filter(v, s, d, thr, 3))(
        jnp.asarray(val), jnp.asarray(std), jnp.asarray(dark))
    gv, _ = jax.vmap(lambda v, s, m: bad_pixel_filter(
        v, s, m, thr, 3, dark_is_mask=True))(
        jnp.asarray(val), jnp.asarray(std), mask)
    np.testing.assert_array_equal(np.asarray(fv), np.asarray(gv))
    # mask semantics are explicit opt-in: an integer map WITHOUT the flag
    # keeps the reference's '> threshold' contract (filter_larger_than_by
    # _map may receive integer DN maps)
    int_map = (np.asarray(dark) * 255).astype(np.uint8)
    hv, _ = jax.vmap(lambda v, s, m: bad_pixel_filter(
        v, s, m, jnp.asarray(100.0, jnp.float32), 3))(
        jnp.asarray(val), jnp.asarray(std), jnp.asarray(int_map))
    ov, _ = jax.vmap(lambda v, s, m: bad_pixel_filter(
        v, s, m, jnp.asarray(100.0, jnp.float32), 3))(
        jnp.asarray(val), jnp.asarray(std),
        jnp.asarray(int_map.astype(np.float32)))
    np.testing.assert_array_equal(np.asarray(hv), np.asarray(ov))


def test_lerp_bp_256_degenerates_to_exact_lookup(rng):
    """With a 256-entry table as its own base, the lerp kernel's t is
    identically 0/1 and the fused-corrections merge equals the exact
    8-bit kernel on the repaired stack (merge_corrected's 8-bit route)."""
    from camera_linearity_tpu.ops.hdr_pallas2 import (merge_nhwc_fused,
                                                      merge_nhwc_lerp_bp)
    from camera_linearity_tpu.ops.filters import bad_pixel_filter
    import jax
    n, h, w, c = 3, 32, 24, 3
    val = rng.uniform(0.05, 0.95, (n, h, w, c)).astype(np.float32)
    std = rng.uniform(0.001, 0.01, (n, h, w, c)).astype(np.float32)
    dark = (rng.uniform(0, 1, (n, h, w, c)) > 0.9).astype(np.float32)
    exposures = np.array([0.002, 0.004, 0.008], np.float32)
    icrf = np.sort(rng.uniform(0, 1, (256, c)), axis=0).astype(np.float32)
    icrf_diff = np.gradient(icrf.astype(np.float64), 2 / 255,
                            axis=0).astype(np.float32)
    thr = jnp.asarray(0.5, jnp.float32)

    pv, ps = merge_nhwc_lerp_bp(
        jnp.asarray(val), jnp.asarray(std), jnp.asarray(dark),
        jnp.asarray(exposures), jnp.asarray(icrf), jnp.asarray(icrf_diff),
        thr, bits=256)
    fv, fs = jax.vmap(lambda v, s, d: bad_pixel_filter(v, s, d, thr, 3))(
        jnp.asarray(val), jnp.asarray(std), jnp.asarray(dark))
    jv, js = merge_nhwc_fused(fv, fs, jnp.asarray(exposures),
                              jnp.asarray(icrf), jnp.asarray(icrf_diff))
    np.testing.assert_allclose(np.asarray(pv), np.asarray(jv), rtol=5e-6,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(js), rtol=5e-5,
                               atol=1e-7)


# ---------------------------------------------------------------------------
# randomized shape/dtype sweep: grid-tail and dtype handling across the
# whole small-shape space (hypothesis), val+std and value-only
# ---------------------------------------------------------------------------
import os  # noqa: E402

from hypothesis import given, settings, strategies as st  # noqa: E402


# CPU-only: the sweep's value is shape-space logic, which interpret mode
# covers; on the real chip every random shape would pay a fresh Mosaic
# compile (minutes of tunnel time for zero extra coverage)
@pytest.mark.skipif(os.environ.get("CL_TPU_TEST_PLATFORM", "cpu") != "cpu",
                    reason="shape-space sweep is interpret-mode coverage")
@settings(max_examples=10, deadline=None)
@given(st.integers(2, 5), st.integers(3, 26), st.integers(8, 70),
       st.integers(1, 3), st.booleans(), st.booleans(),
       st.integers(0, 2 ** 31 - 1))
def test_fused_kernel_parity_random_shapes(n, h, w, c, use_std, int_dns,
                                           seed):
    rng = np.random.default_rng(seed)
    if int_dns:
        val = rng.integers(0, 256, (n, h, w, c)).astype(np.uint8)
    else:
        val = rng.uniform(0.0, 1.0, (n, h, w, c)).astype(np.float32)
    std = rng.uniform(0.001, 0.02, (n, h, w, c)).astype(np.float32) \
        if use_std else None
    exposures = (0.001 * 2.0 ** np.arange(n)).astype(np.float32)
    icrf = np.sort(rng.uniform(0, 1, (256, c)), axis=0).astype(np.float32)
    icrf[0], icrf[-1] = 0.0, 1.0
    icrf_diff = np.gradient(icrf.astype(np.float64), 2 / 255,
                            axis=0).astype(np.float32)
    j = jnp.asarray
    pv, ps = merge_nhwc_fused(j(val), None if std is None else j(std),
                              j(exposures), j(icrf), j(icrf_diff), hb=8)
    # integer DNs go through the u8 oracle (merge_stack documents [0,1]
    # floats; the kernel auto-detects the dtype)
    oracle = hdr.merge_stack_u8 if int_dns else hdr.merge_stack
    rv, rs = oracle(j(val), None if std is None else j(std),
                    j(exposures), j(icrf), j(icrf_diff))
    np.testing.assert_allclose(np.asarray(pv), np.asarray(rv), rtol=5e-5,
                               atol=1e-6)
    if use_std:
        # atol floor 1e-5: the full [0,1] val range reaches weight/bracket
        # cancellation zones where near-zero stds carry f32 noise that
        # rtol alone amplifies (observed 7e-6 abs at std~5e-3)
        np.testing.assert_allclose(np.asarray(ps), np.asarray(rs),
                                   rtol=5e-4, atol=1e-5)
    else:
        assert ps is None
