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
