"""Pallas fused-merge kernel parity vs the jnp reference path.

Runs in interpreter mode on CPU (the kernel auto-selects); the same code
compiles natively on TPU.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from camera_linearity_tpu.ops import hdr
from camera_linearity_tpu.ops.hdr_pallas import merge_stack_pallas


@pytest.fixture
def inputs(rng):
    n, h, w, c = 4, 40, 60, 3  # P = 2400, not a multiple of the tile size
    stack_val = rng.uniform(0.02, 0.98, (n, h, w, c)).astype(np.float32)
    stack_std = rng.uniform(0.001, 0.02, (n, h, w, c)).astype(np.float32)
    exposures = np.array([0.002, 0.004, 0.008, 0.016], np.float32)
    icrf = np.sort(rng.uniform(0, 1, (256, c)), axis=0).astype(np.float32)
    icrf[0], icrf[-1] = 0.0, 1.0
    icrf_diff = np.gradient(icrf.astype(np.float64), 2 / 255,
                            axis=0).astype(np.float32)
    return stack_val, stack_std, exposures, icrf, icrf_diff


@pytest.mark.parametrize("mode", ["corrected", "reference"])
def test_pallas_matches_jnp(inputs, mode):
    stack_val, stack_std, exposures, icrf, icrf_diff = inputs
    args = tuple(jnp.asarray(a) for a in
                 (stack_val, stack_std, exposures, icrf, icrf_diff))
    pv, ps = merge_stack_pallas(*args, compat=mode)
    jv, js = hdr.merge_stack(*args, compat=mode)
    # f32 op-order differences between the fused kernel and XLA's fusion
    # put single elements near 1e-5 relative on TPU
    np.testing.assert_allclose(np.asarray(pv), np.asarray(jv), rtol=5e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(js), rtol=5e-4,
                               atol=1e-6)


def test_pallas_no_std(inputs):
    stack_val, _, exposures, icrf, icrf_diff = inputs
    pv, ps = merge_stack_pallas(jnp.asarray(stack_val), None,
                                jnp.asarray(exposures), jnp.asarray(icrf),
                                jnp.asarray(icrf_diff))
    assert ps is None
    jv, _ = hdr.merge_stack(jnp.asarray(stack_val), None,
                            jnp.asarray(exposures), jnp.asarray(icrf),
                            jnp.asarray(icrf_diff))
    np.testing.assert_allclose(np.asarray(pv), np.asarray(jv), rtol=5e-5,
                               atol=1e-6)


def test_pallas_single_channel(rng):
    n, h, w = 3, 32, 32
    stack_val = rng.uniform(0.05, 0.95, (n, h, w, 1)).astype(np.float32)
    stack_std = rng.uniform(0.001, 0.01, (n, h, w, 1)).astype(np.float32)
    exposures = np.array([0.001, 0.002, 0.004], np.float32)
    icrf = np.sort(rng.uniform(0, 1, (256, 1)), axis=0).astype(np.float32)
    icrf_diff = np.gradient(icrf.astype(np.float64), 2 / 255,
                            axis=0).astype(np.float32)
    args = tuple(jnp.asarray(a) for a in
                 (stack_val, stack_std, exposures, icrf, icrf_diff))
    pv, ps = merge_stack_pallas(*args)
    jv, js = hdr.merge_stack(*args)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(jv), rtol=5e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(js), rtol=5e-4,
                               atol=1e-6)
