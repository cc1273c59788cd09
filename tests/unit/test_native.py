"""Native staging library: build, parity with NumPy, and fallback paths."""
import numpy as np
import pytest

from camera_linearity_tpu import native


def test_native_builds_and_loads():
    # g++ is part of the supported toolchain; if truly absent the NumPy
    # fallbacks below still pass.
    assert native.available() in (True, False)


def test_u8_to_f32_parity(rng):
    arr = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    out = native.u8_to_f32(arr, 1.0 / 255)
    # semantic is multiply-by-scale (not divide): compare bit-exact to that
    np.testing.assert_array_equal(
        out, arr.astype(np.float32) * np.float32(1.0 / 255))
    assert out.dtype == np.float32


def test_cfirst_relayout_parity(rng):
    arr = rng.integers(0, 256, (17, 29, 3), dtype=np.uint8)
    out = native.u8_hwc_to_cfirst_f32(arr, 1.0 / 255)
    expect = (arr.reshape(-1, 3).astype(np.float32)
              * np.float32(1.0 / 255)).T
    np.testing.assert_array_equal(out, np.ascontiguousarray(expect))
    assert out.shape == (3, 17 * 29)


def test_host_welford_matches_reference_loop(rng):
    frames = rng.integers(0, 256, (25, 11, 13, 3), dtype=np.uint8)
    acc = native.HostWelford((11, 13, 3), scale=1.0 / 255)
    acc.update(frames[:16])
    acc.update(frames[16:])
    mean, std = acc.finalize()

    # float64 oracle with reference operation order
    omean = np.zeros((11, 13, 3))
    om2 = np.zeros((11, 13, 3))
    for k, f in enumerate(frames, start=1):
        x = f.astype(np.float64) / 255
        delta = x - omean
        omean += delta / k
        om2 += delta * (x - omean)
    ostd = np.sqrt(om2 / (len(frames) - 1)) / np.sqrt(len(frames))
    np.testing.assert_allclose(mean, omean, rtol=1e-13, atol=1e-15)
    np.testing.assert_allclose(std, ostd, rtol=1e-12, atol=1e-15)
    assert acc.count == 25


def test_host_welford_single_frame_shape(rng):
    acc = native.HostWelford((4, 4, 3), scale=1.0)
    acc.update(rng.integers(0, 2, (4, 4, 3), dtype=np.uint8))
    mean, std = acc.finalize()
    assert std is None  # < 2 frames


def test_numpy_fallback_paths(rng, monkeypatch):
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)  # force fallback
    arr = rng.integers(0, 256, (8, 9, 3), dtype=np.uint8)
    np.testing.assert_allclose(native.u8_to_f32(arr, 0.5),
                               arr.astype(np.float32) * 0.5)
    out = native.u8_hwc_to_cfirst_f32(arr, 1.0)
    assert out.shape == (3, 72)
    mean = np.zeros(arr.shape)
    m2 = np.zeros(arr.shape)
    count = native.welford_update_batch_u8(arr[None], mean, m2, 1.0, 0)
    assert count == 1
    np.testing.assert_allclose(mean, arr.astype(float))
