"""Spatial filters: median-based hot-pixel repair and flat-field correction.

TPU-native counterparts of modules/measurand.py:543-604.  The median filter is
built from static shifted slices + a sorting network over the k*k window — a
formulation XLA fuses into a handful of vectorized min/max ops, which is the
idiomatic TPU way to do small-window medians (no data-dependent control flow,
no gather).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp

Array = jnp.ndarray

__all__ = ["median_filter_2d", "bad_pixel_filter", "hot_pixel_mask",
           "flat_field_correction", "flat_field_roi_mean"]


def _reflect_pad_2d(x: Array, pad: int) -> Array:
    """Reflect padding on the two leading (spatial) axes, matching
    scipy.ndimage mode='reflect' (edge value repeated: (d c b a | a b c d)."""
    return jnp.pad(x, [(pad, pad), (pad, pad)] + [(0, 0)] * (x.ndim - 2),
                   mode="symmetric")


# Exchange schedule of the classic 19-comparator median-of-9 network
# (Smith, "Implementing median filters in XC4000E FPGAs"); after applying
# (min, max) at each pair, index 4 holds the median.
_MEDIAN9_NET = [(1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2),
                (4, 5), (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4),
                (2, 5), (4, 7), (4, 2), (6, 4), (4, 2)]


def median_filter_2d(x: Array, kernel_size: int) -> Array:
    """k x k median over the two leading axes, any trailing axes vectorized.

    Equivalent to scipy.ndimage.median_filter(size=(k, k), axes=(0, 1),
    mode='reflect') as used at measurand.py:546-554.  The reference's k=3
    runs a 19-comparator exchange network over the 9 shifted copies — pure
    min/max on the VPU, ~10x faster than jnp.median's sort at stack scale.
    Other kernel sizes fall back to the sort.
    """
    k = kernel_size
    pad = k // 2
    xp = _reflect_pad_2d(x, pad)
    h, w = x.shape[0], x.shape[1]
    windows = [xp[i:i + h, j:j + w] for i in range(k) for j in range(k)]
    if k == 3:
        for a, b in _MEDIAN9_NET:
            windows[a], windows[b] = (jnp.minimum(windows[a], windows[b]),
                                      jnp.maximum(windows[a], windows[b]))
        return windows[4]
    return jnp.median(jnp.stack(windows, axis=0), axis=0)


def hot_pixel_mask(dark_stack: Array, threshold) -> Array:
    """Precompute the hot-pixel mask ``(dark > threshold)`` as uint8.

    Dark frames are fixed calibration data (reference image_set.py:157-198
    matches them per exposure, not per scene), so the mask can be
    computed ONCE and reused across every merge of the session.  Kernel
    speed is unchanged (the fused merge is not bound by the dark-input
    read — measured round 4), but staging the 1-byte/px mask instead of
    the 4-byte/px dark frames quarters their host->device transfer,
    which matters on link-bound pipelines.  Accepts any (..., H, W, C)
    or planar layout; the comparison is elementwise.
    """
    return (dark_stack > threshold).astype(jnp.uint8)


def bad_pixel_filter(val: Array, std: Optional[Array], dark_val: Array,
                     threshold: float, kernel_size: int = 3,
                     dark_is_mask: bool = False
                     ) -> Tuple[Array, Optional[Array]]:
    """Replace pixels flagged hot by the dark frame with the local median.

    Where ``dark_val > threshold`` the pixel value (and std) is replaced by
    the k x k median of its neighbourhood; elsewhere the original value is
    kept.  This is the documented intent of measurand.py:543-557
    (``filter_larger_than_by_map``), whose masked assignment is shape-buggy in
    the reference (SURVEY.md §7.7); here it is a clean jnp.where.

    With ``dark_is_mask`` the map is a precomputed hot-pixel mask (see
    :func:`hot_pixel_mask`): nonzero flags the pixel hot and ``threshold``
    is ignored.  Mask semantics are EXPLICIT opt-in — an integer-dtype
    map without the flag keeps the ``> threshold`` contract (integer DN
    dark frames are legitimate maps).
    """
    if dark_is_mask:
        hot = dark_val != 0
    else:
        hot = dark_val > threshold
    med_val = median_filter_2d(val, kernel_size)
    new_val = jnp.where(hot, med_val, val)
    if std is None:
        return new_val, None
    med_std = median_filter_2d(std, kernel_size)
    return new_val, jnp.where(hot, med_std, std)


def flat_field_roi_mean(flat: Array, mid_percentage: float) -> Array:
    """Mean of a centered ROI of the flat field, per channel.

    Reference: measurand.py:561-579.  The reference computes float slice
    bounds (which numpy rejects); the intent — a centered ROI covering
    ``mid_percentage`` of each axis — is implemented here with integer
    arithmetic.
    """
    size_x, size_y = flat.shape[0], flat.shape[1]
    roi_dx = math.floor(size_x * mid_percentage)
    roi_dy = math.floor(size_y * mid_percentage)
    start = int((math.floor(1.0 / mid_percentage) - 1) // 2)
    x0, x1 = start * roi_dx, (start + 1) * roi_dx
    y0, y1 = start * roi_dy, (start + 1) * roi_dy
    return jnp.mean(flat[x0:x1, y0:y1, ...], axis=(0, 1))


def flat_field_correction(val: Array, std: Optional[Array], flat_val: Array,
                          flat_std: Optional[Array], mid_percentage: float
                          ) -> Tuple[Array, Optional[Array]]:
    """Flat-field (vignetting / fixed-pattern) correction with uncertainty.

    val_out = (val / flat) * mean_ROI(flat); std_out combines acquisition,
    flat-field and flat-field-mean uncertainty terms exactly as
    measurand.py:559-604.  The value math needs no uncertainty, so the
    correction also applies to value-only data (the reference applies it
    unconditionally after a merge, exposure_series.py:415-417): ``std``
    None yields ``std_out`` None; a missing ``flat_std`` drops the two
    flat-uncertainty terms.
    """
    ff_means = flat_field_roi_mean(flat_val, mid_percentage)
    out_val = (val / flat_val) * ff_means
    if std is None:
        return out_val, None

    u_acq = (std ** 2) / (flat_val ** 2) * ff_means ** 2
    if flat_std is not None:
        ff_mean_stds = flat_field_roi_mean(flat_std, mid_percentage)
        u_acq = u_acq \
            + (val ** 2) / (flat_val ** 4) * (flat_std ** 2) * ff_means ** 2 \
            + (val ** 2) / (flat_val ** 2) * ff_mean_stds ** 2
    return out_val, jnp.sqrt(u_acq)
