"""NaN-aware weighted statistics, histograms and KDE.

jit/vmap-friendly counterparts of the reference statistics helpers
(modules/measurand.py:318-469,716-761 and modules/general_functions.py:132-223).
NaN is used as the masking sentinel exactly as the reference does — reductions
are NaN-aware rather than boolean-mask driven so that results match the
reference bit-for-bit on the same data.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

__all__ = [
    "dimension_statistics", "nanaverage", "apply_thresholds",
    "weighted_avg_and_std", "weighted_histogram", "gaussian_kde",
    "weighted_percentile",
]


def dimension_statistics(val: Array, std: Optional[Array] = None,
                         axis=None) -> dict:
    """Mean/std/error statistics along ``axis``.

    Unweighted: nanmean / nanstd.  With ``std``: inverse-uncertainty weighted
    mean and spread, plus ``error`` = nanmean of the stds
    (measurand.py:318-350).
    """
    if std is None:
        return {"mean": jnp.nanmean(val, axis=axis),
                "std": jnp.nanstd(val, axis=axis),
                "error": None}
    weights = 1.0 / std
    sum_w = jnp.nansum(weights, axis=axis)
    mean = jnp.nansum(val * weights, axis=axis) / sum_w
    mean_keep = jnp.nansum(val * weights, axis=axis, keepdims=True) / \
        jnp.nansum(weights, axis=axis, keepdims=True)
    spread = jnp.sqrt(jnp.nansum(weights * (val - mean_keep) ** 2, axis=axis)
                      / sum_w)
    error = jnp.nanmean(std, axis=axis)
    return {"mean": mean, "std": spread, "error": error}


def nanaverage(values: Array, weights: Array, axis) -> Array:
    """Weighted average ignoring NaNs in both inputs
    (general_functions.py:149-176).  Positions with zero valid weight are NaN.
    """
    valid = ~jnp.isnan(values) & ~jnp.isnan(weights)
    weighted_sum = jnp.nansum(jnp.where(valid, values * weights, 0.0),
                              axis=axis)
    weight_sum = jnp.nansum(jnp.where(valid, weights, 0.0), axis=axis)
    out = weighted_sum / weight_sum
    return jnp.where(weight_sum == 0, jnp.nan, out)


def weighted_avg_and_std(values: Array,
                         weights: Optional[Array]) -> Tuple[Array, Array]:
    """Weighted average and standard deviation
    (general_functions.py:132-146)."""
    average = jnp.average(values, weights=weights)
    variance = jnp.average((values - average) ** 2, weights=weights)
    return average, jnp.sqrt(variance)


def apply_thresholds(val: Array, std: Optional[Array],
                     lower: Optional[Array] = None,
                     upper: Optional[Array] = None):
    """Set values outside per-channel [lower, upper] to NaN.

    Thresholds broadcast over the last axis (the independent/channel axis),
    exactly like the reference's in-place variant (measurand.py:375-428) but
    returned functionally.  ``lower``/``upper`` are 1-D arrays of length
    ``val.shape[-1]``; pass None to skip a side.
    """
    c = val.shape[-1]
    if lower is None:
        lower = jnp.full((c,), -jnp.inf, dtype=val.dtype)
    else:
        lower = jnp.asarray(lower, dtype=val.dtype)
    if upper is None:
        upper = jnp.full((c,), jnp.inf, dtype=val.dtype)
    else:
        upper = jnp.asarray(upper, dtype=val.dtype)
    shape = (1,) * (val.ndim - 1) + (c,)
    mask = (val < lower.reshape(shape)) | (val > upper.reshape(shape))
    new_val = jnp.where(mask, jnp.nan, val)
    new_std = None if std is None else jnp.where(mask, jnp.nan, std)
    return new_val, new_std


def weighted_histogram(values: Array, bins: int,
                       included_range: Optional[Tuple[float, float]] = None,
                       std: Optional[Array] = None):
    """Fixed-size weighted histogram of one channel's finite values.

    Replaces the reference's boolean-masked ``np.histogram`` call
    (measurand.py:430-469) with a jit-compatible formulation: non-finite
    values (and zero-std entries when weighting) get zero weight instead of
    being compressed away, which yields identical counts.

    Returns (hist, bin_edges).
    """
    flat = values.reshape(-1)
    finite = jnp.isfinite(flat)
    if std is not None:
        sflat = std.reshape(-1)
        finite = finite & (sflat != 0)
        weights = jnp.where(finite, 1.0 / jnp.where(sflat == 0, 1.0, sflat),
                            0.0)
    else:
        weights = jnp.where(finite, 1.0, 0.0)

    if included_range is None:
        lo = jnp.min(jnp.where(finite, flat, jnp.inf))
        hi = jnp.max(jnp.where(finite, flat, -jnp.inf))
    else:
        lo = jnp.asarray(included_range[0], dtype=flat.dtype)
        hi = jnp.asarray(included_range[1], dtype=flat.dtype)

    edges = jnp.linspace(lo, hi, bins + 1)
    width = (hi - lo) / bins
    # np.histogram semantics: right-inclusive final bin.
    idx = jnp.clip(jnp.floor((flat - lo) / width).astype(jnp.int32), 0,
                   bins - 1)
    in_range = (flat >= lo) & (flat <= hi)
    w = jnp.where(in_range, weights, 0.0)
    hist = jnp.zeros((bins,), dtype=weights.dtype).at[idx].add(w)
    return hist, edges


def gaussian_kde(values: Array, x_range: Array,
                 std: Optional[Array] = None,
                 chunk: int = 131072) -> Array:
    """Weighted Gaussian KDE with Silverman bandwidth, evaluated on x_range.

    jnp reimplementation of scipy.stats.gaussian_kde as used by the reference
    (measurand.py:716-761): weights are 1/std (zero-std and non-finite points
    excluded), Silverman's factor computed from the effective number of
    weighted samples.

    The evaluation streams over data-point chunks of size ``chunk`` via
    ``lax.scan`` (the reference streams through scipy the same way), so the
    (points, samples) kernel matrix never materializes — peak memory is
    O(chunk * len(x_range)) and megapixel inputs evaluate fine.
    """
    flat = values.reshape(-1)
    finite = jnp.isfinite(flat)
    if std is not None:
        sflat = std.reshape(-1)
        finite = finite & (sflat != 0)
        raw_w = jnp.where(finite, 1.0 / jnp.where(sflat == 0, 1.0, sflat),
                          0.0)
    else:
        raw_w = jnp.where(finite, 1.0, 0.0)
    w = raw_w / jnp.sum(raw_w)

    # Effective sample size; scipy: neff = 1 / sum(w^2).
    neff = 1.0 / jnp.sum(w ** 2)
    # Weighted variance (scipy uses cov of the dataset with aweights).
    x = jnp.where(finite, flat, 0.0)
    mean = jnp.sum(w * x)
    # scipy covariance with aweights uses factor 1/(1 - sum(w^2)).
    var = jnp.sum(w * (x - mean) ** 2) / (1.0 - jnp.sum(w ** 2))
    # Silverman factor for 1-D: (neff * 3/4)^(-1/5).
    factor = (neff * 3.0 / 4.0) ** (-1.0 / 5.0)
    bw2 = var * factor ** 2

    norm = 1.0 / jnp.sqrt(2.0 * jnp.pi * bw2)
    wv = jnp.where(finite, w, 0.0)

    def eval_chunk(xc, wc):
        diff = x_range[:, None] - xc[None, :]
        return jnp.sum(jnp.exp(-0.5 * diff ** 2 / bw2) * wc[None, :],
                       axis=1)

    n = x.size
    if n <= chunk:
        return eval_chunk(x, wv) * norm

    k = -(-n // chunk)
    pad = k * chunk - n
    xp = jnp.pad(x, (0, pad))
    wp = jnp.pad(wv, (0, pad))  # zero weight: padding contributes nothing
    acc, _ = jax.lax.scan(
        lambda carry, xw: (carry + eval_chunk(*xw), None),
        jnp.zeros_like(x_range),
        (xp.reshape(k, chunk), wp.reshape(k, chunk)))
    return acc * norm


def weighted_percentile(values: Array,
                        percentiles: Optional[Array] = None,
                        weights: Optional[Array] = None) -> Array:
    """Weighted percentiles (general_functions.py:179-223)."""
    if percentiles is None:
        percentiles = jnp.array([75.0, 25.0])
    percentiles = jnp.asarray(percentiles) / 100.0
    if weights is None:
        weights = jnp.ones(values.size, dtype=values.dtype)
    idx = jnp.argsort(values)
    a_sort = values[idx]
    w_sort = weights[idx]
    ecdf = jnp.cumsum(w_sort)
    p = percentiles * (weights.sum() - 1)
    idx_low = jnp.searchsorted(ecdf, p, side="right")
    idx_high = jnp.minimum(jnp.searchsorted(ecdf, p + 1, side="right"),
                           ecdf.size - 1)
    weights_high = p - jnp.floor(p)
    weights_low = 1.0 - weights_high
    x1 = jnp.take(a_sort, idx_low) * weights_low
    x2 = jnp.take(a_sort, idx_high) * weights_high
    return x1 + x2
