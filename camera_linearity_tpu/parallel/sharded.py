"""Sharded pipeline variants: multi-chip merge, statistics and calibration.

Two complementary styles, both idiomatic on TPU:

* **GSPMD (jit + shardings)** for the compute-dense paths — the HDR merge is
  elementwise over pixels, so sharding the row axis needs no communication
  at all and XLA partitions the fused kernel for free.
* **shard_map + explicit collectives** for the reductions — pair statistics
  reduce over the sharded pixel axes, so local NaN-aware partial sums
  combine with ``psum`` over ICI, mirroring how the reference's
  ``compute_dimension_statistics`` (measurand.py:318-350) would have to
  behave across chips.

The DE calibration shards its population axis: trial generation and energy
evaluation are population-parallel; only argmin/mean/std of the (S,)
energies cross chips per generation (a few scalars over ICI).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import hdr as hdr_ops

Array = jnp.ndarray

__all__ = ["merge_batch_sharded", "dimension_statistics_sharded",
           "pair_stats_sharded"]


def merge_batch_sharded(batch_val: Array, batch_std: Optional[Array],
                        exposures: Array, icrf: Array, icrf_diff: Array,
                        mesh: Mesh, compat: str = "corrected",
                        icrf_base: Optional[Array] = None,
                        icrf_diff_base: Optional[Array] = None
                        ) -> Tuple[Array, Optional[Array]]:
    """HDR-merge a (B, N, H, W, C) batch of scenes across the mesh.

    Scenes shard over ``data``, rows over ``pixel`` (BASELINE config 5's
    batch-of-scenes axis).  The merge itself is pointwise over pixels, so
    the partitioned program has zero communication.  Each chip's local
    (B_loc, N, H_loc, W, C) block merges through the fast fused kernel
    (ops/hdr.merge_batch folds scenes into image rows — exact, since the
    merge is row-independent); a GSPMD jit cannot partition the Pallas
    custom-call, so this is a ``shard_map``.  256-point base curves route
    each chip's local merge through the piecewise-linear kernel for
    >8-bit depths, exactly as in the single-chip path.
    """
    in_spec = P("data", None, "pixel", None, None)
    out_spec = P("data", "pixel", None, None)
    if icrf_base is None:
        base_specs, base_args = (), ()
    elif batch_std is None:
        # value-only merges never read the diff curve — don't ship one
        base_specs, base_args = (P(),), (icrf_base,)
    else:
        if icrf_diff_base is None:
            raise ValueError("merge_batch_sharded: icrf_diff_base is "
                             "required when batch_std is given alongside "
                             "icrf_base (uncertainty needs the base "
                             "derivative curve)")
        base_specs, base_args = (P(), P()), (icrf_base, icrf_diff_base)

    def merge_local(bv, bs, ex, a, b, *bases):
        kb = {}
        if bases:
            kb = {"icrf_base": bases[0],
                  "icrf_diff_base": bases[1] if len(bases) > 1 else None}
        return hdr_ops.merge_batch(bv, bs, ex, a, b, compat=compat, **kb)

    if batch_std is None:
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(in_spec, P(), P(), P()) + base_specs,
                 out_specs=out_spec)
        def run_v(bv, ex, a, b, *bases):
            return merge_local(bv, None, ex, a, b, *bases)[0]
        return run_v(batch_val, exposures, icrf, icrf_diff,
                     *base_args), None

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(in_spec, in_spec, P(), P(), P()) + base_specs,
             out_specs=(out_spec, out_spec))
    def run(bv, bs, ex, a, b, *bases):
        return merge_local(bv, bs, ex, a, b, *bases)

    return run(batch_val, batch_std, exposures, icrf, icrf_diff,
               *base_args)


def dimension_statistics_sharded(val: Array, std: Optional[Array],
                                 mesh: Mesh, axis_name: str = "pixel"):
    """NaN-aware (weighted) mean/std/error over the leading (sharded) axis
    with explicit psum collectives.

    Equivalent to ops.stats.dimension_statistics(axis=(0, 1)) on a
    (H, W, C) array whose H axis is sharded over ``axis_name``: each chip
    reduces its local rows, then the partial sums combine over ICI.
    """
    spec_in = P(axis_name, None, None)

    if std is None:
        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(spec_in,), out_specs=(P(), P(), P()))
        def stats(v):
            finite = jnp.isfinite(v)
            n = jax.lax.psum(jnp.sum(finite, axis=(0, 1)), axis_name)
            s1 = jax.lax.psum(
                jnp.sum(jnp.where(finite, v, 0.0), axis=(0, 1)), axis_name)
            s2 = jax.lax.psum(
                jnp.sum(jnp.where(finite, v * v, 0.0), axis=(0, 1)),
                axis_name)
            mean = s1 / n
            var = s2 / n - mean ** 2
            return mean, jnp.sqrt(jnp.maximum(var, 0.0)), mean * jnp.nan

        mean, spread, _ = stats(val)
        return {"mean": mean, "std": spread, "error": None}

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(spec_in, spec_in), out_specs=(P(), P(), P()))
    def stats(v, s):
        finite = jnp.isfinite(v) & jnp.isfinite(s)
        w = jnp.where(finite, 1.0 / s, 0.0)
        sw = jax.lax.psum(jnp.sum(w, axis=(0, 1)), axis_name)
        swv = jax.lax.psum(jnp.sum(jnp.where(finite, w * v, 0.0),
                                   axis=(0, 1)), axis_name)
        mean = swv / sw
        swd = jax.lax.psum(
            jnp.sum(jnp.where(finite, w * (v - mean) ** 2, 0.0),
                    axis=(0, 1)), axis_name)
        spread = jnp.sqrt(swd / sw)
        n = jax.lax.psum(jnp.sum(finite, axis=(0, 1)), axis_name)
        s_sum = jax.lax.psum(jnp.sum(jnp.where(finite, s, 0.0),
                                     axis=(0, 1)), axis_name)
        return mean, spread, s_sum / n

    mean, spread, error = stats(val, std)
    return {"mean": mean, "std": spread, "error": error}


def pair_stats_sharded(short_val: Array, long_val: Array,
                       short_std: Optional[Array],
                       long_std: Optional[Array], ratio: float,
                       mesh: Mesh, axis_name: str = "pixel"):
    """Sharded absolute/relative exposure-pair statistics.

    The elementwise difference stays local to each chip's rows; only the
    statistics reduce (exposure_series.py:443-446 across chips).
    """
    from ..ops.uncertainty import scale_difference
    (av, astd), (rv, rstd) = scale_difference(
        short_val, short_std, long_val, long_std, ratio)
    return (dimension_statistics_sharded(av, astd, mesh, axis_name),
            dimension_statistics_sharded(rv, rstd, mesh, axis_name))
