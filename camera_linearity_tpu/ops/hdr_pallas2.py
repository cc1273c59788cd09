"""Fused HDR-merge Pallas kernel v2: planar, zero-relayout from NHWC.

Replaces the removed round-1 kernel's channel-first requirement
with a formulation that merges logical ``(N, H, W, C)`` stacks with no
physical relayout and ~3x less device time, and generalizes the lookup to
8-bit (256-entry, radix 16x16) and 12-bit (4096-entry, radix 64x8x8)
tables.  Measured on one v5e chip (BASELINE config 2: 1920x1200x3, 6
exposures, val+std): 3.9 ms / ~585 MP/s vs 12.4 ms round 1 and the
500 MP/s target.  The design rests on four measured facts
(benchmarks/exp_kernel.py):

1. **XLA stores logical NHWC channel-planar.**  A (N, H, W, C) f32 array
   has layout ``major_to_minor=(0, 3, 1, 2)`` — physically (N, C, H, W)
   with (8,128) tiling over (H, W).  ``jnp.transpose(x, (0,3,1,2))`` is a
   free relabeling, so the kernel runs on the logical planar view and the
   "NHWC relayout" (5.7 ms in XLA, ~4 ms in round 1) vanishes.
2. **Sublane<->lane moves dominate naive LUT formulations.**  Any reshape
   that merges the (rows, w) pixel block into one lane axis — e.g. to feed
   a 2-D one-hot matmul — relays out megabytes per exposure per block
   (8.5 ms of the 11.5 ms first attempt).  Everything here therefore stays
   in batch-leading ``(hb, ., w)`` shapes: rows are the dot-general batch
   dim, one-hots build from 4-D iota broadcasts, and stage-2 reduces over
   a true sublane axis.  No transposes or lane-merges exist in the body.
3. **The 3 exact bf16 table parts belong on the contraction dim.**  With
   parts on the output dim, the MXU materializes a 3x-larger f32
   intermediate plus a VPU parts-sum; with parts-in-K the MXU's f32
   accumulator reconstructs the exact f32 entry for free (a one-hot row
   has a single 1.0, so each product is an exact bf16-part selection).
4. **Sub-128-lane f32 table blocks DMA as per-sublane strided transfers**
   (~60 ms of pure overhead across a 450-cell grid) — table operands pad
   to 128 lanes.  Also: a pre-split bf16 table block is *mangled* by
   sublane packing on load — ship f32 tables, split to parts in-kernel.

Merge semantics are identical to ops/hdr.py (reference:
modules/exposure_series.py:317-397): gaussian weight (+ derivative),
two-level radix ICRF lookup (+ derivative), sum-of-weights normalization,
weighted accumulation of value and variance, final sqrt — one HBM read of
the stack, one HBM write of the result.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

__all__ = ["merge_nhwc_fused", "merge_planar_fused", "pack_tables",
           "merge_nhwc_lerp", "merge_planar_lerp", "pack_tables_lerp",
           "merge_nhwc_lerp_bp", "merge_planar_lerp_bp",
           "is_piecewise_linear_256"]

# radix decomposition per table size: (HI, LO); LO > 16 uses a further
# (LO/8, 8) split in stage-2 so the select stays cheap on the VPU.
_RADIX = {256: (16, 16), 4096: (64, 64)}

# The piecewise-linear (lerp) kernels below take 256-point base curves
# directly (the reference's >8-bit ICRFs are np.interp'd up from
# DATAPOINTS=256 solved points —
# reference: modules/ICRF_calibration_exposure.py:204-216,398-402).


def pack_tables(icrf: Array, icrf_diff: Array) -> Array:
    """Pack [icrf; icrf'] into the kernel's (C, 2*LO, max(HI,128)) f32
    operand.

    Per channel: rows 0..LO-1 hold the icrf, rows LO..2*LO-1 the
    derivative; column ``hi`` holds the LO-entry row (entries
    ``hi*LO + lo``) at row index ``lo``.  Lanes pad to 128 (fact 4).
    """
    bits, c = icrf.shape
    hi_size, lo_size = _RADIX[bits]
    f32 = jnp.float32

    def rows(tab):  # (bits, C) -> (C, LO, HI): [ch, lo, hi]
        return tab.astype(f32).T.reshape(c, hi_size, lo_size) \
            .transpose(0, 2, 1)

    t = jnp.concatenate([rows(icrf), rows(icrf_diff)], axis=1)
    if hi_size < 128:
        t = jnp.pad(t, ((0, 0), (0, 0), (0, 128 - hi_size)))
    return t  # (C, 2*LO, >=128)


def is_piecewise_linear_256(icrf, tol: float = 1e-3) -> bool:
    """Whether a (bits, C) table is well-approximated by the piecewise-
    linear interpolant of its own 256-point subsample.

    True for the reference's >8-bit ICRFs (np.interp expansions of 256
    solved datapoints, modules/ICRF_calibration_exposure.py:204-216) and
    for any smooth response curve; false for tables with genuine sub-cell
    structure.  NOTE: the 256-point grid recovered here is offset from
    the expansion's original breakpoints, so reconstruction error is
    O(curvature/256^2) (~3e-4 for gamma-like curves), not zero — this is
    a routing heuristic for callers that only hold the expanded table;
    exact-parity callers should pass the true base curves to
    ``merge_*_lerp`` instead.  Host-side check on small arrays."""
    import numpy as np
    tab = np.asarray(icrf, np.float64)
    bits = tab.shape[0]
    if bits <= 256:
        return False
    x = np.arange(bits) / (bits - 1)
    xb = np.arange(256) / 255.0
    for ch in range(tab.shape[1]):
        base = np.interp(xb, x, tab[:, ch])
        recon = np.interp(x, xb, base)
        if np.max(np.abs(recon - tab[:, ch])) > tol:
            return False
    return True


def pack_tables_lerp(icrf_base: Array, icrf_diff_base: Optional[Array]
                     ) -> Array:
    """Pack 256-point base curves into the lerp kernel's
    (C, n_tab*2*16, 128) f32 operand.

    Row (tab, pair, lo) at column ``hi`` holds ``base_tab[hi*16+lo+pair]``
    (clamped at 255): the two cell endpoints of segment ``hi*16+lo``, for
    each table.  Lanes pad to 128 (fact 4).
    """
    assert icrf_base.shape[0] == 256, "lerp base curves must be 256-point"
    c = icrf_base.shape[1]
    tabs = [icrf_base] if icrf_diff_base is None else [icrf_base,
                                                       icrf_diff_base]

    def rows(tab):  # (256, C) -> (C, 2*16, HI=16): [ch, (pair, lo), hi]
        t = tab.astype(jnp.float32).T                       # (C, 256)
        p0 = t.reshape(c, 16, 16).transpose(0, 2, 1)        # [ch, lo, hi]
        shifted = jnp.concatenate([t[:, 1:], t[:, -1:]], axis=1)
        p1 = shifted.reshape(c, 16, 16).transpose(0, 2, 1)
        return jnp.concatenate([p0, p1], axis=1)            # (C, 32, 16)

    t = jnp.concatenate([rows(tb) for tb in tabs], axis=1)
    return jnp.pad(t, ((0, 0), (0, 0), (0, 128 - 16)))


def _make_kernel(n: int, hb: int, wb: int, use_std: bool, is_int: bool,
                 compat: str, bits: int, lerp: bool = False):
    if lerp:
        return _make_kernel_lerp(n, hb, wb, use_std, is_int, compat, bits)
    hi_size, lo_size = _RADIX[bits]
    max_dn = bits - 1
    lo_bits = lo_size.bit_length() - 1
    n_tab = 2 if use_std else 1

    def kernel(*refs):
        if use_std:
            val_ref, std_ref, t_ref, invt_ref, ov_ref, os_ref = refs
        else:
            val_ref, t_ref, invt_ref, ov_ref = refs
        f32 = jnp.float32
        bf16 = jnp.bfloat16
        c = lambda v: jnp.float32(v)  # noqa: E731  (pin f32 under x64)

        raw = val_ref[...].reshape(n * hb, wb)
        if is_int:
            idx = raw.astype(jnp.int32)
            x = idx.astype(f32) * c(1.0 / max_dn)
        else:
            x = raw.astype(f32)
            idx = jnp.round(x * c(max_dn)).astype(jnp.int32)
            idx = jnp.minimum(jnp.maximum(idx, jnp.int32(0)),
                              jnp.int32(max_dn))
        hi = idx >> lo_bits
        lo = idx & (lo_size - 1)

        w_all = jnp.exp(c(-30.0) * (x - c(0.5)) ** 2)
        inv_sw = c(1.0) / jnp.sum(w_all.reshape(n, hb, wb), axis=0)
        inv_sw2 = inv_sw * inv_sw
        if use_std:
            s_all = std_ref[...].reshape(n * hb, wb).astype(f32)

        # exact 3-part bf16 split, parts on the contraction dim (fact 3);
        # value-only merges drop the derivative rows (half the MXU work).
        t = t_ref[...].reshape(2 * lo_size, t_ref.shape[-1])[
            :n_tab * lo_size, :hi_size]
        p0 = t.astype(bf16)
        r1 = t - p0.astype(f32)
        p1 = r1.astype(bf16)
        p2 = (r1 - p1.astype(f32)).astype(bf16)
        t012 = jnp.concatenate([p0, p1, p2], axis=1)   # (n_tab*LO, 3*HI)
        tb = jnp.broadcast_to(t012[None],
                              (hb, n_tab * lo_size, 3 * hi_size))

        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hb, 1, hi_size, wb),
                                           2)
        if lo_size <= 16:
            iota_lo = jax.lax.broadcasted_iota(jnp.int32, (hb, lo_size, wb),
                                               1)
        else:
            iota_8 = jax.lax.broadcasted_iota(jnp.int32, (hb, 8, wb), 1)

        acc_v = jnp.zeros((hb, wb), f32)
        acc_s = jnp.zeros((hb, wb), f32)
        for e in range(n):
            sl = slice(e * hb, (e + 1) * hb)
            oh = (hi[sl].reshape(hb, 1, 1, wb) == iota_hi).astype(bf16)
            oh3 = jnp.broadcast_to(oh, (hb, 3, hi_size, wb)).reshape(
                hb, 3 * hi_size, wb)
            a = jax.lax.dot_general(
                tb, oh3,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32)          # (hb, n_tab*LO, wb)

            lo_e = lo[sl]
            if lo_size <= 16:
                oh_lo = (lo_e.reshape(hb, 1, wb) == iota_lo).astype(f32)
                g = jnp.sum(a[:, 0:lo_size, :] * oh_lo, axis=1)
                if use_std:
                    fp = jnp.sum(a[:, lo_size:2 * lo_size, :] * oh_lo,
                                 axis=1)
            else:
                # LO = A*8: select the 8-entry sub-row first, then the
                # A-group — 8+A compares and LO+A FMAs per element
                # instead of LO of each.
                a_grp = lo_size // 8
                oh_b = ((lo_e & 7).reshape(hb, 1, wb) == iota_8
                        ).astype(f32)                # (hb, 8, wb)
                ohb_t = jnp.broadcast_to(
                    oh_b.reshape(hb, 1, 1, 8, wb),
                    (hb, n_tab, a_grp, 8, wb)).reshape(
                        hb, n_tab * lo_size, wb)
                y = (a * ohb_t).reshape(hb, n_tab, a_grp, 8, wb).sum(
                    axis=3)                          # (hb, n_tab, A, wb)
                oh_a = ((lo_e >> 3).reshape(hb, 1, wb)
                        == jax.lax.broadcasted_iota(
                            jnp.int32, (hb, a_grp, wb), 1)).astype(f32)
                gf = jnp.sum(y * oh_a.reshape(hb, 1, a_grp, wb), axis=2)
                g = gf[:, 0, :]
                if use_std:
                    fp = gf[:, 1, :]

            w_e = w_all[sl]
            invt = invt_ref[e, 0]
            acc_v = acc_v + w_e * g * invt
            if use_std:
                s_e = s_all[sl]
                dw = c(-60.0) * (x[sl] - c(0.5)) * w_e
                dg = fp * s_e
                bracket = (dw * g + w_e * dg) * inv_sw \
                    - (dw * w_e * g) * inv_sw2
                scale = dg if compat == "reference" else s_e
                term = bracket * scale * invt
                acc_s = acc_s + term * term

        ov_ref[...] = (acc_v * inv_sw).reshape(ov_ref.shape)
        if use_std:
            os_ref[...] = jnp.sqrt(acc_s).reshape(os_ref.shape)

    return kernel


# 19-comparator median-of-9 exchange network (Smith) — index 4 holds the
# median after the exchanges.  Mirrors ops/filters._MEDIAN9_NET.
_MED9 = [(1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2),
         (4, 5), (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4),
         (2, 5), (4, 7), (4, 2), (6, 4), (4, 2)]


def _median9_block(strip, hb: int, wb: int):
    """3x3 median of the center ``hb`` rows of an ``(hb+2, wb)`` strip,
    columns reflect-padded (edge repeat) like scipy mode='reflect'."""
    def colshift(s, d):
        if d < 0:
            return jnp.concatenate([s[:, :1], s[:, :-1]], axis=1)
        if d > 0:
            return jnp.concatenate([s[:, 1:], s[:, -1:]], axis=1)
        return s

    shifted = [colshift(strip, d) for d in (-1, 0, 1)]
    ws = [shifted[dj][di:di + hb, :]
          for di in range(3) for dj in range(3)]
    for a, b in _MED9:
        ws[a], ws[b] = (jnp.minimum(ws[a], ws[b]),
                        jnp.maximum(ws[a], ws[b]))
    return ws[4]


def _make_kernel_lerp(n: int, hb: int, wb: int, use_std: bool, is_int: bool,
                      compat: str, bits: int, bad_pixel: bool = False):
    """Piecewise-linear merge kernel: evaluates 256-point base curves as
    interpolants at any bit depth, at near-8-bit cost.

    ``table[idx]`` for an np.interp-expanded table equals (to f32
    rounding) ``lerp(base[j], base[j+1], t)`` with
    ``pos = idx * 255/(bits-1)``, ``j = floor(pos)``, ``t = pos - j`` —
    so instead of the exact ``O(bits)``-MACs-per-lookup radix over the
    expanded table (24.5k MACs/px-exp at 12 bits), the kernel runs the
    8-bit-sized 16x16 radix over segment PAIRS (3k MACs/px-exp) and a
    two-FMA lerp on the VPU.

    With ``bad_pixel`` the dark-frame hot-pixel repair (3x3 median
    replace, ops/filters.bad_pixel_filter) fuses into the kernel as a
    prologue: neighbor row blocks arrive as extra clamped-index inputs,
    so the stack makes no separate corrections round-trip through HBM.
    """
    max_dn = bits - 1
    n_tab = 2 if use_std else 1
    n_rows = n_tab * 2 * 16

    def kernel(*refs):
        if bad_pixel:
            if use_std:
                (val_ref, vp_ref, vn_ref, std_ref, sp_ref, sn_ref,
                 dark_ref, t_ref, invt_ref, thr_ref, ov_ref,
                 os_ref) = refs
            else:
                (val_ref, vp_ref, vn_ref, dark_ref, t_ref, invt_ref,
                 thr_ref, ov_ref) = refs
        elif use_std:
            val_ref, std_ref, t_ref, invt_ref, ov_ref, os_ref = refs
        else:
            val_ref, t_ref, invt_ref, ov_ref = refs
        f32 = jnp.float32
        bf16 = jnp.bfloat16
        c = lambda v: jnp.float32(v)  # noqa: E731  (pin f32 under x64)

        if bad_pixel:
            # hot-pixel repair prologue: per exposure, median-replace
            # where the matched dark frame flags the pixel hot.  The
            # full-block neighbor specs do NOT triple HBM traffic in
            # practice — Mosaic's pipeliner reuses the overlapping
            # fetches (measured round 4: 1-row/8-row narrow-halo specs
            # changed nothing outside the ±10% epoch noise band, so the
            # simpler full-block scheme stays).
            i = pl.program_id(1)
            nh = pl.num_programs(1)
            # dark_ref is either matched dark frames (float, compare
            # against the threshold) or a precomputed uint8 hot mask
            # (ops.filters.hot_pixel_mask — same kernel speed, but 4x
            # less host->device transfer when masks are staged for fixed
            # calibration darks)
            if jnp.issubdtype(dark_ref.dtype, jnp.integer):
                hot_of = lambda e: dark_ref[e, 0] != 0  # noqa: E731
            else:
                thr = thr_ref[0, 0]
                hot_of = lambda e: dark_ref[e, 0].astype(f32) > thr  # noqa

            def fix(cur_ref, prev_ref, next_ref, e):
                cur = cur_ref[e, 0].astype(f32)
                top = prev_ref[e, 0, hb - 1:hb, :].astype(f32)
                bot = next_ref[e, 0, 0:1, :].astype(f32)
                # reflect (edge-repeat) at the image borders; interior
                # blocks read the true neighbor rows (clamped index maps
                # deliver the same block at the edges)
                top = jnp.where(i == 0, cur[0:1, :], top)
                bot = jnp.where(i == nh - 1, cur[hb - 1:hb, :], bot)
                strip = jnp.concatenate([top, cur, bot], axis=0)
                med = _median9_block(strip, hb, wb)
                return jnp.where(hot_of(e), med, cur)

            raw = jnp.concatenate(
                [fix(val_ref, vp_ref, vn_ref, e) for e in range(n)],
                axis=0)                                  # (n*hb, wb)
            if use_std:
                s_all = jnp.concatenate(
                    [fix(std_ref, sp_ref, sn_ref, e) for e in range(n)],
                    axis=0)
        else:
            raw = val_ref[...].reshape(n * hb, wb)
        if is_int:
            idx = raw.astype(jnp.int32)
            x = idx.astype(f32) * c(1.0 / max_dn)
        else:
            x = raw.astype(f32)
            idx = jnp.round(x * c(max_dn)).astype(jnp.int32)
            idx = jnp.minimum(jnp.maximum(idx, jnp.int32(0)),
                              jnp.int32(max_dn))
        pos = idx.astype(f32) * c(255.0 / max_dn)
        j = jnp.minimum(pos.astype(jnp.int32), jnp.int32(254))
        t_frac = pos - j.astype(f32)
        hi = j >> 4
        lo = j & 15

        w_all = jnp.exp(c(-30.0) * (x - c(0.5)) ** 2)
        inv_sw = c(1.0) / jnp.sum(w_all.reshape(n, hb, wb), axis=0)
        inv_sw2 = inv_sw * inv_sw
        if use_std and not bad_pixel:
            s_all = std_ref[...].reshape(n * hb, wb).astype(f32)

        # exact 3-part bf16 split, parts on the contraction dim (fact 3)
        t = t_ref[...].reshape(n_rows, t_ref.shape[-1])[:, :16]
        p0 = t.astype(bf16)
        r1 = t - p0.astype(f32)
        p1 = r1.astype(bf16)
        p2 = (r1 - p1.astype(f32)).astype(bf16)
        t012 = jnp.concatenate([p0, p1, p2], axis=1)       # (n_rows, 48)
        tb = jnp.broadcast_to(t012[None], (hb, n_rows, 48))

        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hb, 1, 16, wb), 2)
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (hb, 16, wb), 1)

        acc_v = jnp.zeros((hb, wb), f32)
        acc_s = jnp.zeros((hb, wb), f32)
        for e in range(n):
            sl = slice(e * hb, (e + 1) * hb)
            oh = (hi[sl].reshape(hb, 1, 1, wb) == iota_hi).astype(bf16)
            oh3 = jnp.broadcast_to(oh, (hb, 3, 16, wb)).reshape(
                hb, 48, wb)
            a = jax.lax.dot_general(
                tb, oh3,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32)            # (hb, n_rows, wb)

            oh_lo = (lo[sl].reshape(hb, 1, wb) == iota_lo).astype(f32)
            ohl = jnp.broadcast_to(
                oh_lo.reshape(hb, 1, 16, wb),
                (hb, n_tab * 2, 16, wb)).reshape(hb, n_rows, wb)
            y = (a * ohl).reshape(hb, n_tab * 2, 16, wb).sum(axis=2)
            tf = t_frac[sl]
            g = y[:, 0, :] + tf * (y[:, 1, :] - y[:, 0, :])
            if use_std:
                fp = y[:, 2, :] + tf * (y[:, 3, :] - y[:, 2, :])

            w_e = w_all[sl]
            invt = invt_ref[e, 0]
            acc_v = acc_v + w_e * g * invt
            if use_std:
                s_e = s_all[sl]
                dw = c(-60.0) * (x[sl] - c(0.5)) * w_e
                dg = fp * s_e
                bracket = (dw * g + w_e * dg) * inv_sw \
                    - (dw * w_e * g) * inv_sw2
                scale = dg if compat == "reference" else s_e
                term = bracket * scale * invt
                acc_s = acc_s + term * term

        ov_ref[...] = (acc_v * inv_sw).reshape(ov_ref.shape)
        if use_std:
            os_ref[...] = jnp.sqrt(acc_s).reshape(os_ref.shape)

    return kernel


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Every grid cell writes a distinct output block (no cross-cell carries),
# so all grid dimensions are semantically parallel.  Declaring them
# improves the DMA stream itself — the pure-copy floor at hb=16 drops
# 2.65 -> 1.97 ms and the full kernel ~3.9 -> ~3.7 ms (benchmarks/
# exp_plateau.py) — but DMA and compute remain ADDITIVE: neither these
# hints nor a hand-rolled async-copy pipeline (benchmarks/
# exp_manual_pipeline.py) overlaps them on this part.  Override (e.g. to
# None) via module global for A/B.
_DIM_SEMANTICS: Optional[Tuple[str, ...]] = ("parallel", "parallel",
                                             "arbitrary")


def _params(vmem_mb: int) -> "pltpu.CompilerParams":
    kw = dict(vmem_limit_bytes=vmem_mb * 1024 * 1024)
    if _DIM_SEMANTICS is not None:
        kw["dimension_semantics"] = _DIM_SEMANTICS
    return pltpu.CompilerParams(**kw)


def _pick_blocks(bits: int, h: int, w: int, hb: int) -> Tuple[int, int]:
    """Rows/lanes per grid cell.  12-bit tables make the (hb, 2*LO, wb)
    intermediates 4x larger, so the lane dim blocks down to keep the
    working set well under VMEM."""
    hb = min(hb, h)
    if bits <= 256 or w <= 768:
        return (hb, w) if bits <= 256 else (min(hb, 8), w)
    return min(hb, 8), 640  # lane blocks must be 128-multiples


@partial(jax.jit, static_argnames=("compat", "hb"))
def merge_planar_fused(val: Array, std: Optional[Array], exposures: Array,
                       icrf: Array, icrf_diff: Array,
                       compat: str = "corrected", hb: int = 16
                       ) -> Tuple[Array, Optional[Array]]:
    """Fused merge on logical ``(N, C, H, W)`` planar stacks.

    ``val``: float [0,1] or integer DNs; ``std`` optional float;
    ``icrf``/``icrf_diff``: (256, C) or (4096, C); ``exposures``: (N,).
    Returns ``(C, H, W)`` value (+ std).  ``hb`` = rows per grid cell.
    """
    n, ch, h, w = val.shape
    bits = icrf.shape[0]
    if bits not in _RADIX:
        raise NotImplementedError(
            f"the fused kernel supports {sorted(_RADIX)}-entry tables; "
            "use ops.hdr.merge_stack")
    f32 = jnp.float32
    use_std = std is not None
    is_int = jnp.issubdtype(val.dtype, jnp.integer)
    hb, wb = _pick_blocks(bits, h, w, hb)

    tables = pack_tables(icrf, icrf_diff)          # (C, 2*LO, >=128)
    inv_t = (1.0 / exposures.astype(f32)).reshape(n, 1)
    t_rows, t_lanes = tables.shape[1], tables.shape[2]

    grid = (ch, pl.cdiv(h, hb), pl.cdiv(w, wb))
    kernel = _make_kernel(n, hb, wb, use_std, is_int, compat, bits)
    stack_spec = pl.BlockSpec((n, 1, hb, wb),
                              lambda c_, i, j: (0, c_, i, j),
                              memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((1, t_rows, t_lanes),
                              lambda c_, i, j: (c_, 0, 0),
                              memory_space=pltpu.VMEM)
    invt_spec = pl.BlockSpec((n, 1), lambda c_, i, j: (0, 0),
                             memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, hb, wb), lambda c_, i, j: (c_, i, j),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((ch, h, w), f32)
    params = _params(64)

    if use_std:
        ov, os_ = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[stack_spec, stack_spec, table_spec, invt_spec],
            out_specs=[out_spec, out_spec],
            out_shape=[out_shape, out_shape],
            compiler_params=params, interpret=_interpret(),
        )(val, std, tables, inv_t)
        return ov, os_
    ov = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[stack_spec, table_spec, invt_spec],
        out_specs=out_spec, out_shape=out_shape,
        compiler_params=params, interpret=_interpret(),
    )(val, tables, inv_t)
    return ov, None


@partial(jax.jit, static_argnames=("bits", "compat", "hb"))
def merge_planar_lerp(val: Array, std: Optional[Array], exposures: Array,
                      icrf_base: Array, icrf_diff_base: Optional[Array],
                      bits: int, compat: str = "corrected", hb: int = 16
                      ) -> Tuple[Array, Optional[Array]]:
    """Fused merge on logical ``(N, C, H, W)`` planar stacks through
    256-point base curves evaluated as piecewise-linear interpolants.

    Semantically equal (to f32 rounding) to ``merge_planar_fused`` with
    ``icrf = np.interp``-expanded ``bits``-entry tables — the reference's
    own construction for >8-bit depths (ICRF_calibration_exposure.py:
    204-216, 398-402) — at near-8-bit kernel cost instead of the exact
    radix's O(bits) MACs per lookup.  ``icrf_diff_base`` None merges
    value-only.
    """
    n, ch, h, w = val.shape
    f32 = jnp.float32
    use_std = std is not None
    if use_std and icrf_diff_base is None:
        raise ValueError("std merge needs icrf_diff_base")
    is_int = jnp.issubdtype(val.dtype, jnp.integer)
    hb = min(hb, h)
    wb = w

    tables = pack_tables_lerp(icrf_base,
                              icrf_diff_base if use_std else None)
    inv_t = (1.0 / exposures.astype(f32)).reshape(n, 1)
    t_rows, t_lanes = tables.shape[1], tables.shape[2]

    grid = (ch, pl.cdiv(h, hb), pl.cdiv(w, wb))
    kernel = _make_kernel(n, hb, wb, use_std, is_int, compat, bits,
                          lerp=True)
    stack_spec = pl.BlockSpec((n, 1, hb, wb),
                              lambda c_, i, j: (0, c_, i, j),
                              memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((1, t_rows, t_lanes),
                              lambda c_, i, j: (c_, 0, 0),
                              memory_space=pltpu.VMEM)
    invt_spec = pl.BlockSpec((n, 1), lambda c_, i, j: (0, 0),
                             memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, hb, wb), lambda c_, i, j: (c_, i, j),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((ch, h, w), f32)
    params = _params(64)

    if use_std:
        ov, os_ = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[stack_spec, stack_spec, table_spec, invt_spec],
            out_specs=[out_spec, out_spec],
            out_shape=[out_shape, out_shape],
            compiler_params=params, interpret=_interpret(),
        )(val, std, tables, inv_t)
        return ov, os_
    ov = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[stack_spec, table_spec, invt_spec],
        out_specs=out_spec, out_shape=out_shape,
        compiler_params=params, interpret=_interpret(),
    )(val, tables, inv_t)
    return ov, None


@partial(jax.jit, static_argnames=("bits", "compat", "hb"))
def merge_planar_lerp_bp(val: Array, std: Optional[Array], dark: Array,
                         exposures: Array, icrf_base: Array,
                         icrf_diff_base: Optional[Array], threshold: Array,
                         bits: int, compat: str = "corrected", hb: int = 16
                         ) -> Tuple[Array, Optional[Array]]:
    """:func:`merge_planar_lerp` with the dark-frame hot-pixel repair
    (3x3 median replace, reference image_set.py:387-400) fused in as a
    kernel prologue — the corrected stack never round-trips through HBM.

    ``dark``: (N, C, H, W) matched dark frames (all-zero planes for
    exposures without one — the repair is then an exact no-op), OR a
    uint8 hot-pixel MASK (nonzero = repair; precompute once via
    ``ops.filters.hot_pixel_mask`` — same kernel speed, 4x less
    host->device transfer for fixed calibration darks; ``threshold`` is
    then ignored).
    Requires float stacks and H divisible by ``hb`` (the neighbor-block
    halo scheme needs uniform row blocks); callers fall back to the
    unfused chain otherwise.
    """
    n, ch, h, w = val.shape
    f32 = jnp.float32
    use_std = std is not None
    if use_std and icrf_diff_base is None:
        raise ValueError("std merge needs icrf_diff_base")
    if jnp.issubdtype(val.dtype, jnp.integer):
        raise ValueError("fused bad-pixel merge needs float stacks")
    hb = min(hb, h)
    if h % hb != 0:
        raise ValueError(f"H={h} must divide into hb={hb} row blocks")
    wb = w
    nh = h // hb

    tables = pack_tables_lerp(icrf_base,
                              icrf_diff_base if use_std else None)
    inv_t = (1.0 / exposures.astype(f32)).reshape(n, 1)
    thr = jnp.asarray(threshold, f32).reshape(1, 1)
    t_rows, t_lanes = tables.shape[1], tables.shape[2]

    grid = (ch, nh, 1)
    kernel = _make_kernel_lerp(n, hb, wb, use_std, False, compat, bits,
                               bad_pixel=True)
    spec = pl.BlockSpec((n, 1, hb, wb), lambda c_, i, j: (0, c_, i, j),
                        memory_space=pltpu.VMEM)
    # full-block neighbor halos: only the adjacent row is needed, but
    # narrow (1- or 8-row) halo specs measured NO faster on-chip (the
    # pipeliner already reuses the overlapping fetches) and Mosaic
    # requires >=8-row blocks anyway — keep the simple scheme
    spec_prev = pl.BlockSpec(
        (n, 1, hb, wb),
        lambda c_, i, j: (0, c_, jnp.maximum(i - 1, 0), j),
        memory_space=pltpu.VMEM)
    spec_next = pl.BlockSpec(
        (n, 1, hb, wb),
        lambda c_, i, j: (0, c_, jnp.minimum(i + 1, nh - 1), j),
        memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((1, t_rows, t_lanes),
                              lambda c_, i, j: (c_, 0, 0),
                              memory_space=pltpu.VMEM)
    invt_spec = pl.BlockSpec((n, 1), lambda c_, i, j: (0, 0),
                             memory_space=pltpu.SMEM)
    thr_spec = pl.BlockSpec((1, 1), lambda c_, i, j: (0, 0),
                            memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, hb, wb), lambda c_, i, j: (c_, i, j),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((ch, h, w), f32)
    params = _params(96)

    if use_std:
        ov, os_ = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[spec, spec_prev, spec_next, spec, spec_prev,
                      spec_next, spec, table_spec, invt_spec, thr_spec],
            out_specs=[out_spec, out_spec],
            out_shape=[out_shape, out_shape],
            compiler_params=params, interpret=_interpret(),
        )(val, val, val, std, std, std, dark, tables, inv_t, thr)
        return ov, os_
    ov = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[spec, spec_prev, spec_next, spec, table_spec, invt_spec,
                  thr_spec],
        out_specs=out_spec, out_shape=out_shape,
        compiler_params=params, interpret=_interpret(),
    )(val, val, val, dark, tables, inv_t, thr)
    return ov, None


@partial(jax.jit, static_argnames=("bits", "compat", "hb"))
def merge_nhwc_lerp_bp(stack_val: Array, stack_std: Optional[Array],
                       dark: Array, exposures: Array, icrf_base: Array,
                       icrf_diff_base: Optional[Array], threshold: Array,
                       bits: int, compat: str = "corrected", hb: int = 16
                       ) -> Tuple[Array, Optional[Array]]:
    """NHWC wrapper for :func:`merge_planar_lerp_bp` (free relayout)."""
    planar = lambda s: jnp.transpose(s, (0, 3, 1, 2))  # noqa: E731
    ov, os_ = merge_planar_lerp_bp(
        planar(stack_val),
        None if stack_std is None else planar(stack_std),
        planar(dark), exposures, icrf_base, icrf_diff_base, threshold,
        bits, compat=compat, hb=hb)
    to_nhwc = lambda o: jnp.transpose(o, (1, 2, 0))  # noqa: E731
    return to_nhwc(ov), None if os_ is None else to_nhwc(os_)


@partial(jax.jit, static_argnames=("bits", "compat", "hb"))
def merge_nhwc_lerp(stack_val: Array, stack_std: Optional[Array],
                    exposures: Array, icrf_base: Array,
                    icrf_diff_base: Optional[Array], bits: int,
                    compat: str = "corrected", hb: int = 16
                    ) -> Tuple[Array, Optional[Array]]:
    """NHWC wrapper for :func:`merge_planar_lerp` (free relayout, fact 1)."""
    planar = lambda s: jnp.transpose(s, (0, 3, 1, 2))  # noqa: E731
    ov, os_ = merge_planar_lerp(
        planar(stack_val),
        None if stack_std is None else planar(stack_std),
        exposures, icrf_base, icrf_diff_base, bits, compat=compat, hb=hb)
    to_nhwc = lambda o: jnp.transpose(o, (1, 2, 0))  # noqa: E731
    return to_nhwc(ov), None if os_ is None else to_nhwc(os_)


@partial(jax.jit, static_argnames=("compat", "hb"))
def merge_nhwc_fused(stack_val: Array, stack_std: Optional[Array],
                     exposures: Array, icrf: Array, icrf_diff: Array,
                     compat: str = "corrected", hb: int = 16
                     ) -> Tuple[Array, Optional[Array]]:
    """Fused merge on logical ``(N, H, W, C)`` stacks — no physical
    relayout (measured fact 1; the planar transpose and the (H, W, C)
    result view are relabelings of the existing device layout).

    Drop-in for ops.hdr.merge_stack; returns (H, W, C) value (+ std).
    """
    planar = lambda s: jnp.transpose(s, (0, 3, 1, 2))  # noqa: E731
    ov, os_ = merge_planar_fused(
        planar(stack_val),
        None if stack_std is None else planar(stack_std),
        exposures, icrf, icrf_diff, compat=compat, hb=hb)
    to_nhwc = lambda o: jnp.transpose(o, (1, 2, 0))  # noqa: E731
    return to_nhwc(ov), None if os_ is None else to_nhwc(os_)
