"""HDR exposure-stack merging with uncertainty propagation.

The reference merges with two Python passes over a list of images — a
sum-of-weights prologue and an accumulation loop, each a chain of NumPy ops
(reference: modules/exposure_series.py:317-397).  Here the stack is a single
``(N, H, W, C)`` device array and both passes are fused into one jitted
computation over the exposure axis; XLA fuses the per-exposure elementwise
chain (weight -> LUT gather -> accumulate) into a single pass over HBM.
ops/hdr_pallas2.py provides the hand-fused Pallas kernels for the same
math; this module is the reference-semantics jnp path used for parity and
as fallback.

Weight/accumulation semantics (exposure_series.py:382-394):

    w_n, dw_n = gaussian_weight(x_n)         # from the *raw* value image
    g_n, dg_n = linearize(x_n, s_n)          # ICRF LUT + derivative * std
    HDR   = sum_n  w_n g_n / (SW t_n)
    std^2 = sum_n (((dw_n g_n + w_n dg_n)/SW - dw_n w_n g_n/SW^2) * D / t_n)^2

where ``SW = sum_n w_n`` and ``D`` is ``dg_n`` in ``compat='reference'``
mode — replicating exposure_series.py:389 exactly — or the input std ``s_n``
in ``compat='corrected'`` mode (first-order propagation: the bracket is
dHDR/dx_n with dg/dx = icrf'(x), so it must be scaled by the std of x_n, not
by dg_n; SURVEY.md §7.7).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .linearize import dn_indices, lut_lookup, lut_lookup_multi
from .uncertainty import gaussian_weight

Array = jnp.ndarray

__all__ = ["sum_of_weights", "merge_stack", "merge_stack_u8", "merge_hdr",
           "merge_corrected", "merge_batch"]


def merge_batch(batch_val: "Array", batch_std, exposures, icrf, icrf_diff,
                compat: str = "corrected", use_pallas=None,
                icrf_base=None, icrf_diff_base=None):
    """Merge a (B, N, H, W, C) batch of scenes in one device call.

    On TPU the batch vmaps over the fused kernel — Pallas turns the vmap
    into an extra grid dimension, so the whole batch is still ONE kernel
    launch with no data movement (measured 697 MP/s aggregate for 4
    scenes of BASELINE config 2 vs 430 via row-folding + transpose).
    Elsewhere it vmaps the jnp path.  256-point base curves select the
    piecewise-linear kernel for >8-bit tables (see merge_hdr).
    """
    # the lerp kernel packs 256-point base curves only; other datapoints
    # resolutions (config.datapoints is user-settable) fall through to the
    # exact paths instead of tripping the kernel's pack-time assert
    if (icrf_base is not None and icrf_base.shape[0] == 256
            and icrf.shape[0] > 256
            and jax.default_backend() == "tpu" and use_pallas is not False):
        from .hdr_pallas2 import merge_nhwc_lerp
        bits = icrf.shape[0]
        if batch_std is None:
            v = jax.vmap(lambda bv: merge_nhwc_lerp(
                bv, None, exposures, icrf_base, None, bits=bits,
                compat=compat)[0])(batch_val)
            return v, None
        return jax.vmap(lambda bv, bs: merge_nhwc_lerp(
            bv, bs, exposures, icrf_base, icrf_diff_base, bits=bits,
            compat=compat))(batch_val, batch_std)
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and icrf.shape[0] in (256, 4096))
    if use_pallas:
        from .hdr_pallas2 import merge_nhwc_fused
        if batch_std is None:
            v = jax.vmap(lambda bv: merge_nhwc_fused(
                bv, None, exposures, icrf, icrf_diff, compat=compat)[0]
            )(batch_val)
            return v, None
        return jax.vmap(lambda bv, bs: merge_nhwc_fused(
            bv, bs, exposures, icrf, icrf_diff, compat=compat)
        )(batch_val, batch_std)
    if batch_std is None:
        return jax.vmap(lambda v: merge_stack(
            v, None, exposures, icrf, icrf_diff, compat=compat)[0]
        )(batch_val), None
    return jax.vmap(lambda v, s: merge_stack(
        v, s, exposures, icrf, icrf_diff, compat=compat)
    )(batch_val, batch_std)


def sum_of_weights(stack_val: Array) -> Tuple[Array, Array]:
    """Sum of gaussian weights over the exposure axis and its square
    (exposure_series.py:317-345)."""
    w, _ = gaussian_weight(stack_val)
    sw = jnp.sum(w, axis=0)
    return sw, sw ** 2


def _merge_core(x, idx, stack_std, exposures, icrf, icrf_diff, compat):
    """Shared merge math on normalized values ``x`` and DN indices ``idx``
    (both (N, H, W, C))."""
    dtype = x.dtype
    w_all, dw_all = gaussian_weight(x)
    sw = jnp.sum(w_all, axis=0)
    sw2 = sw ** 2
    t = exposures.astype(dtype).reshape(-1, 1, 1, 1)

    if stack_std is None:
        g = lut_lookup(idx, icrf).astype(dtype)
        return jnp.sum(w_all * g / (sw * t), axis=0), None

    # One shared one-hot pass feeds both tables (see lut_lookup_multi).
    gd = lut_lookup_multi(idx, jnp.stack([icrf, icrf_diff], axis=-1))
    g = gd[..., 0].astype(dtype)
    fprime = gd[..., 1].astype(dtype)

    hdr_val = jnp.sum(w_all * g / (sw * t), axis=0)
    dg = fprime * stack_std
    bracket = (dw_all * g + w_all * dg) / sw - (dw_all * w_all * g) / sw2
    scale = dg if compat == "reference" else stack_std
    hdr_var = jnp.sum(((bracket * scale) / t) ** 2, axis=0)
    return hdr_val, jnp.sqrt(hdr_var)


def _auto_row_chunk(n, h, w, c, bits, itemsize=4,
                    budget_bytes=1 << 30) -> int:
    """Rows per chunk so the radix-lookup intermediate (the (..., 2, LO)
    rows tensor of lut_lookup_multi, 2*LO floats per element) stays under
    ~1 GB.  Returns 0 for 'no chunking needed'."""
    lo = 1 << ((bits.bit_length() - 1) // 2)
    per_row = n * w * c * 2 * lo * itemsize
    if per_row * h <= budget_bytes:
        return 0
    return max(8, budget_bytes // per_row)


def _chunked_over_rows(core, h, row_chunk, *stacks):
    """Apply ``core`` over (N, row_chunk, W, C) slabs via lax.map, bounding
    the lookup intermediate to one slab at a time.  Rows pad up to a chunk
    multiple; padding is sliced off the result."""
    k = -(-h // row_chunk)
    pad = k * row_chunk - h

    def prep(s):
        if pad:
            s = jnp.pad(s, [(0, 0), (0, pad)] + [(0, 0)] * (s.ndim - 2))
        n = s.shape[0]
        s = s.reshape(n, k, row_chunk, *s.shape[2:])
        return jnp.moveaxis(s, 1, 0)  # (k, N, rc, W, C)

    slabs = tuple(prep(s) for s in stacks)
    out = jax.lax.map(lambda xs: core(*xs), slabs)

    def unchunk(o):
        if o is None:
            return None
        o = o.reshape(k * row_chunk, *o.shape[2:])
        return o[:h] if pad else o

    return tuple(unchunk(o) for o in out)


@partial(jax.jit, static_argnames=("compat", "row_chunk"))
def merge_stack(stack_val: Array, stack_std: Optional[Array],
                exposures: Array, icrf: Array, icrf_diff: Array,
                compat: str = "corrected",
                row_chunk: Optional[int] = None
                ) -> Tuple[Array, Optional[Array]]:
    """Merge a preprocessed ``(N, H, W, C)`` stack into an HDR radiance map.

    ``stack_val`` holds [0,1] float values (dark/bad-pixel corrections are a
    prologue, see models/exposure_series.py); ``exposures`` is ``(N,)``;
    ``icrf``/``icrf_diff`` are ``(bits, C)``.  Returns ``(hdr_val, hdr_std)``
    with ``hdr_std`` None when ``stack_std`` is None.

    ``row_chunk`` bounds peak memory (auto-sized to keep the radix-lookup
    intermediate near 1 GB when None; pass 0 to disable chunking).
    """
    n, h, w, c = stack_val.shape
    max_dn = icrf.shape[0] - 1
    if row_chunk is None:
        row_chunk = _auto_row_chunk(n, h, w, c, icrf.shape[0])

    if stack_std is None:
        def core(sv):
            return _merge_core(sv, dn_indices(sv, max_dn), None, exposures,
                               icrf, icrf_diff, compat)
        if not row_chunk or row_chunk >= h:
            return core(stack_val)
        (val,) = _chunked_over_rows(lambda sv: (core(sv)[0],), h, row_chunk,
                                    stack_val)
        return val, None

    def core2(sv, ss):
        return _merge_core(sv, dn_indices(sv, max_dn), ss, exposures,
                           icrf, icrf_diff, compat)
    if not row_chunk or row_chunk >= h:
        return core2(stack_val, stack_std)
    return _chunked_over_rows(core2, h, row_chunk, stack_val, stack_std)


@partial(jax.jit, static_argnames=("compat", "row_chunk"))
def merge_stack_u8(stack_dn: Array, stack_std: Optional[Array],
                   exposures: Array, icrf: Array, icrf_diff: Array,
                   compat: str = "corrected",
                   row_chunk: Optional[int] = None
                   ) -> Tuple[Array, Optional[Array]]:
    """Merge directly from an integer-DN stack (the native 8-bit path).

    ``stack_dn``: (N, H, W, C) uint8/int DNs.  Keeping the stack in uint8
    on device cuts HBM read traffic 4x vs pre-normalized float and removes
    the per-pixel round: ``x = dn/max_dn`` exactly reproduces the
    reference's 8-bit load normalization (image_set.py:223), and ``dn`` is
    itself the LUT index.
    """
    n, h, w, c = stack_dn.shape
    max_dn = icrf.shape[0] - 1
    dtype = icrf.dtype if jnp.issubdtype(icrf.dtype, jnp.floating) \
        else jnp.float32
    if row_chunk is None:
        row_chunk = _auto_row_chunk(n, h, w, c, icrf.shape[0])

    def to_x(dn):
        idx = dn.astype(jnp.int32)
        return idx.astype(dtype) * (1.0 / max_dn), idx

    if stack_std is None:
        def core(dn):
            x, idx = to_x(dn)
            return _merge_core(x, idx, None, exposures, icrf, icrf_diff,
                               compat)
        if not row_chunk or row_chunk >= h:
            return core(stack_dn)
        (val,) = _chunked_over_rows(lambda dn: (core(dn)[0],), h, row_chunk,
                                    stack_dn)
        return val, None

    def core2(dn, ss):
        x, idx = to_x(dn)
        return _merge_core(x, idx, ss, exposures, icrf, icrf_diff, compat)
    if not row_chunk or row_chunk >= h:
        return core2(stack_dn, stack_std)
    return _chunked_over_rows(core2, h, row_chunk, stack_dn, stack_std)


@partial(jax.jit, static_argnames=("compat", "kernel_size",
                                   "mid_percentage"))
def merge_corrected(stack_val: Array, stack_std: Optional[Array],
                    dark_stack: Array, exposures: Array, icrf: Array,
                    icrf_diff: Array, dark_threshold: Array,
                    flat_val: Optional[Array] = None,
                    flat_std: Optional[Array] = None,
                    mid_percentage: float = 0.05,
                    compat: str = "corrected", kernel_size: int = 3,
                    icrf_base: Optional[Array] = None,
                    icrf_diff_base: Optional[Array] = None
                    ) -> Tuple[Array, Optional[Array]]:
    """Corrections-fused merge: bad-pixel prologue -> merge -> flat epilogue
    in ONE jitted computation (BASELINE config 3; reference runs the
    prologue as a per-image Python pass, exposure_series.py:371-381, and
    the epilogue as a separate call, :415-417).

    ``dark_stack`` is (N, H, W, C) of per-exposure dark frames — all-zero
    planes for exposures without a matched dark (the repair is then an
    exact no-op, like the reference's skip) — OR a precomputed uint8
    hot-pixel mask (``ops.filters.hot_pixel_mask``; darks are fixed
    calibration data, so the mask is computed once — same merge speed,
    4x less host->device transfer when staging it).  The median repair runs
    vmapped over the exposure axis; XLA fuses it with the normalization
    into the merge kernel's input stream, so the stack makes one HBM
    round-trip for the whole chain.
    """
    from .filters import bad_pixel_filter, flat_field_correction
    # one-kernel path: hot-pixel repair fused as the merge prologue.
    # >8-bit tables need their base curves; a 256-entry table IS its own
    # base (the lerp degenerates to the exact lookup: pos = idx, t = 0).
    base, diff_b = icrf_base, icrf_diff_base
    if base is None and icrf.shape[0] == 256:
        base, diff_b = icrf, icrf_diff
    if (base is not None and base.shape[0] == 256
            and jax.default_backend() == "tpu"
            and kernel_size == 3
            and not jnp.issubdtype(stack_val.dtype, jnp.integer)
            and stack_val.shape[1] % 16 == 0):
        from .hdr_pallas2 import merge_nhwc_lerp_bp
        hdr_val, hdr_std = merge_nhwc_lerp_bp(
            stack_val, stack_std, dark_stack, exposures, base,
            None if stack_std is None else diff_b,
            dark_threshold, bits=icrf.shape[0], compat=compat)
        if flat_val is not None:
            hdr_val, hdr_std = flat_field_correction(
                hdr_val, hdr_std, flat_val, flat_std, mid_percentage)
        return hdr_val, hdr_std
    # merge_corrected's documented contract: an integer-dtype dark_stack
    # IS a precomputed hot-pixel mask (hot_pixel_mask); float dark frames
    # compare against the threshold
    dark_is_mask = bool(jnp.issubdtype(dark_stack.dtype, jnp.integer))
    if stack_std is None:
        fixed_val = jax.vmap(
            lambda v, d: bad_pixel_filter(v, None, d, dark_threshold,
                                          kernel_size, dark_is_mask)[0])(
            stack_val, dark_stack)
        fixed_std = None
    else:
        fixed_val, fixed_std = jax.vmap(
            lambda v, s, d: bad_pixel_filter(v, s, d, dark_threshold,
                                             kernel_size, dark_is_mask))(
            stack_val, stack_std, dark_stack)

    hdr_val, hdr_std = merge_hdr(fixed_val, fixed_std, exposures, icrf,
                                 icrf_diff, compat=compat,
                                 icrf_base=icrf_base,
                                 icrf_diff_base=icrf_diff_base)
    if flat_val is not None:
        hdr_val, hdr_std = flat_field_correction(hdr_val, hdr_std, flat_val,
                                                 flat_std, mid_percentage)
    return hdr_val, hdr_std


def merge_hdr(stack_val: Array, stack_std: Optional[Array], exposures: Array,
              icrf: Array, icrf_diff: Array, compat: str = "corrected",
              use_pallas: Optional[bool] = None,
              icrf_base: Optional[Array] = None,
              icrf_diff_base: Optional[Array] = None
              ) -> Tuple[Array, Optional[Array]]:
    """Dispatch to the fastest merge implementation.

    On TPU with 8-bit tables the fused v2 Pallas kernel (ops/hdr_pallas2.py)
    wins: 3.9 ms (~585 MP/s) for 1920x1200x3x6 with std directly on NHWC
    stacks vs 29 ms for the fused-XLA radix path and 12.4 ms for the
    round-1 kernel.  Elsewhere — or for non-256-entry tables — the jnp
    path runs.  Pass ``use_pallas`` to force either implementation.

    For >8-bit depths, passing the 256-point solved curves as
    ``icrf_base``/``icrf_diff_base`` selects the piecewise-linear kernel
    (merge_nhwc_lerp): the reference's >8-bit tables are np.interp
    expansions of 256 solved datapoints
    (ICRF_calibration_exposure.py:204-216, 398-402), so evaluating the
    interpolant in-kernel is the same math at near-8-bit cost — ~4x the
    exact 4096-radix throughput.  ``icrf``/``icrf_diff`` still provide
    the expanded tables for the non-TPU fallback (and define ``bits``).
    """
    if (icrf_base is not None and icrf_base.shape[0] == 256
            and icrf.shape[0] > 256
            and jax.default_backend() == "tpu" and use_pallas is not False):
        from .hdr_pallas2 import merge_nhwc_lerp
        return merge_nhwc_lerp(
            stack_val, stack_std, exposures, icrf_base,
            None if stack_std is None else icrf_diff_base,
            bits=icrf.shape[0], compat=compat)
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and icrf.shape[0] in (256, 4096))
    if use_pallas and jax.default_backend() == "tpu":
        from .hdr_pallas2 import merge_nhwc_fused
        return merge_nhwc_fused(stack_val, stack_std, exposures, icrf,
                                icrf_diff, compat=compat)
    if jnp.issubdtype(stack_val.dtype, jnp.integer):
        return merge_stack_u8(stack_val, stack_std, exposures, icrf,
                              icrf_diff, compat=compat)
    return merge_stack(stack_val, stack_std, exposures, icrf, icrf_diff,
                       compat=compat)
