"""Fused Pallas TPU kernel for the HDR exposure-stack merge.

One kernel fuses the whole per-pixel merge chain of the reference's two
Python passes (reference: modules/exposure_series.py:317-397): gaussian
weighting (+ derivative), ICRF LUT lookup (+ derivative), sum-of-weights
normalization and the weighted accumulation of value and variance — one HBM
read of the stack, one HBM write of the result.

Design notes (see /opt/skills/guides/pallas_guide.md):

* Grid = (pixel tiles, channels).  The stack is viewed channel-first as
  ``(C, N, P)`` and each program owns a ``(N, TILE_P)`` value+std strip of
  one channel in VMEM (Mosaic wants the last two block dims lane/sublane
  aligned or full-size, so channel leads).
* The 256-entry LUT lookup is a one-hot contraction on the MXU: TPUs have
  no vector-gather, and XLA's fancy-index lowering serializes (measured
  ~500 ms/image); a ``(TILE_P, bits) x (2, bits)`` contraction against the
  two-row table ``[icrf_c, icrf'_c]`` produces both the linearized value
  and the LUT derivative in one MXU pass and is exact for float32 under
  HIGHEST precision.
* Two passes over the exposure axis run entirely in VMEM: pass 1 reduces
  the sum of weights, pass 2 accumulates value and variance with the exact
  bracket formula (no algebraic expansion, so no cancellation loss).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

__all__ = ["merge_stack_pallas", "merge_stack_pallas_cfirst"]

_TILE_P = 4096  # (N, 4096) f32 strips; one-hot scratch (4096, bits) in VMEM


def _weight(x):
    """Gaussian HDR weight + derivative (measurand.py:606-618)."""
    w = jnp.exp(-30.0 * (x - 0.5) ** 2)
    return w, -60.0 * (x - 0.5) * w


def _merge_kernel(val_ref, std_ref, lut2_ref, inv_t_ref,
                  out_val_ref, out_std_ref, *, n_images: int,
                  compat: str, bits: int, use_std: bool):
    """Fused merge for one (TILE_P,) pixel strip of one channel."""
    f32 = jnp.float32
    max_dn = bits - 1
    iota = jax.lax.broadcasted_iota(jnp.int32, (_TILE_P, bits), 1)

    # ---- pass 1: sum of weights (exposure_series.py:317-345) ----------
    sw = jnp.zeros((_TILE_P,), f32)
    for n in range(n_images):
        w, _ = _weight(val_ref[0, n, :])
        sw = sw + w
    sw2 = sw * sw

    # ---- pass 2: accumulate value and variance ------------------------
    acc_val = jnp.zeros((_TILE_P,), f32)
    acc_var = jnp.zeros((_TILE_P,), f32)
    for n in range(n_images):
        x = val_ref[0, n, :]
        w, dw = _weight(x)
        idx = jnp.clip(jnp.round(x * max_dn).astype(jnp.int32), 0, max_dn)
        one_hot = (idx[:, None] == iota).astype(f32)
        # (TILE_P, bits) x (2, bits) -> (TILE_P, 2): [g, icrf'] per pixel.
        gd = jax.lax.dot_general(
            one_hot, lut2_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)
        g = gd[:, 0]
        inv_t = inv_t_ref[n]
        acc_val = acc_val + (w * g) * inv_t / sw
        if use_std:
            s = std_ref[0, n, :]
            dg = gd[:, 1] * s
            bracket = (dw * g + w * dg) / sw - (dw * w * g) / sw2
            scale = dg if compat == "reference" else s
            term = bracket * scale * inv_t
            acc_var = acc_var + term * term

    out_val_ref[0, 0, :] = acc_val
    if use_std:
        out_std_ref[0, 0, :] = jnp.sqrt(acc_var)


@partial(jax.jit, static_argnames=("compat",))
def merge_stack_pallas_cfirst(val: Array, std: Optional[Array],
                              exposures: Array, icrf: Array,
                              icrf_diff: Array, compat: str = "corrected"
                              ) -> Tuple[Array, Optional[Array]]:
    """Fused merge on channel-first ``(C, N, P)`` stacks.

    This is the zero-copy fast path: callers that keep stacks channel-first
    skip the layout change ``merge_stack_pallas`` performs.  Returns
    ``(C, P)`` value (and std when ``std`` is given).
    """
    c, n, p = val.shape
    bits = icrf.shape[0]
    f32 = jnp.float32
    use_std = std is not None

    lut2 = jnp.stack([icrf.astype(f32).T, icrf_diff.astype(f32).T],
                     axis=1)  # (C, 2, bits)
    inv_t = 1.0 / exposures.astype(f32)
    if not use_std:
        std = val  # placeholder block source; the kernel never reads it

    grid = (pl.cdiv(p, _TILE_P), c)
    kernel = partial(_merge_kernel, n_images=n, compat=compat, bits=bits,
                     use_std=use_std)

    out_val, out_std = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, _TILE_P), lambda i, ch: (ch, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, _TILE_P), lambda i, ch: (ch, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, bits), lambda i, ch: (ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, _TILE_P), lambda i, ch: (ch, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _TILE_P), lambda i, ch: (ch, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, 1, p), f32),
            jax.ShapeDtypeStruct((c, 1, p), f32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(val.astype(f32), std.astype(f32), lut2, inv_t)

    return out_val[:, 0, :], (out_std[:, 0, :] if use_std else None)


@partial(jax.jit, static_argnames=("compat",))
def merge_stack_pallas(stack_val: Array, stack_std: Optional[Array],
                       exposures: Array, icrf: Array, icrf_diff: Array,
                       compat: str = "corrected"
                       ) -> Tuple[Array, Optional[Array]]:
    """Fused-kernel HDR merge; drop-in for ops.hdr.merge_stack.

    ``stack_val``/``stack_std``: (N, H, W, C); ``exposures``: (N,);
    ``icrf``/``icrf_diff``: (bits, C).  Channel-last stacks are relaid to
    (C, N, P) for lane-aligned tiling, then merged by the fused kernel.
    """
    n, h, w, c = stack_val.shape
    p = h * w
    val = stack_val.reshape(n, p, c).transpose(2, 0, 1)
    std = None if stack_std is None else \
        stack_std.reshape(n, p, c).transpose(2, 0, 1)
    out_val, out_std = merge_stack_pallas_cfirst(val, std, exposures, icrf,
                                                 icrf_diff, compat=compat)
    hdr_val = out_val.transpose(1, 0).reshape(h, w, c)
    hdr_std = None if out_std is None else \
        out_std.transpose(1, 0).reshape(h, w, c)
    return hdr_val, hdr_std
