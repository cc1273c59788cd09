"""Exact-radix 12-bit lookup: 4 int8 byte planes vs 3 bf16 parts (VERDICT r2 #9).

The exact (non-interpolant) 4096-entry lookup has an MXU floor of
``parts x n_tables x bits`` MACs per lookup (docs/kernel_design.md).  The
last untried idea is exact int8 *byte* planes: an f32 table entry is four
bytes; a one-hot int8 matmul with an int32 accumulator selects each byte
plane exactly, and ``b0 | b1<<8 | b2<<16 | b3<<24`` bitcast to f32
reconstructs the entry bit-exactly.  int8 MXU rate is 2x bf16, but the
formulation needs 4 planes where bf16 needs 3 parts, and planes must sit
on the *output* dim (a power-of-256 weighting on the contraction dim
cannot be carried by an int8 one-hot), so stage-2/reconstruction work
grows 4/n_tab-fold.  Net expectation: MXU time x 2/3, VPU time + ~6 int
ops per table row — worth measuring, not guessing.

Both variants below run the full merge body (weights, accumulate, sqrt)
on identical f32 traffic at BASELINE config-3 geometry; the only delta is
the lookup stage, so wall-time difference isolates it.

Usage: python benchmarks/exp_int8_planes.py [--interpret]
"""
import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, H, W, C = 6, 1200, 1920, 3
BITS = 4096
HI, LO = 64, 64          # shipped radix split for 4096 entries
N_TAB = 2                # value + derivative tables (val+std merge)

INTERPRET = False


def timeit(fn, *args, iters=10, trials=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        float(sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out)))
        best = min(best, (time.time() - t0) / iters)
    return best


# ---------------------------------------------------------------- tables
def pack_bf16(icrf, icrf_diff):
    """Shipped layout: (C, 2*LO, max(HI,128)) f32, split to parts in-kernel."""
    c = icrf.shape[1]

    def rows(tab):
        return tab.astype(np.float32).T.reshape(c, HI, LO).transpose(0, 2, 1)

    packed = np.concatenate([rows(icrf), rows(icrf_diff)], axis=1)
    pad = np.zeros((c, 2 * LO, 128 - HI), np.float32)
    return jnp.asarray(np.concatenate([packed, pad], axis=2))


def pack_int8(icrf, icrf_diff):
    """(C, 4*2*LO, max(HI,128)) int8: byte p of table t at rows
    [(t*4 + p) * LO, ...) — planes on the output dim."""
    c = icrf.shape[1]
    out = np.zeros((c, 4 * N_TAB * LO, 128), np.int8)
    for t, tab in enumerate((icrf, icrf_diff)):
        # (C, LO, HI) entry layout, as the f32 packer
        ent = tab.astype(np.float32).T.reshape(c, HI, LO).transpose(0, 2, 1)
        u = ent.view(np.uint32)
        for p in range(4):
            byte = ((u >> (8 * p)) & 0xFF).astype(np.uint8)
            out[:, (t * 4 + p) * LO:(t * 4 + p + 1) * LO, :HI] = \
                byte.view(np.int8)
    return jnp.asarray(out)


# ---------------------------------------------------------------- kernels
def _common_prologue(val_ref, std_ref, hb, wb):
    f32 = jnp.float32
    c = lambda v: jnp.float32(v)  # noqa: E731
    x = val_ref[...].reshape(N * hb, wb).astype(f32)
    idx = jnp.round(x * c(BITS - 1)).astype(jnp.int32)
    idx = jnp.clip(idx, 0, BITS - 1)
    hi = idx >> 6
    lo = idx & (LO - 1)
    w_all = jnp.exp(c(-30.0) * (x - c(0.5)) ** 2)
    inv_sw = c(1.0) / jnp.sum(w_all.reshape(N, hb, wb), axis=0)
    s_all = std_ref[...].reshape(N * hb, wb).astype(f32)
    return x, hi, lo, w_all, inv_sw, s_all


def _stage2_select(a, lo_e, hb, wb, n_rows_per_tab, n_tabs):
    """8+A two-level lo-select over (hb, n_tabs*n_rows_per_tab, wb)."""
    a_grp = n_rows_per_tab // 8
    iota_8 = jax.lax.broadcasted_iota(jnp.int32, (hb, 8, wb), 1)
    oh_b = ((lo_e & 7).reshape(hb, 1, wb) == iota_8).astype(a.dtype)
    ohb_t = jnp.broadcast_to(
        oh_b.reshape(hb, 1, 1, 8, wb),
        (hb, n_tabs, a_grp, 8, wb)).reshape(hb, n_tabs * n_rows_per_tab, wb)
    y = (a * ohb_t).reshape(hb, n_tabs, a_grp, 8, wb).sum(axis=3)
    oh_a = ((lo_e >> 3).reshape(hb, 1, wb) == jax.lax.broadcasted_iota(
        jnp.int32, (hb, a_grp, wb), 1)).astype(a.dtype)
    return jnp.sum(y * oh_a.reshape(hb, 1, a_grp, wb), axis=2)


def _accum_epilogue(e, x, w_all, s_all, inv_sw, g, fp, acc_v, acc_s, invt,
                    hb):
    c = lambda v: jnp.float32(v)  # noqa: E731
    sl = slice(e * hb, (e + 1) * hb)
    w_e = w_all[sl]
    acc_v = acc_v + w_e * g * invt
    dw = c(-60.0) * (x[sl] - c(0.5)) * w_e
    dg = fp * s_all[sl]
    bracket = (dw * g + w_e * dg) * inv_sw - (dw * w_e * g) * inv_sw * inv_sw
    term = bracket * s_all[sl] * invt
    return acc_v, acc_s + term * term


def kernel_bf16(hb, wb, *refs):
    val_ref, std_ref, t_ref, invt_ref, ov_ref, os_ref = refs
    f32, bf16 = jnp.float32, jnp.bfloat16
    x, hi, lo, w_all, inv_sw, s_all = _common_prologue(val_ref, std_ref,
                                                       hb, wb)
    t = t_ref[...].reshape(2 * LO, t_ref.shape[-1])[:N_TAB * LO, :HI]
    p0 = t.astype(bf16)
    r1 = t - p0.astype(f32)
    p1 = r1.astype(bf16)
    p2 = (r1 - p1.astype(f32)).astype(bf16)
    t012 = jnp.concatenate([p0, p1, p2], axis=1)       # (2*LO, 3*HI)
    tb = jnp.broadcast_to(t012[None], (hb, N_TAB * LO, 3 * HI))
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hb, 1, HI, wb), 2)

    acc_v = jnp.zeros((hb, wb), f32)
    acc_s = jnp.zeros((hb, wb), f32)
    for e in range(N):
        sl = slice(e * hb, (e + 1) * hb)
        oh = (hi[sl].reshape(hb, 1, 1, wb) == iota_hi).astype(bf16)
        oh3 = jnp.broadcast_to(oh, (hb, 3, HI, wb)).reshape(hb, 3 * HI, wb)
        a = jax.lax.dot_general(
            tb, oh3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)                # (hb, 2*LO, wb)
        gf = _stage2_select(a, lo[sl], hb, wb, LO, N_TAB)
        acc_v, acc_s = _accum_epilogue(e, x, w_all, s_all, inv_sw,
                                       gf[:, 0, :], gf[:, 1, :],
                                       acc_v, acc_s, invt_ref[e, 0], hb)
    ov_ref[...] = (acc_v * inv_sw).reshape(ov_ref.shape)
    os_ref[...] = jnp.sqrt(acc_s).reshape(os_ref.shape)


def kernel_int8(hb, wb, *refs):
    val_ref, std_ref, t_ref, invt_ref, ov_ref, os_ref = refs
    f32 = jnp.float32
    i32 = jnp.int32
    x, hi, lo, w_all, inv_sw, s_all = _common_prologue(val_ref, std_ref,
                                                       hb, wb)
    t8 = t_ref[...].reshape(4 * N_TAB * LO,
                            t_ref.shape[-1])[:, :HI]   # (4*2*LO, HI) int8
    tb = jnp.broadcast_to(t8[None], (hb, 4 * N_TAB * LO, HI))
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hb, HI, wb), 1)

    acc_v = jnp.zeros((hb, wb), f32)
    acc_s = jnp.zeros((hb, wb), f32)
    for e in range(N):
        sl = slice(e * hb, (e + 1) * hb)
        oh = (hi[sl].reshape(hb, 1, wb) == iota_hi).astype(jnp.int8)
        a = jax.lax.dot_general(
            tb, oh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=i32)              # (hb, 8*LO, wb) bytes
        # reconstruct f32 bit patterns from the 4 selected byte planes of
        # each table BEFORE the lo-select: 4 ANDs + 3 shifts + 3 ORs per
        # table row
        ab = a.reshape(hb, N_TAB, 4, LO, wb)
        u = (ab[:, :, 0] & 255) | ((ab[:, :, 1] & 255) << 8) \
            | ((ab[:, :, 2] & 255) << 16) | ((ab[:, :, 3] & 255) << 24)
        vals = jax.lax.bitcast_convert_type(u, f32)    # (hb, 2, LO, wb)
        gf = _stage2_select(vals.reshape(hb, N_TAB * LO, wb), lo[sl],
                            hb, wb, LO, N_TAB)
        acc_v, acc_s = _accum_epilogue(e, x, w_all, s_all, inv_sw,
                                       gf[:, 0, :], gf[:, 1, :],
                                       acc_v, acc_s, invt_ref[e, 0], hb)
    ov_ref[...] = (acc_v * inv_sw).reshape(ov_ref.shape)
    os_ref[...] = jnp.sqrt(acc_s).reshape(os_ref.shape)


# ---------------------------------------------------------------- driver
def build(variant, hb=24):
    wb = W
    grid = (C, H // hb)
    t_rows = {"bf16": 2 * LO, "int8": 4 * N_TAB * LO}[variant]
    t_dtype = {"bf16": jnp.float32, "int8": jnp.int8}[variant]
    kern = {"bf16": kernel_bf16, "int8": kernel_int8}[variant]

    def im_map(c, i):
        return (0, c, i, 0)

    def tab_map(c, i):
        return (c, 0, 0)

    out_sd = [jax.ShapeDtypeStruct((C, H, W), jnp.float32)] * 2
    return pl.pallas_call(
        partial(kern, hb, wb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, 1, hb, wb), im_map),
            pl.BlockSpec((N, 1, hb, wb), im_map),
            pl.BlockSpec((1, t_rows, 128), tab_map),
            pl.BlockSpec((N, 1), lambda c, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[pl.BlockSpec((1, hb, wb), lambda c, i: (c, i, 0))] * 2,
        out_shape=out_sd,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=INTERPRET,
    )


def main():
    global INTERPRET
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--hb", type=int, default=24)
    args = ap.parse_args()
    INTERPRET = args.interpret
    global N, H, W
    if INTERPRET:
        H, W = 48, 256  # keep the CPU interpreter run small

    rng = np.random.default_rng(0)
    icrf = np.sort(rng.uniform(0, 1, (BITS, C)), axis=0)
    icrf[0], icrf[-1] = 0.0, 1.0
    icrf_diff = np.gradient(icrf, 2 / (BITS - 1), axis=0)

    val = rng.uniform(0.02, 0.98, (N, C, H, W)).astype(np.float32)
    std = rng.uniform(0.001, 0.02, (N, C, H, W)).astype(np.float32)
    exposures = 0.001 * 2.0 ** np.arange(N)
    invt = (1.0 / exposures).astype(np.float32).reshape(N, 1)

    jval, jstd = jnp.asarray(val), jnp.asarray(std)
    jinvt = jnp.asarray(invt)
    tb_f = pack_bf16(icrf, icrf_diff)
    tb_i = pack_int8(icrf, icrf_diff)

    hb = 8 if INTERPRET else args.hb
    f_bf16 = jax.jit(lambda *a: build("bf16", hb)(*a))
    f_int8 = jax.jit(lambda *a: build("int8", hb)(*a))

    v1, s1 = f_bf16(jval, jstd, tb_f, jinvt)
    v2, s2 = f_int8(jval, jstd, tb_i, jinvt)
    # int8 planes reconstruct table entries bit-exactly; bf16 3-part is
    # exact too — outputs must agree to f32 accumulation noise
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=2e-6,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=2e-5,
                               atol=1e-7)
    print("parity ok (bf16 3-part vs int8 4-plane, bit-exact tables)")

    if not INTERPRET:
        dt1 = timeit(f_bf16, jval, jstd, tb_f, jinvt)
        dt2 = timeit(f_int8, jval, jstd, tb_i, jinvt)
        mp = H * W * C / 1e6
        print(f"bf16 3-part: {dt1*1e3:.2f} ms  ({mp/dt1:.0f} MP/s)")
        print(f"int8 4-plane: {dt2*1e3:.2f} ms  ({mp/dt2:.0f} MP/s)")
        print(f"ratio: {dt1/dt2:.2f}x")


if __name__ == "__main__":
    main()
