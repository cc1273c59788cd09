"""Kernel experiments for the config-2 merge (run on the real chip).

Ablation + variant timing harness; not part of the library. Usage:
    python benchmarks/exp_kernel.py [names...]
"""
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
P = H * W
TILE = 8192


def timeit(fn, *args, iters=20, trials=3):
    out = fn(*args)
    jax.block_until_ready(out)
    # host fetch to fully sync the remote transport
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0]))
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        float(sum(jnp.sum(l) for l in leaves if l is not None))
        best = min(best, (time.time() - t0) / iters)
    return best


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    val = jnp.asarray(rng.uniform(0.02, 0.98, (N, H, W, C)), jnp.float32)
    std = jnp.asarray(rng.uniform(0.001, 0.02, (N, H, W, C)), jnp.float32)
    t = jnp.asarray(0.001 * 2.0 ** np.arange(N), jnp.float32)
    icrf = np.sort(rng.uniform(0, 1, (256, C)), axis=0)
    icrf[0], icrf[-1] = 0.0, 1.0
    icrf_diff = np.gradient(icrf, 2 / 255, axis=0)
    return val, std, t, jnp.asarray(icrf, jnp.float32), \
        jnp.asarray(icrf_diff, jnp.float32)


def cfirst(s):
    return s.reshape(N, P, C).transpose(2, 0, 1).reshape(C, N, 1, P)


# --------------------------------------------------------------------------
# Ablation A: pure DMA floor — copy val+std (cfirst layout) to two outputs.
def dma_kernel(val_ref, std_ref, ov_ref, os_ref):
    ov_ref[0, 0] = jnp.sum(val_ref[0, :, 0, :], axis=0)
    os_ref[0, 0] = jnp.sum(std_ref[0, :, 0, :], axis=0)


@jax.jit
def ab_dma(val, std):
    stack_spec = pl.BlockSpec((1, N, 1, TILE), lambda i, ch: (ch, 0, 0, i),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, TILE), lambda i, ch: (ch, 0, i),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        dma_kernel, grid=(pl.cdiv(P, TILE), C),
        in_specs=[stack_spec, stack_spec], out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((C, 1, P), jnp.float32)] * 2,
    )(val, std)


# --------------------------------------------------------------------------
# Ablation B: merge math only (g = x, fp = 1) — no LUT stage.
def math_kernel(val_ref, std_ref, invt_ref, ov_ref, os_ref):
    f32 = jnp.float32
    c = lambda v: jnp.float32(v)  # noqa: E731
    x6 = val_ref[0, :, 0, :].astype(f32)
    s6 = std_ref[0, :, 0, :].astype(f32)
    w6 = jnp.exp(c(-30.0) * (x6 - c(0.5)) ** 2)
    sw = jnp.sum(w6, axis=0, keepdims=True)
    inv_sw = c(1.0) / sw
    invt = invt_ref[0, :, :]
    g6 = x6
    ov_ref[0, 0] = jnp.sum(w6 * g6 * invt, axis=0) * inv_sw[0]
    dw6 = c(-60.0) * (x6 - c(0.5)) * w6
    dg6 = s6
    bracket6 = (dw6 * g6 + w6 * dg6) * inv_sw - (dw6 * w6 * g6) * (
        inv_sw * inv_sw)
    term6 = bracket6 * s6 * invt
    os_ref[0, 0] = jnp.sqrt(jnp.sum(term6 * term6, axis=0))


@jax.jit
def ab_math(val, std, t):
    stack_spec = pl.BlockSpec((1, N, 1, TILE), lambda i, ch: (ch, 0, 0, i),
                              memory_space=pltpu.VMEM)
    invt_spec = pl.BlockSpec((1, N, 1), lambda i, ch: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, TILE), lambda i, ch: (ch, 0, i),
                            memory_space=pltpu.VMEM)
    inv_t = (1.0 / t).reshape(1, N, 1)
    return pl.pallas_call(
        math_kernel, grid=(pl.cdiv(P, TILE), C),
        in_specs=[stack_spec, stack_spec, invt_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((C, 1, P), jnp.float32)] * 2,
    )(val, std, inv_t)


# --------------------------------------------------------------------------
# Ablation C: DMA on the flat (N, L) layout used by the v2 kernel.
def flat_dma_kernel(val_ref, std_ref, ov_ref, os_ref):
    ov_ref[...] = jnp.sum(val_ref[...], axis=0, keepdims=True)
    os_ref[...] = jnp.sum(std_ref[...], axis=0, keepdims=True)


def make_flat_invt(tile, dead=False):
    """Full merge math with a real (N,1) invt input block."""
    def kern(val_ref, std_ref, invt_ref, ov_ref, os_ref):
        f32 = jnp.float32
        c = lambda v_: jnp.float32(v_)  # noqa: E731
        x = val_ref[...]
        if dead:
            idx = jnp.round(x * c(255.0)).astype(jnp.int32)
            idx = jnp.minimum(jnp.maximum(idx, jnp.int32(0)),
                              jnp.int32(255))
            hi = idx >> 4
            pos = (pl.program_id(0) * jnp.int32(tile)
                   + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1))
            hi = hi + (pos % jnp.int32(3)) * jnp.int32(16)
            lo = idx & 15
            del hi, lo
        g = x
        fp = jnp.ones_like(x)
        w = jnp.exp(c(-30.0) * (x - c(0.5)) ** 2)
        inv_sw = c(1.0) / jnp.sum(w, axis=0, keepdims=True)
        invt = invt_ref[...].reshape(x.shape[0], 1)
        ov_ref[...] = (jnp.sum(w * g * invt, axis=0, keepdims=True)
                       * inv_sw).reshape(ov_ref.shape)
        s = std_ref[...].astype(f32)
        dw = c(-60.0) * (x - c(0.5)) * w
        dg = fp * s
        bracket = (dw * g + w * dg) * inv_sw \
            - (dw * w * g) * (inv_sw * inv_sw)
        term = bracket * s * invt
        os_ref[...] = jnp.sqrt(
            jnp.sum(term * term, axis=0, keepdims=True)
        ).reshape(os_ref.shape)

    @jax.jit
    def f(val, std, invt):
        n, length = val.shape
        stack_spec = pl.BlockSpec((n, tile), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
        invt_spec = pl.BlockSpec((n, 1), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern, grid=(pl.cdiv(length, tile),),
            in_specs=[stack_spec, stack_spec, invt_spec],
            out_specs=[out_spec, out_spec],
            out_shape=[jax.ShapeDtypeStruct((1, length), jnp.float32)] * 2,
        )(val, std, invt)
    return f


def make_flat_dma(tile, extra=None, vmem_mb=None):
    def kern(val_ref, std_ref, ov_ref, os_ref):
        if extra == "math":
            f32 = jnp.float32
            c = lambda v_: jnp.float32(v_)  # noqa: E731
            x = val_ref[...]
            g = x
            fp = jnp.ones_like(x)
            w = jnp.exp(c(-30.0) * (x - c(0.5)) ** 2)
            inv_sw = c(1.0) / jnp.sum(w, axis=0, keepdims=True)
            invt = c(1.0)
            ov_ref[...] = (jnp.sum(w * g * invt, axis=0, keepdims=True)
                           * inv_sw).reshape(ov_ref.shape)
            s = std_ref[...].astype(f32)
            dw = c(-60.0) * (x - c(0.5)) * w
            dg = fp * s
            bracket = (dw * g + w * dg) * inv_sw \
                - (dw * w * g) * (inv_sw * inv_sw)
            term = bracket * s * invt
            os_ref[...] = jnp.sqrt(
                jnp.sum(term * term, axis=0, keepdims=True)
            ).reshape(os_ref.shape)
            return
        v = jnp.sum(val_ref[...], axis=0, keepdims=True)
        if extra == "mod":
            pos = (pl.program_id(0) * jnp.int32(tile)
                   + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1))
            v = v + (pos % jnp.int32(3)).astype(jnp.float32)
        elif extra == "round":
            idx = jnp.round(val_ref[...] * jnp.float32(255.0)
                            ).astype(jnp.int32)
            idx = jnp.minimum(jnp.maximum(idx, jnp.int32(0)),
                              jnp.int32(255))
            v = v + jnp.sum(idx, axis=0, keepdims=True).astype(jnp.float32)
        elif extra == "exp":
            x = val_ref[...]
            w = jnp.exp(jnp.float32(-30.0) * (x - jnp.float32(0.5)) ** 2)
            v = v + jnp.sum(w, axis=0, keepdims=True)
        ov_ref[...] = v
        os_ref[...] = jnp.sum(std_ref[...], axis=0, keepdims=True)

    @jax.jit
    def f(val, std):
        n, length = val.shape
        stack_spec = pl.BlockSpec((n, tile), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        kw = {}
        if vmem_mb:
            kw["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb * 1024 * 1024)
        return pl.pallas_call(
            kern, grid=(pl.cdiv(length, tile),),
            in_specs=[stack_spec, stack_spec],
            out_specs=[out_spec, out_spec],
            out_shape=[jax.ShapeDtypeStruct((1, length), jnp.float32)] * 2,
            **kw,
        )(val, std)
    return f


# --------------------------------------------------------------------------
def run(names):
    val, std, t, icrf, icrf_diff = make_data()
    vcf, scf = cfirst(val), cfirst(std)
    res = {}

    if "dma" in names:
        res["ablate_dma"] = timeit(ab_dma, vcf, scf)
    if "math" in names:
        res["ablate_math"] = timeit(ab_math, vcf, scf, t)
    if "relayout" in names:
        f = jax.jit(lambda a, b: (cfirst(a), cfirst(b)))
        res["xla_relayout"] = timeit(f, val, std)
    if "v2" in names:
        from camera_linearity_tpu.ops import hdr
        from camera_linearity_tpu.ops.hdr_pallas2 import merge_nhwc_fused
        ref_v, ref_s = hdr.merge_stack(val, std, t, icrf, icrf_diff)
        for hb in [8, 16, 24]:
            try:
                f = partial(merge_nhwc_fused, compat="corrected", hb=hb)
                v, s = f(val, std, t, icrf, icrf_diff)
                ev = float(jnp.max(jnp.abs(v - ref_v)))
                es = float(jnp.max(jnp.abs(s - ref_s)))
                res[f"v2_nhwc_hb{hb} (err {ev:.1e}/{es:.1e})"] = \
                    timeit(f, val, std, t, icrf, icrf_diff)
            except Exception as e:  # noqa: BLE001
                print(f"v2_nhwc_hb{hb}: FAIL "
                      f"{str(e).splitlines()[0][:100]}")
    if "flatdma" in names:
        L = P * C
        vf = val.reshape(N, L)
        sf = std.reshape(N, L)
        invt = (1.0 / t).reshape(N, 1)
        for dead in [False, True]:
            try:
                res[f"flat_invt_dead{dead}"] = timeit(
                    make_flat_invt(2048, dead), vf, sf, invt)
            except Exception as e:  # noqa: BLE001
                print(f"flat_invt_dead{dead}: FAIL "
                      f"{str(e).splitlines()[0][:100]}")
    if "planar" in names:
        from camera_linearity_tpu.ops.hdr_pallas2 import merge_planar_fused
        vp = jax.jit(lambda s: jnp.transpose(s, (0, 3, 1, 2)))(val)
        sp = jax.jit(lambda s: jnp.transpose(s, (0, 3, 1, 2)))(std)
        jax.block_until_ready((vp, sp))
        for hb in [8, 16]:
            try:
                f = partial(merge_planar_fused, compat="corrected", hb=hb)
                res[f"planar_hb{hb}"] = timeit(f, vp, sp, t, icrf,
                                               icrf_diff)
            except Exception as e:  # noqa: BLE001
                print(f"planar_hb{hb}: FAIL {str(e).splitlines()[0][:100]}")
        # NHWC in, planar out (skip the output back-transpose)
        from camera_linearity_tpu.ops.hdr_pallas2 import merge_nhwc_fused

        @partial(jax.jit, static_argnames=())
        def nhwc_in_planar_out(v, s, t_, a, b):
            pv = jnp.transpose(v, (0, 3, 1, 2))
            ps = jnp.transpose(s, (0, 3, 1, 2))
            return merge_planar_fused(pv, ps, t_, a, b)
        res["nhwc_in_planar_out"] = timeit(nhwc_in_planar_out, val, std, t,
                                           icrf, icrf_diff)
        from camera_linearity_tpu.ops import hdr
        from camera_linearity_tpu.ops.hdr_pallas2 import merge_nhwc_fused
        ref_v, ref_s = hdr.merge_stack(val, std, t, icrf, icrf_diff)
        for hbv in [8, 16, 32]:
            f = partial(merge_nhwc_fused, compat="corrected", hb=hbv)
            v, s = f(val, std, t, icrf, icrf_diff)
            ev = float(jnp.max(jnp.abs(v - ref_v)))
            es = float(jnp.max(jnp.abs(s - ref_s)))
            res[f"final_nhwc_hb{hbv} (err {ev:.1e}/{es:.1e})"] = timeit(
                f, val, std, t, icrf, icrf_diff)
        # uint8 value stack (the reference's native 8-bit load path)
        rng = np.random.default_rng(1)
        dn = rng.integers(0, 256, (N, H, W, C)).astype(np.uint8)
        val_u8 = jnp.asarray(dn)
        ref_u8v, ref_u8s = hdr.merge_stack_u8(val_u8, std, t, icrf,
                                              icrf_diff)
        f = partial(merge_nhwc_fused, compat="corrected", hb=16)
        v, s = f(val_u8, std, t, icrf, icrf_diff)
        ev = float(jnp.max(jnp.abs(v - ref_u8v)))
        res[f"final_nhwc_u8 (err {ev:.1e})"] = timeit(
            f, val_u8, std, t, icrf, icrf_diff)
        # no-std variant
        fv = partial(merge_nhwc_fused, compat="corrected", hb=16)
        v, s = fv(val, None, t, icrf, icrf_diff)
        assert s is None
        res["final_nhwc_nostd"] = timeit(fv, val, None, t, icrf, icrf_diff)
    if "v2dbg" in names:
        from camera_linearity_tpu.ops.hdr_pallas2 import merge_nhwc_fused
        for dbg in ["nolut", "ohonly", "nostage2", "full"]:
            for tile, ec in [(2048, 8)]:
                try:
                    f = partial(merge_nhwc_fused, compat="corrected",
                                tile=tile, exp_chunk=ec, debug=dbg)
                    res[f"v2dbg_{dbg}_t{tile}_e{ec}"] = timeit(
                        f, val, std, t, icrf, icrf_diff)
                except Exception as e:  # noqa: BLE001
                    print(f"v2dbg_{dbg}: FAIL "
                          f"{str(e).splitlines()[0][:100]}")
    if "v2cf" in names:
        from camera_linearity_tpu.ops import hdr
        from camera_linearity_tpu.ops.hdr_pallas2 import merge_cfirst_v2
        ref_v, _ = hdr.merge_stack(val, std, t, icrf, icrf_diff)
        ref_cf = ref_v.reshape(P, C).T
        for tile, ec in [(2048, 8), (8192, 2)]:
            f = partial(merge_cfirst_v2, compat="corrected", tile=tile,
                        exp_chunk=ec)
            vcf3 = vcf.reshape(C, N, P)
            scf3 = scf.reshape(C, N, P)
            v, s = f(vcf3, scf3, t, icrf, icrf_diff)
            ev = float(jnp.max(jnp.abs(v - ref_cf)))
            res[f"v2_cf_t{tile}_e{ec} (err {ev:.1e})"] = timeit(
                f, vcf3, scf3, t, icrf, icrf_diff)

    for k, v in res.items():
        print(f"{k:>16}: {v*1e3:8.2f} ms   {P/1e6/v:7.1f} MP/s")


if __name__ == "__main__":
    run(sys.argv[1:] or ["base", "dma", "math", "relayout"])
