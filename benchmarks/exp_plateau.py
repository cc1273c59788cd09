"""Config-2 kernel plateau investigation (VERDICT r2 #3).

The v2 merge kernel sits at ~3.9 ms on config 2 where the pure-traffic
time at nominal v5e HBM bandwidth (~819 GB/s for 387 MB) would be
~0.5 ms, and the measured in-kernel DMA floor is 2.2-2.3 ms.  This
harness separates the candidate explanations with measurements:

* ``xla``     — the same HBM traffic as a fused XLA reduction (no Pallas):
                the achievable device bandwidth ceiling on THIS chip.
* ``dma``     — production-geometry Pallas copy floor, with and without
                ``dimension_semantics`` parallel hints and across row-block
                sizes (fewer/larger grid cells).
* ``kern``    — the shipped kernel across hb and dimension_semantics.
* ``trace``   — jax.profiler device trace of the shipped kernel into
                /tmp/xprof_plateau (inspect with xprof/tensorboard).

Usage: python benchmarks/exp_plateau.py [xla dma kern trace ...]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, H, W, C = 6, 1200, 1920, 3


def timeit(fn, *args, iters=20, trials=3):
    out = fn(*args)
    jax.block_until_ready(out)
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0]))
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        float(sum(jnp.sum(x) for x in leaves if x is not None))
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


GB = (2 * N * H * W * C * 4 + 2 * H * W * C * 4) / 1e9  # read + write


def run_xla(val, std):
    """Traffic-identical fused XLA pass: read both stacks, write two
    (H, W, C) outputs.  What the memory system actually delivers."""
    f = jax.jit(lambda v, s: (jnp.sum(v, axis=0), jnp.sum(s, axis=0)))
    dt = timeit(f, val, std)
    print(f"xla_reduce_floor: {dt*1e3:.2f} ms  -> {GB/dt:.0f} GB/s "
          f"effective")
    # read-only single-stack variant (isolates write traffic share)
    f1 = jax.jit(lambda v: jnp.sum(v, axis=0))
    dt1 = timeit(f1, val)
    gb1 = (N * H * W * C * 4 + H * W * C * 4) / 1e9
    print(f"xla_single_stack: {dt1*1e3:.2f} ms  -> {gb1/dt1:.0f} GB/s")


def planar(val):
    return jnp.transpose(val, (0, 3, 1, 2))  # free relayout (fact 1)


def make_dma(hb, semantics=None):
    def kern(v_ref, s_ref, ov_ref, os_ref):
        ov_ref[...] = jnp.sum(v_ref[...], axis=0)
        os_ref[...] = jnp.sum(s_ref[...], axis=0)

    kw = {}
    params = dict(vmem_limit_bytes=100 * 1024 * 1024)
    if semantics is not None:
        params["dimension_semantics"] = semantics
    kw["compiler_params"] = pltpu.CompilerParams(**params)

    @jax.jit
    def f(vp, sp):
        grid = (C, pl.cdiv(H, hb))
        stack_spec = pl.BlockSpec((N, 1, hb, W),
                                  lambda c_, i: (0, c_, i, 0),
                                  memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, hb, W), lambda c_, i: (c_, i, 0),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[stack_spec, stack_spec],
            out_specs=[out_spec, out_spec],
            out_shape=[jax.ShapeDtypeStruct((C, H, W), jnp.float32)] * 2,
            **kw,
        )(vp, sp)
    return f


def run_dma(val, std):
    vp, sp = planar(val), planar(std)
    for hb in (8, 16, 24, 48, 120, 300, 600):
        if H % hb:
            continue
        for sem in (None, ("parallel", "parallel"),
                    ("arbitrary", "arbitrary")):
            try:
                dt = timeit(make_dma(hb, sem), vp, sp)
            except Exception as e:  # noqa: BLE001
                print(f"dma hb={hb} sem={sem}: FAIL "
                      f"{str(e).splitlines()[0][:90]}")
                continue
            cells = C * (H // hb)
            print(f"dma hb={hb:4d} cells={cells:4d} sem={sem}: "
                  f"{dt*1e3:.2f} ms -> {GB/dt:.0f} GB/s")


def run_kern(val, std, t, icrf, icrf_diff):
    from camera_linearity_tpu.ops.hdr_pallas2 import merge_nhwc_fused
    for hb in (16, 24, 48, 120):
        dt = timeit(lambda v, s: merge_nhwc_fused(
            v, s, t, icrf, icrf_diff, hb=hb), val, std)
        print(f"kern hb={hb:4d}: {dt*1e3:.2f} ms -> "
              f"{H*W/1e6/dt:.0f} MP/s")


def run_trace(val, std, t, icrf, icrf_diff):
    from camera_linearity_tpu.ops.hdr_pallas2 import merge_nhwc_fused
    from camera_linearity_tpu.utils.observability import trace
    out = merge_nhwc_fused(val, std, t, icrf, icrf_diff)
    jax.block_until_ready(out)
    with trace("/tmp/xprof_plateau"):
        for _ in range(10):
            out = merge_nhwc_fused(val, std, t, icrf, icrf_diff)
        jax.block_until_ready(out)
        float(jnp.sum(out[0]))
    print("trace written to /tmp/xprof_plateau")


def main():
    names = sys.argv[1:] or ["xla", "dma", "kern"]
    val, std, t, icrf, icrf_diff = make_data()
    if "xla" in names:
        run_xla(val, std)
    if "dma" in names:
        run_dma(val, std)
    if "kern" in names:
        run_kern(val, std, t, icrf, icrf_diff)
    if "trace" in names:
        run_trace(val, std, t, icrf, icrf_diff)


if __name__ == "__main__":
    main()
