"""Driver benchmark: one JSON line per BASELINE config, headline LAST.

The headline (final line, what the driver parses) is BASELINE config 2 —
HDR merge throughput (val+std) on RGB 6-exposure 1920x1200x3 logical NHWC
stacks; target 500 MP/s per v5e chip, ``vs_baseline`` = measured/target.

Other lines: config 1 (grayscale 5-frame 512^2, no uncertainty), config 3
(12-bit stacks with dark/bad-pixel/flat corrections fused around the
merge), config 4 (3-channel population-batched DE calibration wall-clock;
vs_baseline = speedup over the measured SciPy serial reference divided by
the 10x target), config 5 (video->HDR: see benchmarks/bench_video.py for
the full-size decode-overlapped run recorded in benchmarks/RESULTS.md).
"""
import json
import os
import time

import numpy as np

# Persistent compilation cache: Mosaic/XLA compiles of the large merge and
# calibration programs cost minutes of single-core LLVM time per fresh
# process; a disk cache turns every rerun (and the driver's scoring run,
# when a prior warm run populated it) into a cache hit.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _sync(*arrays):
    import jax.numpy as jnp
    return float(sum(jnp.sum(a) for a in arrays if a is not None))


def _time(fn, iters=20, trials=3):
    out = fn()
    _sync(*[x for x in out if x is not None])
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(iters):
            out = fn()
        _sync(*[x for x in out if x is not None])
        best = min(best, (time.time() - t0) / iters)
    return best


def _icrf(rng, bits, c):
    import jax.numpy as jnp
    icrf = np.sort(rng.uniform(0, 1, (bits, c)), axis=0)
    icrf[0], icrf[-1] = 0.0, 1.0
    icrf_diff = np.gradient(icrf, 2 / (bits - 1), axis=0)
    return jnp.asarray(icrf, jnp.float32), jnp.asarray(icrf_diff,
                                                       jnp.float32)


def bench_config1():
    import jax.numpy as jnp
    from camera_linearity_tpu.ops import hdr
    rng = np.random.default_rng(1)
    n, h, w, c = 5, 512, 512, 1
    val = jnp.asarray(rng.integers(0, 256, (n, h, w, c)), jnp.uint8)
    exposures = jnp.asarray(0.001 * 2.0 ** np.arange(n), jnp.float32)
    icrf, icrf_diff = _icrf(rng, 256, c)
    dt = _time(lambda: hdr.merge_hdr(val, None, exposures, icrf, icrf_diff))
    # A single 0.26 MP merge is dispatch-bound (~8 ms tunnel round-trip);
    # a batch of K such stacks in one call shows the chip's actual
    # capability at this shape (vmap folds the batch into the kernel grid)
    k = 32
    batch = jnp.asarray(rng.uniform(0.01, 0.99, (k, n, h, w, c)),
                        jnp.float32)
    dtb = _time(lambda: hdr.merge_batch(batch, None, exposures, icrf,
                                        icrf_diff))
    print(json.dumps({"metric": "config1_merge_gray_nostd", "unit": "MP/s",
                      "value": round(h * w / 1e6 / dt, 2),
                      "value_batched": round(k * h * w / 1e6 / dtb, 2),
                      "batched_stacks": k}))


def bench_config3():
    import jax.numpy as jnp
    from camera_linearity_tpu.ops import hdr
    rng = np.random.default_rng(3)
    n, h, w, c = 6, 1200, 1920, 3
    bits = 4096
    val = jnp.asarray(rng.uniform(0.02, 0.98, (n, h, w, c)), jnp.float32)
    std = jnp.asarray(rng.uniform(0.001, 0.02, (n, h, w, c)), jnp.float32)
    dark = jnp.asarray((rng.uniform(0, 1, (n, h, w, c)) > 0.999)
                       .astype(np.float32))
    flat_v = jnp.asarray(rng.uniform(0.7, 1.0, (h, w, c)), jnp.float32)
    flat_s = jnp.asarray(rng.uniform(0.001, 0.01, (h, w, c)), jnp.float32)
    exposures = jnp.asarray(0.001 * 2.0 ** np.arange(n), jnp.float32)
    # reference-faithful 12-bit tables: np.interp expansions of 256 solved
    # datapoints (reference ICRF_calibration_exposure.py:204-216,398-402);
    # the solved base curves route the merge through the lerp kernel
    base = np.sort(rng.uniform(0, 1, (256, c)), axis=0)
    base[0], base[-1] = 0.0, 1.0
    diff_base = np.gradient(base, 2 / 255, axis=0)
    x, xb = np.arange(bits) / (bits - 1), np.arange(256) / 255.0
    icrf = jnp.asarray(np.stack(
        [np.interp(x, xb, base[:, ch]) for ch in range(c)], 1), jnp.float32)
    icrf_diff = jnp.asarray(np.stack(
        [np.interp(x, xb, diff_base[:, ch]) for ch in range(c)], 1),
        jnp.float32)
    base_j = jnp.asarray(base, jnp.float32)
    diff_base_j = jnp.asarray(diff_base, jnp.float32)
    thr = jnp.asarray(0.5, jnp.float32)
    dt = _time(lambda: hdr.merge_corrected(
        val, std, dark, exposures, icrf, icrf_diff, thr, flat_v, flat_s,
        mid_percentage=0.05, kernel_size=3, icrf_base=base_j,
        icrf_diff_base=diff_base_j))
    print(json.dumps({"metric": "config3_merge_12bit_fused_corrections",
                      "unit": "MP/s", "value": round(h * w / 1e6 / dt, 2)}))


def bench_config4():
    import jax.numpy as jnp
    from camera_linearity_tpu import CameraConfig
    from camera_linearity_tpu.models import calibration as cal
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent / "benchmarks"))
    from bench_calibration import build_problem

    stacks, exposures, mean_icrf, pca = build_problem()
    cfg = CameraConfig(num_of_chs=3, datapoints=256)

    def solve():
        return cal.calibration(
            -1.0, 1.0,
            channel_stacks=(jnp.asarray(stacks), None,
                            jnp.asarray(exposures)),
            pca_arrays=np.stack([pca] * 3),
            mean_icrf_arrays=np.stack([mean_icrf] * 3),
            config=cfg, popsize=15, maxiter=1000, tol=0.01, rng_seed=7)

    solve()  # compile
    t0 = time.time()
    _, _, e1, _ = solve()
    warm = time.time() - t0
    # SciPy serial 3-channel reference on this exact problem, measured on
    # this host (benchmarks/bench_calibration.py; RESULTS.md): 34-45 s per
    # channel at identical hyperparameters -> 110 s serial is conservative.
    scipy_serial_s = 110.0
    speedup = scipy_serial_s / warm
    print(json.dumps({"metric": "config4_calibration_3ch_wall",
                      "unit": "s", "value": round(warm, 3),
                      "speedup_vs_scipy": round(speedup, 1),
                      "vs_target_10x": round(speedup / 10.0, 2),
                      "final_energies": [round(float(e), 4) for e in e1]}))


def bench_config5():
    import os
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent / "benchmarks"))
    import bench_video
    if os.environ.get("CL_BENCH_FULL"):
        out = bench_video.run(1000, 8, 2160, 3840)
    else:
        # scaled: same 4K frame geometry and full decode->stats->merge
        # stream, fewer frames/scenes (full-size numbers: RESULTS.md)
        out = bench_video.run(100, 2, 2160, 3840)
    print(json.dumps(out))


def bench_config2_headline():
    import jax.numpy as jnp
    from camera_linearity_tpu.ops import hdr
    rng = np.random.default_rng(0)
    n, h, w, c = 6, 1200, 1920, 3
    stack_val = jnp.asarray(rng.uniform(0.02, 0.98, (n, h, w, c)),
                            jnp.float32)
    stack_std = jnp.asarray(rng.uniform(0.001, 0.02, (n, h, w, c)),
                            jnp.float32)
    exposures = jnp.asarray(0.001 * 2.0 ** np.arange(n), jnp.float32)
    icrf, icrf_diff = _icrf(rng, 256, c)
    dt = _time(lambda: hdr.merge_hdr(stack_val, stack_std, exposures, icrf,
                                     icrf_diff))
    mps = h * w / 1e6 / dt
    print(json.dumps({
        "metric": "hdr_merge_val_std_throughput",
        "value": round(mps, 2),
        "unit": "MP/s",
        "vs_baseline": round(mps / 500.0, 4),
    }))


def _device_attaches(timeout_s: float) -> bool:
    """Bounded device-attach probe.

    A dead device tunnel makes the first jax call block FOREVER (observed:
    the relay process died mid-round and `jax.devices()` hung past a
    10-minute timeout).  Attaching on a daemon thread bounds the wait so a
    scoring run emits a structured diagnostic instead of hanging until an
    external kill loses the whole artifact."""
    import threading
    ok: list = []

    def attach():
        import jax
        ok.append(len(jax.devices()) > 0)

    t = threading.Thread(target=attach, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def main():
    timeout_s = float(os.environ.get("CL_BENCH_ATTACH_TIMEOUT", "600"))
    if not _device_attaches(timeout_s):
        err = (f"device attach did not complete within {timeout_s:.0f}s "
               "(device tunnel down?)")
        for name in ("config1_merge_gray_nostd",
                     "config3_merge_12bit_fused_corrections",
                     "config4_calibration_3ch_wall",
                     "config5_video_to_hdr_e2e"):
            print(json.dumps({"metric": name, "error": err}))
        print(json.dumps({"metric": "hdr_merge_val_std_throughput",
                          "error": err}), flush=True)
        # the attach thread is stuck in native code; a normal interpreter
        # exit would join it and hang anyway
        os._exit(0)
    for bench in (bench_config1, bench_config3, bench_config4,
                  bench_config5):
        try:
            bench()
        except Exception as e:  # noqa: BLE001 — never lose the headline
            print(json.dumps({"metric": bench.__name__, "error":
                              str(e).splitlines()[0][:200]}))
    bench_config2_headline()


if __name__ == "__main__":
    main()
