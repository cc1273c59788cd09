"""HDR-merge benchmarks across the BASELINE.json config family.

Prints one JSON line per configuration.  ``bench.py`` at the repo root is
the driver's single-line headline (config 2); this script is the full
sweep: config 1 (grayscale 5-frame 512^2, no uncertainty), config 2 (RGB
6-exposure 1920x1200 with std), the channel-first kernel fast path, and a
batch-of-scenes shape (config 5's merge stage).
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def _sync(*arrays):
    import jax.numpy as jnp
    return float(sum(jnp.sum(a) for a in arrays if a is not None))


def bench(fn, args, iters=20, trials=3):
    out = fn(*args)
    _sync(*(out if isinstance(out, tuple) else (out,)))
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        _sync(*(out if isinstance(out, tuple) else (out,)))
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    import jax.numpy as jnp
    from camera_linearity_tpu.ops import hdr
    from camera_linearity_tpu.ops.hdr_pallas2 import merge_nhwc_fused

    rng = np.random.default_rng(0)
    results = []

    def tables(c):
        icrf = np.sort(rng.uniform(0, 1, (256, c)), axis=0)
        icrf[0], icrf[-1] = 0.0, 1.0
        icrf_diff = np.gradient(icrf, 2 / 255, axis=0)
        return (jnp.asarray(icrf, jnp.float32),
                jnp.asarray(icrf_diff, jnp.float32))

    # config 1: grayscale 5-frame 512x512, no uncertainty
    n, h, w, c = 5, 512, 512, 1
    icrf, icrf_diff = tables(c)
    sv = jnp.asarray(rng.uniform(0, 1, (n, h, w, c)), jnp.float32)
    ex = jnp.asarray(0.001 * 2.0 ** np.arange(n), jnp.float32)
    t = bench(lambda *a: hdr.merge_hdr(*a),
              (sv, None, ex, icrf, icrf_diff))
    results.append({"config": "1_gray_512_novar",
                    "value": round(h * w / 1e6 / t, 1), "unit": "MP/s"})

    # config 2: RGB 6-exposure 1920x1200 with uncertainty (headline)
    n, h, w, c = 6, 1200, 1920, 3
    icrf, icrf_diff = tables(c)
    sv = jnp.asarray(rng.uniform(0.02, 0.98, (n, h, w, c)), jnp.float32)
    ss = jnp.asarray(rng.uniform(0.001, 0.02, (n, h, w, c)), jnp.float32)
    ex = jnp.asarray(0.001 * 2.0 ** np.arange(n), jnp.float32)
    t = bench(lambda *a: hdr.merge_hdr(*a), (sv, ss, ex, icrf, icrf_diff))
    results.append({"config": "2_rgb_1920x1200_std",
                    "value": round(h * w / 1e6 / t, 1), "unit": "MP/s"})

    # v2 planar kernel directly (same data as config 2) — no dispatch
    p = h * w
    t = bench(lambda *a: merge_nhwc_fused(*a, compat="corrected"),
              (sv, ss, ex, icrf, icrf_diff))
    results.append({"config": "2_v2_kernel_direct",
                    "value": round(p / 1e6 / t, 1), "unit": "MP/s"})

    # config 5 merge stage: batch of 4 scenes at 1920x1200 — vmap folds
    # the batch into an extra kernel grid axis (one launch).
    b = 4
    bv = jnp.stack([sv] * b)
    bs = jnp.stack([ss] * b)
    t = bench(lambda *a: hdr.merge_batch(*a), (bv, bs, ex, icrf, icrf_diff))
    results.append({"config": "5_batch4_scenes_vmap",
                    "value": round(b * p / 1e6 / t, 1), "unit": "MP/s"})

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
