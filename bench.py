"""Headline benchmark: HDR merge (val+std) throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The shape is BASELINE config 2 (RGB 6-exposure 1920x1200x3 with
uncertainty); the target (BASELINE.md) is 500 MP/s per chip on v5e, and
vs_baseline reports the ratio against that target.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from camera_linearity_tpu.ops import hdr

    rng = np.random.default_rng(0)
    n, h, w, c = 6, 1200, 1920, 3
    stack_val = jnp.asarray(rng.uniform(0.02, 0.98, (n, h, w, c)),
                            jnp.float32)
    stack_std = jnp.asarray(rng.uniform(0.001, 0.02, (n, h, w, c)),
                            jnp.float32)
    exposures = jnp.asarray(0.001 * 2.0 ** np.arange(n), jnp.float32)
    icrf = np.sort(rng.uniform(0, 1, (256, c)), axis=0)
    icrf[0], icrf[-1] = 0.0, 1.0
    icrf_diff = np.gradient(icrf, 2 / 255, axis=0)
    icrf_j = jnp.asarray(icrf, jnp.float32)
    icrf_diff_j = jnp.asarray(icrf_diff, jnp.float32)

    def run_once():
        return hdr.merge_hdr(stack_val, stack_std, exposures, icrf_j,
                             icrf_diff_j)

    # warmup / compile
    out = run_once()
    jax.block_until_ready(out[0])
    float(jnp.sum(out[0]))

    best = float("inf")
    for _trial in range(3):
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            out = run_once()
        # host fetch = hard synchronization on remote transports
        float(jnp.sum(out[0]) + jnp.sum(out[1]))
        per_iter = (time.time() - t0) / iters
        best = min(best, per_iter)

    mps = h * w / 1e6 / best
    print(json.dumps({
        "metric": "hdr_merge_val_std_throughput",
        "value": round(mps, 2),
        "unit": "MP/s",
        "vs_baseline": round(mps / 500.0, 4),
    }))


if __name__ == "__main__":
    main()
