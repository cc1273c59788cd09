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

Tunnel resilience (the round-3 lesson: ONE dead 600s attach probe lost
every metric of the scoring run): the parent process never touches jax.
It spawns a child per attempt; the child makes a bounded attach probe and
runs the still-missing metrics, streaming one JSON line each.  The parent
enforces per-metric deadlines, re-spawns (with backoff) on attach failure
or a mid-metric hang, retries each metric up to CL_BENCH_MAX_ATTEMPTS
within the CL_BENCH_BUDGET wall budget, and always emits whatever subset
succeeded — headline re-printed last.  Metrics run headline-FIRST inside
the child so a flapping tunnel is most likely to lose auxiliary lines,
never the headline.
"""
import json
import os
import subprocess
import sys
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
    import jax
    import jax.numpy as jnp
    from camera_linearity_tpu.ops import hdr
    rng = np.random.default_rng(1)
    n, h, w, c = 5, 512, 512, 1
    val = jnp.asarray(rng.integers(0, 256, (n, h, w, c)), jnp.uint8)
    exposures = jnp.asarray(0.001 * 2.0 ** np.arange(n), jnp.float32)
    icrf, icrf_diff = _icrf(rng, 256, c)
    # the inputs are already device-resident (staged once above), so the
    # single-call number below is NOT paying per-call staging — any gap
    # to the kernel time is pure dispatch latency
    dt = _time(lambda: hdr.merge_hdr(val, None, exposures, icrf, icrf_diff))

    # dispatch-floor attribution: K kernel executions inside ONE jitted
    # fori_loop = one dispatch; per-iteration time is the on-device
    # kernel cost.  The chained carry (a data-dependent no-op added to
    # the input) stops XLA hoisting the loop-invariant merge.
    k_loop = 50

    @jax.jit
    def kernel_train(v0):
        def body(_, acc):
            bump = (acc[0, 0, 0] < -1).astype(v0.dtype)  # always 0
            ov, _ = hdr.merge_hdr(v0 + bump, None, exposures, icrf,
                                  icrf_diff)
            return ov
        return jax.lax.fori_loop(0, k_loop, body,
                                 jnp.zeros((h, w, c), jnp.float32))

    dt_train = _time(lambda: (kernel_train(val),), iters=3)
    kernel_ms = dt_train / k_loop * 1e3
    dispatch_ms = max(0.0, dt * 1e3 - kernel_ms)

    # A single 0.26 MP merge is dispatch-bound (~ms tunnel round-trip);
    # a batch of K such stacks in one call shows the chip's actual
    # capability at this shape (vmap folds the batch into the kernel grid)
    k = 32
    batch = jnp.asarray(rng.uniform(0.01, 0.99, (k, n, h, w, c)),
                        jnp.float32)
    dtb = _time(lambda: hdr.merge_batch(batch, None, exposures, icrf,
                                        icrf_diff))
    # a lone 0.26 MP stack cannot hide the dispatch; the measured
    # kernel/dispatch split next to value_batched lets the single number
    # read correctly: value_kernel_only is what the chip does once the
    # call overhead is amortized or batched away
    print(json.dumps({"metric": "config1_merge_gray_nostd", "unit": "MP/s",
                      "value": round(h * w / 1e6 / dt, 2),
                      "value_kernel_only": round(
                          h * w / 1e6 / (kernel_ms / 1e3), 2),
                      "kernel_ms": round(kernel_ms, 3),
                      "dispatch_ms": round(dispatch_ms, 3),
                      "value_batched": round(k * h * w / 1e6 / dtb, 2),
                      "batched_stacks": k, "dispatch_bound": True}),
          flush=True)


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
                      "unit": "MP/s", "value": round(h * w / 1e6 / dt, 2)}),
          flush=True)


def _scipy_baseline(stacks, exposures, mean_icrf, pca):
    """MEASURED serial-SciPy reference for config 4, cached to /tmp.

    Runs the reference's own solver loop
    (benchmarks/bench_calibration.py scipy_reference_seconds — SciPy
    DifferentialEvolutionSolver, identical hyperparameters and budget,
    ICRF_calibration_exposure.py:357-370) on channel 0 of the IDENTICAL
    problem, once per host: the result is cached in /tmp keyed by a
    digest of the problem arrays, so bench reruns and respawned child
    attempts skip the ~40 s CPU solve.  The artifact is self-contained:
    it carries the measured seconds, the generation count, and the
    measurement timestamp instead of a constant.
    """
    import hashlib
    from pathlib import Path
    from bench_calibration import scipy_reference_seconds
    digest = hashlib.sha256(
        np.ascontiguousarray(stacks[0]).tobytes()
        + np.asarray(exposures, float).tobytes()
        + np.asarray(mean_icrf, float).tobytes()
        + np.asarray(pca, float).tobytes()).hexdigest()[:16]
    cache = Path("/tmp") / f"cl_scipy_baseline_{digest}.json"
    if cache.exists():
        try:
            rec = json.loads(cache.read_text())
            if rec.get("digest") == digest:
                return rec
        except (ValueError, OSError):
            pass
    wall, energy, nit = scipy_reference_seconds(stacks[0], exposures,
                                                mean_icrf, pca)
    rec = {"digest": digest, "scipy_1ch_s": round(wall, 2),
           "scipy_converged_at": nit,
           "scipy_final_energy": round(float(energy), 5),
           "scipy_measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                              time.gmtime())}
    try:
        cache.write_text(json.dumps(rec))
    except OSError:
        pass
    return rec


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
    # serial 3-channel SciPy = 3 x the measured 1-channel wall (the
    # reference solves channels independently; its joblib n_jobs=3 mode
    # divides this by at most 3)
    base = _scipy_baseline(stacks, exposures, mean_icrf, pca)
    scipy_serial_s = 3.0 * base["scipy_1ch_s"]
    speedup = scipy_serial_s / warm
    print(json.dumps({"metric": "config4_calibration_3ch_wall",
                      "unit": "s", "value": round(warm, 3),
                      "scipy_measured_s": round(scipy_serial_s, 2),
                      "scipy_1ch_s": base["scipy_1ch_s"],
                      "scipy_converged_at": base["scipy_converged_at"],
                      "scipy_measured_at": base["scipy_measured_at"],
                      "speedup_vs_scipy": round(speedup, 1),
                      "vs_target_10x": round(speedup / 10.0, 2),
                      "final_energies": [round(float(e), 4) for e in e1]}),
          flush=True)


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
        # the letter-spec capture (1000 frames x 8 scenes x 4K, calibration
        # leg in-region) takes ~33 min and is recorded out-of-band; carry
        # it here so the artifact is self-contained.  Raw log:
        # benchmarks/config5_full_spec_r5.log; analysis: RESULTS.md Round 5.
        out["full_spec_recorded"] = {
            "value_mps": 102.17, "cpu_floor_mps": 109.4,
            "cpu_floor_cv2_mps": 77.2, "decode_busy_frac": 0.99,
            "captured_at": "2026-08-19T14:57Z",
            "log": "benchmarks/config5_full_spec_r5.log"}
    print(json.dumps(out), flush=True)


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
    }), flush=True)


# Child execution order: headline FIRST (grab it while the tunnel is up),
# then the cheap merges, then the long solves.  Canonical ARTIFACT order
# keeps the headline last (the driver parses the final line).
HEADLINE = "hdr_merge_val_std_throughput"
BENCHES = {
    HEADLINE: bench_config2_headline,
    "config1_merge_gray_nostd": bench_config1,
    "config3_merge_12bit_fused_corrections": bench_config3,
    "config4_calibration_3ch_wall": bench_config4,
    "config5_video_to_hdr_e2e": bench_config5,
}
CHILD_ORDER = list(BENCHES)
ARTIFACT_ORDER = [m for m in BENCHES if m != HEADLINE] + [HEADLINE]


def _child_main(metrics):
    """Run inside the spawned child: bounded attach, then each metric.

    Every line this prints is JSON; control events carry ``_event``.  On a
    metric-level exception the error line still uses the metric's name so
    the parent can count the attempt.  Exits via os._exit: a failed attach
    leaves its probe thread stuck in native code, and a clean exit would
    join it and hang.
    """
    fake = os.environ.get("CL_BENCH_FAKE")
    if fake:
        _run_fake(json.loads(fake), metrics)
        os._exit(0)
    timeout_s = float(os.environ.get("CL_BENCH_ATTACH_TIMEOUT", "300"))
    t0 = time.time()
    if not _device_attaches(timeout_s):
        print(json.dumps({"_event": "attach_fail",
                          "timeout_s": timeout_s}), flush=True)
        os._exit(3)
    print(json.dumps({"_event": "attach_ok",
                      "attach_s": round(time.time() - t0, 1)}), flush=True)
    for name in metrics:
        try:
            BENCHES[name]()
        except Exception as e:  # noqa: BLE001 — never lose other metrics
            msg = (str(e).splitlines() or [repr(e)])[0][:200]
            print(json.dumps({"metric": name, "error": msg}), flush=True)
    os._exit(0)


def _device_attaches(timeout_s: float) -> bool:
    """Bounded device-attach probe (see utils.general.device_attach_within;
    duplicated here so the child needs no package import before jax)."""
    import threading
    ok: list = []

    def attach():
        import jax
        platform = os.environ.get("CL_BENCH_PLATFORM")
        if platform:  # debug: run the whole bench on e.g. the CPU backend
            jax.config.update("jax_platforms", platform)
        ok.append(len(jax.devices()) > 0)

    t = threading.Thread(target=attach, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def _run_fake(spec: dict, metrics) -> None:
    """Deterministic child stand-in for orchestration tests (no device).

    ``spec``: {"attach_fail_times": N, "counter": path, "metrics":
    {name: "ok"|"error"|"hang"|"hang_once"|"die"}}.  The counter file
    carries attach/hang attempt counts across child spawns.  "die"
    hard-exits the child mid-metric with NO error line (a native
    segfault/OOM abort stand-in).
    """
    def bump(key) -> int:
        path = spec["counter"] + "." + key
        n = 0
        if os.path.exists(path):
            with open(path) as f:
                n = int(f.read() or 0)
        with open(path, "w") as f:
            f.write(str(n + 1))
        return n + 1

    if bump("attach") <= spec.get("attach_fail_times", 0):
        print(json.dumps({"_event": "attach_fail", "timeout_s": 0}),
              flush=True)
        os._exit(3)
    print(json.dumps({"_event": "attach_ok", "attach_s": 0.0}), flush=True)
    for name in metrics:
        mode = spec.get("metrics", {}).get(name, "ok")
        if mode == "die":
            os._exit(9)
        if mode == "hang" or (mode == "hang_once"
                              and bump("hang_" + name) == 1):
            time.sleep(3600)
        if mode == "error":
            print(json.dumps({"metric": name, "error": "fake failure"}),
                  flush=True)
        else:
            print(json.dumps({"metric": name, "value": 1.0,
                              "unit": "fake"}), flush=True)
    os._exit(0)


def _spawn_child(metrics):
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--run",
         ",".join(metrics)],
        stdout=subprocess.PIPE, stderr=sys.stderr, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)))


def _reader(pipe, q):
    for line in pipe:
        q.put(line)
    q.put(None)


def main():
    budget_s = float(os.environ.get("CL_BENCH_BUDGET", "2700"))
    attach_s = float(os.environ.get("CL_BENCH_ATTACH_TIMEOUT", "300"))
    metric_s = float(os.environ.get("CL_BENCH_METRIC_TIMEOUT", "900"))
    max_attempts = int(os.environ.get("CL_BENCH_MAX_ATTEMPTS", "3"))
    deadline = time.time() + budget_s

    import queue
    import threading
    results: dict = {}
    attempts = {m: 0 for m in CHILD_ORDER}
    attach_failures = 0

    def emit(name, line):
        results[name] = line.rstrip()
        print(results[name], flush=True)  # kill-insurance: stream as final

    while time.time() < deadline:
        pending = [m for m in CHILD_ORDER
                   if m not in results and attempts[m] < max_attempts]
        if not pending:
            break
        child = _spawn_child(pending)
        q: "queue.Queue" = queue.Queue()
        threading.Thread(target=_reader, args=(child.stdout, q),
                         daemon=True).start()
        # first line is the attach event: allow the probe timeout + slack
        line_deadline = time.time() + attach_s + 60
        attached = False
        running = None  # metric currently charged for a hang
        try:
            while True:
                try:
                    line = q.get(timeout=max(
                        1.0, min(line_deadline, deadline) - time.time()))
                except queue.Empty:
                    # hang: attach probe itself wedged, or a metric stalled
                    victim = running if attached else None
                    if victim is not None:
                        attempts[victim] += 1
                        if attempts[victim] >= max_attempts:
                            emit(victim, json.dumps(
                                {"metric": victim, "error":
                                 f"no result within {metric_s:.0f}s x"
                                 f"{max_attempts} attempts (hang)"}))
                    break
                if line is None:  # child exited
                    # a HARD exit mid-metric (segfault/OOM abort in native
                    # code prints no error line) must still charge the
                    # running metric an attempt — otherwise a
                    # reliably-crashing metric respawns in a tight loop
                    # for the whole budget and starves every later metric
                    if attached and running is not None \
                            and running not in results:
                        attempts[running] += 1
                        if attempts[running] >= max_attempts:
                            emit(running, json.dumps(
                                {"metric": running, "error":
                                 "child process died during this metric "
                                 f"x{max_attempts} attempts"}))
                    break
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue  # stray non-JSON noise from libraries
                if rec.get("_event") == "attach_ok":
                    attached = True
                    running = pending[0]
                    line_deadline = time.time() + metric_s
                    continue
                if rec.get("_event") == "attach_fail":
                    break
                name = rec.get("metric")
                if name in BENCHES:
                    if name in results:
                        pass  # already final from an earlier attempt
                    elif "error" in rec:
                        attempts[name] += 1
                        if attempts[name] >= max_attempts:
                            emit(name, line)
                    else:
                        emit(name, line)
                    # the child runs ITS list in order, whatever the
                    # parent's bookkeeping says — track its position
                    i = pending.index(name)
                    running = pending[i + 1] if i + 1 < len(pending) \
                        else None
                    if running is None:
                        break
                    line_deadline = time.time() + metric_s
        finally:
            try:
                child.kill()
            except OSError:
                pass
        if all(m in results for m in CHILD_ORDER):
            break
        if not attached:
            attach_failures += 1
            # the tunnel flaps on minute scales: back off, then retry for
            # as much of the budget as remains
            cap = float(os.environ.get("CL_BENCH_BACKOFF_CAP", "300"))
            wait = min(60.0 * attach_failures, cap,
                       max(0.0, deadline - time.time()))
            if wait <= 0:
                break
            time.sleep(wait)

    err = (f"no result within the {budget_s:.0f}s bench budget "
           f"({attach_failures} attach timeouts — device tunnel down?)")
    for name in ARTIFACT_ORDER:
        if name not in results:
            results[name] = json.dumps({"metric": name, "error": err})
            print(results[name], flush=True)
    # canonical artifact order, headline LAST (the driver parses the final
    # line); earlier streamed lines were kill-insurance duplicates
    for name in ARTIFACT_ORDER:
        print(results[name], flush=True)
    os._exit(0)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        _child_main([m for m in sys.argv[2].split(",") if m in BENCHES])
    else:
        main()
