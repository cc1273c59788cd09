"""Seeded solution parity: the device DE solver vs SciPy's
DifferentialEvolutionSolver on the identical synthetic problem with
identical hyperparameters (reference driver:
ICRF_calibration_exposure.py:288-402).

BASELINE acceptance: the solved ICRF matches the SciPy solution within
tolerance OR strictly beats its final energy on every channel — both
solutions scored under the same float64 NumPy energy (the reference's own
objective), so the comparison is metric-identical.
"""
import warnings

import numpy as np
import jax.numpy as jnp

from camera_linearity_tpu import CameraConfig
from camera_linearity_tpu.models import calibration as cal


def _build_problem(seed=7, n_exp=6, pixels=400, datapoints=256):
    rng = np.random.default_rng(seed)
    gamma = [2.0, 2.2, 2.4]
    exposures = 0.001 * 2.0 ** np.arange(n_exp)
    x = np.linspace(0, 1, datapoints)
    curves = np.stack([x ** g for g in np.linspace(1.6, 3.0, 25)])
    mean_icrf = curves.mean(axis=0)
    _, _, vt = np.linalg.svd(curves - mean_icrf, full_matrices=False)
    pca = vt[:5].T
    stacks = []
    for c in range(3):
        radiance = rng.uniform(0.01, 0.35, pixels)
        linear = radiance[:, None] * (exposures / exposures[-1])[None, :]
        dn = np.around(np.clip(linear, 0, 1) ** (1 / gamma[c])
                       * (datapoints - 1)).astype(np.int32)
        stacks.append(dn)
    return np.stack(stacks), exposures, mean_icrf, pca


def _np_energy(params, stack, exposures, mean_icrf, pca):
    """The reference's float64 objective (_energy_function +
    analyze_linearity, ICRF_calibration_exposure.py:66-201)."""
    curve = mean_icrf + pca @ params
    curve = curve + (1 - curve[-1])
    curve = curve.copy()
    curve[0] = 0
    if curve.max() > 1 or curve.min() < 0 or \
            not np.all(curve[1:] > curve[:-1]):
        return np.inf
    lo, hi = curve[5], curve[250]
    g = curve[stack]
    g = np.where((g < lo) | (g > hi), np.nan, g)
    n = stack.shape[-1]
    ii, jj = np.triu_indices(n, 1)
    r = exposures[ii] / exposures[jj]
    d = np.abs((g[:, ii] - r * g[:, jj]) / (r * g[:, jj]))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        e = np.nanmean(np.nanmean(d, axis=0))
    return np.inf if np.isnan(e) else float(e)


def test_solver_matches_or_beats_scipy_seeded():
    from scipy.optimize._differentialevolution import \
        DifferentialEvolutionSolver

    stacks, exposures, mean_icrf, pca = _build_problem()
    maxiter = 200

    # --- SciPy reference per channel, reference hyperparameters ---------
    scipy_x, scipy_e = [], []
    for c in range(3):
        with DifferentialEvolutionSolver(
                lambda p: _np_energy(p, stacks[c], exposures, mean_icrf,
                                     pca),
                [(-1, 1)] * 5, strategy="currenttobest1bin", tol=0.01,
                x0=[0] * 5, mutation=(0, 1.95), recombination=0.4,
                init="sobol", rng=7) as solver:
            nit = 0
            for _ in solver:
                nit += 1
                if solver.converged() or nit == maxiter:
                    break
            scipy_x.append(np.asarray(solver.x))
            scipy_e.append(_np_energy(np.asarray(solver.x), stacks[c],
                                      exposures, mean_icrf, pca))

    # --- device solver, same problem / budget / hyperparameters ---------
    cfg = CameraConfig(num_of_chs=3, datapoints=256)
    icrf, _, _, _ = cal.calibration(
        -1.0, 1.0,
        channel_stacks=(jnp.asarray(stacks), None, jnp.asarray(exposures)),
        pca_arrays=np.stack([pca] * 3),
        mean_icrf_arrays=np.stack([mean_icrf] * 3),
        config=cfg, popsize=15, maxiter=maxiter, tol=0.01, rng_seed=7,
        refine_maxiter=200)

    # Score the device curves under the same float64 objective by
    # projecting them back onto the PCA basis (exact: curves were built
    # from basis coefficients; endpoint renorm/clip is shared).
    for c in range(3):
        curve_dev = np.asarray(icrf[:, c], float)
        params_dev = pca.T @ (curve_dev - mean_icrf)
        dev_e = _np_energy(params_dev, stacks[c], exposures, mean_icrf,
                           pca)
        curve_scipy = mean_icrf + pca @ scipy_x[c]
        curve_scipy = np.clip(curve_scipy + (1 - curve_scipy[-1]), 0, 1)
        curve_scipy[0] = 0
        curve_close = np.max(np.abs(curve_dev - curve_scipy)) < 5e-3
        beats = dev_e <= scipy_e[c] * (1 + 1e-6)
        assert curve_close or beats, (
            f"channel {c}: device energy {dev_e:.6f} vs scipy "
            f"{scipy_e[c]:.6f}, max curve diff "
            f"{np.max(np.abs(curve_dev - curve_scipy)):.4f}")


def test_sobol_init_bit_exact_with_scipy_and_warning_free():
    """sobol_init_population must reproduce SciPy's init_population_qmc
    point set bit-exactly for an int seed (qmc.Sobol seeded with the
    solver's RandomState) WITHOUT emitting the balance-properties
    UserWarning on non-power-of-two population sizes."""
    from scipy.stats import qmc
    for n, d, seed in [(45, 5, 7), (15, 6, 0), (64, 4, 3)]:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            expected = qmc.Sobol(d=d,
                                 seed=np.random.RandomState(seed)).random(n)
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # any warning -> failure
            got = cal.sobol_init_population(n, d, seed)
        np.testing.assert_array_equal(got, expected)
