"""Strict SciPy-trajectory parity mode for the ICRF solve.

The fast device solver (models/calibration.py) runs deferred-updating DE
on the TPU and matches-or-beats SciPy's final energies, but it does not
reproduce SciPy's *trajectory*: SciPy's ``updating='immediate'`` mode
accepts each trial into the population before the next candidate mutates,
and every candidate consumes host RNG draws in a strict serial order.

This module is the letter-of-BASELINE mode: an independent host float64
re-implementation of the exact solve the reference performs, down to the
RNG stream, so a seeded strict solve reproduces the reference's population
trajectory bit-for-bit and its final curve to well under 1e-6.  It
replicates:

* SciPy's ``DifferentialEvolutionSolver`` semantics for
  ``strategy='currenttobest1bin'``, ``updating='immediate'``,
  ``init='sobol'`` with dithered mutation — including the Sobol' engine
  being seeded with (and consuming draws from) the *same* ``RandomState``
  that later drives mutation, the population rounding up to the next
  power of two under ``init='sobol'``, the per-candidate draw order
  (fill-point, then sample shuffle, then crossover uniforms, then
  out-of-bounds resampling), ``<=`` acceptance, and best-member swap
  promotion.  Validated bit-exactly against ``scipy.optimize`` in
  tests/unit/test_scipy_strict.py.
* the reference's stepping loop, which advances the solver TWICE per
  counted iteration (``for step in solver:`` plus an explicit
  ``next(solver)``, reference ICRF_calibration_exposure.py:364-370), its
  per-channel seeds ``rng_seed + c`` (:381), and its stop rule
  (converged / iteration cap / energy below limit, :369).
* the reference's float64 objective ``_energy_function`` +
  ``analyze_linearity`` (ICRF_calibration_exposure.py:66-201), including
  the (X, Y, N, N) broadcast reduction order, the NaN-threshold masking
  against the *mapped* limits, and the 1/std ``nanaverage`` weighting.

Use the fast device mode for production; use this when an audit demands
the reference's exact numbers.
"""
from __future__ import annotations

import warnings
from typing import Callable, Optional, Sequence, Tuple

import numpy as np

from ..config import CameraConfig, DEFAULT_CONFIG

__all__ = ["StrictDESolver", "reference_energy", "calibration_strict",
           "calibration_hybrid"]


def _as_random_state(seed) -> np.random.RandomState:
    """SciPy's ``check_random_state`` for the cases the solver uses."""
    if seed is None:
        return np.random.mtrand._rand
    if isinstance(seed, (int, np.integer)):
        return np.random.RandomState(seed)
    if isinstance(seed, np.random.RandomState):
        return seed
    raise ValueError(f"cannot seed a RandomState from {seed!r}")


class StrictDESolver:
    """Bit-exact re-implementation of SciPy's DE solver for the subset the
    reference exercises: ``currenttobest1bin``, binomial crossover,
    ``updating='immediate'``, ``init='sobol'``, dithered mutation, no
    constraints, no integrality, scalar (non-vectorized) objective.

    Parameters mirror ``scipy.optimize.DifferentialEvolutionSolver``
    (reference call site: ICRF_calibration_exposure.py:357-362).
    """

    def __init__(self, func: Callable[[np.ndarray], float],
                 bounds: Sequence[Tuple[float, float]],
                 x0: Optional[Sequence[float]] = None,
                 popsize: int = 15,
                 mutation: Tuple[float, float] = (0.0, 1.95),
                 recombination: float = 0.4,
                 tol: float = 0.01, atol: float = 0.0,
                 seed=None):
        from scipy.stats import qmc

        self.func = func
        self.tol, self.atol = tol, atol
        self.cross_over_probability = recombination
        self.dither = [min(mutation), max(mutation)]
        self.scale = None

        limits = np.array(bounds, dtype=float).T      # (2, D)
        # SciPy's scale formula, kept verbatim for bit parity:
        # scaled = 0.5 (lb + ub) + (t - 0.5) |lb - ub|
        self._scale_arg1 = 0.5 * (limits[0] + limits[1])
        self._scale_arg2 = np.fabs(limits[0] - limits[1])
        with np.errstate(divide="ignore"):
            recip = 1.0 / self._scale_arg2
            recip[~np.isfinite(recip)] = 0.0
        self._recip_scale_arg2 = recip
        self.parameter_count = limits.shape[1]

        self.random_number_generator = _as_random_state(seed)

        n = max(5, popsize * self.parameter_count)
        # init='sobol' rounds the population up to the next power of two
        n = int(2 ** np.ceil(np.log2(n)))
        self.num_population_members = n
        # The Sobol' engine is seeded with the SAME RandomState the solver
        # mutates with — its scrambling consumes draws from it, which
        # offsets every later draw; seeding a copy would desynchronize.
        sampler = qmc.Sobol(d=self.parameter_count,
                            seed=self.random_number_generator)
        self.population = sampler.random(n=self.num_population_members)
        self.population_energies = np.full(n, np.inf)
        self._nfev = 0

        if x0 is not None:
            x0_scaled = self._unscale_parameters(np.asarray(x0, float))
            if ((x0_scaled > 1.0) | (x0_scaled < 0.0)).any():
                raise ValueError(
                    "Some entries in x0 lay outside the specified bounds")
            self.population[0] = x0_scaled

        self._random_population_index = np.arange(n)

    # -- parameter space <-> unit cube ---------------------------------
    def _scale_parameters(self, trial: np.ndarray) -> np.ndarray:
        return self._scale_arg1 + (trial - 0.5) * self._scale_arg2

    def _unscale_parameters(self, parameters: np.ndarray) -> np.ndarray:
        return (parameters - self._scale_arg1) * self._recip_scale_arg2 + 0.5

    @property
    def x(self) -> np.ndarray:
        return self._scale_parameters(self.population[0])

    def converged(self) -> bool:
        if np.any(np.isinf(self.population_energies)):
            return False
        return bool(np.std(self.population_energies) <=
                    self.atol +
                    self.tol * np.abs(np.mean(self.population_energies)))

    # -- internals, draw-for-draw with SciPy ----------------------------
    def _calculate_population_energies(self) -> None:
        params = self._scale_parameters(self.population)
        self.population_energies = np.array(
            [float(np.squeeze(self.func(p))) for p in params])
        self._nfev += self.num_population_members

    def _promote_lowest_energy(self) -> None:
        best = int(np.argmin(self.population_energies))
        e = self.population_energies
        e[[0, best]] = e[[best, 0]]
        self.population[[0, best], :] = self.population[[best, 0], :]

    def _select_samples(self, candidate: int) -> np.ndarray:
        # persistent index array, shuffled in place (SciPy keeps the
        # shuffle state across calls)
        self.random_number_generator.shuffle(self._random_population_index)
        idxs = self._random_population_index[:6]
        return idxs[idxs != candidate][:5]

    def _mutate(self, candidate: int) -> np.ndarray:
        rng = self.random_number_generator
        # draw order matters: fill point BEFORE the sample shuffle
        fill_point = rng.randint(self.parameter_count, dtype=np.int64)
        samples = self._select_samples(candidate)
        r0, r1 = samples[0], samples[1]
        pop = self.population
        bprime = (pop[candidate] + self.scale *
                  (pop[0] - pop[candidate] + pop[r0] - pop[r1]))
        crossovers = rng.uniform(size=self.parameter_count) \
            < self.cross_over_probability
        crossovers[fill_point] = True
        return np.where(crossovers, bprime, pop[candidate])

    def _ensure_constraint(self, trial: np.ndarray) -> None:
        mask = (trial > 1) | (trial < 0)
        oob = int(np.count_nonzero(mask))
        if oob:
            trial[mask] = self.random_number_generator.uniform(size=oob)

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[np.ndarray, float]:
        """One generation: SciPy's ``updating='immediate'`` branch."""
        if np.all(np.isinf(self.population_energies)):
            self._calculate_population_energies()
            self._promote_lowest_energy()

        self.scale = self.random_number_generator.uniform(self.dither[0],
                                                          self.dither[1])
        for candidate in range(self.num_population_members):
            trial = self._mutate(candidate)
            self._ensure_constraint(trial)
            energy = float(np.squeeze(
                self.func(self._scale_parameters(trial))))
            self._nfev += 1
            if energy <= self.population_energies[candidate]:
                self.population[candidate] = trial
                self.population_energies[candidate] = energy
                if energy <= self.population_energies[0]:
                    self._promote_lowest_energy()
        return self.x, float(self.population_energies[0])


# ---------------------------------------------------------------------------
# The reference's float64 objective, verbatim semantics
# ---------------------------------------------------------------------------

def _nanaverage(values, weights, axis):
    """reference general_functions.py:149-176."""
    valid = ~np.isnan(values) & ~np.isnan(weights)
    weighted_sum = np.nansum(values * weights * valid, axis=axis)
    valid_weights_sum = np.nansum(valid * weights, axis=axis)
    with np.errstate(invalid="ignore", divide="ignore"):
        result = weighted_sum / valid_weights_sum
    result[valid_weights_sum == 0] = np.nan
    return result


def _analyze_linearity(g, g_std, lower, upper, exposures):
    """reference analyze_linearity (ICRF_calibration_exposure.py:66-145),
    relative mode, float64, preserving the (X, Y, N, N) broadcast and its
    reduction order."""
    n = g.shape[2]
    pair_indices = np.triu_indices(n, k=1)
    mask = (g < lower) | (g > upper)
    gm = np.where(mask, np.nan, g)

    ratios = exposures[:, None] / exposures[None, :]
    ratios[np.tril_indices(n, k=0)] = np.nan
    ratio_stack = ratios[None, None]

    gi = gm[..., :, None]
    gj = gm[..., None, :]
    scaled = gj * ratio_stack
    with np.errstate(invalid="ignore", divide="ignore"):
        lm = (gi - scaled) / scaled
    diffs = np.abs(lm)

    if g_std is not None:
        si = g_std[..., :, None]
        sj = g_std[..., None, :]
        with np.errstate(invalid="ignore", divide="ignore"):
            lm_std = np.sqrt((si / scaled) ** 2 +
                             ((gi * sj) / (ratio_stack * gj ** 2)) ** 2)
            weights = np.where(np.isfinite(diffs) & (lm_std != 0),
                               1 / lm_std, np.nan)
        results = _nanaverage(diffs, weights, axis=(0, 1))
    else:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            results = np.nanmean(diffs, axis=(0, 1))
    return results[pair_indices]


def reference_energy(params, mean_icrf, pca, value_stack, std_stack,
                     lower: int, upper: int, use_mean: bool,
                     exposures, datapoints: int) -> float:
    """The reference's ``_energy_function``
    (ICRF_calibration_exposure.py:148-201): endpoint pinning, monotone /
    in-[0,1] rejection with inf, LUT application of the candidate curve to
    the integer DN stack, relative all-pairs linearity, nanmean energy.

    ``value_stack`` is (X, Y, N) integer DNs (any leading shape with the
    exposure axis last also works, e.g. the repo's flattened (P, N) form
    reshaped to (P, 1, N)).  The no-mean-curve mode uses ``datapoints``
    for the gamma base curve (the reference uses gs.BITS there,
    :37 — crashes unless BITS == DATAPOINTS; fixed, not ported).
    """
    params = np.asarray(params, float)
    if use_mean:
        curve = mean_icrf + pca @ params
    else:
        curve = np.linspace(0, 1, datapoints) ** params[0] \
            + pca @ params[1:]
    curve = curve + (1 - curve[-1])
    curve = curve.copy()
    curve[0] = 0.0

    std_curve = None
    if std_stack is not None:
        dx = 2 / (datapoints - 1)
        std_curve = np.gradient(curve, dx)

    if curve.max() > 1 or curve.min() < 0:
        return np.inf
    if not np.all(curve[1:] > curve[:-1]):
        return np.inf

    mapped_lower = curve[lower]
    mapped_upper = curve[upper]
    g = curve[value_stack]
    g_std = None
    if std_stack is not None:
        g_std = std_curve[value_stack] * std_stack
    results = _analyze_linearity(g, g_std, mapped_lower, mapped_upper,
                                 np.asarray(exposures, float))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        energy = np.nanmean(results)
    return np.inf if np.isnan(energy) else float(energy)


# ---------------------------------------------------------------------------
# strict calibration driver
# ---------------------------------------------------------------------------

def _solve_channel_strict(stack_c, std_c, mean_c, pca_c, bounds, x0,
                          lower_dn, upper_dn, use_mean, exposures,
                          datapoints, popsize, mutation, recombination,
                          tol, seed, maxiter, energy_limit,
                          stall_limit: Optional[int] = None):
    """One channel of the reference solve loop
    (ICRF_calibration_exposure.py:342-376), shared by
    :func:`calibration_strict` (cold ``x0``) and
    :func:`calibration_hybrid` (device-seeded ``x0``) so the two stay in
    lockstep.  2-D (P, N) stacks are reshaped to (P, 1, N) to keep the
    reference's (X, Y, N, N) reduction order.  Each counted iteration
    advances TWO generations (the reference's double-step, :364-366).

    ``stall_limit`` (opt-in; hybrid audits use it) additionally stops
    when the best energy has not improved for that many counted
    iterations — DE never discards its best member, so stopping on a
    stall cannot return anything worse than the current best.  The
    default (None) keeps the reference's exact stopping rule.

    Returns (curve (datapoints,), e_init, e_final, n_iterations)."""
    if stack_c.ndim == 2:  # (P, N) -> (P, 1, N)
        stack_c = stack_c[:, None, :]
    if std_c is not None and std_c.ndim == 2:
        std_c = std_c[:, None, :]

    def func(p):
        return reference_energy(p, mean_c, pca_c, stack_c, std_c,
                                lower_dn, upper_dn, use_mean,
                                exposures, datapoints)

    solver = StrictDESolver(func, bounds, x0=x0, popsize=popsize,
                            mutation=mutation,
                            recombination=recombination, tol=tol,
                            seed=seed)
    # materialize the initial energies up front (consumes no RNG draws;
    # __next__ then skips its lazy init, exactly as SciPy does when
    # energies are already finite) so e_init is the true pre-evolution
    # best
    solver._calculate_population_energies()
    solver._promote_lowest_energy()
    e_init = float(solver.population_energies[0])
    number_of_iterations = 0
    func_value = e_init
    best, stalled = e_init, 0
    for _step in solver:
        number_of_iterations += 1
        _, func_value = next(solver)  # the reference's double-step
        if stall_limit is not None:
            if func_value < best:
                best, stalled = func_value, 0
            else:
                stalled += 1
        if solver.converged() or number_of_iterations == maxiter \
                or func_value < energy_limit \
                or (stall_limit is not None and stalled >= stall_limit):
            break
    e_final = float(func_value)

    result = solver.x
    if use_mean:
        curve = mean_c + pca_c @ result
    else:
        curve = np.linspace(0, 1, datapoints) ** result[0] \
            + pca_c @ result[1:]
    curve = curve + (1 - curve[-1])
    curve[0] = 0.0
    return curve, e_init, e_final, number_of_iterations


def calibration_strict(lower_PCA_limit: float, upper_PCA_limit: float,
                       channel_stacks,
                       pca_arrays: np.ndarray,
                       mean_icrf_arrays: Optional[np.ndarray] = None,
                       initial_function: Optional[np.ndarray] = None,
                       data_limits: Tuple[int, int] = (5, 250),
                       energy_limit: float = 0.0,
                       rng_seed: int = 7,
                       maxiter: int = 1000,
                       tol: float = 0.01,
                       mutation: Tuple[float, float] = (0.0, 1.95),
                       recombination: float = 0.4,
                       popsize: int = 15,
                       config: CameraConfig = DEFAULT_CONFIG):
    """The reference solve, reproduced to the RNG draw
    (ICRF_calibration_exposure.py:288-402).

    ``channel_stacks`` = (value_stacks (C, ..., N) integer DNs, std_stacks
    or None, exposures (N,)) — the same injection point as
    :func:`calibration`; 2-D (P, N) per-channel stacks are reshaped to
    (P, 1, N) so the reference's (X, Y, N, N) reduction order is kept.
    Channel c solves with seed ``rng_seed + c`` (:381).  Each counted
    iteration advances the solver TWO generations (the reference's loop
    calls ``next`` once implicitly and once explicitly, :364-366) and the
    loop stops on convergence, ``maxiter`` counted iterations, or the
    SECOND step's best energy falling below ``energy_limit`` (:369).

    Returns (ICRF (bits, C), initial_energies (C,), final_energies (C,),
    n_iterations (C,)) — the reference returns all-zero energy arrays
    (:322-323, never written); actual energies are returned here instead.
    """
    cfg = config
    value_stacks, std_stacks, exposures = channel_stacks
    value_stacks = np.asarray(value_stacks)
    exposures = np.asarray(exposures, float)
    chs = value_stacks.shape[0]

    use_mean = initial_function is None
    num_pca = pca_arrays.shape[-1]
    if use_mean:
        bounds = [(lower_PCA_limit, upper_PCA_limit)] * num_pca
        x0 = [0.0] * num_pca
    else:
        bounds = [(1.0, 8.0)] + \
            [(lower_PCA_limit, upper_PCA_limit)] * num_pca
        x0 = [3.0] + [0.0] * num_pca

    icrf = np.zeros((cfg.datapoints, chs))
    e_init = np.zeros(chs)
    e_final = np.zeros(chs)
    n_iters = np.zeros(chs, int)
    lower_dn, upper_dn = int(data_limits[0]), int(data_limits[1])

    for c in range(chs):
        std_c = None
        if std_stacks is not None:
            std_c = np.asarray(std_stacks[c], float)
        mean_c = None
        if use_mean:
            mean_c = np.asarray(mean_icrf_arrays[c], float)
        icrf[:, c], e_init[c], e_final[c], n_iters[c] = \
            _solve_channel_strict(
                value_stacks[c], std_c, mean_c,
                np.asarray(pca_arrays[c], float), bounds, x0,
                lower_dn, upper_dn, use_mean, exposures, cfg.datapoints,
                popsize, mutation, recombination, tol, rng_seed + c,
                maxiter, energy_limit)

    icrf[icrf < 0] = 0
    icrf[icrf > 1] = 1

    if cfg.bits != cfg.datapoints:
        x_new = np.linspace(0, 1, cfg.bits)
        x_old = np.linspace(0, 1, cfg.datapoints)
        icrf = np.stack([np.interp(x_new, x_old, icrf[:, c])
                         for c in range(chs)], axis=1)
    return icrf, e_init, e_final, n_iters


def calibration_hybrid(lower_PCA_limit: float, upper_PCA_limit: float,
                       channel_stacks,
                       pca_arrays: np.ndarray,
                       mean_icrf_arrays: Optional[np.ndarray] = None,
                       initial_function: Optional[np.ndarray] = None,
                       data_limits: Tuple[int, int] = (5, 250),
                       energy_limit: float = 0.0,
                       rng_seed: int = 7,
                       strict_maxiter: int = 100,
                       strict_stall_limit: Optional[int] = None,
                       tol: float = 0.01,
                       mutation: Tuple[float, float] = (0.0, 1.95),
                       recombination: float = 0.4,
                       popsize: int = 15,
                       config: CameraConfig = DEFAULT_CONFIG,
                       device_kwargs: Optional[dict] = None):
    """Fast-then-exact hybrid ICRF solve.

    Phase 1 runs the population-batched device solver
    (:func:`~camera_linearity_tpu.models.calibration.calibration`) to
    locate the energy basin at TPU speed.  Phase 2 injects each channel's
    device optimum as ``x0`` into :class:`StrictDESolver` — the exact
    float64 ``currenttobest1bin`` solver that reproduces SciPy draw for
    draw — and lets it converge under the reference's own objective
    (ICRF_calibration_exposure.py:148-201), stepped with the reference's
    double-step loop (:364-370).

    Because the seed joins the strict population (SciPy's ``x0``
    injection) and DE never discards its best member, the result can only
    match or improve on the *clipped seed's* energy *as measured by the
    reference's float64 energy* (when the device optimum lies inside the
    strict bounds the clipped seed IS the device optimum): the hybrid is
    an audit-grade answer at a fraction of a cold strict solve's
    iteration budget.

    ``device_kwargs`` forwards extra options to the device phase (e.g.
    ``maxiter``, ``energy_form``, ``mesh``).  Strict bounds clip the seed
    inward when the device's refinement rounds stepped slightly outside
    the original box.  ``strict_stall_limit`` stops the polish early
    when the best energy has not improved for that many iterations —
    measured on the production-scale bench problem the full 100-iteration
    polish confirms-but-never-improves the seed (RESULTS.md "Round 5"),
    so a stall limit of ~10 cuts the audit cost ~5x without weakening
    the match-or-improve guarantee (DE never discards its best member).

    Returns (ICRF (bits, C), device_energies (C,), strict_initial (C,),
    strict_final (C,), n_iterations (C,)) — the two energy scales are the
    device f32 objective and the reference float64 objective
    respectively; compare strict_initial vs strict_final, not device vs
    strict.
    """
    from .calibration import calibration  # late: avoids an import cycle

    cfg = config
    value_stacks, std_stacks, exposures = channel_stacks
    value_stacks = np.asarray(value_stacks)
    exposures_np = np.asarray(exposures, float)
    chs = value_stacks.shape[0]

    dk = dict(device_kwargs or {})
    dk.pop("return_base", None)   # fixed return layout is unpacked below
    dk.pop("return_params", None)
    dk.setdefault("popsize", popsize)
    dk.setdefault("tol", tol)
    dk.setdefault("mutation", mutation)
    dk.setdefault("recombination", recombination)
    *_, device_energies, _ratio, seed_params = calibration(
        lower_PCA_limit, upper_PCA_limit,
        initial_function=initial_function, data_limits=data_limits,
        energy_limit=energy_limit, rng_seed=rng_seed, config=cfg,
        channel_stacks=channel_stacks, pca_arrays=pca_arrays,
        mean_icrf_arrays=mean_icrf_arrays, return_params=True, **dk)

    use_mean = initial_function is None
    num_pca = pca_arrays.shape[-1]
    if use_mean:
        bounds = [(lower_PCA_limit, upper_PCA_limit)] * num_pca
    else:
        bounds = [(1.0, 8.0)] + \
            [(lower_PCA_limit, upper_PCA_limit)] * num_pca
    lo = np.array([b[0] for b in bounds])
    hi = np.array([b[1] for b in bounds])

    icrf = np.zeros((cfg.datapoints, chs))
    e_init = np.zeros(chs)
    e_final = np.zeros(chs)
    n_iters = np.zeros(chs, int)
    lower_dn, upper_dn = int(data_limits[0]), int(data_limits[1])

    for c in range(chs):
        std_c = None
        if std_stacks is not None:
            std_c = np.asarray(std_stacks[c], float)
        mean_c = np.asarray(mean_icrf_arrays[c], float) if use_mean else None
        x0 = np.clip(np.asarray(seed_params[c], float), lo, hi)
        icrf[:, c], e_init[c], e_final[c], n_iters[c] = \
            _solve_channel_strict(
                value_stacks[c], std_c, mean_c,
                np.asarray(pca_arrays[c], float), bounds, x0,
                lower_dn, upper_dn, use_mean, exposures_np, cfg.datapoints,
                popsize, mutation, recombination, tol, rng_seed + c,
                strict_maxiter, energy_limit,
                stall_limit=strict_stall_limit)

    icrf[icrf < 0] = 0
    icrf[icrf > 1] = 1

    if cfg.bits != cfg.datapoints:
        x_new = np.linspace(0, 1, cfg.bits)
        x_old = np.linspace(0, 1, cfg.datapoints)
        icrf = np.stack([np.interp(x_new, x_old, icrf[:, c])
                         for c in range(chs)], axis=1)
    return icrf, np.asarray(device_energies, float), e_init, e_final, \
        n_iters
