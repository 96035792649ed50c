"""Anderson fixed-point solver (ops/fixedpoint.py) tests.

Claims under test: (a) on a linear contraction with spectral radius
close to 1 the solver needs far fewer map applications than plain
iteration; (b) the clamp projection keeps extrapolated candidates in
the map's domain; (c) `refine_converged` lands on the SAME fixed point
as the f64 engine driven to stationarity (the north-star fidelity
mechanism, bench.py measure_north_star).
"""
import numpy as np
import pytest

import gpyrn_tpu as g
from gpyrn_tpu.ops.fixedpoint import anderson_fixed_point
from gpyrn_tpu.models.exact_blocked import refine_converged


def test_anderson_linear_contraction():
    """Slow modes clustered near 1 (the GPRN sweep-map regime:
    ρ = 0.90–0.97, κ(I−A) small): plain iteration needs ~700 steps for
    1e-9; Anderson must do it in under 30 F-evaluations."""
    rng = np.random.default_rng(0)
    n = 40
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.linspace(0.90, 0.97, n)
    A = Q @ np.diag(lam) @ Q.T
    b = rng.standard_normal(n)
    x_star = np.linalg.solve(np.eye(n) - A, b)

    def F(x):
        fx = A @ x + b
        return fx, -float(np.linalg.norm(fx - x))

    x, merit, info = anderson_fixed_point(F, np.zeros(n), memory=8,
                                          max_evals=60, rel_tol=1e-9)
    assert info["evals"] < 40
    assert np.max(np.abs(x - x_star)) < 1e-7
    # plain iteration comparison: after the same number of steps the
    # plain error is orders of magnitude larger
    xp = np.zeros(n)
    for _ in range(info["evals"]):
        xp = A @ xp + b
    assert np.max(np.abs(xp - x_star)) > 1e3 * np.max(np.abs(x - x_star))


def test_anderson_clamp_keeps_domain():
    """F(x) = sqrt(x) elementwise (fixed point 1, domain x >= 0):
    extrapolations leave the domain, the clamp floors them, and the
    merit safeguard (−max|log x|, a genuine Lyapunov function of this
    map) rejects the floored region and converges anyway."""
    def F(x):
        fx = np.sqrt(x)
        return fx, -float(np.max(np.abs(np.log(fx))))

    def clamp(x):
        return np.maximum(x, 1e-12)

    x0 = np.full(16, 0.01)
    x, merit, info = anderson_fixed_point(F, x0, memory=5, max_evals=60,
                                          rel_tol=1e-13, clamp=clamp)
    assert np.all(np.isfinite(x))
    assert np.max(np.abs(x - 1.0)) < 1e-6


def test_anderson_max_evals_cap():
    def F(x):
        fx = 0.999 * x + 1.0
        return fx, -float(np.max(np.abs(fx - x)))

    _, _, info = anderson_fixed_point(F, np.zeros(4), memory=2,
                                      max_evals=7, rel_tol=0.0)
    assert info["evals"] <= 7


@pytest.mark.slow
def test_refine_converged_matches_f64_fixed_point():
    """refine_converged (Anderson over df64 sweeps) must land on the
    f64 engine's own fixed point: run fit_state to tol=1e-13 and
    evaluate elbo_refine there — the two ELBOs agree to ~1e-8."""
    rng = np.random.default_rng(3)
    N = 34
    t = np.sort(rng.uniform(0, 40, N))
    data = []
    for i in range(2):
        data += [np.sin(2 * np.pi * t / (9 + 3 * i))
                 + 0.1 * rng.standard_normal(N), np.full(N, 0.1)]
    gprn = g.inference(1, t, *data)
    gprn.set_components(g.covfunc.QuasiPeriodic(1.0, 15.0, 9.0, 0.7),
                        [g.covfunc.SquaredExponential(1.0, 15.0),
                         g.covfunc.Matern52(0.8, 10.0)],
                        [None, None], [0.1, 0.1])
    eng = gprn.engine
    tt = np.asarray(gprn.time, dtype=float)
    theta = gprn._theta()
    mu0, var0 = eng.init_mu_var(theta, gprn.y)
    mu64, var64, it, conv = eng.fit_state(theta, tt, gprn.y, gprn.yerr2,
                                          mu0, var0, 20000, 1e-13)
    e64 = float(eng.elbo_refine(theta, tt, gprn.y, gprn.yerr2,
                                mu64, var64, 1)[0])

    e_fp, mu_fp, var_fp, info = refine_converged(
        gprn, np.asarray(mu0, dtype=np.float64),
        np.asarray(var0, dtype=np.float64), rel_tol=1e-10, max_evals=60)
    assert info["stationarity_rel"] < 1e-8
    assert e_fp == pytest.approx(e64, rel=1e-8)
    # the two stopping rules (fit_state state-delta 1e-13 vs Anderson
    # merit 1e-10) leave residual state error amplified by 1/(1-rho)
    scale = 1.0 + np.max(np.abs(np.asarray(mu64)))
    assert np.max(np.abs(mu_fp - np.asarray(mu64))) / scale < 1e-5
