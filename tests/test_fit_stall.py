"""Merit-stall mixed-precision fit (engine.fit_state_stall[_lean]).

Claims under test (round-4 verdict weak #1 / next-round item 1):

1. The stall fit applies the SAME exact-nugget update map as
   ``fit_state`` (budget-exit trajectory equality), and with the rules
   active in f64 ends within merit resolution of the deep fixed point.
2. In float32 the merit-stall rule actually STOPS the fit far below the
   ``max_iter`` budget (the plain state rule often never fires — the
   f32 state wobbles at the rounding floor forever), and the state it
   returns polishes to the same reference-fidelity ELBO as the
   budget-burning plain fit.
3. The default ``inference.ELBOcalc(precision='mixed')`` path routes
   through the stall fit and reports convergence.
"""
import numpy as np
import pytest

import gpyrn_tpu as g
from gpyrn_tpu.config import enable_x64

enable_x64(True)


def _problem(N, seed=0, p=2):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 100, N))
    data = []
    for i in range(p):
        data += [np.sin(2 * np.pi * t / (20 + 5 * i))
                 + 0.1 * rng.standard_normal(N), np.full(N, 0.1)]
    gprn = g.inference(1, t, *data)
    gprn.set_components(
        [g.covfunc.QuasiPeriodic(1.0, 30.0, 20.0, 0.7)],
        [g.covfunc.SquaredExponential(1.0 + 0.05 * k, 30.0)
         for k in range(p)],
        [None] * p, [0.1] * p)
    return gprn


def test_stall_same_update_map_as_fit_state():
    """Budget-exit equality: 16 stall sweeps (2 blocks of 8, no stop
    rule reachable) must land on the same state as 16 plain fit_state
    sweeps — the stall fit runs the SAME exact-nugget map, the merit
    sweep included."""
    gprn = _problem(120)
    eng = gprn.engine
    theta = gprn._theta()
    t = np.asarray(gprn.time, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, gprn.y)
    mu_a, var_a, it_a, _ = eng.fit_state(
        theta, t, gprn.y, gprn.yerr2, mu0, var0, 16, 0.0)
    mu_b, var_b, it_b, done_b = eng.fit_state_stall(
        theta, t, gprn.y, gprn.yerr2, mu0, var0, 16, 0.0,
        8, 0.0, 10_000)
    assert int(it_a) == int(it_b) == 16
    assert not bool(done_b)
    scale = 1.0 + np.max(np.abs(np.asarray(mu_a)))
    assert np.max(np.abs(np.asarray(mu_b) - np.asarray(mu_a))) / scale \
        < 1e-11
    np.testing.assert_allclose(np.asarray(var_b), np.asarray(var_a),
                               rtol=1e-9, atol=1e-13)


def test_stall_near_fixed_point_f64():
    """With the rules active in f64, the stall fit ends within merit
    resolution of fit_state's deep fixed point (the merit rule may
    preempt the state rule — ELBO flatness near the optimum means the
    state can be ~sqrt(stall_tol)-level away while the ELBO is not)."""
    gprn = _problem(120)
    eng = gprn.engine
    theta = gprn._theta()
    t = np.asarray(gprn.time, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, gprn.y)
    mu_a, var_a, it_a, done_a = eng.fit_state(
        theta, t, gprn.y, gprn.yerr2, mu0, var0, 2000, 1e-10)
    mu_b, var_b, it_b, done_b = eng.fit_state_stall(
        theta, t, gprn.y, gprn.yerr2, mu0, var0, 2000, 1e-10,
        8, 1e-12, 5)
    assert bool(done_a) and bool(done_b)
    scale = 1.0 + np.max(np.abs(np.asarray(mu_a)))
    assert np.max(np.abs(np.asarray(mu_b) - np.asarray(mu_a))) / scale \
        < 1e-4


def test_stall_lean_matches_dense_stall_f64():
    gprn = _problem(90, seed=3)
    eng = gprn.engine
    theta = gprn._theta()
    t = np.asarray(gprn.time, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, gprn.y)
    args = (theta, t, gprn.y, gprn.yerr2, mu0, var0, 400, 1e-9,
            4, 1e-12, 5)
    mu_d, var_d, it_d, _ = eng.fit_state_stall(*args)
    mu_l, var_l, it_l, _ = eng.fit_state_stall_lean(*args)
    assert int(it_d) == int(it_l)
    scale = 1.0 + np.max(np.abs(np.asarray(mu_d)))
    assert np.max(np.abs(np.asarray(mu_l) - np.asarray(mu_d))) / scale \
        < 1e-9


def test_stall_stops_at_f32_floor_and_keeps_parity():
    """f32: the plain state rule burns the budget; the stall fit stops
    early and its state refines to the same f64 ELBO."""
    import jax.numpy as jnp
    gprn = _problem(150, seed=1)
    eng = gprn.engine
    theta = gprn._theta()
    t = np.asarray(gprn.time, dtype=float)
    f32 = lambda x: jnp.asarray(np.asarray(x), dtype=jnp.float32)  # noqa
    mu0, var0 = eng.init_mu_var(f32(theta), f32(gprn.y))
    args32 = (f32(theta), f32(t), f32(gprn.y), f32(gprn.yerr2),
              mu0, var0)
    budget = 1500
    mu_p, var_p, it_p, done_p = eng.fit_state(
        *args32, budget, np.float32(1e-6))
    mu_s, var_s, it_s, done_s = eng.fit_state_stall(
        *args32, budget, np.float32(1e-6), 8, np.float32(1e-4), 3)
    assert bool(done_s), "stall rule never fired"
    assert int(it_s) < budget // 2, int(it_s)
    # equal-fidelity check: 3 f64 polish sweeps from each state
    e_s, _, _ = eng.elbo_refine(theta, t, gprn.y, gprn.yerr2,
                                np.float64(np.asarray(mu_s)),
                                np.float64(np.asarray(var_s)), 3)
    e_p, _, _ = eng.elbo_refine(theta, t, gprn.y, gprn.yerr2,
                                np.float64(np.asarray(mu_p)),
                                np.float64(np.asarray(var_p)), 3)
    # the stall trades a bounded slice of depth for the sweep budget:
    # measured gap ~3e-5 relative post-polish at the default knobs
    # (the plain path pays ~10x the sweeps for it)
    assert abs(float(e_s) - float(e_p)) / abs(float(e_p)) < 2e-4, \
        (float(e_s), float(e_p), int(it_s), int(it_p))


def test_elbocalc_mixed_default_uses_stall():
    gprn = _problem(100, seed=2)
    assert gprn.mixed_stall
    elbo, mu, var, it = gprn.ELBOcalc(precision='mixed')
    assert np.isfinite(elbo)
    # plain-path budget burn would report iterations near max_iter
    assert it < 2000, it
    # against the budget-burning plain mixed path: same pipeline, same
    # polish — the stall may give up a bounded depth slice, nothing more
    g2 = _problem(100, seed=2)
    g2.mixed_stall = False
    e_plain, *_ = g2.ELBOcalc(precision='mixed')
    assert abs(elbo - e_plain) / abs(e_plain) < 2e-4, (elbo, e_plain)


def test_tight_mixed_tol_disarms_stall():
    """mixed_tol below STALL_MIN_TOL is an explicit depth request: the
    mixed path must run the plain state rule, identical to
    mixed_stall=False (small/well-conditioned problems can reach tight
    deltas that the merit stall would forfeit)."""
    g1 = _problem(100, seed=2)
    g1.mixed_tol = 1e-8
    e_a, _, _, it_a = g1.ELBOcalc(precision='mixed', max_iter=300)
    g2 = _problem(100, seed=2)
    g2.mixed_tol = 1e-8
    g2.mixed_stall = False
    e_b, _, _, it_b = g2.ELBOcalc(precision='mixed', max_iter=300)
    assert int(it_a) == int(it_b)
    assert e_a == e_b
    # while the default tolerance does arm it (stops well under budget)
    g3 = _problem(100, seed=2)
    _, _, _, it_c = g3.ELBOcalc(precision='mixed', max_iter=300)
    assert int(it_c) < int(it_a)


def test_stall_returns_best_block_state():
    """On a merit stall the fit returns the best-merit block state."""
    import jax.numpy as jnp
    gprn = _problem(60, seed=5)
    eng = gprn.engine
    theta = gprn._theta()
    t = np.asarray(gprn.time, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, gprn.y)
    # stall_tol=inf makes every block after the first "non-improving"
    # (the first improves from the -inf sentinel), so with patience=1
    # the fit stops after block 2 and must return the BEST (block-1)
    # state — exactly 8 plain sweeps.
    mu_s, var_s, it_s, done_s = eng.fit_state_stall(
        theta, t, gprn.y, gprn.yerr2, mu0, var0, 400, 1e-14,
        8, np.inf, 1)
    mu_8, var_8, it_8, _ = eng.fit_state(
        theta, t, gprn.y, gprn.yerr2, mu0, var0, 8, 1e-14)
    assert bool(done_s) and int(it_s) == 16
    scale = 1.0 + np.max(np.abs(np.asarray(mu_8)))
    assert np.max(np.abs(np.asarray(mu_s) - np.asarray(mu_8))) / scale \
        < 1e-12


@pytest.mark.slow
def test_stall_respects_max_iter_budget():
    gprn = _problem(80, seed=7)
    eng = gprn.engine
    theta = gprn._theta()
    t = np.asarray(gprn.time, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, gprn.y)
    # impossible tolerances + infinite patience: exits by budget only
    mu, var, it, done = eng.fit_state_stall(
        theta, t, gprn.y, gprn.yerr2, mu0, var0, 40, 0.0,
        8, 0.0, 10_000)
    assert not bool(done)
    assert int(it) == 40
