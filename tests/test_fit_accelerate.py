"""Anderson-accelerated float32 bulk fit (``fit_accelerate``).

The mixed-precision path's f32 phase can run as a host fixed-point
solve (inference/meanfield.py::_accelerated_fit32 over
ops/fixedpoint.anderson_fixed_point with the merit-stall stop).  The
f32 sweep map has a rounding floor — the state wobbles ~1e-3 per sweep
forever, so the plain path's state tolerance often never fires and
burns the whole max_iter budget — and these tests pin the two claims
that matter: the accelerated fit STOPS (at the floor, in far fewer
sweeps than the plain budget) and its best-ELBO state is as good as a
long plain run's, within f32 evaluation noise.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import gpyrn_tpu as g


def _problem(N=300, seed=2):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 80, N))
    y1 = np.sin(2 * np.pi * t / 17) + 0.1 * rng.standard_normal(N)
    y2 = 0.6 * np.sin(2 * np.pi * t / 17 + 0.4) \
        + 0.1 * rng.standard_normal(N)
    gprn = g.inference(1, t, y1, np.full(N, 0.1), y2, np.full(N, 0.1))
    gprn.set_components(
        [g.covfunc.QuasiPeriodic(1.0, 25.0, 17.0, 0.8)],
        [g.covfunc.SquaredExponential(1.0, 30.0),
         g.covfunc.SquaredExponential(0.8, 25.0)],
        [None, None], [0.1, 0.1])
    return gprn


def _f32_args(gprn):
    eng = gprn.engine
    theta = gprn._theta()
    t = np.asarray(gprn.time, dtype=float)

    def f32(x):
        return jnp.asarray(np.asarray(x), dtype=jnp.float32)

    mu0, var0 = eng.init_mu_var(f32(theta), f32(gprn.y))
    return (f32(theta), f32(t), f32(gprn.y), f32(gprn.yerr2), mu0, var0)


@pytest.mark.slow
def test_accelerated_fit_stops_at_floor_and_matches_plain_quality():
    gprn = _problem()
    eng = gprn.engine
    args = _f32_args(gprn)
    budget = 1500
    mu_a, var_a, n_a, conv = gprn._accelerated_fit32(args, False, budget)
    assert conv            # the stall stop fired before the budget
    assert n_a < budget
    mu_a = np.asarray(mu_a)
    var_a = np.asarray(var_a)
    assert np.all(np.isfinite(mu_a))
    assert np.all(var_a > 0)

    # quality: the f32 ELBO of the accelerated state is within f32
    # evaluation noise (~1e-3 relative on this ill-conditioned config)
    # of a LONG plain run's — with far fewer sweeps spent
    e_a, *_ = eng.elbo_refine(*args[:4], jnp.asarray(mu_a),
                              jnp.asarray(var_a), 1)
    mu_p, var_p, it_p, _ = eng.fit_state(*args, budget, np.float32(0.0))
    e_p, *_ = eng.elbo_refine(*args[:4], mu_p, var_p, 1)
    assert float(e_a) >= float(e_p) - 1e-2 * abs(float(e_p))


@pytest.mark.slow
def test_elbocalc_mixed_accelerated_matches_plain():
    # bound the plain run: its state tolerance sits below this
    # problem's f32 floor, so it runs exactly max_iter sweeps
    gprn = _problem()
    e_plain, *_ = gprn.ELBOcalc(precision='mixed', max_iter=600)

    gprn2 = _problem()
    gprn2.fit_accelerate = True
    e_acc, mu2, var2, n2 = gprn2.ELBOcalc(precision='mixed',
                                          max_iter=600)
    assert np.isfinite(e_acc)
    # both states sit in the same f32 noise ball; the f64 3-sweep
    # polish evaluates them exactly — they agree to f32-floor accuracy
    assert abs(e_acc - e_plain) / abs(e_plain) < 5e-3
    assert 0 < n2 < 600


def test_accelerated_ignored_off_the_dense_state_path():
    # fit_accelerate must not change the reference-rule ('elbo') stop
    gprn = _problem(N=60)
    gprn.fit_accelerate = True
    gprn.mixed_stop = 'elbo'
    e1, *_ = gprn.ELBOcalc(precision='mixed')
    gprn2 = _problem(N=60)
    gprn2.mixed_stop = 'elbo'
    e2, *_ = gprn2.ELBOcalc(precision='mixed')
    assert e1 == pytest.approx(e2, rel=1e-12)


def test_anderson_stall_rule_returns_best_state():
    # a scalar map whose merit has a hard ceiling: plain iteration
    # x <- (x + 1/x)/2 converges to sqrt(1) = 1 with merit -(x-1)^2
    from gpyrn_tpu.ops.fixedpoint import anderson_fixed_point

    def F(x):
        v = 0.5 * (x + 1.0 / np.maximum(x, 1e-12))
        return v, -float((v[0] - 1.0) ** 2)

    x, e, info = anderson_fixed_point(
        F, np.array([4.0]), rel_tol=0.0, max_evals=60,
        stall_patience=3, stall_tol=1e-12)
    assert info["stalled"]
    assert abs(x[0] - 1.0) < 1e-6
    # and the default (stall off) behaves exactly as before
    x2, e2, info2 = anderson_fixed_point(
        F, np.array([4.0]), rel_tol=1e-10, max_evals=60)
    assert not info2["stalled"]
    assert abs(x2[0] - 1.0) < 1e-6
