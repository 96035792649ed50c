"""Nonparametric (mixture-of-Gaussians) VI tests.

The reference module is experimental and broken for q > 1 (its own
comment, nonparametric.py:401), so the oracles here are mathematical:
the NPV ELBO must be a valid lower bound that improves under optimization
and approach the mean-field ELBO from below on a well-identified problem
(a k=1 isotropic mixture is a strictly smaller family than mean-field's
free-diagonal Gaussian)."""
import numpy as np
import pytest

import gpyrn_tpu as g
from gpyrn_tpu.inference import nonparametric as npv


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    N = 15
    t = np.sort(rng.uniform(0, 30, N))
    y = np.sin(2 * np.pi * t / 10) + 0.1 * rng.standard_normal(N)
    yerr = np.full(N, 0.1)
    return t, y, yerr


def _components():
    return ([g.covfunc.Periodic(1.0, 10.0, 0.5)],
            [g.covfunc.SquaredExponential(1.0, 5.0)], [None], [0.1])


def test_constructor_invariants(problem):
    t, y, yerr = problem
    gprn = npv.inference(1, t, 3, y, yerr)
    assert gprn.N == t.size and gprn.p == 1 and gprn.k == 3
    assert gprn.d == t.size * 2
    f, w = gprn._u_to_fhatW(np.arange(gprn.d, dtype=float))
    assert f.shape == (1, 1, t.size) and w.shape == (1, 1, t.size)


def test_constructor_odd_args_raises(problem):
    t, y, yerr = problem
    with pytest.raises(AssertionError):
        npv.inference(1, t, 3, y, yerr, y)


@pytest.mark.slow
def test_elbo_improves_under_fit(problem):
    t, y, yerr = problem
    gprn = npv.inference(1, t, 2, y, yerr)
    nodes, weights, means, jitters = _components()
    e_short, mu, var = gprn.ELBOcalc(nodes, weights, means, jitters,
                                     iterations=5)
    e_long, mu, var = gprn.ELBOcalc(nodes, weights, means, jitters,
                                    iterations=300)
    assert np.isfinite(e_short) and np.isfinite(e_long)
    assert e_long > e_short
    assert mu.shape == (2, gprn.d)
    assert var.shape == (2,)
    assert np.all(var > 0)


@pytest.mark.slow
def test_npv_is_lower_bound_of_meanfield(problem):
    """NPV with an isotropic mixture cannot beat the mean-field optimum on
    this family (same model, strictly smaller variational family)."""
    t, y, yerr = problem
    nodes, weights, means, jitters = _components()

    mf = g.inference(1, t, y, yerr)
    mf.set_components(*_components())
    e_mf = mf.ELBO

    npv_inf = npv.inference(1, t, 2, y, yerr)
    e_npv, *_ = npv_inf.ELBOcalc(nodes, weights, means, jitters,
                                 iterations=800, learning_rate=3e-2)
    assert e_npv <= e_mf + 0.5  # small slack for entropy-bound looseness


def test_elbo_trajectory_monotonic_tail(problem):
    t, y, yerr = problem
    gprn = npv.inference(1, t, 2, y, yerr)
    nodes, weights, means, jitters = _components()
    gprn.ELBOcalc(nodes, weights, means, jitters, iterations=200)
    traj = gprn._traj
    # adam is not strictly monotone, but the tail must improve on the head
    assert np.mean(traj[-20:]) > np.mean(traj[:20])


def test_elbocalc_state_roundtrip(problem):
    """Returned (mu, var) must resume exactly (var is a std-dev in both
    directions — regression test for the sqrt round-trip bug)."""
    t, y, yerr = problem
    gprn = npv.inference(1, t, 2, y, yerr)
    nodes, weights, means, jitters = _components()
    e1, mu, var = gprn.ELBOcalc(nodes, weights, means, jitters,
                                iterations=100)
    e_resume = gprn.ELBOaux(nodes, weights, means, jitters, mu, var)
    assert e_resume == pytest.approx(e1, rel=1e-6)
    # zero extra iterations from the same state returns the same ELBO
    e2, *_ = gprn.ELBOcalc(nodes, weights, means, jitters,
                           iterations=0, mu=mu, var=var)
    assert e2 == pytest.approx(e1, rel=1e-6)


@pytest.fixture(scope="module")
def npv_problem(problem):
    t, y, yerr = problem
    nodes, weights, means, jitters = _components()
    gprn = npv.inference(1, t, 3, y, yerr)
    return gprn, nodes, weights, means, jitters


def test_npv_predict_mixture(npv_problem):
    gprn, nodes, weights, means, jitters = npv_problem
    elbo, mu, var = gprn.ELBOcalc(nodes, weights, means, jitters,
                                  iterations=120)
    ts, mean, std = gprn.predict(nodes, weights, means, jitters, mu, var,
                                 tstar=np.linspace(0, 40, 30))
    assert mean.shape == (30, gprn.p)
    assert std.shape == (30, gprn.p)
    assert np.all(np.isfinite(mean)) and np.all(std >= 0)
    # predictive roughly tracks the data scale inside the data window
    assert np.max(np.abs(mean)) < 10 * np.max(np.abs(gprn.y))


def test_npv_resample_components(npv_problem):
    gprn, nodes, weights, means, jitters = npv_problem
    rng = np.random.default_rng(0)
    mu = 0.1 * rng.standard_normal((gprn.k, gprn.d))
    mu[1] = mu[0]                       # collapsed pair
    var = np.full(gprn.k, 0.3)
    mu2, var2, n = gprn.resample_components(mu, var)
    assert n >= 1
    assert np.sqrt(np.mean((mu2[1] - mu2[0]) ** 2)) > 1e-6
    # resumed fit stays finite
    e, mu3, var3 = gprn.ELBOcalc(nodes, weights, means, jitters,
                                 iterations=40, mu=mu2, var=var2)
    assert np.isfinite(e)
