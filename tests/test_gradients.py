"""Hyperparameter gradients through the coordinate-ascent sweeps — the
reference has no gradient path at all (it uses Nelder-Mead,
meanfield.py:1149); autodiff through the fused scan is the TPU build's
north-star surface (SURVEY.md §3.3)."""
import numpy as np
import pytest

import gpyrn_tpu as g


@pytest.fixture
def gprn(tiny_dataset):
    t, y, yerr = tiny_dataset
    m = g.inference(1, t, y, yerr)
    m.set_components([g.covfunc.Periodic(1.0, 10.0, 0.5)],
                     [g.covfunc.SquaredExponential(1.0, 5.0)],
                     [None], [0.1])
    return m


@pytest.mark.slow
def test_elbo_grad_matches_finite_differences(gprn):
    gprn.ELBOcalc()  # populate the warm-start cache
    theta0 = gprn.get_parameters()
    n_sweeps = 20
    val, grad = gprn.elbo_grad(n_sweeps=n_sweeps)
    assert np.isfinite(val) and np.all(np.isfinite(grad))

    mu0, var0 = gprn._mu.copy(), gprn._var.copy()
    eps = 1e-6
    for k in range(theta0.size):
        tp = theta0.copy()
        tp[k] += eps
        vp = float(gprn.engine.elbo_fixed(tp, gprn.time, gprn.y, gprn.yerr2,
                                          mu0, var0, n_sweeps))
        tm = theta0.copy()
        tm[k] -= eps
        vm = float(gprn.engine.elbo_fixed(tm, gprn.time, gprn.y, gprn.yerr2,
                                          mu0, var0, n_sweeps))
        fd = (vp - vm) / (2 * eps)
        assert grad[k] == pytest.approx(fd, rel=2e-4, abs=1e-5), \
            f"param {k}: autodiff {grad[k]} vs fd {fd}"


def test_elbo_fixed_reaches_fixed_point(gprn):
    """Coordinate ascent monotonically increases the ELBO: the fixed-sweep
    path converges to a fixed point, and the while-loop fit (which stops
    early on the reference's loose rel-std rule) can only be below it."""
    theta = gprn._theta()
    mu0, var0 = gprn.engine.init_mu_var(theta, gprn.y)
    e_fit, *_ = gprn.engine.elbo_fit(theta, gprn.time, gprn.y, gprn.yerr2,
                                     mu0, var0, 500)
    e_200 = gprn.engine.elbo_fixed(theta, gprn.time, gprn.y, gprn.yerr2,
                                   mu0, var0, 200)
    e_400 = gprn.engine.elbo_fixed(theta, gprn.time, gprn.y, gprn.yerr2,
                                   mu0, var0, 400)
    np.testing.assert_allclose(float(e_200), float(e_400), rtol=1e-6)
    assert float(e_fit) <= float(e_400) + 1e-6


@pytest.mark.slow
def test_optimize_adam_improves_elbo(gprn):
    e0 = gprn.ELBO
    res = gprn.optimize_adam(n_steps=30, learning_rate=3e-2, n_sweeps=15)
    assert res['elbo'] >= e0 - 1e-6


def test_optimize_nelder_mead_improves_elbo(gprn):
    e0 = gprn.ELBO
    res = gprn.optimize(options={'maxiter': 40})
    e1 = -res.fun
    assert e1 >= e0 - 1e-6


def test_optimize_respects_frozen(gprn):
    gprn.freeze_parameter(name='node1.P')
    P_before = gprn.nodes[0].pars[1]
    gprn.optimize(options={'maxiter': 10})
    assert gprn.nodes[0].pars[1] == P_before
    gprn.thaw_all_parameters()


def test_optimize_adam_respects_frozen(gprn):
    gprn.freeze_parameter(name='node1.P')
    P_before = gprn.nodes[0].pars[1]
    res = gprn.optimize_adam(n_steps=10, learning_rate=3e-2, n_sweeps=8)
    assert gprn.nodes[0].pars[1] == P_before
    assert np.isfinite(res['elbo'])
    gprn.thaw_all_parameters()
