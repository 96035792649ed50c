"""Mixed-precision fit mode: f32 updates-only coordinate ascent with the
exact reference nugget, then f64 ELBO polish."""
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


def test_fit_state_reaches_sweep_fixed_point(gprn):
    """The updates-only fit must land on the same fixed point as the
    full sweep iterated to convergence."""
    eng = gprn.engine
    theta = gprn._theta()
    t = np.asarray(gprn.time, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, gprn.y)
    mu_s, var_s, it, conv = eng.fit_state(theta, t, gprn.y, gprn.yerr2,
                                          mu0, var0, 5000, 1e-12)
    assert bool(conv)
    # iterate the full sweep far beyond the reference stopping rule
    _, mu_f, var_f = eng.elbo_refine(theta, t, gprn.y, gprn.yerr2,
                                     mu0, var0, 400)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_f),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_f),
                               atol=1e-5)


def test_mixed_elbo_at_least_reference_rule(gprn):
    """Mixed mode converges the state fully, so its ELBO must be >= the
    ELBO at the reference's loose rel-std stopping point."""
    e_ref, *_ = gprn.ELBOcalc()
    gprn2_elbo, mu, var, it = gprn.ELBOcalc(precision='mixed',
                                            mu='init', var='init')
    assert np.isfinite(gprn2_elbo)
    assert gprn2_elbo >= e_ref - 1e-6


@pytest.mark.slow
def test_mixed_close_to_converged_f64(gprn):
    """Mixed ELBO must agree with a fully-converged f64 fit to ~1e-5."""
    eng = gprn.engine
    theta = gprn._theta()
    t = np.asarray(gprn.time, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, gprn.y)
    e64 = float(eng.elbo_fixed(theta, t, gprn.y, gprn.yerr2,
                               mu0, var0, 500))
    gprn.mixed_tol = 1e-8
    em, *_ = gprn.ELBOcalc(precision='mixed', mu='init', var='init')
    assert em == pytest.approx(e64, rel=1e-5)


@pytest.mark.slow
def test_mixed_multi_output(multi_dataset):
    """For q > 1 the reference's computed ELBO is not exactly the
    objective the updates maximize (cumulative-sumSigmaF and raw-y
    quirks), so monotonicity past the reference stopping point does not
    hold; the correct oracle is the long-run f64 fixed point."""
    t, *data = multi_dataset
    m = g.inference(2, t, *data)
    m.set_components(
        [g.covfunc.Periodic(1.2, 9.0, 0.6), g.covfunc.Matern52(1.1, 4.0)],
        [g.covfunc.SquaredExponential(1.0 + 0.1 * k, 5.0)
         for k in range(6)],
        [None] * 3, [0.1] * 3)
    eng = m.engine
    theta = m._theta()
    mu0, var0 = eng.init_mu_var(theta, m.y)
    e_star = float(eng.elbo_fixed(theta, np.asarray(t, dtype=float),
                                  m.y, m.yerr2, mu0, var0, 1000))
    m.mixed_tol = 1e-6
    em, mu, var, it = m.ELBOcalc(precision='mixed', mu='init', var='init')
    assert np.isfinite(em)
    assert em == pytest.approx(e_star, rel=1e-3)


def test_mixed_refine_converge_lands_on_fixed_point(gprn):
    """refine_sweeps='converge' (Anderson fixed-point polish) must land
    on the f64 fixed-point ELBO, beat the fixed-3-sweep polish, and
    report the sweep count in iterNumber."""
    eng = gprn.engine
    theta = gprn._theta()
    t = np.asarray(gprn.time, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, gprn.y)
    mu64, var64, it, conv = eng.fit_state(theta, t, gprn.y, gprn.yerr2,
                                          mu0, var0, 20000, 1e-13)
    e_star = float(eng.elbo_refine(theta, t, gprn.y, gprn.yerr2,
                                   mu64, var64, 1)[0])

    gprn.refine_method = 'f64'
    gprn.mixed_tol = 1e-3            # stop the f32 bulk early on purpose
    e3, *_ = gprn.ELBOcalc(precision='mixed', mu='init', var='init')
    gprn.refine_sweeps = 'converge'
    gprn.refine_tol = 1e-9
    ec, _, _, n_it = gprn.ELBOcalc(precision='mixed', mu='init',
                                   var='init')
    assert ec == pytest.approx(e_star, rel=1e-7)
    assert ec >= e3 - 1e-9
    assert n_it > 0


@pytest.mark.slow
def test_mixed_refine_converge_df64(gprn):
    """The same contract on the df64 (on-chip double-single) polish."""
    eng = gprn.engine
    theta = gprn._theta()
    t = np.asarray(gprn.time, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, gprn.y)
    mu64, var64, it, conv = eng.fit_state(theta, t, gprn.y, gprn.yerr2,
                                          mu0, var0, 20000, 1e-13)
    e_star = float(eng.elbo_refine(theta, t, gprn.y, gprn.yerr2,
                                   mu64, var64, 1)[0])
    gprn.refine_method = 'df64'
    gprn.refine_sweeps = 'converge'
    gprn.refine_tol = 1e-9
    ec, *_ = gprn.ELBOcalc(precision='mixed', mu='init', var='init')
    assert ec == pytest.approx(e_star, rel=1e-7)
