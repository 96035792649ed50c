"""Stochastic minibatch-over-outputs fit (models/svi.py) tests.

Claims under test: (a) with the full batch the SVI iteration converges
to the same fixed point as the dense coordinate ascent (the natural-
parameter averages converge to the exact statistics); (b) genuine
minibatches recover most of the ELBO gap to the fixed point with a
fraction of the per-step weight factorizations; (c) the shared-weight-
structure constraint is enforced.
"""
import numpy as np
import pytest

import gpyrn_tpu as g
from gpyrn_tpu.models.svi import make_svi_fit, run_svi


@pytest.fixture(scope="module")
def gprn6():
    """p=6 outputs, one node — the regime the SVI path is for."""
    rng = np.random.default_rng(4)
    N = 24
    t = np.sort(rng.uniform(0, 40, N))
    data = []
    for i in range(6):
        data += [np.sin(2 * np.pi * t / (8 + 2 * i))
                 + 0.1 * rng.standard_normal(N), np.full(N, 0.1)]
    m = g.inference(1, t, *data)
    m.set_components(
        [g.covfunc.Periodic(1.0, 10.0, 0.6)],
        [g.covfunc.SquaredExponential(1.0 + 0.05 * k, 6.0)
         for k in range(6)],
        [None] * 6, [0.1] * 6)
    return m


def _fixed_point(gprn):
    eng = gprn.engine
    theta = gprn._theta()
    t = np.asarray(gprn.time, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, gprn.y)
    mu, var, it, conv = eng.fit_state(theta, t, gprn.y, gprn.yerr2,
                                      mu0, var0, 20000, 1e-12)
    e = float(eng.elbo_refine(theta, t, gprn.y, gprn.yerr2,
                              mu, var, 1)[0])
    return np.asarray(mu), np.asarray(var), e, (theta, t, mu0, var0)


def _elbo_at(gprn, mu, var):
    eng = gprn.engine
    return float(eng.elbo_refine(gprn._theta(),
                                 np.asarray(gprn.time, dtype=float),
                                 gprn.y, gprn.yerr2,
                                 np.asarray(mu, dtype=np.float64),
                                 np.asarray(var, dtype=np.float64),
                                 1)[0])


def test_svi_full_batch_rho1_is_exact_coordinate_ascent(gprn6):
    """batch_p = p with κ = 0 (ρ ≡ 1) must reproduce fit_state's
    trajectory exactly — same update map, same iteration count."""
    eng = gprn6.engine
    theta = gprn6._theta()
    t = np.asarray(gprn6.time, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, gprn6.y)
    mu_d, var_d, it, conv = eng.fit_state(theta, t, gprn6.y,
                                          gprn6.yerr2, mu0, var0,
                                          500, 0.0)
    spec, core_maps = gprn6._spec_and_core_maps()
    sv = make_svi_fit(spec, batch_p=6, core_maps=core_maps)
    mu, var = sv.fit_state_svi(theta, t, gprn6.y, gprn6.yerr2,
                               mu0, var0, 500, 0, 1.0, 0.0)
    scale = 1.0 + np.max(np.abs(np.asarray(mu_d)))
    assert np.max(np.abs(np.asarray(mu) - np.asarray(mu_d))) / scale \
        < 1e-10
    assert np.max(np.abs(np.asarray(var) - np.asarray(var_d))) < 1e-10


@pytest.mark.slow
def test_svi_minibatch_recovers_elbo(gprn6):
    mu_star, var_star, e_star, (theta, t, mu0, var0) = \
        _fixed_point(gprn6)
    e0 = _elbo_at(gprn6, mu0, var0)
    spec, core_maps = gprn6._spec_and_core_maps()
    eng = make_svi_fit(spec, batch_p=2, core_maps=core_maps)
    mu, var = eng.fit_state_svi(theta, t, gprn6.y, gprn6.yerr2,
                                mu0, var0, 600, 3, 5.0, 0.5)
    e = _elbo_at(gprn6, mu, var)
    # 2-of-6 outputs per step, 600 steps: recover >= 95% of the climb
    # (measured 98.4% at this seed)
    assert e >= e0 + 0.95 * (e_star - e0)


def test_svi_structure_guard():
    rng = np.random.default_rng(0)
    N = 12
    t = np.sort(rng.uniform(0, 20, N))
    data = []
    for i in range(2):
        data += [rng.standard_normal(N), np.full(N, 0.1)]
    m = g.inference(1, t, *data)
    m.set_components([g.covfunc.Periodic(1.0, 8.0, 0.5)],
                     [g.covfunc.SquaredExponential(1.0, 5.0),
                      g.covfunc.Matern52(1.0, 5.0)],
                     [None] * 2, [0.1] * 2)
    spec, core_maps = m._spec_and_core_maps()
    with pytest.raises(ValueError, match="share one structure"):
        make_svi_fit(spec, batch_p=1, core_maps=core_maps)
    with pytest.raises(ValueError, match="batch_p"):
        make_svi_fit(spec, batch_p=5)


def test_run_svi_installs_state(gprn6):
    mu, var = run_svi(gprn6, n_steps=50, batch_p=3, seed=1)
    assert mu.shape == (gprn6.d,) and var.shape == (gprn6.d,)
    assert np.all(np.isfinite(mu)) and np.all(var > 0)
    np.testing.assert_array_equal(gprn6._mu, mu)


def test_mixed_fit_method_svi_with_converge_polish(gprn6):
    """ELBOcalc(precision='mixed') with fit_method='svi' and the
    Anderson converge polish reaches a STATIONARY point recovering
    nearly all of the ELBO climb.  (Not mode-identity: the GPRN ELBO
    is multimodal — node/weight amplitude degeneracies — and a
    stochastic trajectory may settle a neighboring basin; measured
    99.5% of the climb at these settings.)"""
    mu_star, var_star, e_star, (theta, t, mu0, var0) = \
        _fixed_point(gprn6)
    e0 = _elbo_at(gprn6, mu0, var0)
    gprn6.fit_method = 'svi'
    gprn6.svi_batch_p = 2
    gprn6.svi_kappa = 0.5
    gprn6.svi_seed = 3
    gprn6.refine_method = 'f64'
    gprn6.refine_sweeps = 'converge'
    gprn6.refine_tol = 1e-9
    try:
        e, _, _, n_it = gprn6.ELBOcalc(precision='mixed', max_iter=600,
                                       mu='init', var='init')
    finally:
        gprn6.fit_method = 'dense'
        gprn6.refine_sweeps = 3
    assert e >= e0 + 0.97 * (e_star - e0)
    assert n_it > 600          # bulk steps + polish sweeps reported
