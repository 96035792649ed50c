"""Acceptance tests: one per BASELINE.json config (scaled-down sizes so
the suite stays fast; the full-size numbers live in docs/performance.md).

1. 1-node × 1-output GPRN, SE node + Constant weight, synthetic sine.
2. 2-output RV+FWHM GPRN on the bundled solar dataset (QP node + SE).
3. 3-output RV/BIS/FWHM GPRN with 2 nodes, Periodic + Matern-5/2.
4. Hyperparameter optimization loop + evidence via importance sampling.
5. Large-N batched Cholesky/solve path + nonparametric module.
"""
import numpy as np
import pytest
import scipy.stats as st

import gpyrn_tpu as g
from gpyrn_tpu.inference import evidence as ev
from gpyrn_tpu.inference import nonparametric as npv


def test_config1_sine_se_node_constant_weight():
    rng = np.random.default_rng(1)
    N = 100
    t = np.linspace(0, 100, N)
    y = 3 * np.sin(2 * np.pi * t / 17) + 0.3 * rng.standard_normal(N)
    gprn = g.inference(1, t, y, np.full(N, 0.3))
    gprn.set_components(g.covfunc.SquaredExponential(3.0, 5.0),
                        g.covfunc.Constant(1.0),
                        g.meanfunc.Constant(0.0), 0.3)
    elbo, mu, var, it = gprn.ELBOcalc()
    assert np.isfinite(elbo) and it > 0
    tstar, mean, std, _ = gprn.predict(nn=50)
    assert np.all(np.isfinite(mean))


def test_config2_solar_rv_fwhm():
    time, data = g.datasets.load_solar(("RV", "FWHM"))
    keep = slice(0, 120)
    time = time[keep]
    data = [d[keep] for d in data]
    gprn = g.inference(1, time, *data)
    gprn.set_components(
        g.covfunc.QuasiPeriodic(np.std(data[0]), 30.0, 27.0, 0.7),
        [g.covfunc.SquaredExponential(1.0, 30.0),
         g.covfunc.SquaredExponential(np.std(data[2]), 30.0)],
        [g.meanfunc.Constant(0.0), g.meanfunc.Constant(0.0)],
        [np.std(data[0]) / 2, np.std(data[2]) / 2])
    elbo, *_ = gprn.ELBOcalc(max_iter=100)
    assert np.isfinite(elbo)
    _, mean, std, (nodes, weights) = gprn.predict(nn=60)
    assert mean.shape == (60, 2)
    assert np.asarray(nodes).shape[0] == 1


@pytest.mark.slow
def test_config3_three_outputs_two_nodes():
    rng = np.random.default_rng(3)
    N = 40
    t = np.sort(rng.uniform(0, 60, N))
    act = np.sin(2 * np.pi * t / 13)
    data = []
    for c in (3.0, -2.0, 1.5):
        data += [c * act + 0.2 * rng.standard_normal(N), np.full(N, 0.2)]
    gprn = g.inference(2, t, *data)
    gprn.set_components(
        [g.covfunc.Periodic(1.0, 13.0, 0.7), g.covfunc.Matern52(1.0, 20.0)],
        [g.covfunc.SquaredExponential(1.0, 30.0) for _ in range(6)],
        [None] * 3, [0.2] * 3)
    elbo, mu, var, it = gprn.ELBOcalc(max_iter=150)
    assert np.isfinite(elbo)
    val, grad = gprn.elbo_grad(n_sweeps=10)
    assert np.all(np.isfinite(grad))


@pytest.mark.slow
def test_config4_optimize_plus_evidence(tiny_dataset):
    t, y, yerr = tiny_dataset
    gprn = g.inference(1, t, y, yerr)
    gprn.set_components(g.covfunc.Periodic(1.0, 10.0, 0.5),
                        g.covfunc.SquaredExponential(1.0, 5.0),
                        None, 0.1)
    e0 = gprn.ELBO
    res = gprn.optimize_adam(n_steps=40, learning_rate=2e-2, n_sweeps=10)
    assert res["elbo"] >= e0 - 1e-6

    theta = gprn.get_parameters()
    names = list(gprn.parameters_dict.keys())
    rng = np.random.default_rng(0)
    samples = theta[None, :] * np.exp(
        0.03 * rng.standard_normal((300, theta.size)))
    priors = {n: st.lognorm(s=1.0, scale=max(abs(v), 1e-3))
              for n, v in zip(names, theta)}

    def lnlike(th):
        return ev.batch_elbo(gprn, th, max_iter=40)

    def lnprior(th):
        th = np.atleast_2d(th)
        return sum(priors[n].logpdf(th[:, k])
                   for k, n in enumerate(names))

    logz = ev.compute_perrakis_estimate(samples, lnlike, lnprior,
                                        nsamples=150,
                                        rng=np.random.default_rng(1))
    assert np.isfinite(logz)
    assert logz < res["elbo"] + 10   # evidence below the optimum bound


@pytest.mark.slow
def test_config5_largeN_path_and_nonparametric():
    rng = np.random.default_rng(5)
    N = 600                     # exercises the chunked wide-solve path
    t = np.sort(rng.uniform(0, 300, N))
    y = np.sin(2 * np.pi * t / 40) + 0.1 * rng.standard_normal(N)
    gprn = g.inference(1, t, y, np.full(N, 0.1))
    gprn.set_components(g.covfunc.QuasiPeriodic(1.0, 90.0, 40.0, 0.7),
                        g.covfunc.SquaredExponential(1.0, 90.0),
                        None, 0.1)
    eng = gprn.engine
    theta = gprn._theta()
    mu0, var0 = eng.init_mu_var(theta, gprn.y)
    mu, var, it, conv = eng.fit_state(theta, t, gprn.y, gprn.yerr2,
                                      mu0, var0, 100, 1e-4)
    assert np.all(np.isfinite(np.asarray(mu)))
    elbo, *_ = gprn.ELBOcalc(max_iter=60)
    assert np.isfinite(elbo)

    # nonparametric module on a subsample
    sub = slice(0, 30)
    ni = npv.inference(1, t[sub], 2, y[sub], np.full(30, 0.1))
    e, m, v = ni.ELBOcalc([g.covfunc.QuasiPeriodic(1.0, 90.0, 40.0, 0.7)],
                          [g.covfunc.SquaredExponential(1.0, 90.0)],
                          [None], [0.1], iterations=100)
    assert np.isfinite(e)
