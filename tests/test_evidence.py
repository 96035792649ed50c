"""Evidence-estimator tests.

The reference module was unimportable (SURVEY.md §2.9), so the oracle is
analytic: for a conjugate normal model the marginal likelihood is known in
closed form, and all three estimators must recover it."""
import numpy as np
import pytest
import scipy.stats as st

from gpyrn_tpu.inference import evidence as ev


# Conjugate gaussian toy model: y ~ N(theta, s2), theta ~ N(0, t2).
# Evidence: y_i marginalized -> closed form.
S2, T2 = 0.5 ** 2, 2.0 ** 2
Y = np.array([0.3, -0.2, 0.8, 0.1, -0.5])


def _lnlike(thetas):
    thetas = np.atleast_2d(thetas)
    out = np.empty(len(thetas))
    for i, th in enumerate(thetas[:, 0]):
        out[i] = st.norm.logpdf(Y, loc=th, scale=np.sqrt(S2)).sum()
    return out


def _lnprior(thetas):
    thetas = np.atleast_2d(thetas)
    return st.norm.logpdf(thetas[:, 0], 0.0, np.sqrt(T2))


def _true_logz():
    n = len(Y)
    # p(y) = ∫ N(y|θ,s2) N(θ|0,t2) dθ — gaussian integral
    prec_post = n / S2 + 1 / T2
    mean_num = Y.sum() / S2
    logz = (-0.5 * n * np.log(2 * np.pi * S2)
            - 0.5 * np.log(T2 * prec_post)
            - 0.5 * (Y ** 2).sum() / S2
            + 0.5 * mean_num ** 2 / prec_post)
    return logz


@pytest.fixture(scope="module")
def posterior_samples():
    n = len(Y)
    prec = n / S2 + 1 / T2
    mean = (Y.sum() / S2) / prec
    rng = np.random.default_rng(0)
    return rng.normal(mean, 1 / np.sqrt(prec), size=(4000, 1))


def test_perrakis_recovers_conjugate_evidence(posterior_samples):
    logz = ev.compute_perrakis_estimate(
        posterior_samples, _lnlike, _lnprior, nsamples=2000,
        rng=np.random.default_rng(1))
    assert logz == pytest.approx(_true_logz(), abs=0.15)


def test_perrakis_error_estimation(posterior_samples):
    logz, err = ev.compute_perrakis_estimate(
        posterior_samples, _lnlike, _lnprior, nsamples=500,
        errorestimation=True, rng=np.random.default_rng(2))
    assert np.isfinite(logz) and np.isfinite(err)
    assert err < 1.0


def test_harmonic_mean_ballpark(posterior_samples):
    lnlike_post = _lnlike(posterior_samples)
    hme = ev.compute_harmonicmean(lnlike_post, rng=np.random.default_rng(3))
    # HME is biased towards the posterior-averaged likelihood (i.e. high
    # when the prior is much wider than the posterior, Kass & Raftery 1995)
    assert _true_logz() < hme < _true_logz() + 2.0


def test_run_hme_mc(posterior_samples):
    lnlike_post = _lnlike(posterior_samples)
    hmes = ev.run_hme_mc(lnlike_post, nmc=5, samplesize=1000,
                         rng=np.random.default_rng(4))
    assert hmes.shape == (5,)
    assert np.all(np.isfinite(hmes))


def test_cj_recovers_conjugate_evidence(posterior_samples):
    logz = ev.compute_cj_estimate(
        posterior_samples, _lnlike, _lnprior,
        param_post=posterior_samples[:, 0], nsamples=2000,
        rng=np.random.default_rng(5))
    assert logz == pytest.approx(_true_logz(), abs=0.15)


def test_density_methods_agree(posterior_samples):
    x = posterior_samples[:500, 0]
    for method in ("histogram", "kde", "normal"):
        d = ev.estimate_density(x, method=method)
        assert d.shape == x.shape
        assert np.all(d >= 0)


def test_make_marginal_samples_preserves_marginals():
    rng = np.random.default_rng(6)
    joint = rng.multivariate_normal([0, 5], [[1, 0.9], [0.9, 1]], size=2000)
    marg = ev.make_marginal_samples(joint, rng=rng)
    np.testing.assert_allclose(sorted(marg[:, 0]), sorted(joint[:, 0]))
    # correlation destroyed
    assert abs(np.corrcoef(marg.T)[0, 1]) < 0.1


def test_log_sum():
    assert ev.log_sum(np.log([1.0, 2.0, 3.0])) == pytest.approx(np.log(6.0))
    assert ev.log_sum([]) == -np.inf


def test_multivariate_gaussian():
    mv = ev.MultivariateGaussian([0.0, 1.0], np.eye(2))
    x = mv.rvs(10)
    assert x.shape == (10, 2)
    lp = mv.logpdf(np.zeros((3, 2)))
    expect = st.multivariate_normal([0.0, 1.0], np.eye(2)).logpdf(np.zeros(2))
    np.testing.assert_allclose(lp, expect)


def test_metropolis_ratio_raises_on_mismatch():
    with pytest.raises(ValueError):
        ev.metropolis_ratio(np.zeros(3), np.zeros(4))


def test_batch_elbo_smoke(tiny_dataset):
    import gpyrn_tpu as g
    t, y, yerr = tiny_dataset
    gprn = g.inference(1, t, y, yerr)
    gprn.set_components([g.covfunc.Periodic(1.0, 10.0, 0.5)],
                        [g.covfunc.SquaredExponential(1.0, 5.0)],
                        [None], [0.1])
    theta = gprn.get_parameters()
    thetas = np.stack([theta, theta * 1.05, theta * 0.95])
    vals = ev.batch_elbo(gprn, thetas, max_iter=60)
    assert vals.shape == (3,)
    assert np.all(np.isfinite(vals))


def test_multivariate_gaussian_rvs_1d_shape():
    """Regression: 1-D spaces must give (size, 1) draws, not (1, size)."""
    mv = ev.MultivariateGaussian([0.5], [[1.0]])
    x = mv.rvs(100)
    assert x.shape == (100, 1)
    x1 = mv.rvs(1)
    assert x1.shape == (1, 1)


def test_cj_estimate_1d_parameter_space(posterior_samples):
    """CJ with a 1-parameter model exercises the 1-D proposal path."""
    logz = ev.compute_cj_estimate(
        posterior_samples[:1000], _lnlike, _lnprior,
        param_post=posterior_samples[:1000, 0], nsamples=800,
        rng=np.random.default_rng(9))
    assert logz == pytest.approx(_true_logz(), abs=0.2)
