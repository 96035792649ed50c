"""Native vmapped ensemble MCMC (replacing the reference's emcee path,
meanfield.py:1154-1286)."""
import numpy as np
import pytest
import scipy.stats as st

import gpyrn_tpu as g
from gpyrn_tpu.inference.ensemble import EnsembleResult, autocorr_time


@pytest.fixture
def gprn(tiny_dataset):
    t, y, yerr = tiny_dataset
    m = g.inference(1, t, y, yerr)
    m.set_components([g.covfunc.Periodic(1.0, 10.0, 0.5)],
                     [g.covfunc.SquaredExponential(1.0, 5.0)],
                     [None], [0.1])
    m.ELBOcalc()
    return m


@pytest.mark.slow
def test_native_sampler_smoke(gprn, tmp_path):
    priors = {
        'node1.theta': st.lognorm(s=0.5, scale=1.0),
        'node1.P': st.norm(10.0, 1.0),
        'node1.ell': st.lognorm(s=0.5, scale=0.5),
        'weight1.theta': st.lognorm(s=0.5, scale=1.0),
        'weight1.ell': st.lognorm(s=0.5, scale=5.0),
        'jitter1': st.lognorm(s=0.5, scale=0.1),
    }
    ckpt = str(tmp_path / "chain.npz")
    res = gprn.mcmc(priors, niter=12, elbo_max_iter=50, seed=1,
                    checkpoint=ckpt)
    assert res.chain.shape[0] == 12 or res.converged
    assert res.chain.shape[2] == 6
    assert np.all(np.isfinite(res.log_prob[np.isfinite(res.log_prob)]))
    assert 0.0 <= res.acceptance <= 1.0

    loaded = EnsembleResult.load(ckpt)
    assert loaded.chain.shape == res.chain.shape
    np.testing.assert_allclose(loaded.chain, res.chain)


def test_missing_priors_raise(gprn):
    with pytest.raises(ValueError, match='missing priors'):
        gprn.mcmc({'node1.theta': st.norm(1, 1)}, niter=2)


@pytest.mark.slow
def test_mcmc_respects_frozen(gprn):
    priors = {
        'node1.theta': st.lognorm(s=0.3, scale=1.0),
        'weight1.theta': st.lognorm(s=0.3, scale=1.0),
    }
    res = gprn.mcmc(priors, vars=['node1.theta', 'weight1.theta'],
                    niter=5, elbo_max_iter=30, seed=2)
    assert res.chain.shape[2] == 2
    gprn.thaw_all_parameters()


def test_autocorr_time_on_white_noise():
    rng = np.random.default_rng(0)
    chain = rng.standard_normal((400, 8, 2))
    tau = autocorr_time(chain)
    assert tau.shape == (2,)
    assert np.all(tau < 10)


def test_get_chain_accessors():
    chain = np.arange(24, dtype=float).reshape(4, 3, 2)
    lp = np.zeros((4, 3))
    res = EnsembleResult(chain, lp, lp, ['a', 'b'])
    assert res.get_chain(discard=1).shape == (3, 3, 2)
    assert res.get_chain(flat=True).shape == (12, 2)
    assert res.get_log_prob(flat=True).shape == (12,)


@pytest.mark.slow
def test_device_chain_smoke(gprn, tmp_path):
    """On-device scanned segments (traceable priors): shapes, finiteness,
    checkpointing, and acceptance bookkeeping."""
    from gpyrn_tpu.inference import priors as pr
    priors = {
        'node1.theta': pr.LogNormal(0.0, 0.5),
        'node1.P': pr.Normal(10.0, 1.0),
        'node1.ell': pr.LogNormal(np.log(0.5), 0.5),
        'weight1.theta': pr.LogNormal(0.0, 0.5),
        'weight1.ell': pr.LogNormal(np.log(5.0), 0.5),
        'jitter1': pr.LogNormal(np.log(0.1), 0.5),
    }
    ckpt = str(tmp_path / "devchain.npz")
    res = gprn.mcmc(priors, niter=12, elbo_max_iter=30, seed=3,
                    check_every=4, checkpoint=ckpt)
    assert res.chain.shape[0] == 12 or res.converged
    assert res.chain.shape[2] == 6
    finite = np.isfinite(res.log_prob)
    assert finite.any()
    assert 0.0 <= res.acceptance <= 1.0
    loaded = EnsembleResult.load(ckpt)
    assert loaded.chain.shape == res.chain.shape


@pytest.mark.slow
def test_device_and_host_paths_agree_statistically(gprn):
    """Device-scanned and host-loop chains sample the same posterior:
    their post-burn-in means agree within combined MC error on a
    well-identified parameter."""
    from gpyrn_tpu.inference import priors as pr
    gprn._apply_vars_selection(['node1.P'])
    priors = {'node1.P': pr.Normal(10.0, 0.5)}
    p0 = gprn.get_parameters()
    res_d = gprn.mcmc(priors, p0=p0, niter=150, elbo_max_iter=30,
                      seed=5, nwalkers=6)
    res_h = gprn.mcmc(priors, p0=p0, niter=150, elbo_max_iter=30,
                      seed=6, nwalkers=6, device_chain=False)
    gprn.thaw_all_parameters()
    c_d = res_d.get_chain(discard=50, flat=True)[:, 0]
    c_h = res_h.get_chain(discard=50, flat=True)[:, 0]
    s = max(c_d.std(), c_h.std())
    assert abs(c_d.mean() - c_h.mean()) < 0.75 * s


def test_init_walkers_ellipsoid_semantics():
    """p0-ball initialization matches emcee's sample_ellipsoid semantic
    (reference meanfield.py:1239): diag(sigma)/100 is a COVARIANCE, so
    the per-coordinate spread is sqrt(sigma_i/100) — not sigma_i/100."""
    from gpyrn_tpu.inference.ensemble import init_walkers
    names = ['a', 'b']
    priors = {'a': st.norm(5.0, 4.0), 'b': st.norm(-2.0, 0.25)}
    p0 = np.array([5.0, -2.0])
    rng = np.random.default_rng(0)
    x = init_walkers(p0, priors, names, 4000, rng)
    assert x.shape == (4000, 2)
    expect = np.sqrt(np.array([4.0, 0.25]) / 100.0)
    np.testing.assert_allclose(x.std(axis=0), expect, rtol=0.1)
    np.testing.assert_allclose(x.mean(axis=0), p0, atol=4 * expect.max())


def test_init_walkers_support_rejection_and_passthrough():
    from gpyrn_tpu.inference.ensemble import init_walkers
    names = ['s']
    priors = {'s': st.lognorm(s=0.5, scale=1.0)}    # support (0, inf)
    rng = np.random.default_rng(1)
    # p0 barely positive: the ellipsoid (std sqrt(0.5-ish/10)) crosses 0
    # constantly; every returned walker must still be inside support
    x = init_walkers(np.array([1e-4]), priors, names, 200, rng)
    assert np.all(x > 0)
    # 2-D p0 is used verbatim
    explicit = np.array([[1.0], [2.0]])
    out = init_walkers(explicit, priors, names, 2, rng)
    np.testing.assert_array_equal(out, explicit)
    # p0=None draws from the priors
    out = init_walkers(None, priors, names, 300, rng)
    lo, hi = st.lognorm(s=0.5, scale=1.0).ppf([0.001, 0.999])
    assert np.all(out > 0) and lo < np.median(out) < hi
