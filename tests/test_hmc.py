"""HMC sampler + differentiable prior tests."""
import numpy as np
import pytest
import scipy.stats as st

import gpyrn_tpu as g
from gpyrn_tpu.inference import priors as pr
from gpyrn_tpu.inference.hmc import run_hmc


def test_prior_logpdfs_match_scipy():
    x = np.array([0.3, 1.0, 2.5])
    np.testing.assert_allclose(pr.Normal(1.0, 2.0).logpdf(x),
                               st.norm(1.0, 2.0).logpdf(x), rtol=1e-6)
    np.testing.assert_allclose(
        pr.LogNormal(0.5, 0.8).logpdf(x),
        st.lognorm(s=0.8, scale=np.exp(0.5)).logpdf(x), rtol=1e-6)
    np.testing.assert_allclose(pr.Uniform(0.0, 3.0).logpdf(x),
                               st.uniform(0, 3).logpdf(x), rtol=1e-6)
    np.testing.assert_allclose(pr.Gamma(2.0, 1.5).logpdf(x),
                               st.gamma(2.0, scale=1.5).logpdf(x),
                               rtol=1e-6)
    np.testing.assert_allclose(pr.InvGamma(2.0, 1.5).logpdf(x),
                               st.invgamma(2.0, scale=1.5).logpdf(x),
                               rtol=1e-6)
    np.testing.assert_allclose(pr.HalfNormal(2.0).logpdf(x),
                               st.halfnorm(scale=2.0).logpdf(x), rtol=1e-6)


def test_prior_support_boundaries():
    assert pr.LogNormal(0, 1).logpdf(-1.0) == -np.inf
    assert pr.Uniform(0, 1).logpdf(2.0) == -np.inf
    assert pr.Jeffreys(0.1, 10).logpdf(0.01) == -np.inf
    assert np.isfinite(pr.Jeffreys(0.1, 10).logpdf(1.0))


def test_prior_rvs_within_support():
    rng = np.random.default_rng(0)
    for p in (pr.LogNormal(0, 1), pr.Gamma(2, 1), pr.InvGamma(2, 1),
              pr.HalfNormal(1.0), pr.Jeffreys(0.1, 10)):
        s = p.rvs(size=100, rng=rng)
        assert np.all(s > 0)
    assert np.isfinite(pr.Normal(0, 1).std())


@pytest.mark.slow
def test_hmc_smoke(tiny_dataset):
    t, y, yerr = tiny_dataset
    gprn = g.inference(1, t, y, yerr)
    gprn.set_components([g.covfunc.Periodic(1.0, 10.0, 0.5)],
                        [g.covfunc.SquaredExponential(1.0, 5.0)],
                        [None], [0.1])
    gprn.ELBOcalc()
    priors = {
        'node1.theta': pr.LogNormal(0.0, 0.5),
        'node1.P': pr.Normal(10.0, 1.0),
        'node1.ell': pr.LogNormal(np.log(0.5), 0.5),
        'weight1.theta': pr.LogNormal(0.0, 0.5),
        'weight1.ell': pr.LogNormal(np.log(5.0), 0.5),
        'jitter1': pr.LogNormal(np.log(0.1), 0.5),
    }
    res = run_hmc(gprn, priors, n_samples=10, n_warmup=5, n_chains=2,
                  n_leapfrog=3, n_sweeps=8,
                  p0=gprn.get_parameters(), seed=0)
    assert res.chain.shape == (10, 2, 6)
    assert np.all(res.chain > 0)
    assert np.all(np.isfinite(res.log_prob))
    assert 0.0 <= res.acceptance <= 1.0
    flat = res.get_chain(flat=True)
    assert flat.shape == (20, 6)


def test_hmc_missing_prior_raises(tiny_dataset):
    t, y, yerr = tiny_dataset
    gprn = g.inference(1, t, y, yerr)
    gprn.set_components([g.covfunc.Periodic(1.0, 10.0, 0.5)],
                        [g.covfunc.SquaredExponential(1.0, 5.0)],
                        [None], [0.1])
    with pytest.raises(ValueError, match='missing priors'):
        run_hmc(gprn, {'node1.theta': pr.Normal(1, 1)}, n_samples=1)


@pytest.mark.slow
def test_hmc_multi_node_smoke(multi_dataset):
    """HMC over a q=2, p=3 model (the flagship shape)."""
    t, *data = multi_dataset
    gprn = g.inference(2, t, *data)
    gprn.set_components(
        [g.covfunc.Periodic(1.2, 9.0, 0.6), g.covfunc.Matern52(1.1, 4.0)],
        [g.covfunc.SquaredExponential(1.0 + 0.1 * k, 5.0)
         for k in range(6)],
        [None] * 3, [0.1] * 3)
    gprn.ELBOcalc(max_iter=100)
    # sample just the periods/jitters to keep the smoke fast
    gprn._apply_vars_selection(['node1.P', 'jitter1'])
    priors = {'node1.P': pr.Normal(9.0, 0.5),
              'jitter1': pr.LogNormal(np.log(0.1), 0.3)}
    res = run_hmc(gprn, priors, n_samples=6, n_warmup=3, n_chains=2,
                  n_leapfrog=3, n_sweeps=6, p0=gprn.get_parameters(),
                  seed=3)
    gprn.thaw_all_parameters()
    assert res.chain.shape == (6, 2, 2)
    assert np.all(np.isfinite(res.log_prob))


@pytest.mark.slow
def test_nuts_smoke(tiny_dataset):
    t, y, yerr = tiny_dataset
    gprn = g.inference(1, t, y, yerr)
    gprn.set_components([g.covfunc.Periodic(1.0, 10.0, 0.5)],
                        [g.covfunc.SquaredExponential(1.0, 5.0)],
                        [None], [0.1])
    gprn.ELBOcalc()
    priors = {
        'node1.theta': pr.LogNormal(0.0, 0.5),
        'node1.P': pr.Normal(10.0, 1.0),
        'node1.ell': pr.LogNormal(np.log(0.5), 0.5),
        'weight1.theta': pr.LogNormal(0.0, 0.5),
        'weight1.ell': pr.LogNormal(np.log(5.0), 0.5),
        'jitter1': pr.LogNormal(np.log(0.1), 0.5),
    }
    res = run_hmc(gprn, priors, n_samples=8, n_warmup=6, n_chains=2,
                  n_sweeps=8, algorithm='nuts', max_depth=4,
                  p0=gprn.get_parameters(), seed=0)
    assert res.chain.shape == (8, 2, 6)
    assert np.all(res.chain > 0)
    assert np.all(np.isfinite(res.log_prob))
    assert 0.0 <= res.acceptance <= 1.0


@pytest.mark.slow
def test_nuts_agrees_with_hmc_posterior(tiny_dataset):
    """NUTS and HMC sample the same posterior on a well-identified
    1-parameter problem: posterior means within combined MC error."""
    t, y, yerr = tiny_dataset
    gprn = g.inference(1, t, y, yerr)
    gprn.set_components([g.covfunc.Periodic(1.0, 10.0, 0.5)],
                        [g.covfunc.SquaredExponential(1.0, 5.0)],
                        [None], [0.1])
    gprn.ELBOcalc()
    gprn._apply_vars_selection(['node1.P'])
    priors = {'node1.P': pr.Normal(10.0, 0.5)}
    p0 = gprn.get_parameters()
    res_h = run_hmc(gprn, priors, n_samples=120, n_warmup=40,
                    n_chains=3, n_leapfrog=5, n_sweeps=8, p0=p0, seed=1)
    res_n = run_hmc(gprn, priors, n_samples=120, n_warmup=40,
                    n_chains=3, n_sweeps=8, algorithm='nuts',
                    max_depth=5, p0=p0, seed=2)
    gprn.thaw_all_parameters()
    c_h = res_h.get_chain(discard=40, flat=True)[:, 0]
    c_n = res_n.get_chain(discard=40, flat=True)[:, 0]
    s = max(c_h.std(), c_n.std())
    assert abs(c_h.mean() - c_n.mean()) < 0.75 * s
    # posterior WIDTHS must agree too — a frozen chain has ~zero std
    # and once slipped past a mean-only check (the logw carry bug)
    assert 0.2 * c_h.std() < c_n.std() < 5.0 * c_h.std()


@pytest.mark.slow
def test_dense_mass_matrix_smoke(tiny_dataset):
    """mass_matrix='dense' adapts a full covariance from warmup and
    samples with it (r = C^-T xi momentum draws, M^-1 = cov matvecs in
    leapfrog/kinetic/U-turn): chains stay finite and positive, for both
    HMC and NUTS."""
    t, y, yerr = tiny_dataset
    gprn = g.inference(1, t, y, yerr)
    gprn.set_components([g.covfunc.Periodic(1.0, 10.0, 0.5)],
                        [g.covfunc.SquaredExponential(1.0, 5.0)],
                        [None], [0.1])
    gprn.ELBOcalc()
    priors = {
        'node1.theta': pr.LogNormal(0.0, 0.5),
        'node1.P': pr.Normal(10.0, 1.0),
        'node1.ell': pr.LogNormal(np.log(0.5), 0.5),
        'weight1.theta': pr.LogNormal(0.0, 0.5),
        'weight1.ell': pr.LogNormal(np.log(5.0), 0.5),
        'jitter1': pr.LogNormal(np.log(0.1), 0.5),
    }
    # n_warmup=60 -> phase 1 = 30 steps, second half 15 x 2 chains = 30
    # rows < 50: bump chains to 4 so the dense estimate actually runs
    res = run_hmc(gprn, priors, n_samples=6, n_warmup=60, n_chains=4,
                  n_leapfrog=3, n_sweeps=6, mass_matrix='dense',
                  p0=gprn.get_parameters(), seed=1)
    assert res.chain.shape == (6, 4, 6)
    assert np.all(res.chain > 0)
    assert np.all(np.isfinite(res.log_prob))
    res_n = run_hmc(gprn, priors, n_samples=4, n_warmup=60, n_chains=4,
                    n_sweeps=6, algorithm='nuts', max_depth=3,
                    mass_matrix='dense', p0=gprn.get_parameters(),
                    seed=2)
    assert np.all(np.isfinite(res_n.log_prob))
    assert np.all(res_n.chain > 0)


@pytest.mark.slow
def test_nonpositive_p0_folded_into_support(tiny_dataset):
    """log-space init with a nonpositive p0 entry must not NaN.

    An optimizer can park a sign-symmetric parameter (a jitter enters
    the model squared) at a negative value; before the fold, log(th0)
    made that chain's state NaN and the invalid-state acceptance guard
    pinned it there for the whole run.  |theta| is the identical model
    state, so folding is exact, and exact zeros get a positive floor."""
    t, y, yerr = tiny_dataset
    gprn = g.inference(1, t, y, yerr)
    gprn.set_components([g.covfunc.Periodic(1.0, 10.0, 0.5)],
                        [g.covfunc.SquaredExponential(1.0, 5.0)],
                        [None], [0.1])
    gprn.ELBOcalc()
    priors = {
        'node1.theta': pr.LogNormal(0.0, 0.5),
        'node1.P': pr.Normal(10.0, 1.0),
        'node1.ell': pr.LogNormal(np.log(0.5), 0.5),
        'weight1.theta': pr.LogNormal(0.0, 0.5),
        'weight1.ell': pr.LogNormal(np.log(5.0), 0.5),
        'jitter1': pr.LogNormal(np.log(0.1), 0.5),
    }
    p0 = np.asarray(gprn.get_parameters(), dtype=float)
    p0[-1] = -abs(p0[-1])    # negative jitter: same model, bad for log
    p0[2] = 0.0              # exact zero: needs the floor
    with np.errstate(invalid="raise"):     # np.log(<=0) would raise
        with pytest.warns(RuntimeWarning, match="jitter1"):
            res = run_hmc(gprn, priors, n_samples=4, n_warmup=4,
                          n_chains=2, n_leapfrog=3, n_sweeps=6, p0=p0,
                          seed=0)
    assert np.all(res.chain > 0)
    assert np.all(np.isfinite(res.log_prob))
