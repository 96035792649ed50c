"""Statistical cross-validation of the two native samplers.

HMC and the affine-invariant ensemble sample the SAME posterior
(priors × ELBO surrogate); with a well-identified 2-parameter problem
and tight-ish priors their posterior means must agree within combined
Monte-Carlo error.  This is the samplers' correctness oracle — they
share no code beyond the ELBO."""
import numpy as np
import pytest

import gpyrn_tpu as g
from gpyrn_tpu.inference import priors as pr


@pytest.mark.slow
def test_hmc_and_ensemble_agree(tiny_dataset):
    t, y, yerr = tiny_dataset
    gprn = g.inference(1, t, y, yerr)
    gprn.set_components([g.covfunc.Periodic(1.0, 10.0, 0.5)],
                        [g.covfunc.SquaredExponential(1.0, 5.0)],
                        [None], [0.1])
    gprn.ELBOcalc()
    # sample only the two best-identified parameters
    gprn._apply_vars_selection(['node1.P', 'jitter1'])
    priors = {
        'node1.P': pr.Normal(10.0, 0.5),
        'jitter1': pr.LogNormal(np.log(0.1), 0.3),
    }
    p0 = gprn.get_parameters()

    res_e = gprn.mcmc(priors, p0=p0, niter=400, elbo_max_iter=50,
                      seed=1, nwalkers=8)
    chain_e = res_e.get_chain(discard=150, flat=True)

    res_h = gprn.mcmc(priors, p0=p0, sampler='hmc', niter=250,
                      n_warmup=80, n_chains=4, n_leapfrog=5,
                      n_sweeps=10, seed=2)
    chain_h = res_h.get_chain(discard=80, flat=True)

    gprn.thaw_all_parameters()

    for k, name in enumerate(res_h.parameter_names):
        m_e, m_h = chain_e[:, k].mean(), chain_h[:, k].mean()
        s = max(chain_e[:, k].std(), chain_h[:, k].std())
        # agree within half a posterior standard deviation
        assert abs(m_e - m_h) < 0.5 * s + 1e-3, \
            f"{name}: ensemble {m_e:.4f} vs hmc {m_h:.4f} (sd {s:.4f})"
    assert res_h.acceptance > 0.4
