"""Example 4 — MCMC over hyperparameters + evidence estimation.

Counterpart of reference example_4.py (emcee + multiprocessing.Pool):
here the native vmapped ensemble sampler batches every walker's ELBO fit
into one device call, and the chain feeds the Perrakis evidence
estimator.
"""
import numpy as np
import scipy.stats as st

from gpyrn_tpu import inference, covfunc
from gpyrn_tpu.inference import evidence as ev

rng = np.random.default_rng(2)
N = 30
time = np.sort(rng.uniform(0, 60, N))
y = 4 * np.sin(2 * np.pi * time / 17) + 0.3 * rng.standard_normal(N)
yerr = np.full(N, 0.3)

gprn = inference(1, time, y, yerr)
gprn.set_components(covfunc.Periodic(4.0, 17.0, 0.7),
                    covfunc.SquaredExponential(1.0, 40.0),
                    None, 0.3)
gprn.ELBOcalc()

priors = {
    'node1.theta': st.lognorm(s=0.5, scale=4.0),
    'node1.P': st.norm(17.0, 1.0),
    'node1.ell': st.lognorm(s=0.5, scale=0.7),
    'weight1.theta': st.lognorm(s=0.5, scale=1.0),
    'weight1.ell': st.lognorm(s=0.5, scale=40.0),
    'jitter1': st.lognorm(s=0.5, scale=0.3),
}

result = gprn.mcmc(priors, niter=200, elbo_max_iter=60, seed=0,
                   checkpoint='gprn_chain.npz', progress=True)
print('converged:', result.converged, ' acceptance:', result.acceptance)

chain = result.get_chain(discard=result.iteration // 4, flat=True)
names = list(result.parameter_names)
for k, name in enumerate(names):
    print(f'{name:16s} = {chain[:, k].mean():.3f} +- {chain[:, k].std():.3f}')

# Bayesian evidence from the posterior samples (ELBO surrogate likelihood)
def lnlike(thetas):
    return ev.batch_elbo(gprn, thetas, max_iter=60)

def lnprior(thetas):
    thetas = np.atleast_2d(thetas)
    return sum(priors[n].logpdf(thetas[:, k]) for k, n in enumerate(names))

logz = ev.compute_perrakis_estimate(chain[-500:], lnlike, lnprior,
                                    nsamples=300)
print('Perrakis log-evidence:', logz)
