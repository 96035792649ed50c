"""Example 8 — production serving of a fitted GPRN.

The reference package has no deployment story: prediction re-runs its
numpy loops inside the full research environment.  Here the fitted
posterior predictive becomes a self-contained artifact
(``gpyrn_tpu.serving``, built on ``jax.export``):

1. fit on the training box,
2. ``export_predict`` → serialized StableHLO with the training inputs
   and variational state baked in (symbolic request size: one artifact
   answers any number of prediction points),
3. the serving box replays it with jax alone — no gpyrn_tpu install,
   no kernel registry, no model object.
"""
import numpy as np

from gpyrn_tpu import inference, covfunc, meanfunc, serving

rng = np.random.default_rng(8)
N = 50
time = np.sort(rng.uniform(0, 80, N))
y = 1.8 * np.sin(2 * np.pi * time / 17) + 0.2 * rng.standard_normal(N)
yerr = np.full(N, 0.2)

gprn = inference(1, time, y, yerr)
gprn.set_components(covfunc.Periodic(1.5, 17.0, 0.6),
                    covfunc.SquaredExponential(1.0, 40.0),
                    meanfunc.Constant(0.0), 0.2)

# -- 1. fit --------------------------------------------------------------
elbo, mu, var, it = gprn.ELBOcalc(max_iter=500)
print(f"fit: ELBO = {elbo:.4f} in {it} iterations")

# -- 2. export the fitted predictive -------------------------------------
nbytes = gprn.export_predict("gprn_predict.bin")
print(f"artifact: {nbytes} bytes on disk")

# -- 3. 'serving box': only jax + the artifact ---------------------------
serve = serving.load_predict("gprn_predict.bin")
for n_req in (25, 400):                 # one artifact, any request size
    tstar = np.linspace(-5.0, 85.0, n_req)
    mean, varr = serve(tstar)[:2]
    print(f"served {n_req:4d} points: mean range "
          f"[{mean.min():+.3f}, {mean.max():+.3f}], "
          f"max std {np.sqrt(varr).max():.3f}")

# the served program IS the research-path predict, bit-for-bit
tstar = np.linspace(0.0, 80.0, 60)
mean_serve = serve(tstar)[0]
mean_research, _ = gprn._Prediction(tstar=tstar)
dev = np.max(np.abs(mean_serve - mean_research))
print(f"served vs in-process predict: max |dev| = {dev:.3e}")
assert dev < 1e-10
