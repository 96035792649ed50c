"""dp-axis sharding of the samplers (round-2 verdict weak #7).

The ensemble sampler's walker population shards over the mesh's ``dp``
axis; the chain must be identical to the unsharded run (same device RNG
stream — sharding only changes data layout)."""
import numpy as np
import jax
import pytest

import gpyrn_tpu as g
from gpyrn_tpu.inference import priors as pr
from gpyrn_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs multiple devices")


@pytest.fixture(scope="module")
def gprn():
    rng = np.random.default_rng(2)
    N = 16
    t = np.sort(rng.uniform(0, 30, N))
    y = np.sin(2 * np.pi * t / 9) + 0.1 * rng.standard_normal(N)
    m = g.inference(1, t, y, np.full(N, 0.1))
    m.set_components([g.covfunc.Periodic(1.0, 9.0, 0.6)],
                     [g.covfunc.SquaredExponential(1.0, 5.0)],
                     [None], [0.1])
    return m


def _priors():
    return {'node1.P': pr.Normal(9.0, 0.5),
            'node1.theta': pr.LogNormal(0.0, 0.3)}


@pytest.mark.slow
def test_dp_sharded_ensemble_matches_unsharded(gprn):
    n_dev = len(jax.devices())
    priors = _priors()
    p0 = np.array([9.0, 1.0])
    # walker count = a multiple of the dp size so sharding engages
    kw = dict(p0=p0, vars=['node1.P', 'node1.theta'], niter=8,
              elbo_max_iter=30, seed=5, check_every=4,
              nwalkers=2 * n_dev)
    res_ref = gprn.mcmc(priors, **kw)
    mesh = make_mesh()          # all devices on dp
    res_dp = gprn.mcmc(priors, mesh=mesh, **kw)
    np.testing.assert_allclose(res_dp.chain, res_ref.chain,
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(res_dp.log_prob, res_ref.log_prob,
                               rtol=1e-6, atol=1e-6)


def test_mesh_with_host_loop_raises(gprn):
    from gpyrn_tpu.inference.ensemble import run_ensemble
    mesh = make_mesh()
    with pytest.raises(ValueError, match="device chain"):
        run_ensemble(gprn, _priors(), list(_priors()),
                     p0=np.array([9.0, 1.0]), niter=4,
                     device_chain=False, mesh=mesh)


@pytest.mark.slow
def test_uneven_walkers_fall_back(gprn):
    """Walker counts not divisible by dp stay replicated but still run."""
    n_dev = len(jax.devices())
    res = gprn.mcmc(_priors(), p0=np.array([9.0, 1.0]),
                    vars=['node1.P', 'node1.theta'], niter=4,
                    elbo_max_iter=20, seed=1, check_every=4,
                    nwalkers=2 * n_dev + 2, mesh=make_mesh())
    assert np.isfinite(res.log_prob).any()
