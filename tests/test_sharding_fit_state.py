"""Lattice-sharded fit_state correctness on the virtual CPU mesh."""
import numpy as np
import jax
import pytest

import gpyrn_tpu as g
from gpyrn_tpu.parallel import LAT_AXIS, make_mesh, use_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs multiple devices")


def _problem(N=16, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 30, N))
    data = []
    for i in range(2):
        data += [np.sin(2 * np.pi * t / (8 + 3 * i))
                 + 0.1 * rng.standard_normal(N), np.full(N, 0.1)]
    gprn = g.inference(2, t, *data)
    gprn.set_components(
        [g.covfunc.Periodic(1.0, 8.0, 0.6), g.covfunc.Matern52(1.0, 4.0)],
        [g.covfunc.SquaredExponential(1.0 + 0.1 * k, 5.0)
         for k in range(4)],
        [None] * 2, [0.1] * 2)
    return gprn


@pytest.mark.slow
def test_fit_state_lat_sharded_matches_unsharded():
    ref = _problem()
    eng = ref.engine
    theta = ref._theta()
    t = np.asarray(ref.time, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, ref.y)
    mu_u, var_u, it_u, conv_u = eng.fit_state(theta, t, ref.y, ref.yerr2,
                                              mu0, var0, 200, 1e-8)

    sh = _problem()
    sh.lattice_axis = LAT_AXIS
    eng_s = sh.engine
    mesh = make_mesh(shape=(len(jax.devices()) // 2, 2))
    with use_mesh(mesh):
        mu_s, var_s, it_s, conv_s = eng_s.fit_state(
            theta, t, sh.y, sh.yerr2, mu0, var0, 200, 1e-8)
    assert int(it_u) == int(it_s)
    np.testing.assert_allclose(np.asarray(mu_u), np.asarray(mu_s),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(var_u), np.asarray(var_s),
                               atol=1e-10)
