"""Coverage for the large-N column-chunked linalg branches: force the
chunked wide-solves / einsum-trace paths at small N via the test hook
and verify they reproduce the default paths exactly."""
import numpy as np
import pytest

import gpyrn_tpu as g
from gpyrn_tpu.models import gprn as core


@pytest.fixture
def gprn(tiny_dataset):
    t, y, yerr = tiny_dataset
    m = g.inference(1, t, y, yerr)
    m.set_components([g.covfunc.Periodic(1.0, 10.0, 0.5)],
                     [g.covfunc.SquaredExponential(1.0, 5.0)],
                     [None], [0.1])
    return m


def _run_all(gprn):
    eng = gprn.engine
    t = np.asarray(gprn.time, dtype=float)
    theta = gprn._theta()
    mu0, var0 = eng.init_mu_var(theta, gprn.y)
    e, mu, var, it, conv, _ = eng.elbo_fit(theta, t, gprn.y, gprn.yerr2,
                                           mu0, var0, 60)
    mu_s, var_s, it_s, _ = eng.fit_state(theta, t, gprn.y, gprn.yerr2,
                                         mu0, var0, 60, 1e-9)
    return (float(e), np.asarray(mu), int(it),
            np.asarray(mu_s), np.asarray(var_s))


def test_chunked_branches_match_default(gprn, tiny_dataset):
    e0, mu0_, it0, mus0, vars0 = _run_all(gprn)

    core._CHUNK_OVERRIDE = 8       # N=25 → 4 chunks, padded last chunk
    core.make_engine.cache_clear()
    try:
        t, y, yerr = tiny_dataset
        gprn2 = g.inference(1, t, y, yerr)
        gprn2.set_components([g.covfunc.Periodic(1.0, 10.0, 0.5)],
                             [g.covfunc.SquaredExponential(1.0, 5.0)],
                             [None], [0.1])
        e1, mu1, it1, mus1, vars1 = _run_all(gprn2)
    finally:
        core._CHUNK_OVERRIDE = None
        core.make_engine.cache_clear()

    assert it0 == it1
    np.testing.assert_allclose(e0, e1, rtol=1e-10)
    np.testing.assert_allclose(mu0_, mu1, atol=1e-10)
    np.testing.assert_allclose(mus0, mus1, atol=1e-10)
    np.testing.assert_allclose(vars0, vars1, atol=1e-10)
