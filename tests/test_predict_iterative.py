"""Matrix-free CG prediction (models/iterative.py) vs the dense engine."""
import numpy as np
import pytest

import gpyrn_tpu as g
from gpyrn_tpu.models.iterative import predict_iterative


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.default_rng(4)
    N = 60
    t = np.sort(rng.uniform(0, 60, N))
    data = []
    for i in range(2):
        data += [np.sin(2 * np.pi * t / (12 + 4 * i))
                 + 0.1 * rng.standard_normal(N), np.full(N, 0.1)]
    m = g.inference(2, t, *data)
    m.set_components(
        [g.covfunc.Periodic(1.0, 12.0, 0.7), g.covfunc.Matern52(1.0, 8.0)],
        [g.covfunc.SquaredExponential(1.0 + 0.1 * k, 10.0)
         for k in range(4)],
        [g.meanfunc.Constant(0.05), None], [0.1, 0.12])
    m.ELBOcalc()
    return m


@pytest.mark.slow
def test_matches_dense_predict(fitted):
    m = fitted
    tstar = np.linspace(-5, 65, 80)
    ts_d, mean_d, std_d, (n_d, w_d) = m.predict(tstar=tstar)
    ts_i, mean_i, std_i, (n_i, w_i) = predict_iterative(
        m, tstar=tstar, tol=1e-11, rhs_chunk=32)
    scale = np.max(np.abs(mean_d)) + 1.0
    np.testing.assert_allclose(mean_i, np.asarray(mean_d),
                               atol=1e-5 * scale)
    np.testing.assert_allclose(std_i, np.asarray(std_d),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(n_i), np.asarray(n_d),
                               atol=1e-5)


def test_mean_only_fast_path(fitted):
    m = fitted
    ts, mean, std, _ = predict_iterative(m, tstar=np.linspace(0, 60, 25),
                                         variances=False)
    assert mean.shape == (25, 2)
    assert np.allclose(std[:, 0] ** 2,
                       m.q * np.asarray(m.jitters)[0] ** 2)
