"""Posterior-predictive parity with the reference (_Prediction /
predict; reference meanfield.py:1289-1400, _gp.py:107-138)."""
import numpy as np
import pytest

import gpyrn_tpu as g
from .refutil import import_reference


@pytest.fixture(scope="module")
def fitted_pair():
    rc, rmn, rm = import_reference()
    rng = np.random.default_rng(11)
    N = 20
    t = np.sort(rng.uniform(0, 30, N))
    y1 = np.sin(2 * np.pi * t / 9) + 0.1 * rng.standard_normal(N)
    y2 = 0.7 * np.cos(2 * np.pi * t / 9) + 0.1 * rng.standard_normal(N)
    e = np.full(N, 0.1)

    ours = g.inference(1, t, y1, e, y2, e)
    ours.set_components([g.covfunc.Periodic(1.0, 9.0, 0.7)],
                        [g.covfunc.SquaredExponential(1.0, 6.0),
                         g.covfunc.SquaredExponential(0.8, 7.0)],
                        [None, None], [0.1, 0.1])
    ref = rm.inference(1, t, y1, e, y2, e)
    rn = [rc.Periodic(1.0, 9.0, 0.7)]
    rw = [rc.SquaredExponential(1.0, 6.0), rc.SquaredExponential(0.8, 7.0)]
    rmns = [None, None]
    rj = [0.1, 0.1]
    ref.set_components(rn, rw, rmns, rj)

    e1, mu1, var1, _ = ours.ELBOcalc(max_iter=300)
    e2, mu2, var2, _ = ref.ELBOcalc(rn, rw, rmns, rj, max_iter=300)
    np.testing.assert_allclose(e1, e2, rtol=1e-8)
    return ours, ref


def test_prediction_parity_at_data(fitted_pair):
    ours, ref = fitted_pair
    m1, v1 = ours._Prediction(tstar=ours.time)
    m2, v2 = ref._Prediction(tstar=ref.time)
    np.testing.assert_allclose(m1, np.asarray(m2), atol=1e-7)
    np.testing.assert_allclose(v1, np.asarray(v2), atol=1e-7)


def test_prediction_parity_new_times(fitted_pair):
    ours, ref = fitted_pair
    tstar = np.linspace(-2.0, 33.0, 37)
    m1, v1, sep1 = ours._Prediction(tstar=tstar, separate=True)
    m2, v2, sep2 = ref._Prediction(tstar=tstar, separate=True)
    np.testing.assert_allclose(m1, np.asarray(m2), atol=1e-7)
    np.testing.assert_allclose(v1, np.asarray(v2), atol=1e-7)
    np.testing.assert_allclose(np.asarray(sep1[0], dtype=float),
                               np.asarray(sep2[0], dtype=float), atol=1e-7)


def test_predict_api(fitted_pair):
    ours, _ = fitted_pair
    tstar, mean, std, sep = ours.predict(nn=50)
    assert tstar.shape == (50,)
    assert mean.shape == (50, ours.p)
    assert std.shape == (50, ours.p)
    assert np.all(std > 0)


def test_sample_shapes(fitted_pair):
    ours, _ = fitted_pair
    nodes, weights = ours.sample(rng=np.random.default_rng(0))
    assert nodes.shape == (1, ours.N)
    assert weights.shape == (2, ours.N)
    assert np.all(np.isfinite(nodes)) and np.all(np.isfinite(weights))


def test_prediction_parity_with_means():
    """Prediction combine includes the mean functions (m_star term)."""
    rc, rmn, rm = import_reference()
    rng = np.random.default_rng(21)
    N = 18
    t = np.sort(rng.uniform(0, 30, N))
    y1 = 1.5 + 0.02 * t + np.sin(2 * np.pi * t / 9) \
        + 0.1 * rng.standard_normal(N)
    e = np.full(N, 0.1)

    ours = g.inference(1, t, y1, e)
    ours.set_components([g.covfunc.Periodic(1.0, 9.0, 0.7)],
                        [g.covfunc.SquaredExponential(1.0, 6.0)],
                        [g.meanfunc.Linear(0.02, 1.8)], [0.1])
    ref = rm.inference(1, t, y1, e)
    rn = [rc.Periodic(1.0, 9.0, 0.7)]
    rw = [rc.SquaredExponential(1.0, 6.0)]
    rmean = [rmn.Linear(0.02, 1.8)]
    ref.set_components(rn, rw, rmean, [0.1])

    e1, *_ = ours.ELBOcalc(max_iter=200)
    e2, *_ = ref.ELBOcalc(rn, rw, rmean, [0.1], max_iter=200)
    np.testing.assert_allclose(e1, e2, rtol=1e-8)

    tstar = np.linspace(-1.0, 31.0, 23)
    m1, v1 = ours._Prediction(tstar=tstar)
    m2, v2 = ref._Prediction(tstar=tstar)
    np.testing.assert_allclose(m1, np.asarray(m2), atol=1e-7)
    np.testing.assert_allclose(v1, np.asarray(v2), atol=1e-7)


def test_predict_default_tstar_padding(fitted_pair):
    """Default prediction grid spans the data ±20% of its extent
    (reference meanfield.py:1381-1400)."""
    ours, _ = fitted_pair
    t = np.asarray(ours.time)
    tstar, *_ = ours.predict(nn=77)
    ptp = np.ptp(t)
    assert tstar.shape == (77,)
    assert tstar[0] == pytest.approx(t.min() - 0.2 * ptp)
    assert tstar[-1] == pytest.approx(t.max() + 0.2 * ptp)
