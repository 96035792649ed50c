"""Mean-function library tests (generalizing reference
tests/test_mean_functions.py)."""
import numpy as np
import pytest

from gpyrn_tpu import meanfunc
from .refutil import import_reference


@pytest.fixture(scope="module")
def t():
    return np.linspace(0, 10, 30)


def test_constant(t):
    np.testing.assert_allclose(meanfunc.Constant(2.5)(t), np.full(30, 2.5))


def test_constant_requires_arg():
    with pytest.raises(TypeError):
        meanfunc.Constant()


def test_linear(t):
    m = meanfunc.Linear(2.0, 1.0)
    np.testing.assert_allclose(m(t), 2.0 * (t - t.mean()) + 1.0)


def test_parabola(t):
    m = meanfunc.Parabola(1.0, 2.0, 3.0)
    np.testing.assert_allclose(m(t), np.polyval([1.0, 2.0, 3.0], t))


def test_cubic(t):
    m = meanfunc.Cubic(1.0, 2.0, 3.0, 4.0)
    np.testing.assert_allclose(m(t), np.polyval([1.0, 2.0, 3.0, 4.0], t))


def test_sine(t):
    m = meanfunc.Sine(2.0, 5.0, 0.3)
    np.testing.assert_allclose(m(t), 2.0 * np.sin(2 * np.pi * t / 5.0 + 0.3))


def test_sum_and_product(t):
    c1, c2 = meanfunc.Constant(2.0), meanfunc.Constant(3.0)
    np.testing.assert_allclose((c1 + c2)(t), np.full(30, 5.0))
    np.testing.assert_allclose((c1 * c2)(t), np.full(30, 6.0))


def test_sum_set_parameters_propagates(t):
    m = meanfunc.Constant(1.0) + meanfunc.Linear(1.0, 0.0)
    m.set_parameters(np.array([2.0, 3.0, 4.0]))
    np.testing.assert_allclose(m(t), 2.0 + 3.0 * (t - t.mean()) + 4.0)


def test_parity_with_reference(t):
    _, rmn, _ = import_reference()
    pairs = [
        (meanfunc.Constant(2.5), rmn.Constant(2.5)),
        (meanfunc.Linear(2.0, 1.0), rmn.Linear(2.0, 1.0)),
        (meanfunc.Parabola(1.0, 2.0, 3.0), rmn.Parabola(1.0, 2.0, 3.0)),
        (meanfunc.Cubic(1.0, 2.0, 3.0, 4.0), rmn.Cubic(1.0, 2.0, 3.0, 4.0)),
        (meanfunc.Sine(2.0, 5.0, 0.3), rmn.Sine(2.0, 5.0, 0.3)),
    ]
    for ours, ref in pairs:
        np.testing.assert_allclose(ours(t), ref(t), rtol=1e-12)


def test_multiconstant_offsets():
    time = np.array([0.0, 1.0, 2.0, 10.0, 11.0, 20.0])
    obsid = np.array([1, 1, 1, 2, 2, 3])
    m = meanfunc.MultiConstant([0.5, -0.3, 7.0], obsid, time)
    vals = m(time)
    np.testing.assert_allclose(vals, [7.5, 7.5, 7.5, 6.7, 6.7, 7.0])


def test_multiconstant_parity_with_reference():
    _, rmn, _ = import_reference()
    time = np.array([0.0, 1.0, 2.0, 10.0, 11.0, 20.0])
    obsid = np.array([1, 1, 1, 2, 2, 3])
    ours = meanfunc.MultiConstant([0.5, -0.3, 7.0], obsid, time)
    ref = rmn.MultiConstant([0.5, -0.3, 7.0], obsid, time)
    np.testing.assert_allclose(ours(time), ref(time), rtol=1e-12)
    # prediction-time binning on unseen times
    tnew = np.array([0.5, 10.5, 19.0])
    np.testing.assert_allclose(ours(tnew), ref(tnew), rtol=1e-12)


def test_keplerian_mean_reasonable(t):
    m = meanfunc.Keplerian(5.0, 10.0, 0.2, 0.5, 1.0)
    v = m(t)
    assert np.all(np.isfinite(v))
    assert v.max() <= 10.0 * (1 + 0.2) + 1e-6


def test_prefix_consuming_set_parameters():
    m = meanfunc.Linear(1.0, 2.0)
    rest = m.set_parameters(np.array([5.0, 6.0, 7.0]))
    np.testing.assert_allclose(m.pars, [5.0, 6.0])
    np.testing.assert_allclose(rest, [7.0])
