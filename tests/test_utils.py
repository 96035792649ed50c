"""Astronomy/statistics utility tests (reference gpyrn/_utils.py)."""
import numpy as np
import pytest

from gpyrn_tpu.utils import astro


def test_semi_amplitude_scalar():
    K = astro.semi_amplitude(1.0, 1.0, 1.0, 0.0)
    assert K == pytest.approx(28.435)


def test_keplerian_circular_is_sinusoid():
    t = np.linspace(0, 10, 200)
    _, rv = astro.keplerian(P=5.0, K=3.0, e=0.0, w=np.pi, T=0.0, t=t)
    # circular orbit: rv = K cos(w + nu) = -K cos(2π(t-T)/P) for w=π
    expect = 3.0 * (np.cos(np.pi + 2 * np.pi * t / 5.0))
    np.testing.assert_allclose(rv, expect, atol=1e-8)


def test_keplerian_eccentric_bounds():
    t = np.linspace(0, 20, 500)
    _, rv = astro.keplerian(P=7.0, K=2.0, e=0.6, w=0.3, T=1.0, t=t)
    assert np.all(np.isfinite(rv))
    assert rv.max() <= 2.0 * (1 + 0.6) + 1e-9


def test_phase_folding_sorted():
    t = np.array([0.0, 1.0, 2.5, 4.0, 5.5])
    y = np.arange(5.0)
    phase, fy, fe = astro.phase_folding(t, y, None, period=2.0)
    assert np.all(np.diff(phase) >= 0)
    assert len(phase) == 5


def test_trunc_cauchy_within_bounds():
    rng = np.random.default_rng(0)
    s = astro.truncCauchy_rvs(loc=0, scale=1, a=-2, b=3, size=500, rng=rng)
    assert np.all(s >= -2) and np.all(s <= 3)


def test_invgamma_mass():
    d = astro.invGamma(1.0, 10.0)
    inside = d.cdf(10.0) - d.cdf(1.0)
    assert inside > 0.95


def test_log_sum():
    x = np.log(np.array([1.0, 2.0, 3.0]))
    assert astro.log_sum(x) == pytest.approx(np.log(6.0))


def test_multivariate_normal_logpdf():
    from scipy.stats import multivariate_normal as mvn
    rng = np.random.default_rng(1)
    A = rng.standard_normal((4, 4))
    C = A @ A.T + 4 * np.eye(4)
    r = rng.standard_normal(4)
    expect = mvn(mean=np.zeros(4), cov=C).logpdf(r)
    assert astro.multivariate_normal(r, C) == pytest.approx(expect, rel=1e-9)
    assert astro.multivariate_normal(r, C, method="solve") == \
        pytest.approx(expect, rel=1e-9)


def test_rms_wrms():
    x = np.array([1.0, -1.0, 1.0, -1.0])
    assert astro.rms(x) == pytest.approx(1.0)
    w = np.ones(4)
    assert astro.wrms(x, w) == pytest.approx(1.0)


def test_wrms_weighted():
    x = np.array([0.0, 2.0])
    w = np.array([3.0, 1.0])
    mu = 0.5
    expect = np.sqrt((3 * 0.25 + 1 * 2.25) / 4)
    assert astro.wrms(x, w) == pytest.approx(expect)


def test_anderson_darling():
    rng = np.random.default_rng(2)
    _, label = astro.anderson_darling_test(rng.standard_normal(200))
    assert label.startswith("A-D:")


def test_array_alias_and_array_input_decorator():
    """Reference _utils.py:17-27 parity: the Array annotation alias and
    the _array_input method decorator."""
    import typing
    assert typing.get_origin(astro.Array) is typing.Union

    class F:
        @astro._array_input
        def __call__(self, t):
            assert isinstance(t, np.ndarray) and t.ndim == 1
            return 2.0 * t

    out = F()(3.0)
    np.testing.assert_allclose(out, [6.0])
    np.testing.assert_allclose(F()([1.0, 2.0]), [2.0, 4.0])
