"""df64 transcendental tests against float64 oracles."""
import numpy as np
import pytest

from gpyrn_tpu.ops import df64 as dd
from gpyrn_tpu.ops import df64_math as dm


def _check(fn_df, fn_np, x, rtol, atol=0.0):
    d = fn_df(dd.from_f64(x))
    got = np.asarray(dd.to_f64(d))
    expect = fn_np(x.astype(np.float64))
    np.testing.assert_allclose(got, expect, rtol=rtol, atol=atol)


def test_exp_range():
    x = np.concatenate([np.linspace(-50, 50, 2001),
                        np.array([0.0, 1e-8, -1e-8, 0.5, -0.5])])
    _check(dm.df_exp, np.exp, x, rtol=5e-13)


def test_log_range():
    # |x| >= ~1e-25: below that the input pair's LOW word hits the f32
    # subnormal flush and df precision degrades by design (df64.py)
    x = np.concatenate([np.logspace(-25, 25, 2001),
                        np.array([1.0, 1.0 + 1e-6, 0.999999])])
    _check(dm.df_log, np.log, x, rtol=1e-12, atol=5e-13)


def test_exp_log_roundtrip():
    x = np.logspace(-8, 3, 500)
    d = dm.df_exp(dm.df_log(dd.from_f64(x)))
    np.testing.assert_allclose(np.asarray(dd.to_f64(d)), x, rtol=1e-12)


def test_sin_cos_small_args():
    x = np.linspace(-3.0, 3.0, 4001)
    _check(dm.df_sin, np.sin, x, rtol=2e-12, atol=2e-13)
    _check(dm.df_cos, np.cos, x, rtol=2e-12, atol=2e-13)


def test_sin_cos_large_args():
    """Phases up to ~1e4 (the GPRN kernels' π·r/P range)."""
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.2e4, 1.2e4, 5000)
    _check(dm.df_sin, np.sin, x, rtol=1e-9, atol=5e-11)
    _check(dm.df_cos, np.cos, x, rtol=1e-9, atol=5e-11)


def test_sin2_identity():
    rng = np.random.default_rng(1)
    x = rng.uniform(-5e3, 5e3, 2000)
    s = dm.df_sin(dd.from_f64(x))
    c = dm.df_cos(dd.from_f64(x))
    one = dd.df_add(dd.df_mul(s, s), dd.df_mul(c, c))
    np.testing.assert_allclose(np.asarray(dd.to_f64(one)), 1.0, rtol=2e-12)


def test_pow():
    rng = np.random.default_rng(2)
    a = rng.uniform(0.1, 10.0, 1000)
    b = rng.uniform(-3.0, 3.0, 1000)
    d = dm.df_pow(dd.from_f64(a), dd.from_f64(b))
    np.testing.assert_allclose(np.asarray(dd.to_f64(d)), a ** b, rtol=1e-11)


def test_abs():
    x = np.array([-2.5, 0.0, 3.5])
    d = dm.df_abs(dd.from_f64(x))
    np.testing.assert_allclose(np.asarray(dd.to_f64(d)), np.abs(x))


def test_beats_f32_accuracy():
    """df_sin at large args: ~1e5 times more accurate than f32 sin."""
    rng = np.random.default_rng(3)
    x = rng.uniform(1e3, 1e4, 1000)
    exact = np.sin(x)
    f32_err = np.abs(np.sin(x.astype(np.float32)).astype(np.float64)
                     - exact).max()
    df_err = np.abs(np.asarray(dd.to_f64(dm.df_sin(dd.from_f64(x))))
                    - exact).max()
    assert df_err < f32_err / 1e4
