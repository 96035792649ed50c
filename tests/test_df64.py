"""Double-single (df64) arithmetic and linear algebra tests.

Oracles are float64 computations; df64 carries ~48 mantissa bits, so
tolerances sit between f32 (~1e-7) and f64 (~1e-16) at ~1e-13 relative
for well-scaled operands."""
import numpy as np
import jax.numpy as jnp
import pytest

from gpyrn_tpu.ops import df64 as dd


def _rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return scale * rng.standard_normal(shape)


def test_roundtrip():
    x = np.array([1.0 + 1e-9, np.pi, 1e-6])
    d = dd.from_f64(x)
    np.testing.assert_allclose(np.asarray(dd.to_f64(d)), x, rtol=1e-14)


def test_add_precision():
    a, b = 1.0, 1e-9        # lost entirely in f32
    s = dd.df_add(dd.from_f64(a), dd.from_f64(b))
    assert float(dd.to_f64(s)) == pytest.approx(a + b, rel=1e-15)


def test_mul_precision():
    a, b = np.pi, np.e
    p = dd.df_mul(dd.from_f64(a), dd.from_f64(b))
    assert float(dd.to_f64(p)) == pytest.approx(a * b, rel=1e-14)


def test_div_sqrt_precision():
    a, b = 355.0, 113.0
    q = dd.df_div(dd.from_f64(a), dd.from_f64(b))
    assert float(dd.to_f64(q)) == pytest.approx(a / b, rel=1e-14)
    s = dd.df_sqrt(dd.from_f64(2.0))
    assert float(dd.to_f64(s)) == pytest.approx(np.sqrt(2.0), rel=1e-14)


def test_sum_beats_f32():
    """Σ of 1e5 varied values: df64 accumulation must be ~f64-exact
    while plain f32 loses ~1e-4 relative."""
    x = _rand(100000, seed=1) * np.logspace(-3, 3, 100000)
    exact = np.sum(x.astype(np.float64))
    f32 = float(np.sum(x.astype(np.float32)))
    d = dd.df_sum(dd.from_f64(x))
    got = float(dd.to_f64(d))
    assert got == pytest.approx(exact, rel=1e-10)
    assert abs(got - exact) < abs(f32 - exact) / 10


def test_dot():
    a, b = _rand(1000, 2), _rand(1000, 3)
    exact = float(a @ b)
    d = dd.df_dot(dd.from_f64(a), dd.from_f64(b))
    assert float(dd.to_f64(d)) == pytest.approx(exact, rel=1e-11)


@pytest.mark.parametrize("cond", [1e3, 1e8])
def test_cholesky_logdet_vs_f64(cond):
    """df64 Cholesky log-det of an SE-like ill-conditioned matrix —
    the exact computation plain f32 fails at for cond ≳ 1e7."""
    N = 60
    t = np.sort(np.random.default_rng(0).uniform(0, 10, N))
    K = np.exp(-0.5 * (t[:, None] - t[None, :]) ** 2 / 2.0 ** 2)
    nug = np.trace(K) / cond
    A = K + nug * np.eye(N)
    exact = float(np.linalg.slogdet(A)[1])

    L = dd.df_cholesky(dd.from_f64(A))
    hi, lo = dd.df_logdet_from_chol(L)
    got = float(hi) + float(lo)
    assert got == pytest.approx(exact, rel=1e-5)

    # the df64 factor itself reproduces A to near-f64 accuracy
    Lf = np.asarray(dd.to_f64(L))
    np.testing.assert_allclose(Lf @ Lf.T, A, atol=1e-10)


def test_cholesky_beats_f32_at_high_cond():
    N = 50
    t = np.sort(np.random.default_rng(1).uniform(0, 10, N))
    K = np.exp(-0.5 * (t[:, None] - t[None, :]) ** 2 / 3.0 ** 2)
    A = K + 1e-8 * np.trace(K) * np.eye(N)     # cond ~ 1e8
    exact = float(np.linalg.slogdet(A)[1])
    f32_L = np.linalg.cholesky(A.astype(np.float32))
    f32_logdet = 2 * float(np.sum(np.log(np.diag(f32_L))))
    L = dd.df_cholesky(dd.from_f64(A))
    hi, lo = dd.df_logdet_from_chol(L)
    got = float(hi) + float(lo)
    assert abs(got - exact) < abs(f32_logdet - exact) / 10


def test_tri_solve():
    N = 40
    A = _rand((N, N), 5)
    L = np.tril(A) + N * np.eye(N)
    b = _rand(N, 6)
    exact = np.linalg.solve(L, b)
    x = dd.df_tri_solve(dd.from_f64(L), dd.from_f64(b))
    np.testing.assert_allclose(np.asarray(dd.to_f64(x)), exact,
                               rtol=1e-10, atol=1e-10)


def test_tri_solve_matrix_rhs():
    N = 20
    L = np.tril(_rand((N, N), 7)) + N * np.eye(N)
    B = _rand((N, 3), 8)
    exact = np.linalg.solve(L, B)
    X = dd.df_tri_solve(dd.from_f64(L), dd.from_f64(B))
    np.testing.assert_allclose(np.asarray(dd.to_f64(X)), exact,
                               rtol=1e-9, atol=1e-9)
