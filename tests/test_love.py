"""LOVE cached predictive variances (models/iterative.py) and the
fully reorthogonalized Lanczos basis behind them (ops/iterative.py).
"""
import numpy as np
import pytest

import gpyrn_tpu as g
from gpyrn_tpu.models.iterative import build_love, predict_iterative
from gpyrn_tpu.ops.iterative import lanczos_vectors


def test_lanczos_vectors_orthonormal_and_tridiagonal():
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    N, k = 80, 30
    X = rng.standard_normal((N, N))
    A = jnp.asarray(X @ X.T / N + np.eye(N))
    mv = lambda x: A @ x  # noqa: E731
    v0 = jnp.asarray(rng.standard_normal(N))
    Q, al, be = lanczos_vectors(mv, v0, k)
    Qn = np.asarray(Q)
    # orthonormal basis (the whole point of the reorthogonalization)
    np.testing.assert_allclose(Qn @ Qn.T, np.eye(k), atol=1e-10)
    # T = Q A Qᵀ reproduced by the tridiagonal coefficients
    T = Qn @ np.asarray(A) @ Qn.T
    np.testing.assert_allclose(np.diag(T), np.asarray(al), atol=1e-9)
    np.testing.assert_allclose(np.diag(T, 1), np.asarray(be)[:-1],
                               atol=1e-9)
    np.testing.assert_allclose(T - np.diag(np.diag(T))
                               - np.diag(np.diag(T, 1), 1)
                               - np.diag(np.diag(T, -1), -1),
                               np.zeros((k, k)), atol=1e-9)


def test_lanczos_vectors_exhaustion_stays_pd():
    """On a rank-deficient Krylov space (A with tiny spectrum spread),
    steps after breakdown must produce identity T entries and zero
    rows, keeping chol(T) finite."""
    import jax.numpy as jnp
    N, k = 40, 40
    A = jnp.eye(N) * 2.0                   # Krylov space exhausts at 1
    v0 = jnp.ones(N)
    Q, al, be = lanczos_vectors(lambda x: A @ x, v0, k)
    T = np.diag(np.asarray(al)) + np.diag(np.asarray(be)[:-1], 1) + \
        np.diag(np.asarray(be)[:-1], -1)
    L = np.linalg.cholesky(T)
    assert np.all(np.isfinite(L))
    assert np.asarray(al)[0] == pytest.approx(2.0)
    assert np.allclose(np.asarray(al)[1:], 1.0)   # identity tail
    assert np.allclose(np.asarray(Q)[1:], 0.0)    # dead rows


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.default_rng(7)
    N = 120
    t = np.sort(rng.uniform(0, 60, N))
    data = []
    for i in range(2):
        data += [np.sin(2 * np.pi * t / (12 + 4 * i))
                 + 0.1 * rng.standard_normal(N), np.full(N, 0.1)]
    m = g.inference(1, t, *data)
    m.set_components(
        [g.covfunc.SquaredExponential(1.0, 9.0)],
        [g.covfunc.SquaredExponential(1.0 + 0.1 * k, 10.0)
         for k in range(2)],
        [None, None], [0.1, 0.12])
    m.ELBOcalc()
    return m


def test_love_matches_dense_predict(fitted):
    m = fitted
    tstar = np.linspace(-5, 65, 60)
    ts_d, mean_d, std_d, _ = m.predict(tstar=tstar)
    love = build_love(m, rank=m.N, tol=1e-11)
    ts_l, mean_l, std_l, _ = love.predict(tstar=tstar)
    scale = np.max(np.abs(mean_d)) + 1.0
    np.testing.assert_allclose(mean_l, np.asarray(mean_d),
                               atol=1e-5 * scale)
    # full-rank LOVE is exact up to Lanczos rounding
    np.testing.assert_allclose(std_l, np.asarray(std_d), atol=1e-4,
                               rtol=1e-3)


@pytest.mark.slow
def test_love_error_decays_with_rank(fitted):
    m = fitted
    tstar = np.linspace(0, 60, 40)
    _, _, std_d, _ = m.predict(tstar=tstar)
    errs = []
    for rank in (8, 30, 90):
        _, _, std_l, _ = build_love(m, rank=rank).predict(tstar=tstar)
        errs.append(float(np.max(np.abs(std_l - np.asarray(std_d)))))
    assert errs[2] <= errs[0] + 1e-12
    assert errs[2] < 5e-3          # high rank is accurate in absolute terms
    # truncation only DROPS variance-reduction: LOVE never underestimates
    _, _, std_8, _ = build_love(m, rank=8).predict(tstar=tstar)
    assert np.all(std_8 >= np.asarray(std_d) - 1e-6)


@pytest.mark.slow
def test_love_mean_matches_cg_path(fitted):
    m = fitted
    tstar = np.linspace(0, 60, 30)
    _, mean_cg, _, _ = predict_iterative(m, tstar=tstar, tol=1e-11,
                                         variances=False)
    _, mean_l, _, _ = build_love(m, rank=20, tol=1e-11).predict(
        tstar=tstar, variances=False)
    np.testing.assert_allclose(mean_l, mean_cg, atol=1e-8)


def test_love_requires_state():
    rng = np.random.default_rng(1)
    t = np.sort(rng.uniform(0, 10, 20))
    m = g.inference(1, t, rng.standard_normal(20), np.full(20, 0.1))
    m.set_components(g.covfunc.SquaredExponential(1.0, 3.0),
                     g.covfunc.Constant(1.0), None, 0.1)
    with pytest.raises(ValueError, match="no variational state"):
        build_love(m)
