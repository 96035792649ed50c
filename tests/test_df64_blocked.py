"""MXU-path df64 linear algebra: exact-slice GEMM + blocked Cholesky.

Validates the Ozaki-split GEMM (ops/df64_gemm.py) and the blocked
factorization/solves (ops/df64_blocked.py) against NumPy float64 ground
truth, including the ill-conditioned QuasiPeriodic kernel matrices the
exact-parity ELBO path factors (reference nugget 1e-6,
/root/reference/gpyrn/meanfield.py:433)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gpyrn_tpu.ops.df64 import DF, from_f64, to_f64, df_sum, df
from gpyrn_tpu.ops.df64_gemm import df64_matmul, df64_matvec
from gpyrn_tpu.ops.df64_blocked import (
    df_cho_solve_blocked, df_cholesky_blocked, df_logdet_blocked,
    df_tri_solve_blocked, df_tri_solve_t_blocked)

rng = np.random.default_rng(0)


def _qp_kernel(N, nugget=1e-6, ell_p=0.7):
    t = np.sort(rng.uniform(0, 100, N))
    r = t[:, None] - t[None, :]
    K = np.exp(-2 * np.sin(np.pi * np.abs(r) / 30.0) ** 2 / ell_p ** 2
               - r ** 2 / (2 * 20.0 ** 2))
    return K + nugget * np.eye(N)


# ---------------------------------------------------------------------------
# df_sum pairwise reduction
# ---------------------------------------------------------------------------

def test_df_sum_pairwise_accuracy():
    x = rng.standard_normal(10001) * 10.0 ** rng.uniform(-3, 3, 10001)
    s = to_f64(df_sum(from_f64(x)))
    ref = np.sum(np.sort(x))  # well-conditioned reference
    assert abs(s - np.float64(sum(map(float, x)))) <= 1e-10 * np.sum(np.abs(x))
    assert np.isfinite(ref)


def test_df_sum_axis_odd_even():
    x = rng.standard_normal((7, 13))
    for ax in (0, 1, -1):
        s = to_f64(df_sum(from_f64(x), axis=ax))
        np.testing.assert_allclose(s, x.sum(axis=ax), rtol=1e-13,
                                   atol=1e-15)


# ---------------------------------------------------------------------------
# GEMM
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("M,K,N,batch", [
    (33, 47, 29, ()),          # odd shapes
    (64, 300, 64, ()),
    (64, 3000, 32, ()),        # chunked-K path
    (16, 64, 16, (3,)),        # batched
])
def test_matmul_matches_f64(M, K, N, batch):
    A = rng.standard_normal(batch + (M, K))
    B = rng.standard_normal(batch + (K, N))
    C = to_f64(jax.jit(df64_matmul)(from_f64(A), from_f64(B)))
    err = np.max(np.abs(C - A @ B) / (np.abs(A) @ np.abs(B)))
    assert err < 1e-13


@pytest.mark.slow
def test_matmul_wide_dynamic_range():
    A = rng.standard_normal((24, 80)) * 10.0 ** rng.uniform(-6, 6, (24, 1))
    B = rng.standard_normal((80, 24)) * 10.0 ** rng.uniform(-6, 6, (1, 24))
    C = to_f64(df64_matmul(from_f64(A), from_f64(B)))
    err = np.max(np.abs(C - A @ B) / (np.abs(A) @ np.abs(B)))
    assert err < 1e-13


def test_matmul_cancellation():
    """L@Lᵀ reconstructs an ill-conditioned K to ~f64 absolute accuracy
    (the trailing-update workload of the blocked Cholesky)."""
    N = 200
    K = _qp_kernel(N)
    L = np.linalg.cholesky(K)
    R = to_f64(df64_matmul(from_f64(L), from_f64(L.T)))
    assert np.max(np.abs(R - L @ L.T)) < 1e-12


def test_matvec():
    A = rng.standard_normal((50, 333))
    x = rng.standard_normal(333)
    y = to_f64(df64_matvec(from_f64(A), from_f64(x)))
    np.testing.assert_allclose(y, A @ x, rtol=1e-12, atol=1e-13)


# ---------------------------------------------------------------------------
# blocked Cholesky / solves
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("N,block", [(60, 16), (100, 32), (200, 64),
                                     (300, 128)])
def test_blocked_cholesky_ill_conditioned(N, block):
    K = _qp_kernel(N)
    F = df_cholesky_blocked(from_f64(K[None]), block)
    L = to_f64(F.L)[0, :N, :N]
    # factor residual at ~f64 level
    assert np.max(np.abs(L @ L.T - K)) < 1e-11
    ld = to_f64(df_logdet_blocked(F))[0]
    ld64 = 2 * np.sum(np.log(np.diag(np.linalg.cholesky(K))))
    assert abs(ld - ld64) < 1e-7 * abs(ld64)


@pytest.mark.slow
def test_blocked_cholesky_batch_and_padding():
    """Batched matrices with N not a block multiple (padding path)."""
    N = 90
    K1 = _qp_kernel(N)
    K2 = 3.0 * _qp_kernel(N)
    F = df_cholesky_blocked(from_f64(np.stack([K1, K2])), 64)
    ld = to_f64(df_logdet_blocked(F))
    for i, K in enumerate((K1, K2)):
        ld64 = 2 * np.sum(np.log(np.diag(np.linalg.cholesky(K))))
        assert abs(ld[i] - ld64) < 1e-7 * abs(ld64)


@pytest.mark.slow
def test_blocked_solves():
    N = 150
    K = _qp_kernel(N)
    L64 = np.linalg.cholesky(K)
    F = df_cholesky_blocked(from_f64(K[None]), 64)
    b = rng.standard_normal((1, N, 5))
    scale = np.max(np.abs(np.linalg.solve(L64, b[0])))
    X = to_f64(df_tri_solve_blocked(F, from_f64(b)))[0]
    assert np.max(np.abs(X - np.linalg.solve(L64, b[0]))) < 1e-5 * scale
    scale_t = np.max(np.abs(np.linalg.solve(L64.T, b[0])))
    Xt = to_f64(df_tri_solve_t_blocked(F, from_f64(b)))[0]
    assert np.max(np.abs(Xt - np.linalg.solve(L64.T, b[0]))) < 1e-5 * scale_t
    Xc = to_f64(df_cho_solve_blocked(F, from_f64(b)))[0]
    ref = np.linalg.solve(K, b[0])
    assert np.max(np.abs(Xc - ref)) < 1e-5 * np.max(np.abs(ref))


@pytest.mark.slow
def test_blocked_quadratic_form_accuracy():
    """||L⁻¹μ||² for a smooth in-range μ — the μᵀK⁻¹μ ELBO term — is
    far better conditioned than the componentwise solve and must hit
    ~1e-9 relative."""
    N = 200
    K = _qp_kernel(N)
    L64 = np.linalg.cholesky(K)
    mu = K @ rng.standard_normal(N)       # in-range vector
    F = df_cholesky_blocked(from_f64(K[None]), 64)
    w = to_f64(df_tri_solve_blocked(F, from_f64(mu[None, :, None])))[0, :, 0]
    q = float(np.sum(w * w))
    w64 = np.linalg.solve(L64, mu)
    q64 = float(np.sum(w64 * w64))
    assert abs(q - q64) < 1e-8 * abs(q64)
