"""Blocked f32/f64 Cholesky + triangular-inverse diagonal (ops/blocked.py).

This is the MXU sweep path: the engine's per-sweep Σ diagnostics all
reduce to diag(A⁻¹) (see gpyrn_tpu/models/gprn.py `_chol_diag_ainv`),
computed by blocked-GEMM triangular inversion instead of a dense-RHS
N³ triangular solve.  Validated here against jnp.linalg ground truth
across padded/unpadded shapes, batches, and both dtypes.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from gpyrn_tpu.ops.blocked import (blocked_chol_diag_ainv,
                                   blocked_cholesky, diag_Ainv)


def _spd(rng, B, N, dtype, cond=1e4):
    X = rng.standard_normal((B, N, N))
    A = X @ X.transpose(0, 2, 1) / N + np.eye(N)
    # stretch the spectrum a little so rounding differences are visible
    d = np.linspace(1.0, cond ** 0.25, N)
    A = A * d[None, :, None] * d[None, None, :]
    return jnp.asarray(A, dtype=dtype)


@pytest.mark.parametrize("N,block", [(64, 32), (96, 32), (130, 64),
                                     (257, 128), (512, 128)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_blocked_cholesky_matches_dense(N, block, dtype):
    A = _spd(np.random.default_rng(N), 3, N, dtype)
    Lp, Linv_d = blocked_cholesky(A, block=block)
    L_ref = jnp.linalg.cholesky(A)
    tol = 5e-5 if dtype == jnp.float32 else 1e-12
    assert np.allclose(np.asarray(Lp)[:, :N, :N], np.asarray(L_ref),
                       rtol=tol, atol=tol)
    # padded tail must be the identity (so downstream math is unaffected)
    Npad = Lp.shape[1]
    if Npad > N:
        tail = np.asarray(Lp)[:, N:, N:]
        assert np.allclose(tail, np.eye(Npad - N), atol=0)
        assert not np.any(np.asarray(Lp)[:, N:, :N])


@pytest.mark.parametrize("N,block", [(64, 32), (130, 64), (257, 128)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_diag_ainv_matches_inverse(N, block, dtype):
    A = _spd(np.random.default_rng(7 * N), 2, N, dtype)
    Lp, Linv_d = blocked_cholesky(A, block=block)
    d = diag_Ainv(Lp, Linv_d=Linv_d, block=block, n_valid=N)
    ref = np.stack([np.diag(np.linalg.inv(np.asarray(a, np.float64)))
                    for a in A])
    tol = 2e-4 if dtype == jnp.float32 else 1e-11
    assert np.allclose(np.asarray(d), ref, rtol=tol)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_fused_wrapper_shapes_and_values(dtype):
    N = 200
    A = _spd(np.random.default_rng(0), 4, N, dtype)
    L, d = blocked_chol_diag_ainv(A, block=64)
    assert L.shape == (4, N, N) and d.shape == (4, N)
    L_ref = jnp.linalg.cholesky(A)
    tol = 5e-5 if dtype == jnp.float32 else 1e-12
    assert np.allclose(np.asarray(L), np.asarray(L_ref), rtol=tol,
                       atol=tol)
    ref = np.stack([np.diag(np.linalg.inv(np.asarray(a, np.float64)))
                    for a in A])
    assert np.allclose(np.asarray(d), ref,
                       rtol=2e-4 if dtype == jnp.float32 else 1e-11)


def test_diag_ainv_rejects_unpadded():
    L = jnp.eye(100)[None]
    with pytest.raises(ValueError):
        diag_Ainv(L, block=64)


def test_single_block_path():
    # N <= block: degenerates to one XLA factorization, no strips
    A = _spd(np.random.default_rng(3), 1, 40, jnp.float64)
    L, d = blocked_chol_diag_ainv(A, block=512)
    ref = np.diag(np.linalg.inv(np.asarray(A[0], np.float64)))
    assert np.allclose(np.asarray(d[0]), ref, rtol=1e-11)
