"""Matrix-free CG coordinate-ascent fit (models/cg_fit.py).

Acceptance contract (round-2 verdict item 4): the matrix-free fit must
agree with the dense engines to <= 1e-4 relative state error at an
overlapping N.  Building blocks (pivoted Cholesky, Woodbury apply) are
pinned against dense oracles here too.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import gpyrn_tpu as g
from gpyrn_tpu.ops.iterative import (kernel_diag, pivoted_cholesky,
                                     woodbury_apply)
from gpyrn_tpu.ops.linalg import TRAIN_NUGGET, kernel_matrix


@pytest.fixture(scope="module")
def problem():
    """q=1, p=2 GPRN at N=300 — small enough for dense oracles, large
    enough that rank-128 compression is a real truncation."""
    rng = np.random.default_rng(7)
    N = 300
    t = np.sort(rng.uniform(0, 100, N))
    data = []
    for i in range(2):
        data += [np.sin(2 * np.pi * t / (20 + 10 * i))
                 + 0.1 * rng.standard_normal(N), np.full(N, 0.1)]
    m = g.inference(1, t, *data)
    m.set_components(
        [g.covfunc.QuasiPeriodic(1.0, 30.0, 20.0, 0.7)],
        [g.covfunc.SquaredExponential(1.0, 15.0),
         g.covfunc.SquaredExponential(0.8, 25.0)],
        [None, None], [0.1, 0.1])
    return m


def test_pivoted_cholesky_reconstructs():
    """U Uᵀ + diag(residual) tracks K; residual decays fast with rank."""
    rng = np.random.default_rng(0)
    N = 200
    t = np.sort(rng.uniform(0, 50, N))
    kern = g.covfunc.SquaredExponential(1.3, 8.0)
    K = np.asarray(kernel_matrix(kern.structure, kern.pars, t, 0.0),
                   dtype=np.float64)
    U, diag_r = pivoted_cholesky(kern.structure, kern.pars, t, 40, 0.0)
    U = np.asarray(U)
    # residual diagonal is exactly diag(K - U Uᵀ)
    np.testing.assert_allclose(np.asarray(diag_r),
                               np.diag(K) - np.sum(U * U, axis=1),
                               atol=1e-9)
    # smooth kernel: rank 40 captures K to ~machine level
    assert np.max(np.abs(K - U @ U.T)) < 1e-8
    # over-asking ranks is safe: exhausted steps give zero columns
    U2, _ = pivoted_cholesky(kern.structure, kern.pars, t, 60, 0.0)
    assert np.all(np.isfinite(np.asarray(U2)))


def test_kernel_diag_matches_dense():
    rng = np.random.default_rng(1)
    t = np.sort(rng.uniform(0, 50, 64))
    kern = g.covfunc.QuasiPeriodic(1.0, 30.0, 20.0, 0.7)
    K = np.asarray(kernel_matrix(kern.structure, kern.pars, t, 1e-5))
    d = np.asarray(kernel_diag(kern.structure, kern.pars, t, 1e-5))
    np.testing.assert_allclose(d, np.diag(K), rtol=1e-12)


def test_woodbury_apply_matches_dense():
    rng = np.random.default_rng(2)
    N, m = 120, 16
    U = rng.standard_normal((N, m))
    a = 0.5 + rng.random(N)
    M = U @ U.T + np.diag(a)
    r = rng.standard_normal((N, 3))
    x = np.asarray(woodbury_apply(jnp.asarray(U), jnp.asarray(a),
                                  jnp.asarray(r)))
    np.testing.assert_allclose(x, np.linalg.solve(M, r), rtol=1e-9,
                               atol=1e-10)
    # 1-D right-hand side round-trips
    x1 = np.asarray(woodbury_apply(jnp.asarray(U), jnp.asarray(a),
                                   jnp.asarray(r[:, 0])))
    np.testing.assert_allclose(x1, np.linalg.solve(M, r[:, 0]),
                               rtol=1e-9, atol=1e-10)


@pytest.mark.slow
def test_cg_fit_matches_dense(problem):
    """fit_state_cg vs the dense fit_state: <= 1e-4 relative state
    error (measured ~1e-7 at rank 128 for these smooth kernels)."""
    m = problem
    eng = m.engine
    theta = m._theta()
    tt = np.asarray(m.time, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, m.y)
    mu_d, var_d, it_d, done_d = eng.fit_state(
        theta, tt, m.y, m.yerr2, mu0, var0, 800, 1e-6)
    cg = m.cg_engine
    mu_c, var_c, it_c, done_c, rres_c = cg.fit_state_cg(
        theta, tt, m.y, m.yerr2, mu0, var0, 800, 1e-6)
    assert bool(done_d) and bool(done_c)
    scale = np.max(np.abs(np.asarray(mu_d))) + 1.0
    assert np.max(np.abs(np.asarray(mu_c) - np.asarray(mu_d))) / scale \
        < 1e-4
    vscale = np.max(np.abs(np.asarray(var_d)))
    assert np.max(np.abs(np.asarray(var_c) - np.asarray(var_d))) \
        / vscale < 1e-4


def test_cg_fit_surface(problem):
    """fit_method='cg' through ELBOcalc(precision='mixed') lands near
    the dense mixed path's ELBO.  The f32 bulk stage of BOTH paths
    wanders ~1e-3 in state per f32 rounding (the maps agree to ~2e-7 in
    f64 — test_cg_fit_matches_dense), and the short f64 polish does not
    fully contract that, so the surface bar is the mixed contract's,
    not the f64 parity bar."""
    m = problem
    m.refine_method = 'f64'     # CPU test env: f64 refine is native
    m.fit_method = 'dense'
    e_dense, *_ = m.ELBOcalc(precision='mixed', mu='init', var='init',
                             max_iter=200)
    m.fit_method = 'cg'
    try:
        e_cg, *_ = m.ELBOcalc(precision='mixed', mu='init', var='init',
                              max_iter=200)
    finally:
        m.fit_method = 'dense'
    assert e_cg == pytest.approx(e_dense, rel=1e-3)


def test_cg_engine_cache_invalidation(problem):
    m = problem
    eng1 = m.cg_engine
    assert m.cg_engine is eng1          # cached
    m.cg_rank = 64
    eng2 = m.cg_engine
    assert eng2 is not eng1             # knob change rebuilds
    assert eng2.rank == 64
    m.cg_rank = 128
