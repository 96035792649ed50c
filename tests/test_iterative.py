"""Matrix-free CG / Lanczos toolkit (ops/iterative.py) vs dense oracles."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gpyrn_tpu as g
from gpyrn_tpu.ops.iterative import (cg_solve, kernel_matvec, lanczos,
                                     slq_logdet)
from gpyrn_tpu.ops.linalg import TRAIN_NUGGET, kernel_matrix


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    N = 300
    t = np.sort(rng.uniform(0, 100, N))
    kern = g.covfunc.QuasiPeriodic(1.0, 30.0, 20.0, 0.7)
    K = np.asarray(kernel_matrix(kern.structure, kern.pars, t,
                                 TRAIN_NUGGET), dtype=np.float64)
    return rng, t, kern, K


def test_matvec_matches_dense(problem):
    rng, t, kern, K = problem
    v = rng.standard_normal((len(t), 3))
    y = np.asarray(kernel_matvec(kern.structure, kern.pars, t, v,
                                 nugget=TRAIN_NUGGET, chunk=128))
    np.testing.assert_allclose(y, K @ v, rtol=2e-6, atol=1e-8)
    # 1-D input round-trips
    y1 = np.asarray(kernel_matvec(kern.structure, kern.pars, t, v[:, 0],
                                  nugget=TRAIN_NUGGET, chunk=64))
    np.testing.assert_allclose(y1, K @ v[:, 0], rtol=2e-6, atol=1e-8)


def test_cg_matches_direct_solve(problem):
    rng, t, kern, K = problem
    N = len(t)
    d = 0.3 + rng.random(N)               # well-conditioned A = K + D
    A = K + np.diag(d)
    b = rng.standard_normal((N, 2))

    def matvec(v):
        return kernel_matvec(kern.structure, kern.pars, t, v,
                             nugget=TRAIN_NUGGET) + d[:, None] * v

    x, it = cg_solve(matvec, b, tol=1e-10, maxiter=500,
                     precond_diag=jnp.asarray(np.diag(A)))
    x_ref = np.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=5e-5,
                               atol=1e-6)
    assert int(it) < 500


def test_gp_conditional_mean_via_cg(problem):
    """Predictive mean through CG equals the dense GP conditional."""
    rng, t, kern, K = problem
    N = len(t)
    noise = np.full(N, 0.05 ** 2)
    y = np.sin(2 * np.pi * t / 30) + 0.05 * rng.standard_normal(N)

    def matvec(v):
        return kernel_matvec(kern.structure, kern.pars, t, v,
                             nugget=TRAIN_NUGGET) + noise[:, None] * v

    alpha, _ = cg_solve(matvec, y, tol=1e-10, maxiter=1000,
                        precond_diag=jnp.asarray(np.diag(K) + noise))
    tstar = np.linspace(0, 100, 40)
    Ks = np.asarray(
        g.covfunc  # noqa: F841 - dense cross-covariance oracle below
        and kernel_matrix(kern.structure, kern.pars, t, 0.0))
    from gpyrn_tpu.ops.linalg import cross_kernel_matrix
    Kstar = np.asarray(cross_kernel_matrix(kern.structure, kern.pars,
                                           tstar, t))
    mean_cg = Kstar @ np.asarray(alpha)
    mean_ref = Kstar @ np.linalg.solve(K + np.diag(noise), y)
    np.testing.assert_allclose(mean_cg, mean_ref, rtol=1e-5, atol=1e-6)


def test_slq_logdet_accuracy(problem):
    rng, t, kern, K = problem
    N = len(t)
    d = 0.5 + rng.random(N)
    A = K + np.diag(d)

    def matvec(v):
        return kernel_matvec(kern.structure, kern.pars, t, v,
                             nugget=TRAIN_NUGGET) + d * v

    est = float(slq_logdet(matvec, N, n_probes=24, n_steps=30,
                           key=jax.random.PRNGKey(1), dtype=jnp.float64))
    _, ld = np.linalg.slogdet(A)
    assert est == pytest.approx(ld, rel=0.05)


def test_lanczos_extreme_eigs(problem):
    """Lanczos T's extreme Ritz values bracket toward A's spectrum."""
    rng, t, kern, K = problem
    N = len(t)
    A = K + np.eye(N)

    def matvec(v):
        return kernel_matvec(kern.structure, kern.pars, t, v,
                             nugget=TRAIN_NUGGET) + v

    v0 = jnp.asarray(rng.standard_normal(N))
    al, be = lanczos(matvec, v0, 30)
    T = np.diag(np.asarray(al)) + np.diag(np.asarray(be)[:-1], 1) + \
        np.diag(np.asarray(be)[:-1], -1)
    ritz = np.linalg.eigvalsh(T)
    w = np.linalg.eigvalsh(A)
    assert ritz.max() <= w.max() * 1.01
    assert ritz.max() >= w.max() * 0.9      # top eigenvalue converged


@pytest.mark.slow
def test_cg_refined_beats_f32_stall():
    """Mixed-precision iterative refinement: f32 CG stalls near its
    rounding floor; df64 residuals push the solve to ~1e-6."""
    rng = np.random.default_rng(5)
    N = 250
    t = np.sort(rng.uniform(0, 100, N))
    kern = g.covfunc.QuasiPeriodic(1.0, 30.0, 20.0, 0.7)
    noise = np.float32(0.01)
    b = rng.standard_normal(N).astype(np.float32)
    t32 = jnp.asarray(t, jnp.float32)
    pars32 = jnp.asarray(np.asarray(kern.pars), jnp.float32)

    def matvec32(v):
        return kernel_matvec(kern.structure, pars32, t32,
                             jnp.asarray(v, jnp.float32),
                             nugget=1e-4) + noise * jnp.asarray(
                                 v, jnp.float32)

    from gpyrn_tpu.ops.iterative import cg_refined, df64_kernel_matvec

    def residual_matvec(x):
        return df64_kernel_matvec(kern.structure, kern.pars, t, x,
                                  nugget=1e-4) + noise * x

    precond = jnp.full(N, np.float32(1.0 + 0.01))
    x_plain, _ = cg_solve(matvec32, jnp.asarray(b), tol=1e-12,
                          maxiter=2000, precond_diag=precond)
    r_plain = np.asarray(residual_matvec(x_plain)) - b
    rel_plain = np.linalg.norm(r_plain) / np.linalg.norm(b)

    x_ref, rel_ref = cg_refined(matvec32, residual_matvec,
                                jnp.asarray(b), n_refine=3,
                                inner_tol=1e-6, maxiter=2000,
                                precond_diag=precond)
    assert float(rel_ref) < 3e-6
    assert float(rel_ref) < rel_plain * 0.5 or rel_plain < 3e-6


def test_cg_true_residual_reporting_and_refresh():
    """Honesty contract (round-4 verdict item 3): ``return_relres``
    reports the TRUE achieved residual (pinned against an independent
    b − A x), and with ``refresh_every`` the stopping test acts on the
    true residual — so a met tolerance is real, and an unreachable one
    runs to maxiter instead of being silently claimed off the drifted
    f32 recursion."""
    rng = np.random.default_rng(9)
    N = 400
    t = np.sort(rng.uniform(0, 100, N))
    kern = g.covfunc.SquaredExponential(1.0, 30.0)   # smooth: huge cond
    t32 = jnp.asarray(t, jnp.float32)
    pars32 = jnp.asarray(np.asarray(kern.pars), jnp.float32)
    b = jnp.asarray(rng.standard_normal(N).astype(np.float32))

    def mv(v):
        return kernel_matvec(kern.structure, pars32, t32, v,
                             nugget=1e-4)

    # (a) reported relres == independent true residual
    x1, it1, rel1 = cg_solve(mv, b, tol=1e-7, maxiter=300,
                             return_relres=True)
    true1 = float(jnp.linalg.norm(b - mv(x1)) / jnp.linalg.norm(b))
    np.testing.assert_allclose(float(rel1), true1, rtol=1e-3)
    # the f32 floor on this conditioning sits well above 1e-7: the
    # solver must not pretend otherwise
    assert true1 > 1e-7

    # (b) an achievable tolerance, stopped on the REFRESHED residual,
    # is genuinely met
    x2, it2, rel2 = cg_solve(mv, b, tol=3e-3, maxiter=300,
                             refresh_every=5, return_relres=True)
    assert float(rel2) <= 3e-3 * 1.5 or int(it2) == 300
    true2 = float(jnp.linalg.norm(b - mv(x2)) / jnp.linalg.norm(b))
    np.testing.assert_allclose(float(rel2), true2, rtol=1e-3)


def test_cg_refresh_matches_plain_in_f64(problem):
    """In float64 (no drift at these tolerances) the refreshed solve
    returns the same solution as the plain recursion."""
    rng, t, kern, K = problem
    N = len(t)
    d = 0.3 + rng.random(N)
    b = rng.standard_normal(N)

    def matvec(v):
        return kernel_matvec(kern.structure, kern.pars, t, v,
                             nugget=1e-6) + (d[:, None] * v
                                             if v.ndim == 2 else d * v)

    x_p, _ = cg_solve(matvec, b, tol=1e-10, maxiter=500)
    x_r, _, rel_r = cg_solve(matvec, b, tol=1e-10, maxiter=500,
                             refresh_every=7, return_relres=True)
    np.testing.assert_allclose(np.asarray(x_r), np.asarray(x_p),
                               rtol=1e-6, atol=1e-9)
    assert float(rel_r) <= 1e-9


def test_cg_refresh_keeps_krylov_rate_ill_conditioned():
    """Residual replacement must CONTINUE the search direction: a
    direction restart at the replacement points degrades CG to
    steepest-descent rate on ill-conditioned systems (measured: relres
    0.43 at maxiter where plain CG converges in ~120 iterations)."""
    rng = np.random.default_rng(0)
    N = 96
    t = np.sort(rng.uniform(0, 100, N))
    b = rng.standard_normal(N)
    kern = g.covfunc.QuasiPeriodic(1.0, 30.0, 20.0, 0.7)

    def mv(v):
        return kernel_matvec(kern.structure, kern.pars, t, v,
                             nugget=1e-2)

    x_p, it_p = cg_solve(mv, b, tol=1e-9, maxiter=200)
    x_r, it_r, rel = cg_solve(mv, b, tol=1e-9, maxiter=200,
                              refresh_every=5, return_relres=True)
    assert float(rel) <= 1e-8, float(rel)
    assert int(it_r) <= int(it_p) * 2, (int(it_r), int(it_p))


def test_cg_warm_restart_equivalent(problem):
    """Two restarted 25-iter CG legs reach the same solution quality as
    one 50-iter run (the host-chunked pattern for runtimes that kill
    long device calls)."""
    rng, t, kern, K = problem
    N = len(t)
    d = 0.3 + rng.random(N)
    b = rng.standard_normal(N)

    def matvec(v):
        return kernel_matvec(kern.structure, kern.pars, t, v,
                             nugget=1e-6) + (d[:, None] * v
                                             if v.ndim == 2 else d * v)

    x_a, _ = cg_solve(matvec, b, tol=0.0, maxiter=25)
    r_a = np.linalg.norm(np.asarray(matvec(jnp.asarray(x_a))) - b)
    x_b, _ = cg_solve(matvec, b, tol=0.0, maxiter=25, x0=x_a)
    # the restarted leg keeps converging (restart loses Krylov history,
    # so it trails a single long run — the point is monotone progress)
    r_b = np.linalg.norm(np.asarray(matvec(jnp.asarray(x_b))) - b)
    assert r_b < r_a * 0.1
    assert r_b < np.linalg.norm(b) * 1e-3


def test_cg_breakdown_guard_no_nan():
    """A column whose curvature overflows to inf (the f32 blow-up mode
    measured at N=50k before the guards) must freeze gracefully, never
    NaN the batch: 0·inf paths are avoided by select, not arithmetic."""
    N = 32
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((N, 2)).astype(np.float32))

    def bad_matvec(v):
        # huge SPD diagonal on column 1 only -> pAp overflows f32
        scale = jnp.asarray([1.0, 3e38], dtype=jnp.float32)
        return v * scale[None, :]

    x, it = cg_solve(bad_matvec, b, tol=1e-6, maxiter=20)
    assert bool(jnp.all(jnp.isfinite(x)))
    # the well-conditioned column still solves its system
    np.testing.assert_allclose(np.asarray(x[:, 0]), np.asarray(b[:, 0]),
                               rtol=1e-5)


def test_cg_indefinite_preconditioner_guard():
    """An (erroneously) indefinite preconditioner apply — the f32
    Woodbury-cancellation failure that produced rᵀM⁻¹r < 0 at N=50k —
    must not NaN the solve; the guards restart the direction and the
    solution stays finite."""
    N = 24
    rng = np.random.default_rng(1)
    d = 1.0 + rng.random(N).astype(np.float32)
    b = jnp.asarray(rng.standard_normal(N).astype(np.float32))

    def matvec(v):
        return d[:, None] * v if v.ndim == 2 else d * v

    flip = jnp.asarray(np.where(np.arange(N) % 2, -1.0, 1.0),
                       dtype=jnp.float32)

    def bad_precond(r):
        return flip[:, None] * r        # indefinite "M^-1"

    x, it = cg_solve(matvec, b, tol=1e-6, maxiter=50,
                     precond_apply=bad_precond)
    assert bool(jnp.all(jnp.isfinite(x)))


def test_msqrt_apply_exact_at_full_krylov():
    """With n_steps = N the Krylov space is complete and
    msqrt_apply(A, v) equals the symmetric square root applied densely."""
    from gpyrn_tpu.ops.iterative import msqrt_apply
    import gpyrn_tpu as g
    rng = np.random.default_rng(0)
    N = 48
    t = np.sort(rng.uniform(0, 60, N))
    k = g.covfunc.QuasiPeriodic(1.0, 20.0, 13.0, 0.7)
    pars = jnp.asarray(np.asarray(k.core_params(), float))
    K = np.asarray(g.covfunc.evaluate(k.structure, pars,
                                      r=t[:, None] - t[None, :]))
    K = K + 1e-8 * np.eye(N)
    w, V = np.linalg.eigh(K)
    Ksqrt = (V * np.sqrt(np.clip(w, 0, None))) @ V.T
    v = rng.standard_normal(N)

    def mv(x):
        return kernel_matvec(k.structure, pars, t, x, nugget=1e-8)

    z = np.asarray(msqrt_apply(mv, jnp.asarray(v), n_steps=N))
    np.testing.assert_allclose(z, Ksqrt @ v, rtol=1e-6, atol=1e-8)


def test_msqrt_apply_error_decays_with_steps():
    from gpyrn_tpu.ops.iterative import msqrt_apply
    import gpyrn_tpu as g
    rng = np.random.default_rng(1)
    N = 64
    t = np.sort(rng.uniform(0, 60, N))
    k = g.covfunc.SquaredExponential(1.0, 10.0)
    pars = jnp.asarray(np.asarray(k.core_params(), float))
    K = np.asarray(g.covfunc.evaluate(k.structure, pars,
                                      r=t[:, None] - t[None, :]))
    K = K + 1e-6 * np.eye(N)
    w, V = np.linalg.eigh(K)
    Ksqrt = (V * np.sqrt(np.clip(w, 0, None))) @ V.T
    v = rng.standard_normal(N)

    def mv(x):
        return kernel_matvec(k.structure, pars, t, x, nugget=1e-6)

    errs = []
    for steps in (4, 12, 36):
        z = np.asarray(msqrt_apply(mv, jnp.asarray(v), n_steps=steps))
        errs.append(np.linalg.norm(z - Ksqrt @ v))
    assert errs[2] < errs[0]
    assert errs[2] < 1e-5 * np.linalg.norm(Ksqrt @ v)


@pytest.mark.slow
def test_sample_iterative_matches_prior_covariance():
    """Sample second moments: E[s_i^2] = K_ii (statistical, fixed rng)."""
    from gpyrn_tpu.models.iterative import sample_iterative
    import gpyrn_tpu as g
    rng = np.random.default_rng(5)
    N = 40
    t = np.sort(rng.uniform(0, 50, N))
    m = g.inference(1, t, np.sin(t), np.full(N, 0.1))
    m.set_components([g.covfunc.SquaredExponential(1.3, 9.0)],
                     [g.covfunc.Matern52(0.8, 7.0)], [None], [0.1])
    draws = np.stack([sample_iterative(m, rng=np.random.default_rng(s),
                                       n_steps=N)[0][0]
                      for s in range(200)])
    emp_var = draws.var(axis=0)
    assert abs(emp_var.mean() - 1.3 ** 2) < 0.25 * 1.3 ** 2


def test_split_precond_matches_dense_inverse():
    """split_precond applies M⁻¹ for M = U Uᵀ + diag(h) exactly (f64),
    in both the (N,) and (N, k) calling conventions."""
    from gpyrn_tpu.ops.iterative import split_precond
    rng = np.random.default_rng(3)
    N, m = 60, 7
    U = jnp.asarray(rng.standard_normal((N, m)))
    h = jnp.asarray(0.5 + rng.random(N))
    M = np.asarray(U @ U.T) + np.diag(np.asarray(h))
    pre = split_precond(U, h)
    r = rng.standard_normal(N)
    np.testing.assert_allclose(np.asarray(pre(jnp.asarray(r))),
                               np.linalg.solve(M, r), rtol=1e-9,
                               atol=1e-12)
    R = rng.standard_normal((N, 3))
    np.testing.assert_allclose(np.asarray(pre(jnp.asarray(R))),
                               np.linalg.solve(M, R), rtol=1e-9,
                               atol=1e-12)


def test_split_precond_accelerates_ill_conditioned_cg():
    """On a smooth-kernel system where plain CG stalls, the rank-m
    pivoted-Cholesky split preconditioner reaches the tolerance in a
    small fraction of the iterations (the N=50k bench measurement's
    small-N analogue)."""
    from gpyrn_tpu.ops.iterative import pivoted_cholesky, split_precond
    rng = np.random.default_rng(11)
    N = 400
    t = jnp.asarray(np.sort(rng.uniform(0, 100, N)))
    k = g.covfunc.SquaredExponential(1.0, 30.0)   # very smooth: tiny eigs
    pars = jnp.asarray(np.asarray(k.core_params(), float))
    b = jnp.asarray(rng.standard_normal(N))
    nug = 1e-6
    mv = lambda x: kernel_matvec(k.structure, pars, t, x, nugget=nug)
    x0, it0 = cg_solve(mv, b, tol=1e-8, maxiter=300)
    U, _ = pivoted_cholesky(k.structure, pars, t, 40, nugget=0.0)
    pre = split_precond(U, jnp.full(N, nug))
    x1, it1 = cg_solve(mv, b, tol=1e-8, maxiter=300, precond_apply=pre)
    rel = float(jnp.linalg.norm(mv(x1) - b) / jnp.linalg.norm(b))
    assert rel < 1e-6
    assert int(it1) * 4 <= int(it0), (int(it1), int(it0))
