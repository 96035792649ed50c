"""Distributed matrix-free CG (parallel/iterative_sharded.py).

Claim under test: the row-slab-distributed solve equals the single-chip
cg_solve on the same system — including non-decaying kernels where the
identity-padding must be exact — and handles N not divisible by the
axis size.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gpyrn_tpu as g
from gpyrn_tpu.ops.iterative import cg_solve, kernel_matvec
from gpyrn_tpu.parallel import cg_solve_sharded, make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs multiple devices")


def _system(N, kernel, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 100, N))
    b = rng.standard_normal((N, 2))
    d = 0.3 + rng.random(N)
    return t, b, d, kernel


@pytest.mark.parametrize("N", [128, 130])   # 130: pad path (8 devices)
def test_sharded_cg_matches_single_chip(N):
    t, b, d, k = _system(N, g.covfunc.QuasiPeriodic(1.0, 30.0, 20.0,
                                                    0.7))
    pars = np.asarray(k.core_params(), dtype=float)
    mesh = make_mesh(shape=(len(jax.devices()), 1))

    def mv(x):
        y = kernel_matvec(k.structure, pars, t, x, nugget=1e-2)
        return y + (d[:, None] * x if x.ndim == 2 else d * x)

    x_ref, _ = cg_solve(mv, b, tol=1e-10, maxiter=400,
                        precond_diag=1.0 + 1e-2 + d)
    x_sh, it = cg_solve_sharded(k.structure, pars, t, b, mesh,
                                d_add=d, nugget=1e-2, tol=1e-10,
                                maxiter=400)
    np.testing.assert_allclose(x_sh, x_ref, rtol=1e-5, atol=1e-8)
    assert it > 0


def test_sharded_cg_nondecaying_kernel_pad_exact():
    """Periodic never decays, so lazy 'distant dummy rows' padding
    would corrupt the solution — the identity-padding must not."""
    t, b, d, k = _system(131, g.covfunc.Periodic(1.0, 9.0, 0.7), seed=1)
    pars = np.asarray(k.core_params(), dtype=float)
    mesh = make_mesh(shape=(len(jax.devices()), 1))

    def mv(x):
        y = kernel_matvec(k.structure, pars, t, x, nugget=1e-2)
        return y + (d[:, None] * x if x.ndim == 2 else d * x)

    x_ref, _ = cg_solve(mv, b, tol=1e-10, maxiter=500)
    x_sh, _ = cg_solve_sharded(k.structure, pars, t, b, mesh,
                               d_add=d, nugget=1e-2, tol=1e-10,
                               maxiter=500)
    np.testing.assert_allclose(x_sh, x_ref, rtol=1e-5, atol=1e-8)


def test_sharded_cg_single_rhs_squeeze():
    t, b, d, k = _system(64, g.covfunc.SquaredExponential(1.0, 20.0))
    pars = np.asarray(k.core_params(), dtype=float)
    mesh = make_mesh(shape=(len(jax.devices()), 1))
    x, it = cg_solve_sharded(k.structure, pars, t, b[:, 0], mesh,
                             d_add=d, nugget=1e-2, tol=1e-8)
    assert x.shape == (64,)
    resid = np.asarray(
        kernel_matvec(k.structure, pars, t, jnp.asarray(x),
                      nugget=1e-2)) + d * x - b[:, 0]
    assert np.linalg.norm(resid) / np.linalg.norm(b[:, 0]) < 1e-6


@pytest.mark.slow
def test_predict_iterative_mesh_matches_unsharded():
    """predict_iterative(mesh=...) distributes every conditional solve;
    the prediction must match the unsharded CG path."""
    from gpyrn_tpu.models.iterative import predict_iterative
    rng = np.random.default_rng(2)
    N = 40
    t = np.sort(rng.uniform(0, 60, N))
    y = np.sin(2 * np.pi * t / 13) + 0.1 * rng.standard_normal(N)
    m = g.inference(1, t, y, np.full(N, 0.1))
    m.set_components([g.covfunc.Periodic(1.0, 13.0, 0.6)],
                     [g.covfunc.SquaredExponential(1.0, 8.0)],
                     [None], [0.1])
    m.ELBOcalc(max_iter=80)
    ts = np.linspace(0, 60, 50)
    _, mean_r, std_r, _ = predict_iterative(m, tstar=ts, tol=1e-10)
    mesh = make_mesh(shape=(len(jax.devices()), 1))
    _, mean_s, std_s, _ = predict_iterative(m, tstar=ts, tol=1e-10,
                                            mesh=mesh)
    np.testing.assert_allclose(mean_s, mean_r, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(std_s, std_r, rtol=1e-5, atol=1e-8)


@pytest.mark.slow
def test_cg_fit_sharded_matches_unsharded():
    """The matrix-free TRAINING fit with row-sharded matvecs
    (make_cg_fit(mesh=...)) equals the single-chip CG fit."""
    from gpyrn_tpu.models.cg_fit import make_cg_fit
    rng = np.random.default_rng(3)
    N = 8 * len(jax.devices())
    t = np.sort(rng.uniform(0, 60, N))
    data = []
    for i in range(2):
        data += [np.sin(2 * np.pi * t / (11 + 3 * i))
                 + 0.1 * rng.standard_normal(N), np.full(N, 0.1)]
    m = g.inference(1, t, *data)
    m.set_components([g.covfunc.Periodic(1.0, 11.0, 0.6)],
                     [g.covfunc.SquaredExponential(1.0, 8.0),
                      g.covfunc.SquaredExponential(0.9, 9.0)],
                     [None] * 2, [0.1] * 2)
    spec, core_maps = m._spec_and_core_maps()
    theta = m._theta()
    tt = np.asarray(m.time, dtype=float)
    mu0, var0 = m.engine.init_mu_var(theta, m.y)

    rank = min(48, N)
    eng_u = make_cg_fit(spec, rank=rank, core_maps=core_maps)
    mu_u, var_u, it_u, _, _ = eng_u.fit_state_cg(theta, tt, m.y,
                                                 m.yerr2, mu0, var0,
                                                 30, 0.0)
    mesh = make_mesh(shape=(len(jax.devices()), 1))
    eng_s = make_cg_fit(spec, rank=rank, core_maps=core_maps,
                        mesh=mesh)
    mu_s, var_s, it_s, _, _ = eng_s.fit_state_cg(theta, tt, m.y,
                                                 m.yerr2, mu0, var0,
                                                 30, 0.0)
    assert int(it_s) == int(it_u)
    scale = 1.0 + np.max(np.abs(np.asarray(mu_u)))
    assert np.max(np.abs(np.asarray(mu_s) - np.asarray(mu_u))) / scale \
        < 1e-8
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_u),
                               rtol=1e-7, atol=1e-12)


def test_cg_fit_sharded_indivisible_raises():
    from gpyrn_tpu.models.cg_fit import make_cg_fit
    rng = np.random.default_rng(0)
    N = 8 * len(jax.devices()) + 1
    t = np.sort(rng.uniform(0, 20, N))
    m = g.inference(1, t, rng.standard_normal(N), np.full(N, 0.1))
    m.set_components([g.covfunc.Periodic(1.0, 8.0, 0.5)],
                     [g.covfunc.SquaredExponential(1.0, 5.0)],
                     [None], [0.1])
    spec, core_maps = m._spec_and_core_maps()
    mesh = make_mesh(shape=(len(jax.devices()), 1))
    with pytest.raises(ValueError, match="divisible"):
        make_cg_fit(spec, rank=16, core_maps=core_maps, mesh=mesh)


def test_sharded_cg_lowrank_precond_matches_and_accelerates():
    """precond_rank: the distributed solve with the rank-m
    pivoted-Cholesky split preconditioner returns the same solution as
    the Jacobi-preconditioned distributed solve, in fewer iterations on
    a smooth (ill-conditioned) kernel — including the N % devices != 0
    padding path, where the preconditioner's pad rows must reduce to
    the identity."""
    rng = np.random.default_rng(7)
    N = 133                                   # pad path on 8 devices
    t = np.sort(rng.uniform(0, 100, N))
    b = rng.standard_normal((N, 2))
    k = g.covfunc.SquaredExponential(1.0, 30.0)   # smooth: tiny eigs
    pars = np.asarray(k.core_params(), dtype=float)
    mesh = make_mesh(shape=(len(jax.devices()), 1))
    nug = 1e-6
    x_j, it_j = cg_solve_sharded(k.structure, pars, t, b, mesh,
                                 nugget=nug, tol=1e-9, maxiter=500)
    x_p, it_p = cg_solve_sharded(k.structure, pars, t, b, mesh,
                                 nugget=nug, tol=1e-9, maxiter=500,
                                 precond_rank=40)

    def mv(x):
        return kernel_matvec(k.structure, pars, t, x, nugget=nug)

    res_p = float(np.linalg.norm(np.asarray(mv(jnp.asarray(x_p))) - b)
                  / np.linalg.norm(b))
    assert res_p < 1e-6
    np.testing.assert_allclose(x_p, x_j, rtol=1e-4, atol=1e-6)
    assert it_p * 3 <= it_j, (it_p, it_j)


def test_sharded_cg_refresh_and_relres():
    """refresh_every/return_relres parity with the single-chip solver:
    the refreshed distributed solve matches the plain one in f64 and
    the reported relres equals an independent b − A x."""
    t, b, d, k = _system(128, g.covfunc.QuasiPeriodic(1.0, 30.0, 20.0,
                                                      0.7), seed=4)
    pars = np.asarray(k.core_params(), dtype=float)
    mesh = make_mesh(shape=(len(jax.devices()), 1))
    x_p, _ = cg_solve_sharded(k.structure, pars, t, b, mesh, d_add=d,
                              nugget=1e-2, tol=1e-10, maxiter=400)
    x_r, it_r, rel = cg_solve_sharded(k.structure, pars, t, b, mesh,
                                      d_add=d, nugget=1e-2, tol=1e-10,
                                      maxiter=400, refresh_every=7,
                                      return_relres=True)
    np.testing.assert_allclose(x_r, x_p, rtol=1e-6, atol=1e-9)
    resid = np.asarray(kernel_matvec(k.structure, pars, t,
                                     jnp.asarray(x_r), nugget=1e-2)) \
        + d[:, None] * x_r - b
    true_rel = float(np.max(np.linalg.norm(resid, axis=0)
                            / np.linalg.norm(b, axis=0)))
    np.testing.assert_allclose(rel, true_rel, rtol=1e-6, atol=1e-12)
    assert rel <= 1e-9


def test_sharded_cg_lowrank_precond_zero_nugget_no_d_add():
    """precond_rank with nugget=0 and no d_add: h must stay positive
    (pivoting residual + TRAIN_NUGGET floor) — an all-zero h made the
    split-form preconditioner emit NaN z, whose breakdown guards froze
    every column into a silent x = 0 at maxiter (round-4 advisor)."""
    rng = np.random.default_rng(11)
    N = 64
    t = np.sort(rng.uniform(0, 100, N))
    k = g.covfunc.QuasiPeriodic(1.0, 3.0, 20.0, 0.7)
    pars = np.asarray(k.core_params(), dtype=float)
    x_true = rng.standard_normal(N)
    b = np.asarray(kernel_matvec(k.structure, pars, t,
                                 jnp.asarray(x_true), nugget=0.0))
    mesh = make_mesh(shape=(len(jax.devices()), 1))
    x, it = cg_solve_sharded(k.structure, pars, t, b, mesh,
                             nugget=0.0, tol=1e-8, maxiter=60,
                             precond_rank=16)
    assert np.all(np.isfinite(x))
    assert np.linalg.norm(x) > 0.0, "silent x=0 regression"
    resid = np.asarray(kernel_matvec(k.structure, pars, t,
                                     jnp.asarray(x), nugget=0.0)) - b
    assert np.linalg.norm(resid) / np.linalg.norm(b) < 1e-4
