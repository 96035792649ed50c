"""Panel-sharded (N-axis) distributed linalg + fit — equality vs the
single-chip engine on the 8-virtual-device CPU mesh.

This is SURVEY.md §5.7's sequence parallelism (round-2 verdict item 3):
at q = 1, p = 1 the lattice axis offers no parallelism at all, so these
tests prove the panel path — not lattice batching — carries the
distribution (including the N ≥ 4096 case the verdict prescribes).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

import gpyrn_tpu as g
from gpyrn_tpu.parallel import panel as pp
from gpyrn_tpu.parallel.panel_fit import make_panel_engine

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices")


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), ("lat",))


# ---------------------------------------------------------------------------
# raw panel linear algebra
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("N,B", [(64, 8), (300, 32), (200, 64)])
def test_panel_linalg_matches_dense(N, B):
    """Cholesky, logdet, cho_solve and the Σ-free diag/trace pass all
    agree with dense single-device linalg, including padding (N=300
    pads to 512) and the B > Nl-block edge (200 → B clamped)."""
    dims = pp.panel_dims(N, 8, B)
    rng = np.random.default_rng(N)
    M = rng.standard_normal((N, N))
    A = M @ M.T + N * np.eye(N)
    b = rng.standard_normal(N)
    Ap = np.eye(dims.Np)
    Ap[:N, :N] = A
    bp = np.zeros(dims.Np)
    bp[:N] = b

    def inner(A_slab, b_rep):
        L = pp.panel_cholesky_local(A_slab, dims, "lat")
        ld = pp.panel_logdet_half_local(L, dims, "lat")
        x = pp.panel_cho_solve_local(L, b_rep, dims, "lat")
        dS, cn = pp.panel_diag_trace_local(L, A_slab, dims, "lat")
        Lfull = jax.lax.all_gather(L, "lat", tiled=True)
        return Lfull, ld, x, dS, cn

    f = jax.jit(jax.shard_map(inner, mesh=_mesh(),
                              in_specs=(P("lat", None), P()),
                              out_specs=(P(),) * 5, check_vma=False))
    Lfull, ld, x, dS, cn = f(jnp.asarray(Ap), jnp.asarray(bp))
    L_ref = np.linalg.cholesky(A)
    s = np.max(np.abs(L_ref))
    np.testing.assert_allclose(np.asarray(Lfull)[:N, :N], L_ref,
                               atol=1e-11 * s)
    assert abs(float(ld) - np.sum(np.log(np.diag(L_ref)))) < 1e-10
    x_ref = np.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(x)[:N], x_ref, rtol=1e-9,
                               atol=1e-11 * np.max(np.abs(x_ref)))
    # diag/trace: with K := A the solve is B = L⁻¹A = Lᵀ exactly
    Bm = np.linalg.solve(L_ref, A)
    np.testing.assert_allclose(
        np.asarray(dS)[:N], np.diag(A) - np.sum(Bm ** 2, axis=0),
        atol=1e-8 * N)
    np.testing.assert_allclose(
        np.asarray(cn)[:N], np.sum((L_ref.T - Bm) ** 2, axis=0),
        atol=1e-8)
    # identity padding stays clean
    if dims.Np > N:
        assert np.max(np.abs(np.asarray(dS)[N:])) == 0.0
        assert np.max(np.abs(np.asarray(cn)[N:])) == 0.0


def test_panel_solve_t():
    N, B = 100, 16
    dims = pp.panel_dims(N, 8, B)
    rng = np.random.default_rng(7)
    M = rng.standard_normal((N, N))
    A = M @ M.T + N * np.eye(N)
    b = rng.standard_normal(N)
    Ap = np.eye(dims.Np)
    Ap[:N, :N] = A
    bp = np.zeros(dims.Np)
    bp[:N] = b

    def inner(A_slab, b_rep):
        L = pp.panel_cholesky_local(A_slab, dims, "lat")
        return (pp.panel_solve_local(L, b_rep, dims, "lat"),
                pp.panel_solve_t_local(L, b_rep, dims, "lat"))

    f = jax.jit(jax.shard_map(inner, mesh=_mesh(),
                              in_specs=(P("lat", None), P()),
                              out_specs=(P(), P()), check_vma=False))
    xf, xb = f(jnp.asarray(Ap), jnp.asarray(bp))
    L = np.linalg.cholesky(A)
    np.testing.assert_allclose(np.asarray(xf)[:N],
                               np.linalg.solve(L, b), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(xb)[:N],
                               np.linalg.solve(L.T, b), rtol=1e-9)


# ---------------------------------------------------------------------------
# model-level panel fit vs the single-chip engine
# ---------------------------------------------------------------------------

def _problem(N, q=1, p=2, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 100, N))
    ys, errs = [], []
    for i in range(p):
        ys.append(np.sin(2 * np.pi * t / 31 + i) +
                  0.05 * rng.standard_normal(N))
        errs.append(0.05 * np.ones(N))
    args = [v for pair in zip(ys, errs) for v in pair]
    gprn = g.inference(q, t, *args)
    nodes = [g.covfunc.QuasiPeriodic(1., 40., 31., .7)][:q]
    weights = [g.covfunc.SquaredExponential(1. + .1 * a, 50. + 5 * a)
               for a in range(q * p)]
    gprn.set_components(nodes, weights, [None] * p, [0.05] * p)
    return gprn


def test_panel_fit_state_matches_engine():
    gprn = _problem(150, q=1, p=2)
    eng = gprn.engine
    theta = gprn._theta()
    tt = np.asarray(gprn.time, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, gprn.y)
    pe = make_panel_engine(eng.spec, _mesh(), block=16)
    mu_r, var_r, it_r, _ = eng.fit_state(theta, tt, gprn.y, gprn.yerr2,
                                         mu0, var0, 25, 1e-12)
    mu_p, var_p, it_p, _ = pe.fit_state_panel(
        theta, tt, gprn.y, gprn.yerr2, mu0, var0, 25, 1e-12)
    assert int(it_r) == int(it_p)
    np.testing.assert_allclose(np.asarray(mu_p), np.asarray(mu_r),
                               atol=1e-9 * (1 + np.max(np.abs(mu_r))))
    np.testing.assert_allclose(np.asarray(var_p), np.asarray(var_r),
                               atol=1e-9 * (1 + np.max(np.abs(var_r))))


@pytest.mark.slow
def test_panel_elbo_fit_matches_engine():
    """Full reference-semantics fit (ELBO stopping rule): identical
    ELBO and iteration count, q = 1 p = 1 — lat-sharding cannot help."""
    gprn = _problem(120, q=1, p=1)
    eng = gprn.engine
    theta = gprn._theta()
    tt = np.asarray(gprn.time, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, gprn.y)
    pe = make_panel_engine(eng.spec, _mesh(), block=16)
    e_r, _, _, it_r, done_r, _ = eng.elbo_fit(
        theta, tt, gprn.y, gprn.yerr2, mu0, var0, 200)
    e_p, _, _, it_p, done_p = pe.elbo_fit_panel(
        theta, tt, gprn.y, gprn.yerr2, mu0, var0, 200)
    assert int(it_r) == int(it_p) and bool(done_p)
    assert abs(float(e_p) - float(e_r)) < 1e-9 * abs(float(e_r))


@pytest.mark.slow
def test_panel_nonstationary_and_composite_kernels():
    """Slab assembly parity for non-stationary kernels and mixed
    composites (the reference can't even evaluate these mixes)."""
    gprn = _problem(90, q=1, p=1)
    gprn.set_components(
        g.covfunc.SquaredExponential(1., 40.) +
        g.covfunc.Linear(50.) * g.covfunc.Constant(0.02),
        [g.covfunc.Matern52(1., 30.)], [None], [0.05])
    eng = gprn.engine
    theta = gprn._theta()
    tt = np.asarray(gprn.time, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, gprn.y)
    pe = make_panel_engine(eng.spec, _mesh(), block=16)
    e_r, mu_r, _ = eng.elbo_refine(theta, tt, gprn.y, gprn.yerr2,
                                   mu0, var0, 3)
    e_p, mu_p, _ = pe.elbo_refine_panel(theta, tt, gprn.y, gprn.yerr2,
                                        mu0, var0, 3)
    assert abs(float(e_p) - float(e_r)) < 1e-9 * abs(float(e_r))
    np.testing.assert_allclose(np.asarray(mu_p), np.asarray(mu_r),
                               atol=1e-8 * (1 + np.max(np.abs(mu_r))))


def _problem_q2(N=80, seed=3):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 100, N))
    y = np.sin(2 * np.pi * t / 31) + 0.05 * rng.standard_normal(N)
    gprn = g.inference(2, t, y, 0.05 * np.ones(N))
    gprn.set_components(
        [g.covfunc.QuasiPeriodic(1., 40., 31., .7),
         g.covfunc.SquaredExponential(.8, 60.)],
        [g.covfunc.SquaredExponential(1., 50.),
         g.covfunc.Matern32(1., 45.)],
        [None], [0.05])
    return gprn


@pytest.mark.slow
def test_panel_q2_updates():
    """fit_state_panel at q > 1 (updates have no cross-trace terms)."""
    gprn = _problem_q2()
    eng = gprn.engine
    theta = gprn._theta()
    tt = np.asarray(gprn.time, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, gprn.y)
    pe = make_panel_engine(eng.spec, _mesh(), block=16)
    mu_r, var_r, it_r, _ = eng.fit_state(theta, tt, gprn.y, gprn.yerr2,
                                         mu0, var0, 10, 1e-12)
    mu_p, var_p, it_p, _ = pe.fit_state_panel(
        theta, tt, gprn.y, gprn.yerr2, mu0, var0, 10, 1e-12)
    assert int(it_r) == int(it_p)
    np.testing.assert_allclose(np.asarray(mu_p), np.asarray(mu_r),
                               atol=1e-8 * (1 + np.max(np.abs(mu_r))))


def test_panel_tri_inv_and_fro_cross_match_dense():
    """The q > 1 cross-trace primitives: panel triangular inversion
    (row slabs of L⁻¹ + diag(K⁻¹)) and the streaming Frobenius norm
    ‖L_A⁻¹ diag(d) Gᵀ‖² against dense references, incl. padding."""
    N, B = 140, 16
    dims = pp.panel_dims(N, 8, B)
    rng = np.random.default_rng(11)
    M = rng.standard_normal((N, N))
    K = M @ M.T + N * np.eye(N)
    M2 = rng.standard_normal((N, N))
    A = M2 @ M2.T + N * np.eye(N)
    d = 0.1 + rng.random(N)
    Kp = np.eye(dims.Np)
    Kp[:N, :N] = K
    Ap = np.eye(dims.Np)
    Ap[:N, :N] = A
    dp = np.zeros(dims.Np)
    dp[:N] = d

    def inner(K_slab, A_slab, d_rep):
        L_K = pp.panel_cholesky_local(K_slab, dims, "lat")
        G, dKinv = pp.panel_tri_inv_local(L_K, dims, "lat")
        L_A = pp.panel_cholesky_local(A_slab, dims, "lat")
        frob = pp.panel_fro_cross_local(L_A, G, d_rep, dims, "lat")
        Gfull = jax.lax.all_gather(G, "lat", tiled=True)
        return Gfull, dKinv, frob

    f = jax.jit(jax.shard_map(
        inner, mesh=_mesh(),
        in_specs=(P("lat", None), P("lat", None), P()),
        out_specs=(P(),) * 3, check_vma=False))
    Gfull, dKinv, frob = f(jnp.asarray(Kp), jnp.asarray(Ap),
                           jnp.asarray(dp))
    L_ref = np.linalg.cholesky(K)
    G_ref = np.linalg.inv(L_ref)
    np.testing.assert_allclose(np.asarray(Gfull)[:N, :N], G_ref,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(dKinv)[:N],
                               np.diag(np.linalg.inv(K)), rtol=1e-8)
    LA_ref = np.linalg.cholesky(A)
    W_ref = np.linalg.solve(LA_ref, np.diag(d) @ G_ref.T)
    assert abs(float(frob) - np.sum(W_ref ** 2)) < 1e-8 * (
        1 + np.sum(W_ref ** 2))


@pytest.mark.slow
def test_panel_elbo_refine_q2_matches_engine():
    """q = 2 reference-semantics sweeps + ELBO: the cumulative
    cross-trace quirk and the raw-flatten weight-prior pairing, panel-
    distributed, against the single-chip engine."""
    gprn = _problem_q2()
    eng = gprn.engine
    theta = gprn._theta()
    tt = np.asarray(gprn.time, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, gprn.y)
    pe = make_panel_engine(eng.spec, _mesh(), block=16)
    e_r, mu_r, var_r = eng.elbo_refine(theta, tt, gprn.y, gprn.yerr2,
                                       mu0, var0, 4)
    e_p, mu_p, var_p = pe.elbo_refine_panel(theta, tt, gprn.y,
                                            gprn.yerr2, mu0, var0, 4)
    assert abs(float(e_p) - float(e_r)) < 1e-9 * abs(float(e_r))
    np.testing.assert_allclose(np.asarray(mu_p), np.asarray(mu_r),
                               atol=1e-8 * (1 + np.max(np.abs(mu_r))))
    np.testing.assert_allclose(np.asarray(var_p), np.asarray(var_r),
                               atol=1e-8 * (1 + np.max(np.abs(var_r))))


@pytest.mark.slow
def test_panel_elbo_fit_q2p2_matches_engine():
    """q = 2, p = 2 full reference fit (ELBO stopping rule): identical
    ELBO and iteration count vs the single-chip engine."""
    rng = np.random.default_rng(5)
    N = 100
    t = np.sort(rng.uniform(0, 100, N))
    args = []
    for i in range(2):
        args += [np.sin(2 * np.pi * t / 31 + i) +
                 0.05 * rng.standard_normal(N), 0.05 * np.ones(N)]
    gprn = g.inference(2, t, *args)
    gprn.set_components(
        [g.covfunc.QuasiPeriodic(1., 40., 31., .7),
         g.covfunc.SquaredExponential(.8, 60.)],
        [g.covfunc.SquaredExponential(1. + .1 * a, 50. + 5 * a)
         for a in range(4)],
        [None] * 2, [0.05] * 2)
    eng = gprn.engine
    theta = gprn._theta()
    tt = np.asarray(gprn.time, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, gprn.y)
    pe = make_panel_engine(eng.spec, _mesh(), block=16)
    e_r, _, _, it_r, done_r, _ = eng.elbo_fit(
        theta, tt, gprn.y, gprn.yerr2, mu0, var0, 150)
    e_p, _, _, it_p, done_p = pe.elbo_fit_panel(
        theta, tt, gprn.y, gprn.yerr2, mu0, var0, 150)
    assert int(it_r) == int(it_p) and bool(done_p) == bool(done_r)
    assert abs(float(e_p) - float(e_r)) < 1e-9 * abs(float(e_r))


@pytest.mark.slow
def test_panel_elbo_refine_q3_multiple_cross_pairs():
    """q = 3: all three (j, k) cumulative cross pairs exercised."""
    rng = np.random.default_rng(9)
    N = 72
    t = np.sort(rng.uniform(0, 100, N))
    y = np.sin(2 * np.pi * t / 31) + 0.05 * rng.standard_normal(N)
    gprn = g.inference(3, t, y, 0.05 * np.ones(N))
    gprn.set_components(
        [g.covfunc.QuasiPeriodic(1., 40., 31., .7),
         g.covfunc.SquaredExponential(.8, 60.),
         g.covfunc.Matern52(.9, 35.)],
        [g.covfunc.SquaredExponential(1. + .1 * a, 50. + 5 * a)
         for a in range(3)],
        [None], [0.05])
    eng = gprn.engine
    theta = gprn._theta()
    tt = np.asarray(gprn.time, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, gprn.y)
    pe = make_panel_engine(eng.spec, _mesh(), block=8)
    e_r, mu_r, _ = eng.elbo_refine(theta, tt, gprn.y, gprn.yerr2,
                                   mu0, var0, 3)
    e_p, mu_p, _ = pe.elbo_refine_panel(theta, tt, gprn.y, gprn.yerr2,
                                        mu0, var0, 3)
    assert abs(float(e_p) - float(e_r)) < 1e-9 * abs(float(e_r))
    np.testing.assert_allclose(np.asarray(mu_p), np.asarray(mu_r),
                               atol=1e-8 * (1 + np.max(np.abs(mu_r))))


@pytest.mark.slow
def test_panel_elbo_refine_N4096():
    """The round-2 verdict's prescribed shape: q = 1, p = 1, N ≥ 4096
    on the 8-device mesh — reference-semantics sweep + ELBO equality
    where the lattice axis cannot contribute any parallelism."""
    gprn = _problem(4096, q=1, p=1)
    eng = gprn.engine
    theta = gprn._theta()
    tt = np.asarray(gprn.time, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, gprn.y)
    pe = make_panel_engine(eng.spec, _mesh(), block=256)
    e_r, mu_r, _ = eng.elbo_refine_lean(theta, tt, gprn.y, gprn.yerr2,
                                        mu0, var0, 1)
    e_p, mu_p, _ = pe.elbo_refine_panel(theta, tt, gprn.y, gprn.yerr2,
                                        mu0, var0, 1)
    assert abs(float(e_p) - float(e_r)) < 1e-8 * abs(float(e_r))
    np.testing.assert_allclose(np.asarray(mu_p), np.asarray(mu_r),
                               atol=1e-7 * (1 + np.max(np.abs(mu_r))))
