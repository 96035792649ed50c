"""Implicit (fixed-point) differentiation of the converged ELBO
(models/implicit.py): the gradient the reference's Nelder-Mead
`optimize()` descends (meanfield.py:1095-1152), computed exactly at the
fixed point by the implicit function theorem instead of by unrolling
sweeps.  Oracles: (a) the unrolled gradient from the converged state,
which approaches the implicit one geometrically in the sweep count, and
(b) finite differences of the fully re-converged ELBO."""
import numpy as np
import pytest

import gpyrn_tpu as g
from gpyrn_tpu.models.implicit import implicit_value_and_grad_for


def _make(q, p, seed=0):
    rng = np.random.default_rng(seed)
    N = 30
    t = np.sort(rng.uniform(0, 30, N))
    ys = []
    for i in range(p):
        y = np.sin(2 * np.pi * t / 10 + i) + 0.1 * rng.standard_normal(N)
        ys += [y, np.full(N, 0.1)]
    m = g.inference(q, t, *ys)
    nodes = [g.covfunc.Periodic(1.0, 10.0, 0.5),
             g.covfunc.Matern52(1.0, 7.0)][:q]
    weights = [g.covfunc.SquaredExponential(1.0 + 0.2 * k, 5.0 + k)
               for k in range(q * p)]
    m.set_components(nodes, weights, [None] * p, [0.1] * p)
    return m


def _converged_state(m, tol=1e-13):
    theta = m._theta()
    t = np.asarray(m.time, dtype=float)
    mu0, var0 = m.engine.init_mu_var(theta, m.y)
    mu, var, n_iter, conv = m.engine.fit_state(
        theta, t, m.y, m.yerr2, mu0, var0, 4000, tol)
    assert bool(conv)
    return theta, t, mu, var


# slow tier: the fast gate keeps the finite-difference certification
# oracle and the meanfield surface test below
@pytest.mark.parametrize(
    "q,p,k", [pytest.param(1, 1, 60, marks=pytest.mark.slow),
              pytest.param(2, 2, 960, marks=pytest.mark.slow)])
def test_implicit_matches_unrolled_from_fixed_point(q, p, k):
    """Unrolling sweeps from the fixed point converges geometrically to
    the implicit gradient (the contraction rate is problem-dependent —
    the (2,2) case needs ~960 sweeps for 1e-6); the error must both be
    small at k and shrink as the unroll deepens."""
    m = _make(q, p)
    theta, t, mu, var = _converged_state(m)
    ivag = implicit_value_and_grad_for(m.engine)
    res = ivag(theta, t, m.y, m.yerr2, mu, var)
    assert float(res.state_residual) < 1e-10
    assert float(res.adjoint_residual) < 1e-9

    gi = np.asarray(res.grad)
    scale = np.max(np.abs(gi))

    v_half, g_half = m.engine.elbo_value_and_grad(
        theta, t, m.y, m.yerr2, mu, var, k // 2)
    v_un, g_un = m.engine.elbo_value_and_grad(
        theta, t, m.y, m.yerr2, mu, var, k)
    np.testing.assert_allclose(float(res.elbo), float(v_un), rtol=1e-10)
    err_half = np.max(np.abs(np.asarray(g_half) - gi)) / scale
    err_full = np.max(np.abs(np.asarray(g_un) - gi)) / scale
    # geometric approach: deeper unrolls land closer to the implicit grad
    assert err_full < max(0.3 * err_half, 1e-12)
    np.testing.assert_allclose(np.asarray(res.grad), np.asarray(g_un),
                               rtol=1e-5, atol=1e-6 * scale)


def test_implicit_matches_finite_differences_of_converged_elbo():
    """The certification oracle: central differences of G(θ) where each
    evaluation re-converges the state (warm-started) to 1e-13."""
    m = _make(1, 1)
    theta, t, mu, var = _converged_state(m)
    ivag = implicit_value_and_grad_for(m.engine)
    res = ivag(theta, t, m.y, m.yerr2, mu, var)

    def G(th):
        mu_s, var_s, _, conv = m.engine.fit_state(
            th, t, m.y, m.yerr2, mu, var, 4000, 1e-13)
        assert bool(conv)
        e, _, _ = m.engine.sweep_once(th, t, m.y, m.yerr2, mu_s, var_s)
        return float(e)

    eps = 1e-6
    grad = np.asarray(res.grad)
    for k in range(theta.size):
        tp = theta.copy(); tp[k] += eps
        tm = theta.copy(); tm[k] -= eps
        fd = (G(tp) - G(tm)) / (2 * eps)
        assert grad[k] == pytest.approx(fd, rel=5e-5, abs=1e-6), \
            f"param {k}: implicit {grad[k]} vs fd {fd}"


@pytest.mark.slow
def test_neumann_adjoint_agrees_with_gmres():
    m = _make(1, 1)
    theta, t, mu, var = _converged_state(m)
    ivag = implicit_value_and_grad_for(m.engine)
    r_g = ivag(theta, t, m.y, m.yerr2, mu, var, adjoint="gmres")
    r_n = ivag(theta, t, m.y, m.yerr2, mu, var, adjoint="neumann",
               maxiter=400)
    scale = np.max(np.abs(np.asarray(r_g.grad)))
    np.testing.assert_allclose(np.asarray(r_n.grad),
                               np.asarray(r_g.grad),
                               rtol=1e-6, atol=1e-8 * scale)


def test_meanfield_surface_implicit():
    """inference.elbo_grad(method='implicit') converges the state itself,
    caches it, and returns the implicit gradient."""
    m = _make(1, 1)
    v, grad = m.elbo_grad(method='implicit', fit_tol=1e-13,
                          fit_max_iter=4000)
    assert np.isfinite(v) and np.all(np.isfinite(grad))
    # cache was updated to the converged state
    assert m._mu is not None
    theta, t, mu, var = m._theta(), np.asarray(m.time, float), m._mu, m._var
    res = implicit_value_and_grad_for(m.engine)(
        theta, t, m.y, m.yerr2, mu, var)
    np.testing.assert_allclose(v, float(res.elbo), rtol=1e-12)
    np.testing.assert_allclose(grad, np.asarray(res.grad), rtol=1e-10)

    with pytest.raises(ValueError):
        m.elbo_grad(method='nope')


@pytest.mark.slow
def test_optimize_adam_implicit_improves_converged_elbo():
    """The bilevel optimizer: each adam step re-converges the state and
    uses the exact implicit hypergradient.  A few steps must improve the
    converged ELBO over the starting hyperparameters."""
    m = _make(1, 1)
    v0, _ = m.elbo_grad(method='implicit', fit_tol=1e-12,
                        fit_max_iter=3000)
    out = m.optimize_adam(n_steps=15, learning_rate=5e-2,
                          grad='implicit', fit_tol=1e-11,
                          fit_max_iter=500)
    assert np.isfinite(out['fun'])
    assert -out['fun'] > v0 - 1e-8          # converged ELBO improved
    assert out['elbo'] >= v0 - 1e-6
