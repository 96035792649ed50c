"""Implicit (fixed-point) differentiation of the converged ELBO.

The coordinate-ascent sweep is a fixed-point map s ← T(θ, s) over the
variational state s = (μ, σ²), and the reference's reported ELBO at
convergence is E(θ, s*) — the ELBOaux terms evaluated at the post-sweep
state (reference meanfield.py:651-710, outer loop :634-647).  The
gradient that the reference's Nelder-Mead `optimize()` implicitly
descends is therefore

    dG/dθ = ∂E/∂θ + (∂E/∂s)ᵀ · ds*/dθ ,
    ds*/dθ = (I − ∂T/∂s)⁻¹ · ∂T/∂θ        (implicit function theorem),

well-defined because the stable fixed point has ρ(∂T/∂s) < 1.  The
engine's unrolled `elbo_value_and_grad` differentiates through a FIXED
number of sweeps — exact for that truncated objective, but it needs the
whole sweep stack live for the backward pass and its gradient only
approaches dG/dθ as the count grows.  This module computes dG/dθ
directly at the fixed point with O(1) memory in the sweep count:

  * one `jax.vjp` linearization of a single sweep (`engine.sweep_once`),
  * an adjoint solve  w = (I − Jᵀ)⁻¹ v  with  v = ∂E/∂s, where every
    operator application is ONE cotangent pull-back through the stored
    sweep linearization — no refactorizations, no re-sweeps,
  * grad = ∂E/∂θ + (∂T/∂θ)ᵀ w  by one more pull-back.

The adjoint solve is a linear fixed point u ← v + Jᵀu; plain iteration
converges at the sweep map's own rate ρ (measured ≈0.966 per sweep at
N=5000 — hundreds of terms), so the default solver is GMRES
(`jax.scipy.sparse.linalg.gmres`), which collapses that to a few dozen
operator applications; a truncated-Neumann fallback is provided for the
strongly-contractive regime.

The reference has no gradient path at all (SURVEY.md §3.3: gradient-free
Nelder-Mead because nothing differentiates through the NumPy loop); this
surface has no reference counterpart.  It composes with `fit_state` /
the Anderson refine (ops/fixedpoint.py), which produce the converged
state this gradient is evaluated at.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["ImplicitGrad", "make_implicit_value_and_grad",
           "implicit_value_and_grad_for"]


class ImplicitGrad(NamedTuple):
    """Result of one implicit value-and-grad evaluation.

    ``elbo`` is E(θ, s*) (the reference-convention ELBO at the supplied
    state), ``grad`` the total derivative dG/dθ, ``adjoint_residual``
    the relative residual ‖(I−Jᵀ)w − v‖/‖v‖ of the adjoint solve (a
    small value certifies the gradient; a large one means the supplied
    state was not a fixed point or ``maxiter`` was too small), and
    ``state_residual`` the relative sweep residual
    max|T(s*)−s*| / (1+max|s*|) measuring how converged the supplied
    state actually was.
    """
    elbo: jax.Array
    grad: jax.Array
    adjoint_residual: jax.Array
    state_residual: jax.Array


def _tree_dot(a, b):
    return sum(jnp.vdot(x, y) for x, y in
               zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


def _tree_norm(a):
    return jnp.sqrt(jnp.real(_tree_dot(a, a)))


def make_implicit_value_and_grad(engine):
    """Build the jitted implicit (ELBO, dELBO/dθ) evaluator for an engine.

    Returns ``ivag(theta, t, y, yerr2, mu_star, var_star, *, adjoint,
    maxiter, restart, tol) -> ImplicitGrad`` where ``(mu_star,
    var_star)`` is a converged variational state (from
    ``engine.fit_state`` or the Anderson refine).  ``adjoint`` selects
    the linear solver for (I − Jᵀ)w = v:

      * ``'gmres'`` (default): restarted GMRES — robust at any
        contraction rate; ``maxiter`` outer iterations of ``restart``
        Arnoldi steps; ``tol`` the relative residual target (defaults
        dtype-aware: 1e-10 in f64, 1e-5 in f32).
      * ``'neumann'``: truncated series Σₖ (Jᵀ)ᵏ v with ``maxiter``
        terms — one pull-back per term, no orthogonalization overhead;
        only appropriate when ρ(J) is small (fast-converging fits).
    """
    sweep_once = engine.sweep_once

    @functools.partial(jax.jit, static_argnames=("adjoint", "maxiter",
                                                 "restart"))
    def ivag(theta, t, y, yerr2, mu_star, var_star, *,
             adjoint: str = "gmres", maxiter: int = 25,
             restart: int = 20, tol=None):
        theta = jnp.asarray(theta)
        mu_star = jnp.asarray(mu_star).ravel()
        var_star = jnp.asarray(var_star).ravel()
        if tol is None:
            tol = 1e-10 if mu_star.dtype == jnp.float64 else 1e-5

        (elbo, mu1, var1), vjp = jax.vjp(
            lambda th, m, v: sweep_once(th, t, y, yerr2, m, v),
            theta, mu_star, var_star)

        state_res = jnp.maximum(
            jnp.max(jnp.abs(mu1 - mu_star)) /
            (1.0 + jnp.max(jnp.abs(mu_star))),
            jnp.max(jnp.abs(var1 - var_star)) /
            (1.0 + jnp.max(jnp.abs(var_star))))

        one = jnp.ones((), elbo.dtype)
        zero_e = jnp.zeros((), elbo.dtype)
        # v = ∂E/∂s and the explicit ∂E/∂θ, from one pull-back of the
        # ELBO output alone
        e_theta, v_mu, v_var = vjp((one, jnp.zeros_like(mu1),
                                    jnp.zeros_like(var1)))
        v = (v_mu, v_var)

        def JT(w):
            # Jᵀ w: pull the state cotangent back through the sweep
            _, gm, gv = vjp((zero_e, w[0], w[1]))
            return (gm, gv)

        def A(w):
            gm, gv = JT(w)
            return (w[0] - gm, w[1] - gv)

        if adjoint == "gmres":
            w, _ = jax.scipy.sparse.linalg.gmres(
                A, v, x0=v, tol=tol, atol=0.0,
                restart=restart, maxiter=maxiter,
                solve_method="batched")
        elif adjoint == "neumann":
            def body(carry, _):
                acc, term = carry
                term = JT(term)
                return ((acc[0] + term[0], acc[1] + term[1]), term), None

            (w, _), _ = jax.lax.scan(body, (v, v), None, length=maxiter)
        else:                                    # pragma: no cover
            raise ValueError(f"unknown adjoint solver {adjoint!r}")

        rm, rv = A(w)
        adj_res = _tree_norm((rm - v_mu, rv - v_var)) / \
            jnp.maximum(_tree_norm(v), jnp.finfo(mu_star.dtype).tiny)

        # grad = ∂E/∂θ + (∂T/∂θ)ᵀ w
        g_extra, _, _ = vjp((zero_e, w[0], w[1]))
        return ImplicitGrad(elbo, e_theta + g_extra, adj_res, state_res)

    return ivag


@functools.lru_cache(maxsize=128)
def implicit_value_and_grad_for(engine):
    """Per-engine cache of :func:`make_implicit_value_and_grad` (engines
    are themselves cached per model structure in ``make_engine``, so the
    jit caches compose)."""
    return make_implicit_value_and_grad(engine)
