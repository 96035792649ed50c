"""Sharded multi-start hyperparameter optimization.

The GPRN ELBO surface is multi-modal (node/weight amplitude degeneracies,
period aliases); the reference's answer was a single Nelder-Mead run
(meanfield.py:1149).  The TPU-native answer is a *population* of gradient
ascents: B restarts, each an adam step on the ELBO differentiated through
the coordinate-ascent sweeps, with the population sharded over the ``dp``
mesh axis and each restart's (q × p) lattice optionally sharded over
``lat``.  One jitted SPMD step trains every restart on every chip at once.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import optax

from gpyrn_tpu.parallel.mesh import DP_AXIS, shard_along

__all__ = ["make_multistart_step", "multistart_optimize", "MultistartState"]


class MultistartState(NamedTuple):
    """Population state: log-parameters, optimizer state, warm-start
    variational caches, best-so-far tracking."""
    z: jnp.ndarray            # (B, n_par) log-parameters
    opt_state: object
    mu: jnp.ndarray           # (B, d) per-restart variational means
    var: jnp.ndarray          # (B, d)
    best_elbo: jnp.ndarray    # (B,)
    best_z: jnp.ndarray       # (B, n_par)


def make_multistart_step(engine, t, y, yerr2, n_sweeps: int = 25,
                         learning_rate: float = 3e-2,
                         free_mask: Optional[np.ndarray] = None,
                         base_theta: Optional[np.ndarray] = None):
    """Build ``(init_fn, step_fn)`` for a population of adam ascents.

    ``step_fn(state) -> state`` is one fully-jitted SPMD training step:
    per restart it (1) refreshes the variational cache with one
    coordinate-ascent sweep, (2) computes ∂ELBO/∂θ through ``n_sweeps``
    sweeps by reverse-mode autodiff, (3) applies an adam update in
    log-parameter space (all GPRN hyperparameters are positive).
    """
    t = jnp.asarray(t)
    y = jnp.asarray(y)
    yerr2 = jnp.asarray(yerr2)
    opt = optax.adam(learning_rate)

    if free_mask is None:
        free = None
    else:
        free = jnp.asarray(free_mask)
        base = jnp.asarray(base_theta)

    def theta_of(z):
        th = jnp.exp(z)
        if free is not None:
            th = jnp.where(free, th, base)
        return th

    def loss_one(z, mu, var):
        elbo = engine.elbo_fixed(theta_of(z), t, y, yerr2, mu, var, n_sweeps)
        return -elbo

    def refresh_one(z, mu, var):
        _, mu2, var2 = engine.sweep_once(theta_of(z), t, y, yerr2, mu, var)
        return mu2, var2

    def init_fn(thetas):
        """thetas: (B, n_par) initial (positive) parameter vectors."""
        thetas = jnp.asarray(thetas)
        z = jnp.log(thetas)
        mu, var = jax.vmap(lambda th: engine.init_mu_var(th, y))(thetas)
        B = thetas.shape[0]
        return MultistartState(
            z=z, opt_state=opt.init(z), mu=mu, var=var,
            best_elbo=jnp.full((B,), -jnp.inf, dtype=z.dtype),
            best_z=z)

    @jax.jit
    def step_fn(state: MultistartState) -> MultistartState:
        # (1) advance the variational caches one sweep (cheap, keeps the
        # inner fixed-sweep unroll short)
        mu, var = jax.vmap(refresh_one)(state.z, state.mu, state.var)
        # (2) value-and-grad through the sweeps, vmapped over the
        # population; the dp-sharded batch axis makes this SPMD
        neg, grads = jax.vmap(jax.value_and_grad(loss_one))(
            state.z, mu, var)
        elbo = -neg
        updates, opt_state = opt.update(grads, state.opt_state)
        z = optax.apply_updates(state.z, updates)
        improved = elbo > state.best_elbo
        best_elbo = jnp.where(improved, elbo, state.best_elbo)
        best_z = jnp.where(improved[:, None], state.z, state.best_z)
        return MultistartState(z=z, opt_state=opt_state, mu=mu, var=var,
                               best_elbo=best_elbo, best_z=best_z)

    return init_fn, step_fn, theta_of


def multistart_optimize(gprn, n_restarts: int = 8, n_steps: int = 100,
                        learning_rate: float = 3e-2, n_sweeps: int = 25,
                        jitter_scale: float = 0.3, seed: int = 0,
                        mesh: Optional[Mesh] = None,
                        method: str = "adam"):
    """Run a sharded population of optimizer restarts from perturbed
    inits and install the best hyperparameters into ``gprn``.

    ``method='adam'`` (default): gradient ascents through the sweeps.
    ``method='nm'``: gradient-free scipy-trajectory Nelder-Mead
    simplexes (inference/neldermead.py) in lockstep, ``n_steps`` as the
    iteration cap — the sharded-population version of the reference's
    single host Nelder-Mead run (meanfield.py:1149).

    Returns a dict with the best ELBO, best parameters, and the full
    per-restart final ELBOs.
    """
    rng = np.random.default_rng(seed)
    theta0 = gprn.get_parameters(include_frozen=True)
    frozen = gprn.frozen_mask
    B = n_restarts
    inits = theta0[None, :] * np.exp(
        jitter_scale * rng.standard_normal((B, theta0.size)))
    inits[:, frozen] = theta0[frozen]
    inits[0] = theta0                       # keep one unperturbed restart

    if method == "nm":
        return _multistart_nm(gprn, inits, frozen, theta0, n_steps,
                              n_sweeps, mesh)
    if method != "adam":
        raise ValueError(f"unknown method {method!r}")

    eng = gprn.engine
    init_fn, step_fn, theta_of = make_multistart_step(
        eng, np.asarray(gprn.time, dtype=float), gprn.y, gprn.yerr2,
        n_sweeps=n_sweeps, learning_rate=learning_rate,
        free_mask=~frozen, base_theta=theta0)

    state = init_fn(inits)
    if mesh is not None:
        state = jax.tree.map(
            lambda x: shard_along(x, mesh, DP_AXIS, 0)
            if hasattr(x, "ndim") and x.ndim >= 1 and
            x.shape[0] == B else x, state)

    for _ in range(n_steps):
        state = step_fn(state)

    best_elbo = np.asarray(state.best_elbo)
    best = int(np.argmax(best_elbo))
    theta_best = np.asarray(theta_of(state.best_z[best]))
    gprn.set_parameters(theta_best)
    # refresh the gprn variational cache at the winner
    elbo, *_ = gprn.ELBOcalc(mu='init', var='init')
    return {"elbo": float(elbo), "theta": theta_best,
            "restart_elbos": best_elbo, "winner": best}


def _multistart_nm(gprn, inits, frozen, theta0, n_steps, n_sweeps, mesh):
    """Population Nelder-Mead: one simplex per restart, vmapped in
    lockstep, the restart axis dp-sharded over the mesh.  The objective
    is −ELBO after ``n_sweeps`` coordinate-ascent sweeps from the
    'init' variational state of the CANDIDATE's own theta (pure —
    every simplex vertex is self-contained, so the vmapped loop needs
    no carried cache)."""
    from gpyrn_tpu.inference.neldermead import nelder_mead

    eng = gprn.engine
    t = jnp.asarray(np.asarray(gprn.time, dtype=float))
    y = jnp.asarray(gprn.y)
    yerr2 = jnp.asarray(gprn.yerr2)
    free_idx = jnp.asarray(np.flatnonzero(~frozen))
    base = jnp.asarray(theta0)

    def objective(x):
        theta = base.at[free_idx].set(x)
        mu0, var0 = eng.init_mu_var(theta, y)
        return -eng.elbo_fixed(theta, t, y, yerr2, mu0, var0, n_sweeps)

    x0s = jnp.asarray(inits[:, ~frozen])
    if mesh is not None and x0s.shape[0] % mesh.shape[DP_AXIS] == 0:
        # shard the restart axis over dp; if the population is not
        # divisible by dp, leave it replicated (still correct, just
        # not distributed)
        x0s = shard_along(x0s, mesh, DP_AXIS, 0)

    @jax.jit
    def run_population(x0s):
        run = lambda x0: nelder_mead(objective, x0,       # noqa: E731
                                     max_iter=n_steps)
        return jax.vmap(run)(x0s)

    res = run_population(x0s)
    elbos = -np.asarray(res.fun)
    best = int(np.argmax(elbos))
    theta_best = np.asarray(base.at[free_idx].set(res.x[best]))
    gprn.set_parameters(theta_best)
    elbo, *_ = gprn.ELBOcalc(mu='init', var='init')
    return {"elbo": float(elbo), "theta": theta_best,
            "restart_elbos": elbos, "winner": best,
            "nit": np.asarray(res.nit), "converged": np.asarray(res.converged)}
