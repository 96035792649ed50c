"""On-device Nelder-Mead: scipy-trajectory simplex descent, batched.

The reference's ``optimize()`` drives scipy's Nelder-Mead from the host
(reference meanfield.py:1114-1152), which on TPU costs a host→device
round trip per objective call (~31 ms through the remote tunnel — more
than the N=1000 objective itself).  This module runs the WHOLE simplex
loop on the device as one ``lax.while_loop``.

TPU-first formulation: scipy's algorithm evaluates 1-2 points per
iteration sequentially (reflection, then maybe expansion/contraction),
and n more on a shrink.  Sequential data-dependent calls are poison for
a jitted loop — so instead every iteration evaluates ALL candidate
points in ONE batched call:

    [x_reflect, x_expand, x_out_contract, x_in_contract,
     shrink row 1, ..., shrink row n]                     (n+4 points)

(all of which depend only on the current sorted simplex), then selects
the scipy outcome with pure arithmetic masks.  On the MXU a width-(n+4)
vmapped objective costs barely more than width-1, and the resulting
simplex TRAJECTORY — and therefore the answer — is identical to
scipy's ``method='Nelder-Mead'`` to floating-point associativity
(validated against scipy in tests/test_neldermead.py); only the
function-evaluation COUNT differs (points scipy would skip are
evaluated anyway and masked out).

The loop is itself vmappable: :func:`nelder_mead_multistart` runs a
population of simplexes in lockstep for multi-start hyperparameter
searches, and `parallel.multistart` can shard that population over the
device mesh's ``dp`` axis.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, vmap

__all__ = ["nelder_mead", "nelder_mead_multistart", "NMResult",
           "initial_simplex"]


class NMResult(NamedTuple):
    """Mirror of the scipy result fields the reference surface uses."""
    x: jax.Array          # best vertex
    fun: jax.Array        # objective there
    nit: jax.Array        # iterations taken
    nfev: jax.Array       # scipy-equivalent function-eval count
    converged: jax.Array  # xatol+fatol test passed (vs hitting max_iter)


def initial_simplex(x0, nonzdelt=0.05, zdelt=0.00025):
    """scipy's default initial simplex: vertex k+1 perturbs coordinate k
    by 5% (or sets 0.00025 where x0[k] == 0)."""
    x0 = jnp.atleast_1d(x0)
    n = x0.shape[0]
    pert = jnp.where(x0 == 0, zdelt, (1.0 + nonzdelt) * x0)
    sim = jnp.broadcast_to(x0, (n + 1, n))
    return sim.at[jnp.arange(1, n + 1), jnp.arange(n)].set(pert)


def _coeffs(n: int, adaptive: bool):
    if adaptive:        # Gao & Han 2012, as in scipy
        dim = float(n)
        return 1.0, 1.0 + 2.0 / dim, 0.75 - 1.0 / (2.0 * dim), \
            1.0 - 1.0 / dim
    return 1.0, 2.0, 0.5, 0.5           # rho, chi, psi, sigma


def nelder_mead(f: Callable, x0, *, xatol=1e-4, fatol=1e-4,
                max_iter: int | None = None, adaptive: bool = False,
                simplex0=None, batched_f: Callable | None = None):
    """Minimize ``f`` with Nelder-Mead entirely inside one jitted loop.

    Parameters
    ----------
    f : callable
        ``f(x) -> scalar``; must be jit-traceable.
    batched_f : callable, optional
        ``batched_f(X) -> values`` for a (m, n) batch of points.  By
        default ``vmap(f)``; pass an engine's natively-batched objective
        (e.g. a lattice-batched ELBO) to skip the vmap.
    simplex0 : (n+1, n) array, optional
        Initial simplex (defaults to scipy's 5%/0.00025 perturbations).

    Returns :class:`NMResult`.  ``nfev`` counts the evaluations scipy
    would have performed on the same trajectory, not the (larger)
    number this implementation batches.
    """
    x0 = jnp.atleast_1d(jnp.asarray(x0))
    n = int(x0.shape[0])
    if n < 1:
        raise ValueError("x0 must have at least one element")
    rho, chi, psi, sigma = _coeffs(n, adaptive)
    if max_iter is None:
        max_iter = 200 * n              # scipy default
    fbatch = batched_f if batched_f is not None else vmap(f)

    sim = jnp.asarray(simplex0) if simplex0 is not None \
        else initial_simplex(x0)
    fsim = fbatch(sim)
    order = jnp.argsort(fsim)
    sim, fsim = sim[order], fsim[order]

    def cond(state):
        sim, fsim, it, nfev, done = state
        return (~done) & (it < max_iter)

    def body(state):
        sim, fsim, it, nfev, _ = state
        xbar = jnp.mean(sim[:-1], axis=0)
        worst = sim[-1]
        cand = jnp.stack([
            (1 + rho) * xbar - rho * worst,                  # reflect
            (1 + rho * chi) * xbar - rho * chi * worst,      # expand
            (1 + psi * rho) * xbar - psi * rho * worst,      # contract
            (1 - psi) * xbar + psi * worst,                  # in-contract
        ])
        shrink_pts = sim[0] + sigma * (sim[1:] - sim[0])     # rows 1..n
        fall = fbatch(jnp.concatenate([cand, shrink_pts], axis=0))
        fxr, fxe, fxc, fxcc = fall[0], fall[1], fall[2], fall[3]
        fshrink = fall[4:]

        # scipy's decision tree as masks (flow: _minimize_neldermead)
        take_e = (fxr < fsim[0]) & (fxe < fxr)
        take_r = ((fxr < fsim[0]) & ~(fxe < fxr)) | \
                 (~(fxr < fsim[0]) & (fxr < fsim[-2]))
        try_c = ~(fxr < fsim[0]) & ~(fxr < fsim[-2]) & (fxr < fsim[-1])
        take_c = try_c & (fxc <= fxr)
        try_cc = ~(fxr < fsim[0]) & ~(fxr < fsim[-2]) & ~(fxr < fsim[-1])
        take_cc = try_cc & (fxcc < fsim[-1])
        do_shrink = (try_c & ~(fxc <= fxr)) | (try_cc & ~(fxcc < fsim[-1]))

        new_last = jnp.where(take_e, cand[1],
                    jnp.where(take_r, cand[0],
                     jnp.where(take_c, cand[2],
                      jnp.where(take_cc, cand[3], worst))))
        new_flast = jnp.where(take_e, fxe,
                     jnp.where(take_r, fxr,
                      jnp.where(take_c, fxc,
                       jnp.where(take_cc, fxcc, fsim[-1]))))
        sim1 = sim.at[-1].set(new_last)
        fsim1 = fsim.at[-1].set(new_flast)
        sim1 = jnp.where(do_shrink,
                         jnp.concatenate([sim[:1], shrink_pts], axis=0),
                         sim1)
        fsim1 = jnp.where(do_shrink,
                          jnp.concatenate([fsim[:1], fshrink]), fsim1)

        order = jnp.argsort(fsim1)
        sim1, fsim1 = sim1[order], fsim1[order]
        # scipy-equivalent eval count: reflect always; +1 for the
        # expansion or contraction it would have tried; +n on shrink
        nfev1 = nfev + 1 \
            + jnp.where((fxr < fsim[0]) | try_c | try_cc, 1, 0) \
            + jnp.where(do_shrink, n, 0)
        done = (jnp.max(jnp.abs(sim1[1:] - sim1[0])) <= xatol) & \
               (jnp.max(jnp.abs(fsim1[0] - fsim1[1:])) <= fatol)
        return sim1, fsim1, it + 1, nfev1, done

    # scipy checks convergence at the loop TOP and counts iterations
    # from 1, so an already-converged initial simplex reports nit == 1
    done0 = (jnp.max(jnp.abs(sim[1:] - sim[0])) <= xatol) & \
            (jnp.max(jnp.abs(fsim[0] - fsim[1:])) <= fatol)
    state = (sim, fsim, jnp.asarray(1, jnp.int32),
             jnp.asarray(n + 1, jnp.int32), done0)
    sim, fsim, it, nfev, done = lax.while_loop(cond, body, state)
    return NMResult(sim[0], fsim[0], it, nfev, done)


@partial(jax.jit, static_argnums=(0, 2, 3, 4, 5))
def _nm_population(f, x0s, xatol, fatol, max_iter, adaptive):
    run = lambda x0: nelder_mead(f, x0, xatol=xatol, fatol=fatol,  # noqa: E731
                                 max_iter=max_iter, adaptive=adaptive)
    return vmap(run)(x0s)


def nelder_mead_multistart(f: Callable, x0s, *, xatol=1e-4, fatol=1e-4,
                           max_iter: int | None = None,
                           adaptive: bool = False):
    """Run one simplex per row of ``x0s`` (m, n) in lockstep on the
    device and return the population :class:`NMResult` plus the index
    of the best restart.  Under a ``(dp, lat)`` mesh the population
    axis shards over ``dp`` like any other restart population."""
    x0s = jnp.atleast_2d(jnp.asarray(x0s))
    if max_iter is None:
        max_iter = 200 * int(x0s.shape[1])
    res = _nm_population(f, x0s, xatol, fatol, max_iter, adaptive)
    best = jnp.argmin(res.fun)
    return res, best
