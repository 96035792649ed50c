"""Hamiltonian Monte Carlo over GPRN hyperparameters.

The reference's only sampler is emcee's gradient-free ensemble
(meanfield.py:1154-1286).  Autodiff through the coordinate-ascent sweeps
gives ∇ELBO, which unlocks HMC: all chains' leapfrog trajectories —
including the ELBO fits inside every gradient evaluation — run as one
vmapped, jitted device computation.

Sampling happens in unconstrained log-space z = log θ (every GPRN
hyperparameter is positive), with the Jacobian Σz folded into the target
density.  Step size adapts during warmup by dual averaging towards a
target acceptance rate; the mass matrix stays identity (log-space
already roughly decorrelates scales).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Sequence

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["run_hmc", "HMCResult"]


@dataclass
class HMCResult:
    chain: np.ndarray           # (n_samples, n_chains, ndim) in θ-space
    log_prob: np.ndarray        # (n_samples, n_chains)
    acceptance: float
    step_size: float
    parameter_names: Sequence[str] = field(default_factory=list)

    def get_chain(self, discard: int = 0, thin: int = 1,
                  flat: bool = False):
        c = self.chain[discard::thin]
        return c.reshape(-1, c.shape[-1]) if flat else c

    def save(self, filename):
        np.savez_compressed(
            filename, chain=self.chain, log_prob=self.log_prob,
            acceptance=self.acceptance, step_size=self.step_size,
            parameter_names=np.array(list(self.parameter_names)))

    @classmethod
    def load(cls, filename) -> "HMCResult":
        import os
        if not os.path.exists(filename) and \
                os.path.exists(str(filename) + ".npz"):
            filename = str(filename) + ".npz"   # savez appends .npz
        z = np.load(filename, allow_pickle=False)
        return cls(chain=z["chain"], log_prob=z["log_prob"],
                   acceptance=float(z["acceptance"]),
                   step_size=float(z["step_size"]),
                   parameter_names=[str(s) for s in z["parameter_names"]])


def run_hmc(gprn, priors: Dict, n_samples: int = 500, n_warmup: int = 100,
            n_chains: int = 4, n_leapfrog: int = 8, n_sweeps: int = 15,
            target_accept: float = 0.8, initial_step: float = 0.02,
            seed: int = 0, p0=None, checkpoint=None):
    """Sample the hyperparameter posterior (ELBO surrogate likelihood)
    with vmapped HMC.

    Args:
        gprn: a fitted ``inference`` object (components set).
        priors: dict name → prior with a *traceable* ``logpdf``
            (:mod:`gpyrn_tpu.inference.priors`) for every free parameter.
        n_sweeps: coordinate-ascent sweeps inside each ELBO evaluation
            (warm-started from the object's cached variational state).
    """
    gprn._require_components()
    all_names = np.array(list(gprn.parameters_dict.keys()))
    frozen = gprn.frozen_mask
    free_names = [str(n) for n in all_names[~frozen]]
    ndim = len(free_names)
    missing = [n for n in free_names if n not in priors]
    if missing:
        raise ValueError(f"missing priors for parameters: {missing}")
    prior_list = [priors[n] for n in free_names]

    theta_full = gprn.get_parameters(include_frozen=True)
    free_idx = jnp.asarray(np.where(~frozen)[0])
    base = jnp.asarray(theta_full)

    eng = gprn.engine
    t = jnp.asarray(np.asarray(gprn.time, dtype=float))
    y = jnp.asarray(gprn.y)
    yerr2 = jnp.asarray(gprn.yerr2)
    theta0 = gprn._theta()
    mu0, var0 = gprn._resolve_mu_var('previous', 'previous', theta0)
    mu0 = jnp.asarray(mu0)
    var0 = jnp.asarray(var0)

    def logpost(z):
        theta_free = jnp.exp(z)
        theta = base.at[free_idx].set(theta_free)
        lp = sum(pr.logpdf(th) for pr, th in zip(prior_list, theta_free))
        elbo = eng.elbo_fixed(theta, t, y, yerr2, mu0, var0, n_sweeps)
        return lp + jnp.sum(z) + elbo       # + log-Jacobian of θ = e^z

    val_and_grad = jax.value_and_grad(logpost)

    def leapfrog(z, r, eps):
        _, g = val_and_grad(z)
        r = r + 0.5 * eps * g
        def body(_, zr):
            z, r = zr
            z = z + eps * r
            _, g = val_and_grad(z)
            return z, r + eps * g
        z, r = jax.lax.fori_loop(0, n_leapfrog - 1, body, (z, r))
        z = z + eps * r
        v, g = val_and_grad(z)      # final value doubles as lp(z_new)
        r = r + 0.5 * eps * g
        return z, r, v

    def hmc_step(rng, z, lp, eps):
        k1, k2 = jax.random.split(rng)
        r0 = jax.random.normal(k1, z.shape, dtype=z.dtype)
        z_new, r_new, lp_new = leapfrog(z, r0, eps)
        log_accept = (lp_new - 0.5 * jnp.sum(r_new ** 2)) - \
            (lp - 0.5 * jnp.sum(r0 ** 2))
        # reject non-finite PROPOSALS (including NaN entering through the
        # momentum when a gradient goes NaN — an unguarded NaN here would
        # poison the dual-averaging statistics via alpha); but if the
        # CURRENT state is invalid (NaN/-inf logpost, e.g. a bad prior
        # draw) accept any finite proposal so chains escape
        ok_new = jnp.isfinite(lp_new)
        log_accept = jnp.where(ok_new & jnp.isfinite(log_accept),
                               log_accept, -jnp.inf)
        log_accept = jnp.where(jnp.isfinite(lp) | ~ok_new,
                               log_accept, jnp.inf)
        accept = jnp.log(jax.random.uniform(k2, dtype=z.dtype)) < log_accept
        z = jnp.where(accept, z_new, z)
        lp = jnp.where(accept, lp_new, lp)
        return z, lp, jnp.minimum(jnp.exp(log_accept), 1.0)

    batched_step = jax.jit(jax.vmap(hmc_step, in_axes=(0, 0, 0, None)))
    batched_logpost = jax.jit(jax.vmap(logpost))

    # -- initial chain positions -------------------------------------------
    rng = np.random.default_rng(seed)
    if p0 is None:
        th0 = np.array([[pr.rvs(rng=rng) for pr in prior_list]
                        for _ in range(n_chains)])
    else:
        p0 = np.atleast_2d(np.asarray(p0, dtype=float))
        th0 = np.repeat(p0, n_chains, axis=0)[:n_chains] * \
            np.exp(0.01 * rng.standard_normal((n_chains, ndim)))
    z = jnp.asarray(np.log(th0))
    lp = batched_logpost(z)

    keys = jax.random.split(jax.random.PRNGKey(seed), n_warmup + n_samples)

    # -- warmup: dual-averaging step-size adaptation -----------------------
    eps = initial_step
    log_eps_bar, H_bar = np.log(eps), 0.0
    mu_da = np.log(10 * eps)
    for i in range(n_warmup):
        ck = jax.random.split(keys[i], n_chains)
        z, lp, alpha = batched_step(ck, z, lp, eps)
        a = float(jnp.mean(alpha))
        frac = 1.0 / (i + 1 + 10)
        H_bar = (1 - frac) * H_bar + frac * (target_accept - a)
        log_eps = mu_da - np.sqrt(i + 1) / 0.05 * H_bar
        w = (i + 1) ** -0.75
        log_eps_bar = w * log_eps + (1 - w) * log_eps_bar
        eps = float(np.exp(log_eps))
    eps = float(np.exp(log_eps_bar))

    # -- sampling ----------------------------------------------------------
    chain = np.empty((n_samples, n_chains, ndim))
    lps = np.empty((n_samples, n_chains))
    acc = 0.0
    for i in range(n_samples):
        ck = jax.random.split(keys[n_warmup + i], n_chains)
        z, lp, alpha = batched_step(ck, z, lp, eps)
        chain[i] = np.exp(np.asarray(z))
        lps[i] = np.asarray(lp)
        acc += float(jnp.mean(alpha))
        if checkpoint is not None and (i + 1) % 50 == 0:
            HMCResult(chain[:i + 1], lps[:i + 1], acc / (i + 1), eps,
                      free_names).save(checkpoint)

    result = HMCResult(chain=chain, log_prob=lps,
                       acceptance=acc / max(n_samples, 1),
                       step_size=eps, parameter_names=free_names)
    if checkpoint is not None:
        result.save(checkpoint)
    return result
