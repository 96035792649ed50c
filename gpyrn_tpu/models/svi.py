"""Stochastic (minibatch-over-outputs) variational fit — the large-p path.

For GPRNs with MANY outputs (p ≫ 10: multi-band photometry, spectral
time series) a full coordinate-ascent sweep costs q·(1+p) dense
factorizations.  This module subsamples OUTPUTS, not data points:

* the node update's data-dependent quantities are exactly the
  likelihood's natural-parameter sufficient statistics summed over
  outputs —

      dv   = Σ_i (μw_i² + varw_i)/σ_i²      (precision contribution)
      pred = Σ_i resid_i · μw_i / σ_i²       (information vector)

  so textbook stochastic variational inference (Hoffman et al. 2013)
  applies verbatim: a minibatch S of outputs gives the unbiased
  estimates (p/|S|)·Σ_{i∈S}(·), blended into Robbins–Monro averages
  with step size ρ_t = (t₀+t)^(−κ) (κ ∈ (0.5, 1] for almost-sure
  convergence; κ = 0 gives ρ ≡ 1, which at |S| = p reduces EXACTLY to
  the dense coordinate-ascent sweep — the tests pin this), and the
  node posterior is the CLOSED FORM at the averaged statistics — no
  ad-hoc damping of μ/Σ;
* each weight (j, i) depends on output i alone, so sampled outputs'
  weights take their EXACT coordinate update and unsampled ones stay
  until drawn (uniform sampling without replacement per step).

Per step: q node factorizations + q·|S| weight factorizations — the
weight stage, which dominates at large p, shrinks by p/|S|.

Constraint: all q·p weight kernels must share ONE structure (their
parameters may differ per weight) — the sampled-output gather is a
traced index, so the kernel structure cannot vary along it.  The
reference package has no stochastic path at all (its sweep is a dense
NumPy loop over every output, meanfield.py:713-893).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gpyrn_tpu.models.gprn import GPRNSpec, unpack_parameters
from gpyrn_tpu.ops import blocked as _blocked
from gpyrn_tpu.ops import means as means_mod
from gpyrn_tpu.ops.linalg import TRAIN_NUGGET, kernel_matrix_plain

__all__ = ["SVIEngine", "make_svi_fit", "run_svi"]


class SVIEngine(NamedTuple):
    """Jitted stochastic-fit bundle for one model structure."""
    spec: GPRNSpec
    batch_p: int
    fit_state_svi: Callable  # (theta, t, y, yerr2, mu0, var0, n_steps,
    #                           seed, t0, kappa) -> (mu, var)


def make_svi_fit(spec: GPRNSpec, batch_p: int,
                 core_maps: Optional[Tuple] = None) -> SVIEngine:
    """Build the minibatch-over-outputs fit for ``spec``.

    ``batch_p``: outputs sampled per step (static; 1 ≤ batch_p ≤ p).
    """
    q, p, N = spec.q, spec.p, spec.N
    B = int(batch_p)
    if not 1 <= B <= p:
        raise ValueError(f"batch_p must be in [1, {p}], got {B}")
    w_structs = set(spec.weight_structs)
    if len(w_structs) != 1:
        raise ValueError(
            "the SVI fit samples outputs through a traced gather, so "
            "all weight kernels must share one structure; got "
            f"{len(w_structs)} distinct structures (their parameters "
            "may still differ per weight)")
    w_struct = spec.weight_structs[0]
    scale = p / B

    node_maps = weight_maps = None
    if core_maps is not None:
        node_maps, weight_maps = core_maps

    def _core(params_list, maps):
        if maps is None:
            return params_list
        return [m(pp) if m is not None else pp
                for m, pp in zip(maps, params_list)]

    def _mean_values(theta, t):
        _, _, mean_p, _ = unpack_parameters(spec, theta)
        rows = []
        for s, mp in zip(spec.mean_structs, mean_p):
            if s is None:
                rows.append(jnp.zeros(t.shape, dtype=t.dtype))
            else:
                rows.append(means_mod.evaluate(s, mp, t))
        return jnp.stack(rows)

    def _gp_update(structure, cp, t, d_add, pred):
        """One GP's coordinate update (mirror of the lean engine's
        `_gp_update_lean`, models/gprn.py): K rebuilt in place, vector
        solves, diag Σ = d − d²·diag(A⁻¹) with the PSD-envelope clamp."""
        K = kernel_matrix_plain(structure, cp, t, TRAIN_NUGGET)
        idx = jnp.arange(N)
        A = K.at[idx, idx].add(d_add)
        L, dAinv = _blocked.blocked_chol_diag_ainv(A[None])
        Krhs = K @ pred
        t1 = jax.scipy.linalg.cho_solve((L[0], True), Krhs)
        sig_rhs = Krhs - K @ t1
        d_sig = d_add - d_add * d_add * dAinv[0]
        d_sig = jnp.clip(d_sig, jnp.finfo(d_sig.dtype).tiny,
                         jnp.minimum(jnp.diagonal(K), d_add))
        return sig_rhs, d_sig

    @jax.jit
    def fit_state_svi(theta, t, y, yerr2, mu0, var0, n_steps, seed,
                      t0, kappa):
        theta = jnp.asarray(theta)
        t = jnp.asarray(t)
        node_p, weight_p, _, jitters = unpack_parameters(spec, theta)
        node_c = _core(node_p, node_maps)
        weight_c = _core(weight_p, weight_maps)
        # mapped weight params stacked node-major: (q, p, n_wpar)
        Wp = jnp.stack([jnp.stack([jnp.asarray(weight_c[j * p + i])
                                   for i in range(p)])
                        for j in range(q)])
        m = _mean_values(theta, t)
        y_c = jnp.asarray(y) - m
        variance = jitters[:, None] ** 2 + jnp.asarray(yerr2)

        mu0 = jnp.asarray(mu0).ravel()
        var0 = jnp.asarray(var0).ravel()
        muF = mu0[:q * N].reshape(q, N)
        muW = mu0[q * N:].reshape(p, q, N)
        varF = var0[:q * N].reshape(q, N)
        varW = var0[q * N:].reshape(p, q, N)

        # full-batch natural statistics at the entry state (elementwise
        # O(p·q·N) — no solves)
        dv_avg = jnp.sum((muW * muW + varW) / variance[:, None, :],
                         axis=0)
        total = jnp.einsum("pqn,qn->pn", muW, muF)
        resid = (y_c[None, :, :] - total[None, :, :]
                 + muW.transpose(1, 0, 2) * muF[:, None, :])
        pred_avg = jnp.einsum("qpn,pqn->qn", resid,
                              muW / variance[:, None, :])

        kappa = jnp.asarray(kappa, dtype=muF.dtype)
        t0 = jnp.asarray(t0, dtype=muF.dtype)

        base_key = jax.random.PRNGKey(seed)

        def step(i, carry):
            muF, varF, muW, varW, dv_avg, pred_avg = carry
            tstep = jnp.asarray(i, dtype=muF.dtype)
            key = jax.random.fold_in(base_key, i)
            S = jax.random.choice(key, p, (B,), replace=False)
            y_S = y_c[S]                       # (B, N)
            var_S = variance[S]                # (B, N)
            muW_S = muW[S]                     # (B, q, N)
            varW_S = varW[S]

            # -- node stage: SVI natural-parameter averaging ----------
            dv_S = scale * jnp.sum(
                (muW_S * muW_S + varW_S) / var_S[:, None, :], axis=0)
            total_S = jnp.einsum("bqn,qn->bn", muW_S, muF)
            resid_S = (y_S[:, None, :] - total_S[:, None, :]
                       + muW_S * muF[None, :, :])
            pred_S = scale * jnp.einsum(
                "bqn,bqn->qn", resid_S, muW_S / var_S[:, None, :])
            rho = (t0 + tstep) ** (-kappa)
            dv_avg = (1.0 - rho) * dv_avg + rho * dv_S
            pred_avg = (1.0 - rho) * pred_avg + rho * pred_S

            mu_rows, dS_rows = [], []
            for j, s in enumerate(spec.node_structs):
                mj, dj = _gp_update(s, node_c[j], t,
                                    1.0 / dv_avg[j], pred_avg[j])
                mu_rows.append(mj)
                dS_rows.append(dj)
            mu_f = jnp.stack(mu_rows)
            dSf = jnp.stack(dS_rows)

            # -- weight stage: exact updates for the sampled outputs --
            dv2 = mu_f * mu_f + dSf            # (q, N)
            ratio = (var_S[:, None, :] / dv2[None, :, :])   # (B, q, N)
            total2_S = jnp.einsum("bqn,qn->bn", muW_S, mu_f)
            resid2_S = (y_S[:, None, :] - total2_S[:, None, :]
                        + muW_S * mu_f[None, :, :])
            pred2_S = resid2_S * mu_f[None, :, :] / var_S[:, None, :]
            Wp_S = jnp.transpose(Wp, (1, 0, 2))[S]   # (B, q, n_wpar)

            flat = lambda a: a.reshape((B * q,) + a.shape[2:])  # noqa
            mw, dw = lax.map(
                lambda args: _gp_update(w_struct, args[0], t,
                                        args[1], args[2]),
                (flat(Wp_S), flat(ratio), flat(pred2_S)))
            mu_w_S = mw.reshape(B, q, N)
            dSw_S = dw.reshape(B, q, N)

            muW = muW.at[S].set(mu_w_S)
            varW = varW.at[S].set(dSw_S)
            return (mu_f, dSf, muW, varW, dv_avg, pred_avg)

        carry = (muF, varF, muW, varW, dv_avg, pred_avg)
        carry = lax.fori_loop(0, n_steps, step, carry)
        muF, varF, muW, varW, _, _ = carry
        mu = jnp.concatenate([muF.ravel(), muW.ravel()])
        var = jnp.concatenate([varF.ravel(), varW.ravel()])
        return mu, var

    return SVIEngine(spec=spec, batch_p=B, fit_state_svi=fit_state_svi)


def run_svi(gprn, n_steps: int = 600, batch_p: Optional[int] = None,
            seed: int = 0, t0: float = 5.0, kappa: float = 0.6,
            install: bool = True):
    """Run the stochastic fit on a fitted ``inference`` object.

    ``batch_p`` defaults to ~p/4 (≥1).  ``kappa`` trades guarantees
    for speed: the Robbins–Monro theory wants κ ∈ (0.5, 1]; κ = 0.5
    moves measurably faster in practice (98% of the ELBO climb in 600
    steps on the p=6 test problem) at the theory's boundary.  Returns
    ``(mu, var)`` as numpy arrays; with ``install=True`` they also
    become the object's cached variational state (so ``predict``/warm
    starts use them).
    """
    gprn._require_components()
    spec, core_maps = gprn._spec_and_core_maps()
    if batch_p is None:
        batch_p = max(1, spec.p // 4)
    # spec-keyed cache: surviving set_components with a new structure
    key = (spec, int(batch_p))
    cache = getattr(gprn, "_svi_engines", None)
    if cache is None:
        cache = gprn._svi_engines = {}
    eng = cache.get(key)
    if eng is None:
        eng = cache[key] = make_svi_fit(spec, batch_p,
                                        core_maps=core_maps)
    theta = gprn._theta()
    mu0, var0 = gprn.engine.init_mu_var(theta, gprn.y)
    mu, var = eng.fit_state_svi(
        theta, np.asarray(gprn.time, dtype=float), gprn.y, gprn.yerr2,
        mu0, var0, int(n_steps), int(seed), float(t0), float(kappa))
    mu = np.asarray(mu)
    var = np.asarray(var)
    if install:
        gprn._mu, gprn._var = mu, var
    return mu, var
