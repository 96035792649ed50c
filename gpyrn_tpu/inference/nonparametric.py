"""Nonparametric variational inference for GPRNs.

TPU-native re-design of the reference's experimental module
(/root/reference/gpyrn/nonparametric.py): the variational family is a
uniform mixture of k isotropic Gaussians over the stacked latent vector
u = (f, w) (Gershman, Hoffman & Blei 2012, "Nonparametric variational
inference"),

    q(u) = (1/k) Σ_j N(u; μ_j, s_j² I),   u ∈ R^d,  d = N·q·(p+1).

The ELBO combines per-component closed-form expectations of the GPRN
log-likelihood and GP log-prior with the mixture entropy lower bound

    H[q] ≥ -(1/k) Σ_i log[(1/k) Σ_j N(μ_i; μ_j, (s_i²+s_j²) I)].

Everything is one jitted, autodiff-able computation; updates are optax
adam steps on (μ, log s) — replacing the reference's nested Nelder-Mead
over the full k·d vector (nonparametric.py:410-425), which is why its
author capped it at toy sizes and marked it experimental.  The reference
implementation is also numerically broken for q > 1 (its own comment at
nonparametric.py:401); this module is the working equivalent, so parity
is to the *math*, not to the reference's output.

API surface mirrors the reference: ``inference(num_nodes, time, k,
*args)`` with ``ELBOcalc(nodes, weights, means, jitters, iterations)``
returning ``(ELBO, mu, var)``.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve

from gpyrn_tpu.ops import kernels as kernels_mod
from gpyrn_tpu.ops import means as means_mod
from gpyrn_tpu.models import gprn as _core
from gpyrn_tpu.ops.linalg import TRAIN_NUGGET, kernel_matrix

__all__ = ["inference", "npv_elbo", "make_npv_engine"]


class NPVEngine(NamedTuple):
    spec: _core.GPRNSpec
    k: int
    elbo: object          # (theta, t, y, yerr2, mu(k,d), logs(k)) -> scalar
    terms: object         # same args -> (loglike (k,), logprior (k,), entropy)
    fit: object           # adam loop; returns (elbo, mu, logs, trajectory)


@functools.lru_cache(maxsize=64)
def make_npv_engine(spec: _core.GPRNSpec, k: int,
                    core_maps=None) -> NPVEngine:
    """Jitted ELBO + fit loop for a mixture of ``k`` isotropic Gaussians."""
    from gpyrn_tpu.config import ensure_compile_cache
    ensure_compile_cache()
    q, p, N = spec.q, spec.p, spec.N
    d = spec.d

    node_maps = weight_maps = None
    if core_maps is not None:
        node_maps, weight_maps = core_maps

    def _core_params(params_list, maps):
        if maps is None:
            return params_list
        return [m(pp) if m is not None else pp
                for m, pp in zip(maps, params_list)]

    def _build(theta, t):
        node_p, weight_p, mean_p, jitters = _core.unpack_parameters(
            spec, theta)
        node_c = _core_params(node_p, node_maps)
        weight_c = _core_params(weight_p, weight_maps)
        Kf = jnp.stack([kernel_matrix(s, cp, t, TRAIN_NUGGET)
                        for s, cp in zip(spec.node_structs, node_c)])
        Kw = jnp.stack([kernel_matrix(s, cp, t, TRAIN_NUGGET)
                        for s, cp in zip(spec.weight_structs, weight_c)])
        rows = []
        t = jnp.asarray(t)
        for s, mp in zip(spec.mean_structs, mean_p):
            rows.append(jnp.zeros(t.shape, dtype=t.dtype) if s is None
                        else means_mod.evaluate(s, mp, t))
        return Kf, Kw.reshape(q, p, N, N), jnp.stack(rows), jitters

    def _split(mu_k):
        muF = mu_k[:q * N].reshape(q, N)
        muW = mu_k[q * N:].reshape(p, q, N)
        return muF, muW

    def terms(theta, t, y, yerr2, mu, logs):
        """Per-component ELBO terms at a fixed state: expected
        log-likelihood (k,), expected log-prior (k,), and the mixture
        entropy lower bound (scalar).  ``elbo`` below is
        mean(loglike + logprior) + entropy — exposed separately so the
        parity suite can anchor each term against the reference's
        nonparametric ELBOaux (nonparametric.py:272-327)."""
        Kf, Kw, m, jitters = _build(theta, t)
        y_c = jnp.asarray(y) - m
        variance = jitters[:, None] ** 2 + jnp.asarray(yerr2)   # (p, N)
        s2 = jnp.exp(2.0 * logs)                                 # (k,)

        Lf = jnp.linalg.cholesky(Kf)                             # (q,N,N)
        Lw = jnp.linalg.cholesky(Kw)                             # (q,p,N,N)
        logdet_f = 2 * jnp.sum(jnp.log(jnp.diagonal(Lf, axis1=1, axis2=2)))
        logdet_w = 2 * jnp.sum(jnp.log(
            jnp.diagonal(Lw, axis1=2, axis2=3)))
        # traces of K^{-1} for the isotropic covariance terms
        inv_f = jax.vmap(lambda l: cho_solve((l, True), jnp.eye(N)))(Lf)
        inv_w = jax.vmap(jax.vmap(
            lambda l: cho_solve((l, True), jnp.eye(N))))(Lw)
        tr_invf = jnp.trace(inv_f, axis1=1, axis2=2).sum()
        tr_invw = jnp.trace(inv_w, axis1=2, axis2=3).sum()

        def loglike_one(mu_k, s2_k):
            muF, muW = _split(mu_k)
            pred = jnp.einsum("pqn,qn->pn", muW, muF)
            resid2 = (y_c - pred) ** 2
            # E[(y - Σ w f)²] under isotropic N(mu, s² I):
            # resid² + Σ_q [s²(muF² + muW²) + s⁴]
            second = jnp.sum(s2_k * (muF[None, :, :] ** 2 + muW ** 2)
                             + s2_k ** 2, axis=1)               # (p, N)
            quad = jnp.sum((resid2 + second) / variance)
            return -0.5 * jnp.sum(jnp.log(2 * jnp.pi * variance)) \
                - 0.5 * quad

        def logprior_one(mu_k, s2_k):
            muF, muW = _split(mu_k)
            alpha_f = jax.vmap(lambda l, v: cho_solve((l, True), v))(Lf, muF)
            quad_f = jnp.einsum("qn,qn->", muF, alpha_f)
            muW_q = muW.transpose(1, 0, 2)                      # (q,p,N)
            alpha_w = jax.vmap(jax.vmap(
                lambda l, v: cho_solve((l, True), v)))(Lw, muW_q)
            quad_w = jnp.einsum("qpn,qpn->", muW_q, alpha_w)
            return -0.5 * (d * jnp.log(2 * jnp.pi) + logdet_f + logdet_w
                           + quad_f + quad_w
                           + s2_k * (tr_invf + tr_invw))

        ll = jax.vmap(loglike_one)(mu, s2)
        lp = jax.vmap(logprior_one)(mu, s2)

        # mixture entropy lower bound
        diff2 = jnp.sum((mu[:, None, :] - mu[None, :, :]) ** 2, axis=-1)
        ssum = s2[:, None] + s2[None, :]
        log_pair = (-0.5 * diff2 / ssum
                    - 0.5 * d * jnp.log(2 * jnp.pi * ssum))     # (k,k)
        log_qi = jax.scipy.special.logsumexp(log_pair, axis=1) \
            - jnp.log(float(k))
        entropy = -jnp.mean(log_qi)
        return ll, lp, entropy

    def elbo(theta, t, y, yerr2, mu, logs):
        """mu: (k, d) component means; logs: (k,) log std-devs."""
        ll, lp, entropy = terms(theta, t, y, yerr2, mu, logs)
        return jnp.mean(ll + lp) + entropy

    def fit(theta, t, y, yerr2, mu0, logs0, n_steps: int,
            learning_rate: float):
        import optax
        opt = optax.adam(learning_rate)

        def loss(params):
            return -elbo(theta, t, y, yerr2, params[0], params[1])

        params = (jnp.asarray(mu0), jnp.asarray(logs0))
        state = opt.init(params)

        def step(carry, _):
            params, state = carry
            val, grads = jax.value_and_grad(loss)(params)
            updates, state = opt.update(grads, state)
            params = optax.apply_updates(params, updates)
            return (params, state), -val

        (params, _), traj = jax.lax.scan(step, (params, state), None,
                                         length=n_steps)
        final = elbo(theta, t, y, yerr2, params[0], params[1])
        return final, params[0], params[1], traj

    return NPVEngine(
        spec=spec, k=k,
        elbo=jax.jit(elbo),
        terms=jax.jit(terms),
        fit=jax.jit(fit, static_argnums=(6,)),
    )


def npv_elbo(spec, theta, t, y, yerr2, mu, logs, k, core_maps=None):
    """Functional entry: nonparametric-VI ELBO for given mixture params."""
    eng = make_npv_engine(spec, k, core_maps)
    return eng.elbo(theta, t, y, yerr2, mu, logs)


class inference:
    """Nonparametric VI for GPRNs with a mixture of ``k`` isotropic
    Gaussians (reference nonparametric.py:7-58 API surface).

    Args:
        num_nodes: number of latent node functions
        time: time coordinates
        k: number of mixture components
        *args: data as y1, y1err, y2, y2err, ...
    """

    def __init__(self, num_nodes: int, time, k: int, *args):
        self.num_nodes = self.q = num_nodes
        self.time = np.asarray(time, dtype=float)
        self.N = self.time.size
        self.k = int(k)
        assert len(args) > 0 and len(args) % 2 == 0, \
            'Given data and number of components dont match'
        self.p = len(args) // 2
        self.qp = self.q * self.p
        self.d = self.N * self.q * (self.p + 1)
        self.tt = np.tile(self.time, self.p)
        self.y = np.stack([np.asarray(a, dtype=float) for a in args[::2]])
        self.yerr = np.stack([np.asarray(a, dtype=float)
                              for a in args[1::2]])
        self.yerr2 = self.yerr ** 2
        self.ystd = np.std(self.y, axis=1).reshape(self.p, 1)

    def _u_to_fhatW(self, u):
        f = u[:self.q * self.N].reshape((1, self.q, self.N))
        w = u[self.q * self.N:].reshape((self.p, self.q, self.N))
        return f, w

    def sampleIt(self, latentFunc, time=None, rng=None):
        """A sample function drawn from a kernel's GP prior
        (reference nonparametric.py:193-215)."""
        rng = np.random.default_rng() if rng is None else rng
        if time is None:
            time = self.time
        time = np.asarray(time, dtype=float)
        from gpyrn_tpu.ops.linalg import TRAIN_NUGGET
        r = time[:, None] - time[None, :]
        K = np.asarray(kernels_mod.evaluate(latentFunc.structure,
                                            latentFunc.core_params(), r=r))
        K = K + TRAIN_NUGGET * np.eye(time.size)
        w, V = np.linalg.eigh(K)
        w = np.clip(w, 0.0, None)
        return V @ (np.sqrt(w) * rng.standard_normal(time.size))

    def _normalize_means(self, means):
        """Scalar/None → per-output list (shared by ELBOcalc/ELBOaux)."""
        if isinstance(means, (int, float)) or means is None:
            means = [means]
        means = [None if isinstance(m, (int, float)) or m is None else m
                 for m in means]
        if len(means) == 1 and self.p > 1:
            means = means * self.p
        return means

    def _logs_from_std(self, var):
        """Per-component log std-devs from a std-dev scalar/vector."""
        logs = np.log(np.abs(np.atleast_1d(np.asarray(var, dtype=float)))
                      + 1e-300)
        if logs.size == 1:
            logs = np.full(self.k, float(logs))
        return logs

    def ELBOaux(self, nodes, weights, means, jitters, mu, var):
        """Single ELBO evaluation at given mixture parameters
        (reference nonparametric.py:272-327).  ``var`` holds per-component
        standard deviations (the same convention as ELBOcalc's return)."""
        means = self._normalize_means(means)
        jitters = np.atleast_1d(np.asarray(jitters, dtype=float))
        eng = self._engine(nodes, weights, means)
        theta = _core.pack_parameters(nodes, weights, means, jitters)
        logs = self._logs_from_std(var)
        return float(eng.elbo(theta, self.time, self.y, self.yerr2,
                              np.asarray(mu, dtype=float), logs))

    def _engine(self, nodes, weights, means):
        spec = _core.spec_from_components(nodes, weights, means, self.N)
        core_maps = None
        if any(kk.has_core_map() for kk in list(nodes) + list(weights)):
            core_maps = (
                tuple(kk.core_params_from if kk.has_core_map() else None
                      for kk in nodes),
                tuple(kk.core_params_from if kk.has_core_map() else None
                      for kk in weights),
            )
        return make_npv_engine(spec, self.k, core_maps)

    def ELBOcalc(self, nodes, weights, means, jitters, iterations: int = 500,
                 learning_rate: float = 5e-2, mu=None, var=None, seed: int = 0):
        """Fit the mixture variational parameters by on-device adam and
        return ``(ELBO, mu, var)`` with ``mu`` of shape (k, d) and ``var``
        the per-component std-dev vector of shape (k,).  A ``var`` input
        uses the same std-dev convention, so the returned state
        round-trips: ``ELBOcalc(..., mu=mu, var=var)`` resumes exactly."""
        means = self._normalize_means(means)
        jitters = np.atleast_1d(np.asarray(jitters, dtype=float))
        eng = self._engine(nodes, weights, means)
        theta = _core.pack_parameters(nodes, weights, means, jitters)

        rng = np.random.default_rng(seed)
        if mu is None:
            mu = 0.1 * rng.standard_normal((self.k, self.d))
        if var is None:
            logs = np.full(self.k, np.log(0.3))
        else:
            logs = self._logs_from_std(var)

        elbo, mu, logs, traj = eng.fit(theta, self.time, self.y, self.yerr2,
                                       mu, logs, int(iterations),
                                       learning_rate)
        self._traj = np.asarray(traj)
        return float(elbo), np.asarray(mu), np.exp(np.asarray(logs))

    # ------------------------------------------------------------------
    # posterior predictive & component maintenance (TPU-native
    # extensions; the reference's experimental module has neither)
    # ------------------------------------------------------------------

    def predict(self, nodes, weights, means, jitters, mu, var,
                tstar=None, nn: int = 1000):
        """Mixture posterior predictive per output.

        Each component's state (μ_j, s_j²·1) defines the same GPRN
        conditionals as a mean-field state, evaluated with the batched
        lattice engine; the uniform mixture then combines them:

            mean = (1/k) Σ_j mean_j
            var  = (1/k) Σ_j (var_j + mean_j²) − mean².

        Args mirror ``ELBOcalc``; ``mu`` is (k, d) and ``var`` the
        per-component std-dev vector of shape (k,).  Returns
        ``(tstar, mean (n*, p), std (n*, p))``.
        """
        means_l = self._normalize_means(means)
        jitters = np.atleast_1d(np.asarray(jitters, dtype=float))
        spec = _core.spec_from_components(nodes, weights, means_l, self.N)
        core_maps = None
        if any(kk.has_core_map() for kk in list(nodes) + list(weights)):
            core_maps = (
                tuple(kk.core_params_from if kk.has_core_map() else None
                      for kk in nodes),
                tuple(kk.core_params_from if kk.has_core_map() else None
                      for kk in weights),
            )
        eng = _core.make_engine(spec, core_maps)
        theta = _core.pack_parameters(nodes, weights, means_l, jitters)
        t = self.time
        if tstar is None:
            ptp = np.ptp(t)
            tstar = np.linspace(t.min() - 0.2 * ptp,
                                t.max() + 0.2 * ptp, nn)
        tstar = np.atleast_1d(np.asarray(tstar, dtype=float))

        mu = np.asarray(mu, dtype=float).reshape(self.k, self.d)
        s2 = np.asarray(var, dtype=float).reshape(self.k) ** 2
        comp_means, comp_vars = [], []
        for j in range(self.k):
            var_j = np.full(self.d, s2[j])
            m_out, v_out, _, _ = eng.predict(theta, t, self.y,
                                             self.yerr2, mu[j], var_j,
                                             tstar)
            comp_means.append(np.asarray(m_out))
            comp_vars.append(np.asarray(v_out))
        comp_means = np.stack(comp_means)                   # (k, n*, p)
        comp_vars = np.stack(comp_vars)
        mean = comp_means.mean(axis=0)
        second = (comp_vars + comp_means ** 2).mean(axis=0)
        std = np.sqrt(np.maximum(second - mean ** 2, 0.0))
        return tstar, mean, std

    def resample_components(self, mu, var, threshold: float = 1e-2,
                            jitter_scale: float = 0.5, seed: int = 0):
        """Re-initialize COLLAPSED mixture components.

        Nonparametric VI's uniform mixture wastes capacity when two
        components land on the same mode (a known failure mode of the
        Gershman et al. family): any pair closer than
        ``threshold × state scale`` has its second member re-seeded at a
        randomly-perturbed copy of the pair (perturbation
        ``jitter_scale × s_i``), after which ``ELBOcalc(mu=, var=)``
        resumes the fit.  Returns ``(mu, var, n_resampled)``.
        """
        rng = np.random.default_rng(seed)
        mu = np.array(np.asarray(mu, dtype=float).reshape(self.k, self.d))
        var = np.array(np.asarray(var, dtype=float).reshape(self.k))
        scale = max(float(np.sqrt(np.mean(mu ** 2))), 1e-12)
        n_res = 0
        for i in range(self.k):
            for j in range(i + 1, self.k):
                dist = np.sqrt(np.mean((mu[i] - mu[j]) ** 2))
                if dist < threshold * scale:
                    mu[j] = mu[i] + jitter_scale * var[i] * \
                        rng.standard_normal(self.d)
                    var[j] = var[i]
                    n_res += 1
        return mu, var, n_res
