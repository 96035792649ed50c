"""GPRN posterior prediction through matrix-free CG — the N ≫ 20k path.

`engine.predict` (models/gprn.py) factors every GP in the q·(1+p)
lattice densely: O(B·N²) memory.  This module computes the same
conditionals through :mod:`gpyrn_tpu.ops.iterative`'s chunked kernel
matvecs and conjugate gradients — O(N·chunk) memory per GP — so
prediction keeps working where the dense lattice no longer fits a chip.

Accuracy is set by the CG tolerance (default 1e-8 relative residual —
visually indistinguishable from dense; tighten for parity studies).
Predictive variances cost one batched CG solve per ``rhs_chunk`` test
points and can be disabled.

The combine formula and the per-GP noise conventions match the
reference exactly (meanfield.py:1289-1379; PREDICT_NUGGET 1.25e-12,
jitter² added q times — see models/gprn.py `predict`).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gpyrn_tpu.models import gprn as _core
from gpyrn_tpu.ops.iterative import (cg_solve, kernel_matvec,
                                     lanczos_vectors)
from gpyrn_tpu.ops.kernels import evaluate as _keval, is_nonstationary
from gpyrn_tpu.ops.linalg import PREDICT_NUGGET, cross_kernel_matrix

__all__ = ["predict_iterative", "LovePredictor", "build_love",
           "sample_iterative"]


def _gp_conditional_cg(structure, params, t, m_row, v_row, tstar,
                       tol, maxiter, rhs_chunk, want_var, mesh=None):
    """Mean and (optionally) variance of one GP's conditional
    N(K* A⁻¹ m, diag(K** − K* A⁻¹ K*ᵀ)), A = K + diag(v) + nugget·I,
    with every solve through chunked-matvec CG.  With ``mesh``, solves
    run through :func:`gpyrn_tpu.parallel.cg_solve_sharded` — the
    matvec's rows distributed over the mesh's dp axis."""
    t = np.asarray(t, dtype=float)
    N = t.shape[0]
    params = jnp.asarray(params)

    # Jacobi preconditioner: diag(A) = k(0) + v (any positive diagonal
    # works; for the non-stationary trio just the state variance)
    if is_nonstationary(structure):
        k0 = 1.0
    else:
        k0 = float(_keval(structure, params, r=jnp.zeros(())))
    precond = jnp.asarray(k0 + np.asarray(v_row, dtype=float))

    vr = jnp.asarray(v_row)

    def matvec(x):
        base = kernel_matvec(structure, params, t, x,
                             nugget=PREDICT_NUGGET)
        return base + (vr[:, None] * x if x.ndim == 2 else vr * x)

    if mesh is not None:
        from gpyrn_tpu.parallel.iterative_sharded import cg_solve_sharded

        def solve(rhs):
            x, _ = cg_solve_sharded(structure, params, t,
                                    np.asarray(rhs), mesh,
                                    d_add=np.asarray(v_row, float),
                                    nugget=PREDICT_NUGGET, tol=tol,
                                    maxiter=maxiter)
            return jnp.asarray(x)
    else:
        def solve(rhs):
            x, _ = cg_solve(matvec, rhs, tol=tol, maxiter=maxiter,
                            precond_diag=precond)
            return x

    alpha = solve(jnp.asarray(m_row))
    Kstar = np.asarray(cross_kernel_matrix(structure, params, tstar, t))
    mean = Kstar @ np.asarray(alpha)

    if not want_var:
        return mean, None

    # diag K**(t*, t*) — elementwise, no n*×n* buffer
    if is_nonstationary(structure):
        ts = jnp.asarray(tstar)
        kss = np.asarray(_keval(structure, params, r=jnp.zeros_like(ts),
                                t1=ts, t2=ts)) + PREDICT_NUGGET
    else:
        k0 = float(_keval(structure, params, r=jnp.zeros(())))
        kss = np.full(len(tstar), k0 + PREDICT_NUGGET)

    n_star = len(tstar)
    var = np.empty(n_star)
    for s0 in range(0, n_star, rhs_chunk):
        cols = Kstar[s0:s0 + rhs_chunk].T                  # (N, c)
        X = solve(jnp.asarray(cols))
        var[s0:s0 + rhs_chunk] = kss[s0:s0 + rhs_chunk] - \
            np.sum(cols * np.asarray(X), axis=0)
    return mean, var


# ---------------------------------------------------------------------------
# LOVE: cached predictive (co)variances
# ---------------------------------------------------------------------------

class LovePredictor:
    """Constant-time-per-point predictive variances from a one-off
    Lanczos cache (LOVE — Pleiss et al. 2018, adapted to the GPRN
    lattice).

    Per lattice GP, :func:`build_love` runs ``rank`` fully
    reorthogonalized Lanczos steps on A = K + diag(v) + nugget·I
    (ops/iterative.lanczos_vectors) and stores

        R = L_T⁻¹ Q        (rank, N),  T = Q A Qᵀ = L_T L_Tᵀ

    so the variance reduction at test points becomes one GEMM:
    k*ᵀ A⁻¹ k* ≈ ‖R k*‖².  After the build, each `predict` call costs
    O(rank·N) per test point with NO solves — dense `predict` is
    O(N²)/point and the CG path one solve per ``rhs_chunk`` points.
    The mean uses the cached CG solve α = A⁻¹ m (exact to `tol`).

    Accuracy is Krylov-spectral: the error decays with ``rank`` like CG
    on the same matrix (tests/test_love.py measures the decay); the
    cache is state-dependent — rebuild after ELBOcalc/parameter moves.
    """

    def __init__(self, gprn, rows, t):
        self._rows = rows           # per-GP dicts: structure, params, …
        self._t = t
        self.q, self.p = gprn.q, gprn.p
        self._gprn = gprn

    def predict(self, tstar=None, nn: int = 1000, variances: bool = True):
        """Same return convention as :func:`predict_iterative`."""
        g = self._gprn
        t = self._t
        if tstar is None:
            ptp = np.ptp(t)
            tstar = np.linspace(t.min() - 0.2 * ptp,
                                t.max() + 0.2 * ptp, nn)
        tstar = np.atleast_1d(np.asarray(tstar, dtype=float))
        q, p = self.q, self.p
        means, vars_ = [], []
        for row in self._rows:
            Kstar = cross_kernel_matrix(row["structure"], row["params"],
                                        tstar, t)           # (n*, N)
            mean = np.asarray(Kstar @ row["alpha"])
            if variances:
                V = row["R"] @ Kstar.T                      # (rank, n*)
                if is_nonstationary(row["structure"]):
                    ts = jnp.asarray(tstar)
                    kss = np.asarray(_keval(
                        row["structure"], row["params"],
                        r=jnp.zeros_like(ts),
                        t1=ts, t2=ts)) + PREDICT_NUGGET
                else:
                    kss = np.full(len(tstar),
                                  row["k0"] + PREDICT_NUGGET)
                var = np.maximum(kss - np.asarray(
                    jnp.sum(V * V, axis=0)), 0.0)
            else:
                var = np.zeros_like(mean)
            means.append(mean)
            vars_.append(var)
        means, vars_ = np.stack(means), np.stack(vars_)
        return _combine_lattice(g, tstar, means, vars_, q, p)


def build_love(gprn, rank: int = 100, tol: float = 1e-8,
               maxiter: int = 2000) -> LovePredictor:
    """Build the LOVE cache from the current variational state: one
    CG solve (the predictive mean's α) plus ``rank`` Lanczos steps per
    lattice GP.  See :class:`LovePredictor`."""
    gprn._require_components()
    t = np.asarray(gprn.time, dtype=float)
    if gprn._mu is None:
        raise ValueError("no variational state: run ELBOcalc first")
    rows = []
    for structure, pars, m_row, v_row in _lattice_rows(gprn):
        params = jnp.asarray(pars)
        if is_nonstationary(structure):
            k0 = 1.0
        else:
            k0 = float(_keval(structure, params, r=jnp.zeros(())))
        vr = jnp.asarray(np.asarray(v_row, dtype=float))

        def matvec(x, params=params, structure=structure, vr=vr):
            base = kernel_matvec(structure, params, t, x,
                                 nugget=PREDICT_NUGGET)
            return base + (vr[:, None] * x if x.ndim == 2 else vr * x)

        precond = jnp.asarray(k0 + np.asarray(v_row, dtype=float))
        m_j = jnp.asarray(np.asarray(m_row, dtype=float))
        alpha, _ = cg_solve(matvec, m_j, tol=tol, maxiter=maxiter,
                            precond_diag=precond)
        # Lanczos start: the mean RHS when informative, else ones —
        # LOVE's canonical probe couples the cache to the solve space
        v0 = jnp.where(jnp.linalg.norm(m_j) > 1e-12, m_j,
                       jnp.ones_like(m_j))
        k = min(rank, t.shape[0])
        Q, al, be = lanczos_vectors(matvec, v0, k)
        T = jnp.diag(al) + jnp.diag(be[:-1], 1) + jnp.diag(be[:-1], -1)
        L_T = jnp.linalg.cholesky(T)
        R = _solve_lower(L_T, Q)                            # (k, N)
        rows.append({"structure": structure, "params": params,
                     "alpha": np.asarray(alpha), "R": np.asarray(R),
                     "k0": k0})
    return LovePredictor(gprn, rows, t)


def _solve_lower(L, B):
    from jax.lax.linalg import triangular_solve
    return triangular_solve(L, B, left_side=True, lower=True)


def _lattice_rows(gprn):
    """(structure, core_params, mu_row, var_row) per lattice GP in the
    engine's prediction order (q nodes, then weights in i·q+j order)."""
    q, p, N = gprn.q, gprn.p, gprn.N
    mu = np.asarray(gprn._mu).ravel()
    var = np.asarray(gprn._var).ravel()
    muF = mu[:q * N].reshape(q, N)
    muW = mu[q * N:].reshape(p, q, N)
    varF = var[:q * N].reshape(q, N)
    varW = var[q * N:].reshape(p, q, N)
    rows = []
    for j, node in enumerate(gprn.nodes):
        rows.append((node.structure, node.core_params(), muF[j], varF[j]))
    for j in range(q):
        for i in range(p):
            wk = gprn.weights[j * p + i]
            rows.append((wk.structure, wk.core_params(),
                         muW[i, j], varW[i, j]))
    return rows


def _combine_lattice(gprn, tstar, means, vars_, q, p):
    """Lattice conditionals → per-output predictive (the reference's
    combine formula, meanfield.py:1289-1379)."""
    n_pred, n_var = means[:q], vars_[:q]
    w_pred = means[q:].reshape(q, p, -1)
    w_var = vars_[q:].reshape(q, p, -1)
    theta = _core.pack_parameters(gprn.nodes, gprn.weights, gprn.means,
                                  gprn.jitters)
    spec = gprn.engine.spec
    _, _, mean_p, jitters = _core.unpack_parameters(spec,
                                                    np.asarray(theta))
    from gpyrn_tpu.ops import means as means_mod
    m_rows = []
    for s, mp in zip(spec.mean_structs, mean_p):
        if s is None:
            m_rows.append(np.zeros_like(tstar))
        else:
            m_rows.append(np.asarray(means_mod.evaluate(
                s, np.asarray(mp), tstar), dtype=float))
    m_star = np.stack(m_rows)                              # (p, n*)
    jitt2 = np.asarray(jitters, dtype=float) ** 2
    mean_out = m_star.T + np.einsum("qn,qpn->np", n_pred, w_pred)
    var_out = np.einsum(
        "qpn->np",
        w_pred ** 2 * n_var[:, None, :] +
        w_var * (n_var[:, None, :] + n_pred[:, None, :] ** 2)) \
        + q * jitt2[None, :]
    std_out = np.sqrt(np.maximum(var_out, 0.0))
    return tstar, mean_out, std_out, (n_pred, w_pred.reshape(q * p, -1))


def predict_iterative(gprn, tstar=None, nn: int = 1000, tol: float = 1e-8,
                      maxiter: int = 2000, rhs_chunk: int = 64,
                      variances: bool = True, mesh=None):
    """Posterior predictive per output via matrix-free CG solves.

    Same return convention as ``inference.predict``:
    ``(tstar, mean (n*, p), std (n*, p), (node_preds, weight_preds))``
    (std is zeros when ``variances=False``).  ``mesh``: distribute each
    solve's kernel-matvec rows over the mesh's dp axis
    (:func:`gpyrn_tpu.parallel.cg_solve_sharded`) — multi-chip
    throughput for the N ≫ 20k prediction path.
    """
    gprn._require_components()
    t = np.asarray(gprn.time, dtype=float)
    if tstar is None:
        ptp = np.ptp(t)
        tstar = np.linspace(t.min() - 0.2 * ptp, t.max() + 0.2 * ptp, nn)
    tstar = np.atleast_1d(np.asarray(tstar, dtype=float))
    if gprn._mu is None:
        raise ValueError("no variational state: run ELBOcalc first")

    means, vars_ = [], []
    for structure, pars, m_row, v_row in _lattice_rows(gprn):
        mean_b, var_b = _gp_conditional_cg(
            structure, pars, t, m_row, v_row, tstar, tol, maxiter,
            rhs_chunk, variances, mesh=mesh)
        means.append(mean_b)
        vars_.append(var_b if var_b is not None
                     else np.zeros_like(mean_b))
    return _combine_lattice(gprn, tstar, np.stack(means),
                            np.stack(vars_), gprn.q, gprn.p)


def sample_iterative(gprn, time=None, rng=None, n_steps: int = 64):
    """Prior samples of all node and weight functions, matrix-free —
    ``inference.sample`` semantics (meanfield.py:517-539 reference
    surface) at N ≫ 20k: each draw is K^(1/2) ξ through
    :func:`gpyrn_tpu.ops.iterative.msqrt_apply` (k chunked kernel
    matvecs, O(k·N) memory) instead of a dense eigendecomposition.
    Returns ``(node_samples (q, n), weight_samples (q·p, n))``.
    """
    from gpyrn_tpu.ops.iterative import msqrt_apply
    from gpyrn_tpu.ops.kernels import is_nonstationary as _nonstat

    gprn._require_components()
    rng = np.random.default_rng() if rng is None else rng
    t = np.asarray(gprn.time if time is None else time, dtype=float)
    nodes, weights, _, _ = gprn._get_components()

    def draw(kernel):
        pars = jnp.asarray(np.asarray(kernel.core_params(), float))
        # the dense `sample` adds PREDICT_NUGGET only on the stationary
        # branch (reference quirk) — mirror it
        nug = 0.0 if _nonstat(kernel.structure) else PREDICT_NUGGET

        def mv(x):
            return kernel_matvec(kernel.structure, pars, t, x,
                                 nugget=nug)
        xi = jnp.asarray(rng.standard_normal(t.size))
        return np.asarray(msqrt_apply(mv, xi, n_steps=n_steps))

    node_samples = np.array([draw(n) for n in nodes])
    weight_samples = np.array([draw(w) for w in weights])
    return node_samples, weight_samples
