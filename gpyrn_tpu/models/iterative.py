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
from gpyrn_tpu.ops.iterative import cg_solve, kernel_matvec
from gpyrn_tpu.ops.kernels import evaluate as _keval, is_nonstationary
from gpyrn_tpu.ops.linalg import PREDICT_NUGGET, cross_kernel_matrix

__all__ = ["predict_iterative"]


def _gp_conditional_cg(structure, params, t, m_row, v_row, tstar,
                       tol, maxiter, rhs_chunk, want_var):
    """Mean and (optionally) variance of one GP's conditional
    N(K* A⁻¹ m, diag(K** − K* A⁻¹ K*ᵀ)), A = K + diag(v) + nugget·I,
    with every solve through chunked-matvec CG."""
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

    alpha, _ = cg_solve(matvec, jnp.asarray(m_row), tol=tol,
                        maxiter=maxiter, precond_diag=precond)
    Kstar = np.asarray(cross_kernel_matrix(structure, params, tstar, t))
    mean = Kstar @ np.asarray(alpha)

    if not want_var:
        return mean, None

    # diag K**(t*, t*)
    if is_nonstationary(structure):
        kss = np.asarray(jnp.diagonal(_keval(
            structure, params, t1=jnp.asarray(tstar)[:, None],
            t2=jnp.asarray(tstar)[None, :]))) + PREDICT_NUGGET
    else:
        k0 = float(_keval(structure, params, r=jnp.zeros(())))
        kss = np.full(len(tstar), k0 + PREDICT_NUGGET)

    n_star = len(tstar)
    var = np.empty(n_star)
    for s0 in range(0, n_star, rhs_chunk):
        cols = Kstar[s0:s0 + rhs_chunk].T                  # (N, c)
        X, _ = cg_solve(matvec, jnp.asarray(cols), tol=tol,
                        maxiter=maxiter, precond_diag=precond)
        var[s0:s0 + rhs_chunk] = kss[s0:s0 + rhs_chunk] - \
            np.sum(cols * np.asarray(X), axis=0)
    return mean, var


def predict_iterative(gprn, tstar=None, nn: int = 1000, tol: float = 1e-8,
                      maxiter: int = 2000, rhs_chunk: int = 64,
                      variances: bool = True):
    """Posterior predictive per output via matrix-free CG solves.

    Same return convention as ``inference.predict``:
    ``(tstar, mean (n*, p), std (n*, p), (node_preds, weight_preds))``
    (std is zeros when ``variances=False``).
    """
    gprn._require_components()
    t = np.asarray(gprn.time, dtype=float)
    if tstar is None:
        ptp = np.ptp(t)
        tstar = np.linspace(t.min() - 0.2 * ptp, t.max() + 0.2 * ptp, nn)
    tstar = np.atleast_1d(np.asarray(tstar, dtype=float))
    if gprn._mu is None:
        raise ValueError("no variational state: run ELBOcalc first")

    q, p, N = gprn.q, gprn.p, gprn.N
    mu = np.asarray(gprn._mu).ravel()
    var = np.asarray(gprn._var).ravel()
    muF = mu[:q * N].reshape(q, N)
    muW = mu[q * N:].reshape(p, q, N)
    varF = var[:q * N].reshape(q, N)
    varW = var[q * N:].reshape(p, q, N)

    # lattice rows in the engine's prediction order: q nodes, then the
    # q·p weights in (i·q + j) order (models/gprn.py `predict`)
    rows = []
    for j, node in enumerate(gprn.nodes):
        rows.append((node.structure, node.core_params(), muF[j], varF[j]))
    for j in range(q):
        for i in range(p):
            wk = gprn.weights[j * p + i]
            rows.append((wk.structure, wk.core_params(),
                         muW[i, j], varW[i, j]))

    means, vars_ = [], []
    for structure, pars, m_row, v_row in rows:
        mean_b, var_b = _gp_conditional_cg(
            structure, pars, t, m_row, v_row, tstar, tol, maxiter,
            rhs_chunk, variances)
        means.append(mean_b)
        vars_.append(var_b if var_b is not None
                     else np.zeros_like(mean_b))
    means = np.stack(means)
    vars_ = np.stack(vars_)

    n_pred, n_var = means[:q], vars_[:q]
    w_pred = means[q:].reshape(q, p, -1)
    w_var = vars_[q:].reshape(q, p, -1)

    # mean functions at the test points
    theta = _core.pack_parameters(gprn.nodes, gprn.weights, gprn.means,
                                  gprn.jitters)
    spec = gprn.engine.spec
    _, _, mean_p, jitters = _core.unpack_parameters(spec, np.asarray(theta))
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
    return tstar, mean_out, std_out, (n_pred,
                                      w_pred.reshape(q * p, -1))
