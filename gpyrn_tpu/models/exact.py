"""Exact-parity ELBO evaluation on f32 hardware.

The missing piece between the f32 speed path and 1e-6 reference parity:
the coordinate-ascent FIT is f32-safe with the exact nugget
(``fit_state``), but the ELBO *terms* need factorizations of the
ill-conditioned K itself, beyond f32.  This evaluator computes those
terms in double-single (df64) arithmetic — kernel assembly included
(:mod:`gpyrn_tpu.ops.df64_kernels`) — so the full pipeline runs on f32
hardware:

    f32 ``fit_state`` (exact nugget, converges to the true fixed point)
    → df64 ELBO terms at that state.

Accuracy argument: the ELBO is stationary in the variational parameters
at the fixed point, so an O(ε) state error perturbs the ELBO only by
O(ε²); with the f32 state's ε ~ 1e-5 and df64's ~1e-13 term accuracy,
the evaluated ELBO matches the float64 fixed-point value to ~1e-6
relative or better.

All Σ-dependent quantities come from determinant/trace identities that
avoid forming Σ = K − K A⁻¹ K (A = K + D⁻¹ is well-conditioned):

    log det Σ  = log det K − log det A − log det D
    tr(K⁻¹ Σ)  = tr(A⁻¹ D⁻¹) = Σᵢ (A⁻¹)ᵢᵢ / Dᵢᵢ
    diag Σ     = diag K − column-norms²(L_A⁻¹ K)

Supports any (q, p); the reference's q>1 cumulative cross-trace quirk
is computed with df64 cross-solves.  Practical N is set by the
unblocked df64 Cholesky (O(N³) VPU work): hundreds of points.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gpyrn_tpu.ops.df64 import (DF, df_cholesky, df_logdet_from_chol,
                                df_tri_solve, from_f64, to_f64)
from gpyrn_tpu.ops.df64_kernels import df_kernel_matrix, df_supported
from gpyrn_tpu.ops.linalg import TRAIN_NUGGET

__all__ = ["elbo_exact", "elbo_exact_q1"]


def _df_terms(structure, params, t, d_diag, mu, want_factors=False):
    """Per-GP df64 quantities at state diagonal ``d_diag`` (D = diag(d)):

    returns (logdet K, μᵀK⁻¹μ, tr(K⁻¹Σ), logdet Σ, diag Σ[, K, L, LA])
    with A = K + D⁻¹, Σ = (K⁻¹ + D)⁻¹."""
    K = df_kernel_matrix(structure, params, t, TRAIN_NUGGET)
    N = K.hi.shape[0]
    L = df_cholesky(K)
    ld_hi, ld_lo = df_logdet_from_chol(L)
    logdet_K = float(np.float64(np.asarray(ld_hi))
                     + np.float64(np.asarray(ld_lo)))

    # μᵀ K⁻¹ μ = ||L⁻¹ μ||²
    mu_df = from_f64(np.asarray(mu, dtype=np.float64))
    w = df_tri_solve(L, mu_df)
    w64 = np.asarray(to_f64(w), dtype=np.float64)
    muKmu = float(np.sum(w64 * w64))

    # A = K + diag(1/d)
    inv_d = 1.0 / np.asarray(d_diag, dtype=np.float64)
    inv_df = from_f64(inv_d)
    eye = jnp.eye(N, dtype=jnp.float32)
    A = DF(K.hi + inv_df.hi * eye, K.lo + inv_df.lo * eye)
    LA = df_cholesky(A)
    la_hi, la_lo = df_logdet_from_chol(LA)
    logdet_A = float(np.float64(np.asarray(la_hi))
                     + np.float64(np.asarray(la_lo)))

    # L_A⁻¹ I → diag(A⁻¹) = column-norms²;  L_A⁻¹ K → diag Σ
    I_df = DF(eye, jnp.zeros_like(eye))
    Linv = np.asarray(to_f64(df_tri_solve(LA, I_df)), dtype=np.float64)
    diag_Ainv = np.sum(Linv * Linv, axis=0)
    B = np.asarray(to_f64(df_tri_solve(LA, K)), dtype=np.float64)
    K64 = np.asarray(to_f64(K), dtype=np.float64)
    diag_sigma = np.diag(K64) - np.sum(B * B, axis=0)

    tr_KinvSigma = float(np.sum(diag_Ainv * inv_d))
    logdet_D = float(np.sum(np.log(np.asarray(d_diag, dtype=np.float64))))
    logdet_sigma = logdet_K - logdet_A - logdet_D
    out = (logdet_K, muKmu, tr_KinvSigma, logdet_sigma, diag_sigma)
    if want_factors:
        return out + (K, L, LA)
    return out


def _np_to_df(x):
    hi = np.asarray(x, dtype=np.float32)
    lo = (np.asarray(x, dtype=np.float64) - hi.astype(np.float64)) \
        .astype(np.float32)
    return DF(jnp.asarray(hi), jnp.asarray(lo))


def _cross_trace(Linv_j64, LA_k, inv_d_k):
    """tr(K_j⁻¹ Σ_k) for j ≠ k (the reference's cumulative-sumSigmaF
    quirk, meanfield.py:1039), via the Woodbury form
    Σ_k = D_k⁻¹ − D_k⁻¹ A_k⁻¹ D_k⁻¹ so every solve goes through the
    WELL-conditioned A_k (solving through K directly loses ~6 digits
    to cancellation):

        tr(K_j⁻¹Σ_k) = Σᵢ diag(K_j⁻¹)ᵢ (D_k⁻¹)ᵢ − ||L_{A_k}⁻¹ Tᵀ||_F²
        with T = L_j⁻¹ · diag(D_k⁻¹).
    """
    inv_d = np.asarray(inv_d_k, dtype=np.float64)
    diag_Kinv_j = np.sum(Linv_j64 * Linv_j64, axis=0)
    term1 = float(np.sum(diag_Kinv_j * inv_d))
    T = Linv_j64 * inv_d[None, :]
    W = np.asarray(to_f64(df_tri_solve(LA_k, _np_to_df(T.T))),
                   dtype=np.float64)
    return term1 - float(np.sum(W * W))


def elbo_exact(gprn, mu=None, var=None):
    """Reference-convention ELBO at the (converged) variational state,
    with every ill-conditioned factorization in df64 — f32 hardware
    only.  Requires df64-supported stationary kernels.

    Reproduces the reference's quirks exactly: the cumulative sumSigmaF
    node traces (meanfield.py:1039, via df64 cross-traces), the raw
    (p,q,N)→(q·p,N) weight-mean flatten in the prior (:1021), the raw-y
    likelihood (:940) and the ÷q scaling (:709).

    Uses ``gprn._mu``/``gprn._var`` (e.g. from a ``precision='mixed'``
    or plain fit) unless ``mu``/``var`` are given."""
    gprn._require_components()
    for k in list(gprn.nodes) + list(gprn.weights):
        if not df_supported(k.structure):
            raise ValueError(f"kernel {k} not df64-supported")

    if (mu is None) != (var is None):
        raise ValueError("pass both mu and var, or neither")
    if mu is None:
        mu, var = gprn._mu, gprn._var
    if mu is None:
        raise ValueError("no variational state: run ELBOcalc first "
                         "or pass mu/var")
    mu = np.asarray(mu, dtype=np.float64).ravel()
    var = np.asarray(var, dtype=np.float64).ravel()
    N, p, q = gprn.N, gprn.p, gprn.q
    t = np.asarray(gprn.time, dtype=np.float64)
    muF = mu[:q * N].reshape(q, N)
    muW = mu[q * N:].reshape(p, q, N)
    varW = var[q * N:].reshape(p, q, N)

    jitters = np.asarray(gprn.jitters, dtype=np.float64)
    variance = jitters[:, None] ** 2 + np.asarray(gprn.yerr2,
                                                  dtype=np.float64)
    y_raw = np.asarray(gprn.y, dtype=np.float64)

    # -- node GPs (eqs. 16-17 state diagonals) ------------------------------
    dv = np.sum((muW ** 2 + varW) / variance[:, None, :], axis=0)  # (q,N)
    node_out = []
    for j, node in enumerate(gprn.nodes):
        node_out.append(_df_terms(node.structure, node.core_params(),
                                  t, dv[j], muF[j], want_factors=True))
    dSf = np.stack([o[4] for o in node_out])                 # (q, N)

    # cumulative node traces: tr(K_j⁻¹ Σ_{k≤j} Σ_k)
    if q > 1:
        eyeN = jnp.eye(N, dtype=jnp.float32)
        I_df = DF(eyeN, jnp.zeros_like(eyeN))
        Linv64 = [np.asarray(to_f64(df_tri_solve(node_out[j][6], I_df)),
                             dtype=np.float64) for j in range(q)]
    tr_f = []
    for j in range(q):
        total = node_out[j][2]                   # same-index via identity
        for k in range(j):
            total += _cross_trace(Linv64[j], node_out[k][7], 1.0 / dv[k])
        tr_f.append(total)

    # -- weight GPs (lattice order a = j·p + i) ------------------------------
    dv2 = muF ** 2 + dSf                                     # (q, N)
    # reference quirk: prior μ rows come from the RAW (p,q,N) flatten
    muW_raw = muW.reshape(q * p, N)
    ldK_w, muKmu_w, tr_w, ldSig_w = [], [], [], []
    dSw = np.empty((q, p, N))
    for a, wk in enumerate(gprn.weights):
        j, i = a // p, a % p
        d_w = dv2[j] / variance[i]
        out = _df_terms(wk.structure, wk.core_params(), t, d_w, muW_raw[a])
        ldK_w.append(out[0])
        muKmu_w.append(out[1])
        tr_w.append(out[2])
        ldSig_w.append(out[3])
        dSw[j, i] = out[4]

    # -- entropy (meanfield.py:1069-1093) ------------------------------------
    ent = 0.5 * (sum(o[3] for o in node_out) + sum(ldSig_w)) \
        + 0.5 * q * (p + 1) * N * (1 + np.log(2 * np.pi))

    # -- expected log prior (meanfield.py:992-1067) ---------------------------
    logp = (sum(-0.5 * node_out[j][0] - 0.5 * (node_out[j][1] + tr_f[j])
                for j in range(q))
            + sum(-0.5 * lk - 0.5 * (mk + tk)
                  for lk, mk, tk in zip(ldK_w, muKmu_w, tr_w))
            - 0.5 * N * q * (p + 1) * np.log(2 * np.pi))

    # -- expected log likelihood (meanfield.py:895-990; raw-y quirk) ---------
    logl = -0.5 * np.sum(np.log(2 * np.pi * variance))
    omega_nu = np.einsum("pqn,qn->pn", muW, muF)
    res = y_raw - omega_nu
    logl -= 0.5 * np.sum(res ** 2 / variance)
    muW_qp = muW.transpose(1, 0, 2)                          # (q, p, N)
    quad = (dSf[:, None, :] * muW_qp ** 2
            + dSw * muF[:, None, :] ** 2
            + dSf[:, None, :] * dSw) / variance[None, :, :]
    logl -= 0.5 * np.sum(quad)

    return float((logl + logp + ent) / q)


def elbo_exact_q1(gprn, mu=None, var=None):
    """Backwards-compatible alias of :func:`elbo_exact`."""
    return elbo_exact(gprn, mu=mu, var=var)
