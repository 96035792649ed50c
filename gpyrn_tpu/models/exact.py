"""Exact-parity ELBO evaluation on f32 hardware (q = 1 models).

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

Currently restricted to q = 1 (covers BASELINE configs 1, 2 and the
headline benchmark config); q > 1 adds the reference's cumulative
cross-trace quirk and is on the roadmap.  Practical N is set by the
unblocked df64 Cholesky (O(N³) VPU work): hundreds of points.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gpyrn_tpu.ops.df64 import (DF, df_cholesky, df_logdet_from_chol,
                                df_tri_solve, from_f64, to_f64)
from gpyrn_tpu.ops.df64_kernels import df_kernel_matrix, df_supported
from gpyrn_tpu.ops.linalg import TRAIN_NUGGET

__all__ = ["elbo_exact_q1"]


def _df_terms(structure, params, t, d_diag, mu):
    """Per-GP df64 quantities at state diagonal ``d_diag`` (D = diag(d)):

    returns (logdet K, μᵀK⁻¹μ, tr(K⁻¹Σ), diag Σ) with
    A = K + D⁻¹, Σ = (K⁻¹ + D)⁻¹."""
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
    return logdet_K, muKmu, tr_KinvSigma, logdet_sigma, diag_sigma


def elbo_exact_q1(gprn, mu=None, var=None):
    """Reference-convention ELBO at the (converged) variational state,
    with every ill-conditioned factorization in df64 — f32 hardware
    only.  Requires q = 1 and df64-supported stationary kernels.

    Uses ``gprn._mu``/``gprn._var`` (e.g. from a ``precision='mixed'``
    or plain fit) unless ``mu``/``var`` are given."""
    gprn._require_components()
    if gprn.q != 1:
        raise NotImplementedError("elbo_exact_q1 supports q = 1 models")
    for k in list(gprn.nodes) + list(gprn.weights):
        if not df_supported(k.structure):
            raise ValueError(f"kernel {k} not df64-supported")

    if mu is None:
        mu, var = gprn._mu, gprn._var
    if mu is None:
        raise ValueError("no variational state: run ELBOcalc first "
                         "or pass mu/var")
    mu = np.asarray(mu, dtype=np.float64).ravel()
    var = np.asarray(var, dtype=np.float64).ravel()
    N, p = gprn.N, gprn.p
    t = np.asarray(gprn.time, dtype=np.float64)
    muF = mu[:N]
    muW = mu[N:].reshape(p, N)
    varF = var[:N]
    varW = var[N:].reshape(p, N)

    jitters = np.asarray(gprn.jitters, dtype=np.float64)
    variance = jitters[:, None] ** 2 + np.asarray(gprn.yerr2,
                                                  dtype=np.float64)
    m_rows = []
    for mean in gprn.means:
        if mean is None or isinstance(mean, (int, float)):
            m_rows.append(np.zeros(N))
        else:
            m_rows.append(np.asarray(mean(t), dtype=np.float64))
    y_raw = np.asarray(gprn.y, dtype=np.float64)
    y_c = y_raw - np.stack(m_rows)

    # -- node GP (eqs. 16-17 state diagonal) --------------------------------
    dv = np.sum((muW ** 2 + varW) / variance, axis=0)        # D_f = diag(dv)
    node = gprn.nodes[0]
    ldK_f, muKmu_f, tr_f, ldSig_f, dSf = _df_terms(
        node.structure, node.core_params(), t, dv, muF)

    # -- weight GPs ----------------------------------------------------------
    dv2 = muF ** 2 + dSf
    ldK_w, muKmu_w, tr_w, ldSig_w, dSw = [], [], [], [], []
    for i, wk in enumerate(gprn.weights):
        d_w = dv2 / variance[i]                  # D_w = diag(dv2/variance)
        out = _df_terms(wk.structure, wk.core_params(), t, d_w, muW[i])
        ldK_w.append(out[0])
        muKmu_w.append(out[1])
        tr_w.append(out[2])
        ldSig_w.append(out[3])
        dSw.append(out[4])
    dSw = np.stack(dSw)                                      # (p, N)

    # -- entropy (reference meanfield.py:1069-1093) --------------------------
    ent = 0.5 * (ldSig_f + sum(ldSig_w)) \
        + 0.5 * (p + 1) * N * (1 + np.log(2 * np.pi))

    # -- expected log prior (meanfield.py:992-1067; q=1: no cum terms) -------
    logp = (-0.5 * ldK_f - 0.5 * (muKmu_f + tr_f)
            + sum(-0.5 * lk - 0.5 * (mk + tk)
                  for lk, mk, tk in zip(ldK_w, muKmu_w, tr_w))
            - 0.5 * N * (p + 1) * np.log(2 * np.pi))

    # -- expected log likelihood (meanfield.py:895-990; raw-y quirk) ---------
    logl = -0.5 * np.sum(np.log(2 * np.pi * variance))
    omega_nu = muW * muF[None, :]
    res = y_raw - omega_nu
    logl -= 0.5 * np.sum(res ** 2 / variance)
    quad = (dSf[None, :] * muW ** 2 + dSw * muF[None, :] ** 2
            + dSf[None, :] * dSw) / variance
    logl -= 0.5 * np.sum(quad)

    return float(logl + logp + ent)
