"""Double-single kernel-matrix assembly and exact log-determinants.

The measured blocker for an on-chip exact-parity ELBO (TODO.md): building
K in plain f32 before an exact factorization already perturbs
log det(K + 1e-6·I) by ~2% — the ill-conditioned spectrum amplifies the
1e-7-relative entry errors.  This module assembles K **in double-single
arithmetic end to end** (times, lags, transcendentals, nugget) and
factors it with the df64 Cholesky, recovering float64-grade
log-determinants from pure f32 hardware ops.

Covers the stationary kernels used by the BASELINE configs (Constant,
SquaredExponential, Periodic, QuasiPeriodic, RationalQuadratic,
Exponential, Matern32, Matern52, Cosine) plus +/* composites of them.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gpyrn_tpu.ops import kernels as _k
from gpyrn_tpu.ops.df64 import (DF, df, df_add, df_cholesky, df_div,
                                df_logdet_from_chol, df_mul, df_neg,
                                df_sqrt, df_sub, from_f64)
from gpyrn_tpu.ops.df64_math import (PI, df_abs, df_cos, df_exp, df_pow,
                                     df_sin)

__all__ = ["df_supported", "df_kernel_matrix", "df_logdet_kernel"]


def _c(v):
    """float64 scalar → DF constant."""
    v = np.float64(v)
    hi = np.float32(v)
    return DF(jnp.float32(hi), jnp.float32(v - np.float64(hi)))


_SQRT3 = _c(np.sqrt(3.0))
_SQRT5 = _c(np.sqrt(5.0))
_HALF = _c(0.5)
_ONE = _c(1.0)
_TWO = _c(2.0)
_THREE = _c(3.0)
_FIVE = _c(5.0)


def _bc(scalar: DF, like: DF) -> DF:
    """Broadcast a DF scalar against a DF array."""
    return DF(jnp.broadcast_to(scalar.hi, like.hi.shape),
              jnp.broadcast_to(scalar.lo, like.lo.shape))


def _sq(a: DF) -> DF:
    return df_mul(a, a)


def _se(p, r):
    theta, ell = p
    z = df_div(_sq(r), _bc(df_mul(_TWO, _sq(ell)), r))
    return df_mul(_bc(_sq(theta), r), df_exp(df_neg(z)))


def _periodic(p, r):
    theta, P, ell = p
    phase = df_div(df_mul(_bc(PI, r), df_abs(r)), _bc(P, r))
    s2 = _sq(df_sin(phase))
    z = df_div(df_mul(_bc(_TWO, r), s2), _bc(_sq(ell), r))
    return df_mul(_bc(_sq(theta), r), df_exp(df_neg(z)))


def _quasi_periodic(p, r):
    theta, elle, P, ellp = p
    phase = df_div(df_mul(_bc(PI, r), df_abs(r)), _bc(P, r))
    term1 = df_div(df_mul(_bc(_TWO, r), _sq(df_sin(phase))),
                   _bc(_sq(ellp), r))
    term2 = df_div(_sq(r), _bc(df_mul(_TWO, _sq(elle)), r))
    return df_mul(_bc(_sq(theta), r),
                  df_exp(df_neg(df_add(term1, term2))))


def _rq(p, r):
    theta, alpha, ell = p
    denom = df_mul(_TWO, df_mul(alpha, _sq(ell)))
    base = df_add(_bc(_ONE, r), df_div(_sq(r), _bc(denom, r)))
    return df_mul(_bc(_sq(theta), r),
                  df_pow(base, _bc(df_neg(alpha), r)))


def _exp_kernel(p, r):
    theta, ell = p
    z = df_div(df_abs(r), _bc(ell, r))
    return df_mul(_bc(_sq(theta), r), df_exp(df_neg(z)))


def _m32(p, r):
    theta, ell = p
    s = df_div(df_mul(_bc(_SQRT3, r), df_abs(r)), _bc(ell, r))
    return df_mul(_bc(_sq(theta), r),
                  df_mul(df_add(_bc(_ONE, r), s), df_exp(df_neg(s))))


def _m52(p, r):
    # matches the reference's written form (covfunc.py:376-396)
    theta, ell = p
    ar = df_abs(r)
    num = df_add(df_mul(df_mul(_bc(_THREE, r), _bc(_SQRT5, r)),
                        df_mul(_bc(ell, r), ar)),
                 df_mul(_bc(_FIVE, r), _sq(ar)))
    frac = df_div(num, _bc(df_mul(_THREE, _sq(ell)), r))
    damp = df_exp(df_neg(df_div(df_mul(_bc(_SQRT5, r), ar), _bc(ell, r))))
    return df_mul(_bc(_sq(theta), r),
                  df_mul(df_add(_bc(_ONE, r), frac), damp))


def _cos_kernel(p, r):
    theta, P = p
    phase = df_div(df_mul(_bc(df_mul(_TWO, PI), r), df_abs(r)), _bc(P, r))
    return df_mul(_bc(_sq(theta), r), df_cos(phase))


def _const(p, r):
    return _bc(_sq(p[0]), r)


_DF_KERNELS = {
    "C": (1, _const),
    "SE": (2, _se),
    "P": (3, _periodic),
    "QP": (4, _quasi_periodic),
    "RQ": (3, _rq),
    "EXP": (2, _exp_kernel),
    "M32": (2, _m32),
    "M52": (2, _m52),
    "COS": (2, _cos_kernel),
}


def df_supported(structure) -> bool:
    tag = structure[0]
    if tag in ("+", "*"):
        return df_supported(structure[1]) and df_supported(structure[2])
    return tag in _DF_KERNELS


def _evaluate(structure, params, r: DF) -> DF:
    tag = structure[0]
    if tag in ("+", "*"):
        n1 = _k.n_params(structure[1])
        a = _evaluate(structure[1], params[:n1], r)
        b = _evaluate(structure[2], params[n1:], r)
        return df_add(a, b) if tag == "+" else df_mul(a, b)
    npars, fn = _DF_KERNELS[tag]
    return fn(params[:npars], r)


def df_kernel_matrix(structure, params, t, nugget) -> DF:
    """Assemble K(t, t) + nugget·I entirely in double-single arithmetic.

    Args:
        structure: kernel structure tree (stationary, df_supported)
        params: float64 parameter vector
        t: float64 time vector (N,)
        nugget: diagonal jitter (the exact reference value — no f32
            trace-scaling needed, the factorization is df64)
    """
    if not df_supported(structure):
        raise ValueError(f"structure {structure} not df64-supported")
    t_df = from_f64(np.asarray(t, dtype=np.float64))
    N = t_df.hi.shape[0]
    r = df_sub(DF(t_df.hi[:, None], t_df.lo[:, None]),
               DF(t_df.hi[None, :], t_df.lo[None, :]))
    p_df = [from_f64(np.float64(v)) for v in np.asarray(params)]
    K = _evaluate(structure, p_df, r)
    eye = jnp.eye(N, dtype=jnp.float32)
    nug = from_f64(np.float64(nugget))
    return df_add(K, DF(nug.hi * eye, nug.lo * eye))


def df_logdet_kernel(structure, params, t, nugget):
    """log det(K + nugget·I) at float64-grade accuracy from f32 ops:
    df64 assembly + df64 Cholesky.  Returns a python float."""
    K = df_kernel_matrix(structure, params, t, nugget)
    L = df_cholesky(K)
    hi, lo = df_logdet_from_chol(L)
    return float(np.float64(np.asarray(hi)) + np.float64(np.asarray(lo)))
