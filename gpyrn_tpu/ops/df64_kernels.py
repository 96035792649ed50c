"""Double-single kernel-matrix assembly and exact log-determinants.

The measured blocker for an on-chip exact-parity ELBO (TODO.md): building
K in plain f32 before an exact factorization already perturbs
log det(K + 1e-6·I) by ~2% — the ill-conditioned spectrum amplifies the
1e-7-relative entry errors.  This module assembles K **in double-single
arithmetic end to end** (times, lags, transcendentals, nugget) and
factors it with the df64 Cholesky, recovering float64-grade
log-determinants from pure f32 hardware ops.

Covers the ENTIRE reference kernel library (covfunc.py:107-689): the
23 registry tags — stationary (C, WN, SE, P, QP, RQ, RQP, COS, EXP,
M32, M52, GammaExp, PW, PAC, NP, QNP, NRQP, CP, QCP) and the
non-stationary (t1, t2) trio-plus-one (LIN, POLY, HP, QHP) — plus +/*
composites of any of them AND the Derivative wrapper (tag "d", the
d²k/dxᵢdxⱼ kernels of the twice-differentiable SE/P/QP —
covfunc.py:83-104), so the on-chip exact refine path never falls back
to emulated f64 for ANY reference-expressible model.
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

__all__ = ["df_supported", "df_kernel_matrix", "df_logdet_kernel",
           "df_nonstationary"]


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


def _where(cond, a: DF, b: DF) -> DF:
    """Elementwise DF select."""
    return DF(jnp.where(cond, a.hi, b.hi), jnp.where(cond, a.lo, b.lo))


def _white_noise(p, r):
    # w² δ(r = 0)                              (reference covfunc.py:128-148)
    # the lag matrix is an EXACT df difference of the times, so a zero
    # pair identifies the diagonal (== the reference's eye for the
    # distinct-times inputs the library deals in)
    w2 = _bc(_sq(p[0]), r)
    zero = (r.hi == 0) & (r.lo == 0)
    return _where(zero, w2, DF(jnp.zeros_like(r.hi), jnp.zeros_like(r.lo)))


def _rqp(p, r):
    # Periodic × RQ                            (reference covfunc.py:291-313)
    theta, alpha, elle, P, ellp = p[:5]
    phase = df_div(df_mul(_bc(PI, r), df_abs(r)), _bc(P, r))
    per = df_exp(df_neg(df_div(df_mul(_bc(_TWO, r), _sq(df_sin(phase))),
                               _bc(_sq(ellp), r))))
    denom = df_mul(_TWO, df_mul(alpha, _sq(elle)))
    base = df_add(_bc(_ONE, r), df_div(_sq(r), _bc(denom, r)))
    rq = df_pow(base, _bc(df_neg(alpha), r))
    return df_mul(_bc(_sq(theta), r), df_mul(per, rq))


def _gamma_exp(p, r):
    # θ² exp(−(|r|/ℓ)^γ)                       (reference covfunc.py:415-432)
    theta, gamma, ell = p[:3]
    z = df_div(df_abs(r), _bc(ell, r))
    # z^γ via exp(γ log z); the r = 0 diagonal (log 0) is pinned to the
    # exact limit z^γ = 0 afterwards
    zg = df_pow(z, _bc(gamma, r))
    zero = (r.hi == 0) & (r.lo == 0)
    zg = _where(zero, DF(jnp.zeros_like(r.hi), jnp.zeros_like(r.lo)), zg)
    return df_mul(_bc(_sq(theta), r), df_exp(df_neg(zg)))


def _piecewise(p, r):
    # cubic compact-support kernel             (reference covfunc.py:458-473)
    eta = p[0]
    a = df_abs(df_div(r, _bc(df_mul(_HALF, eta), r)))
    one = _bc(_ONE, r)
    w = df_sub(one, a)
    val = df_mul(df_add(df_mul(_bc(_THREE, r), a), one),
                 df_mul(w, df_mul(w, w)))
    outside = a.hi + a.lo > 1
    return _where(outside, DF(jnp.zeros_like(r.hi), jnp.zeros_like(r.lo)),
                  val)


def _paciorek(p, r):
    # modified stationary Paciorek             (reference covfunc.py:477-496)
    amp, l1, l2 = p[:3]
    s2 = df_add(_sq(l1), _sq(l2))
    a = df_sqrt(df_div(df_mul(_TWO, df_mul(l1, l2)), s2))
    b = df_exp(df_neg(df_div(df_mul(_bc(_TWO, r), _sq(r)), _bc(s2, r))))
    return df_mul(_bc(df_mul(_sq(amp), a), r), b)


def _new_periodic(p, r):
    # RQ mapped to (cos, sin) space            (reference covfunc.py:499-519)
    amp, alpha2, P, ell = p[:4]
    phase = df_div(df_mul(_bc(PI, r), df_abs(r)), _bc(P, r))
    num = df_mul(_bc(_TWO, r), _sq(df_sin(phase)))
    base = df_add(_bc(_ONE, r),
                  df_div(num, _bc(df_mul(alpha2, _sq(ell)), r)))
    a = df_pow(base, _bc(df_neg(alpha2), r))
    return df_mul(_bc(_sq(amp), r), a)


def _quasi_new_periodic(p, r):
    # NewPeriodic × SE                         (reference covfunc.py:522-546)
    amp, alpha2, elle, P, ellp = p[:5]
    a = _new_periodic([_ONE, alpha2, P, ellp], r)
    z = df_div(_sq(r), _bc(df_mul(_TWO, _sq(elle)), r))
    return df_mul(_bc(_sq(amp), r), df_mul(a, df_exp(df_neg(z))))


def _new_rqp(p, r):
    # NewPeriodic × RQ                         (reference covfunc.py:549-576)
    amp, alpha1, alpha2, elle, P, ellp = p[:6]
    a = _new_periodic([_ONE, alpha2, P, ellp], r)
    denom = df_mul(_TWO, df_mul(alpha1, _sq(elle)))
    base = df_add(_bc(_ONE, r), df_div(_sq(r), _bc(denom, r)))
    b = df_pow(base, _bc(df_neg(alpha1), r))
    return df_mul(_bc(_sq(amp), r), df_mul(a, b))


def _cos_periodic(p, r):
    # SE mapped with cos (cos², not sin²)      (reference covfunc.py:645-665)
    amp, P, ell = p[:3]
    phase = df_div(df_mul(_bc(PI, r), df_abs(r)), _bc(P, r))
    z = df_div(df_mul(_bc(_TWO, r), _sq(df_cos(phase))), _bc(_sq(ell), r))
    return df_mul(_bc(_sq(amp), r), df_exp(df_neg(z)))


def _quasi_cos_periodic(p, r):
    # CosPeriodic × SE                         (reference covfunc.py:668-689)
    amp, elle, P, ellp = p[:4]
    a = _cos_periodic([_ONE, P, ellp], r)
    z = df_div(_sq(r), _bc(df_mul(_TWO, _sq(elle)), r))
    return df_mul(_bc(_sq(amp), r), df_mul(a, df_exp(df_neg(z))))


# ---- non-stationary kernels (double-single (t1, t2) convention) ----------

def _linear(p, t1, t2):
    # (t1 − c)(t2 − c)                         (reference covfunc.py:399-412)
    c = p[0]
    return df_mul(df_sub(t1, _bc(c, t1)), df_sub(t2, _bc(c, t2)))


def _polynomial(p, t1, t2):
    # (a·t1·t2 + b)^c; pars[0]=theta unused    (reference covfunc.py:435-455)
    # C99 pow semantics for negative bases (matches XLA's f64 pow):
    # integral exponent → signed |base|^c, non-integral → NaN
    _theta, a, b, c = p[:4]
    base = df_add(df_mul(_bc(a, t1), df_mul(t1, t2)), _bc(b, t1))
    mag = df_pow(df_abs(base), _bc(c, t1))
    cval = c.hi + c.lo
    is_int = jnp.round(cval) == cval
    odd = jnp.mod(jnp.round(cval), 2.0) != 0
    neg = base.hi < 0
    nan = jnp.full_like(base.hi, jnp.nan)
    hi = jnp.where(neg, jnp.where(is_int,
                                  jnp.where(odd, -mag.hi, mag.hi), nan),
                   mag.hi)
    lo = jnp.where(neg, jnp.where(is_int,
                                  jnp.where(odd, -mag.lo, mag.lo), 0.0),
                   mag.lo)
    # base == 0: 0^c = 0 for c > 0, 1 for c == 0 (df_pow's clamped log
    # already lands there to ~1e-38, keep it)
    return DF(hi, lo)


def _df_harmonic_series(Nh: DF, P: DF, t: DF):
    """Double-single Lagrange-identity terms (kernels.py:310-320;
    reference covfunc.py:592-601), preserving the reference's
    sin(...)/2*sin(...) operator-precedence quirk."""
    two_pi = df_mul(_TWO, PI)
    s = df_div(df_mul(df_mul(_bc(df_add(Nh, _HALF), t), _bc(two_pi, t)), t),
               _bc(P, t))
    phase = df_div(df_mul(_bc(PI, t), t), _bc(P, t))
    base = df_sin(phase)
    half_base = df_mul(_bc(_HALF, t), base)
    sin_term = df_mul(df_sin(s), half_base)
    cos_term = df_mul(df_cos(s), half_base)
    # 0.5 / tan(πt/P) = 0.5 · cos/sin
    tan_term = df_mul(_bc(_HALF, t), df_div(df_cos(phase), base))
    return sin_term, cos_term, tan_term


def _harmonic_periodic(p, t1, t2):
    # N-harmonic periodic kernel               (reference covfunc.py:579-607)
    Nh, amp, P, ell = p[:4]
    sin1, cos1, tan1 = _df_harmonic_series(Nh, P, t1)
    sin2, cos2, tan2 = _df_harmonic_series(Nh, P, t2)
    first = _sq(df_sub(sin1, sin2))
    second = _sq(df_sub(df_sub(tan1, cos1), df_sub(tan2, cos2)))
    z = df_div(df_mul(_bc(_HALF, t1), df_add(first, second)),
               _bc(_sq(ell), t1))
    return df_mul(_bc(_sq(amp), t1), df_exp(df_neg(z)))


def _quasi_harmonic_periodic(p, t1, t2):
    # HarmonicPeriodic × SE                    (reference covfunc.py:610-630)
    Nh, amp, elle, P, ellp = p[:5]
    a = _harmonic_periodic([Nh, _ONE, P, ellp], t1, t2)
    d = df_sub(t1, t2)
    z = df_div(_sq(d), _bc(df_mul(_TWO, _sq(elle)), d))
    return df_mul(_bc(_sq(amp), t1), df_mul(a, df_exp(df_neg(z))))


_DF_KERNELS = {
    "C": (1, _const),
    "WN": (1, _white_noise),
    "SE": (2, _se),
    "P": (3, _periodic),
    "QP": (4, _quasi_periodic),
    "RQ": (3, _rq),
    "RQP": (5, _rqp),
    "EXP": (2, _exp_kernel),
    "M32": (2, _m32),
    "M52": (2, _m52),
    "COS": (2, _cos_kernel),
    "GammaExp": (3, _gamma_exp),
    "PW": (1, _piecewise),
    "PAC": (3, _paciorek),
    "NP": (4, _new_periodic),
    "QNP": (5, _quasi_new_periodic),
    "NRQP": (6, _new_rqp),
    "CP": (3, _cos_periodic),
    "QCP": (4, _quasi_cos_periodic),
}

_DF_NONSTAT = {
    "LIN": (1, _linear),
    "POLY": (4, _polynomial),
    "HP": (4, _harmonic_periodic),
    "QHP": (5, _quasi_harmonic_periodic),
}


# ---- second-derivative kernels (the Derivative wrapper, tag "d") ----------

def _se_d2(p, r):
    # (θ²/ℓ⁴)(ℓ² − r²) exp(−r²/2ℓ²)        (reference covfunc.py:177-185)
    theta, ell = p
    ell2 = _sq(ell)
    pre = df_div(_sq(theta), _sq(ell2))
    poly = df_sub(_bc(ell2, r), _sq(r))
    z = df_div(_sq(r), _bc(df_mul(_TWO, ell2), r))
    return df_mul(df_mul(_bc(pre, r), poly), df_exp(df_neg(z)))


def _periodic_d2(p, r):
    # 4π²θ² (ℓ²cos(2πr/P) − 4sin²cos²) exp(−2sin²/ℓ²)   (covfunc.py:215-221)
    theta, P, ell = p
    rP = df_div(df_mul(_bc(PI, r), r), _bc(P, r))
    s2 = _sq(df_sin(rP))
    c2 = _sq(df_cos(rP))
    pre = df_mul(_c(4.0), df_mul(df_mul(PI, PI), _sq(theta)))
    ell2 = _sq(ell)
    term2 = df_sub(df_mul(_bc(ell2, r), df_cos(df_mul(_bc(_TWO, r), rP))),
                   df_mul(_bc(_c(4.0), r), df_mul(s2, c2)))
    term3 = df_exp(df_neg(df_div(df_mul(_bc(_TWO, r), s2),
                                 _bc(ell2, r))))
    return df_mul(df_mul(_bc(pre, r), term2), term3)


def _quasi_periodic_d2(p, r):
    # reference covfunc.py:257-266 (QuasiPeriodic._dkdxidj), as written
    theta, elle, P, ellp = p
    le2 = _sq(elle)
    le4 = _sq(le2)
    lp2 = _sq(ellp)
    lp4 = _sq(lp2)
    P2 = _sq(P)
    pi2 = df_mul(PI, PI)
    rP = df_div(df_mul(_bc(PI, r), r), _bc(P, r))
    s = df_sin(rP)
    c = df_cos(rP)
    s2rP = df_sin(df_mul(_bc(_TWO, r), rP))
    c2rP = df_cos(df_mul(_bc(_TWO, r), rP))
    pre = df_div(df_mul(_TWO, _sq(theta)),
                 df_mul(P2, df_mul(lp4, le4)))
    a1 = _bc(df_mul(P2, df_mul(lp4, le2)), r)
    a2 = df_mul(_bc(df_mul(_TWO, df_mul(P2, lp4)), r), _sq(r))
    a3 = df_mul(df_mul(_bc(df_mul(_c(4.0),
                                  df_mul(PI, df_mul(P, df_mul(lp2, le2)))),
                           r), r), s2rP)
    a4 = df_mul(_bc(df_mul(_TWO, df_mul(pi2, df_mul(lp2, le4))), r), c2rP)
    a5 = df_mul(_bc(df_mul(_c(8.0), df_mul(pi2, le4)), r),
                df_mul(_sq(s), _sq(c)))
    term2 = df_sub(df_add(df_sub(df_sub(a1, a2), a3), a4), a5)
    znum = df_add(df_mul(_bc(lp2, r), _sq(r)),
                  df_mul(_bc(df_mul(_TWO, le2), r), _sq(s)))
    term3 = df_exp(df_neg(df_div(znum, _bc(df_mul(lp2, le2), r))))
    return df_mul(df_mul(_bc(pre, r), term2), term3)


_DF_D2 = {
    "SE": (2, _se_d2),
    "P": (3, _periodic_d2),
    "QP": (4, _quasi_periodic_d2),
}


def df_supported(structure) -> bool:
    tag = structure[0]
    if tag in ("+", "*"):
        return df_supported(structure[1]) and df_supported(structure[2])
    if tag == "d":
        return structure[1][0] in _DF_D2
    return tag in _DF_KERNELS or tag in _DF_NONSTAT


def df_nonstationary(structure) -> bool:
    """Whether the structure needs the (t1, t2) calling convention
    anywhere in its tree (mirrors kernels.is_nonstationary)."""
    tag = structure[0]
    if tag in ("+", "*"):
        return df_nonstationary(structure[1]) or df_nonstationary(structure[2])
    return tag in _DF_NONSTAT


def _evaluate(structure, params, r: DF, t1: DF = None, t2: DF = None) -> DF:
    tag = structure[0]
    if tag in ("+", "*"):
        n1 = _k.n_params(structure[1])
        a = _evaluate(structure[1], params[:n1], r, t1, t2)
        b = _evaluate(structure[2], params[n1:], r, t1, t2)
        return df_add(a, b) if tag == "+" else df_mul(a, b)
    if tag == "d":
        npars, fn = _DF_D2[structure[1][0]]
        return fn(params[:npars], r)
    if tag in _DF_NONSTAT:
        if t1 is None or t2 is None:
            raise ValueError(f"kernel {tag} requires (t1, t2) inputs")
        npars, fn = _DF_NONSTAT[tag]
        return fn(params[:npars], t1, t2)
    npars, fn = _DF_KERNELS[tag]
    return fn(params[:npars], r)


def df_kernel_matrix(structure, params, t, nugget) -> DF:
    """Assemble K(t, t) + nugget·I entirely in double-single arithmetic.

    Args:
        structure: kernel structure tree (df_supported; non-stationary
            structures are evaluated on coordinate grids (t1, t2))
        params: float64 parameter vector
        t: float64 time vector (N,)
        nugget: diagonal jitter (the exact reference value — no f32
            trace-scaling needed, the factorization is df64)
    """
    if not df_supported(structure):
        raise ValueError(f"structure {structure} not df64-supported")
    t_df = from_f64(np.asarray(t, dtype=np.float64))
    N = t_df.hi.shape[0]
    t1 = DF(t_df.hi[:, None], t_df.lo[:, None])
    t2 = DF(t_df.hi[None, :], t_df.lo[None, :])
    r = df_sub(t1, t2)
    p_df = [from_f64(np.float64(v)) for v in np.asarray(params)]
    K = _evaluate(structure, p_df, r,
                  *((t1, t2) if df_nonstationary(structure) else (None, None)))
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
