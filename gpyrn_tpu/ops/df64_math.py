"""Double-single transcendental functions (exp, log, sin, cos, pow).

Companion to :mod:`gpyrn_tpu.ops.df64`: ~48-bit-accurate elementary
functions built from f32 hardware ops, following the QD library's
recipes (Hida, Li & Bailey 2001) adapted to binary32 pairs:

* ``df_exp``  — Cody-Waite reduction x = k·ln2 + r, |r| ≤ ln2/2, then a
  Taylor series in df arithmetic and an exact 2^k scale.
* ``df_log``  — one Newton step y ← y₀ + x·e^(−y₀) − 1 from the f32
  estimate (quadratic convergence: f32's 24 bits → ~48 bits).
* ``df_sin`` / ``df_cos`` — three-part Cody-Waite reduction modulo π/2
  (exact for |k| < 2¹⁴, covering the GPRN kernels' phase ranges), then
  Taylor series on |r| ≤ π/4 with quadrant dispatch.
* ``df_pow`` — exp(y·log x) for x > 0.

These are the missing piece for assembling ill-conditioned kernel
matrices at better-than-f32 accuracy on TPU hardware (assembling K in
plain f32 perturbs log-determinants by ~2% — see TODO.md).
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from gpyrn_tpu.ops.df64 import (DF, df, df_add, df_div, df_mul, df_neg,
                                df_sub, from_f64, _quick_two_sum)

__all__ = ["df_exp", "df_log", "df_sin", "df_cos", "df_pow", "df_abs",
           "LN2", "PI", "PI_2"]

# double-single constants (hi = f32(x), lo = f32(x - hi))
LN2 = DF(jnp.float32(0.6931472), jnp.float32(-1.904654e-09))
PI = DF(jnp.float32(3.1415927), jnp.float32(-8.742278e-08))
PI_2 = DF(jnp.float32(1.5707964), jnp.float32(-4.371139e-08))

# four-part Cody-Waite split of π/2: p1, p2 have 12-bit mantissas so
# k·p1 and k·p2 are EXACT f32 products for |k| ≤ 2¹²; p3+p4 carry the
# remainder as a df pair.  p1+p2+p3+p4 == π/2 exactly in float64.
_PIO2_1 = np.float32(1.5703125)
_PIO2_2 = np.float32(0.0004837513)
_PIO2_3 = np.float32(7.54979e-08)
_PIO2_4 = np.float32(-1.7763568e-15)


def df_abs(a: DF) -> DF:
    neg = a.hi < 0
    return DF(jnp.where(neg, -a.hi, a.hi), jnp.where(neg, -a.lo, a.lo))


def _poly_eval(coeffs, r: DF) -> DF:
    """Horner evaluation with float64-derived df coefficients."""
    acc = df(jnp.full_like(r.hi, coeffs[0][0]),
             jnp.full_like(r.hi, coeffs[0][1]))
    for c_hi, c_lo in coeffs[1:]:
        acc = df_add(df_mul(acc, r),
                     df(jnp.full_like(r.hi, c_hi),
                        jnp.full_like(r.hi, c_lo)))
    return acc


def _df_const_table(values):
    out = []
    for v in values:
        hi = np.float32(v)
        lo = np.float32(v - np.float64(hi))
        out.append((hi, lo))
    return out


# Taylor coefficients 1/n! for exp on |r| <= ln2/2 (r^12/12! ~ 1e-13 rel)
_EXP_COEFFS = _df_const_table([1.0 / math.factorial(n)
                               for n in range(12, -1, -1)])
# sin(r)/r and cos(r) series on |r| <= π/4
_SIN_COEFFS = _df_const_table(
    [(-1.0) ** n / math.factorial(2 * n + 1) for n in range(7, -1, -1)])
_COS_COEFFS = _df_const_table(
    [(-1.0) ** n / math.factorial(2 * n) for n in range(8, -1, -1)])


def _pow2_exact(e):
    """Exact 2^e for integer e ∈ [-126, 127] by exponent-field bitcast
    (``jnp.exp2`` is only f32-approximate — ~2e-6 relative error)."""
    import jax
    e = jnp.clip(e, -126, 127)
    bits = ((e + 127) << 23).astype(jnp.int32)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def df_exp(a: DF) -> DF:
    """exp(a) for a double-single a; accurate to ~1e-13 relative over
    the f32-representable range (underflows to 0 below ~exp(-174))."""
    k = jnp.round(a.hi / LN2.hi)
    r = df_sub(a, df_mul(df(k), LN2))         # |r| <= ln2/2 + eps
    p = _poly_eval(_EXP_COEFFS, r)
    # exact two-step power-of-two scaling (covers |k| <= 252)
    ki = k.astype(jnp.int32)
    k1 = ki // 2
    s1 = _pow2_exact(k1)
    s2 = _pow2_exact(ki - k1)
    return DF(p.hi * s1 * s2, p.lo * s1 * s2)


def df_log(a: DF) -> DF:
    """log(a) for a > 0: split a = m·2^q with m ∈ [1, 2) by exponent
    extraction (exact), Newton-iterate y ← y + m·e^(−y) − 1 on the
    mantissa (e^(−y) stays in (0.5, 1], so the low word never
    underflows — iterating on a directly loses it to f32 subnormals for
    |log a| ≳ 60), and add back q·ln2.

    ONE Newton step suffices: the f32 starter has ~24 correct bits and
    convergence is quadratic, so one step lands at the ~48-bit df64
    limit (measured: 1e-14 rel on kernel matrices).  Keeping it to one
    also bounds the compiled graph — two sibling pow/log chains in one
    kernel (e.g. NewRQP) drove XLA:CPU's simplifier superlinear and
    blew a 4 s compile up past 6 minutes."""
    import jax
    hi = jnp.maximum(a.hi, jnp.finfo(jnp.float32).tiny)
    bits = jax.lax.bitcast_convert_type(hi, jnp.int32)
    q = ((bits >> 23) & 0xFF) - 127
    q1 = q // 2
    s1 = _pow2_exact(-q1)
    s2 = _pow2_exact(-(q - q1))
    m = DF(hi * s1 * s2, a.lo * s1 * s2)      # in [1, 2), exact rescale
    y = df(jnp.log(m.hi))
    one = df(jnp.ones_like(y.hi))
    e = df_exp(df_neg(y))
    y = df_add(y, df_sub(df_mul(m, e), one))
    return df_add(y, df_mul(df(q.astype(jnp.float32)), LN2))


def _reduce_pio2(a: DF):
    """a = k·(π/2) + r with |r| ≤ π/4; exact for |k| < 2^14."""
    k = jnp.round(a.hi / PI_2.hi)
    # subtract k·π/2 in exact pieces (k·p1, k·p2 exact f32 products)
    r = df_add(a, df(-k * _PIO2_1))
    r = df_add(r, df(-k * _PIO2_2))
    r = df_sub(r, df_mul(df(k), DF(_PIO2_3, _PIO2_4)))
    return k.astype(jnp.int32), r


def _sin_poly(r: DF) -> DF:
    r2 = df_mul(r, r)
    return df_mul(r, _poly_eval(_SIN_COEFFS, r2))


def _cos_poly(r: DF) -> DF:
    r2 = df_mul(r, r)
    return _poly_eval(_COS_COEFFS, r2)


def df_sin(a: DF) -> DF:
    k, r = _reduce_pio2(a)
    quad = jnp.mod(k, 4)
    s, c = _sin_poly(r), _cos_poly(r)
    hi = jnp.select([quad == 0, quad == 1, quad == 2, quad == 3],
                    [s.hi, c.hi, -s.hi, -c.hi])
    lo = jnp.select([quad == 0, quad == 1, quad == 2, quad == 3],
                    [s.lo, c.lo, -s.lo, -c.lo])
    return DF(hi, lo)


def df_cos(a: DF) -> DF:
    k, r = _reduce_pio2(a)
    quad = jnp.mod(k, 4)
    s, c = _sin_poly(r), _cos_poly(r)
    hi = jnp.select([quad == 0, quad == 1, quad == 2, quad == 3],
                    [c.hi, -s.hi, -c.hi, s.hi])
    lo = jnp.select([quad == 0, quad == 1, quad == 2, quad == 3],
                    [c.lo, -s.lo, -c.lo, s.lo])
    return DF(hi, lo)


def df_pow(a: DF, b: DF) -> DF:
    """a^b for a > 0."""
    return df_exp(df_mul(b, df_log(a)))
