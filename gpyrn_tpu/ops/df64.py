"""Double-single ("df64") arithmetic: ~f64-accurate computation built
from pairs of f32 values, using error-free transformations (Dekker 1971;
Knuth TAOCP §4.2.2; Hida/Li/Bailey's QD library algorithms).

Why: TPU hardware is f32/bf16-native; XLA's software float64 runs ~190×
slower than f32 here (docs/performance.md).  A double-single value
``x ≈ hi + lo`` (|lo| ≤ ½ulp(hi)) carries ~48 mantissa bits — enough to
factor the GPRN's ill-conditioned kernel matrices (cond ≈ tr(K)/nugget ≈
1e9–1e10) that plain f32 cannot (SURVEY.md §7 hard-parts).  This module
provides the arithmetic core, a vectorized left-looking Cholesky, a
triangular solve, and log-determinants — the exact pieces the ELBO's
expected-log-prior/entropy terms need.

All functions are pure jax on f32 arrays and trace/jit/vmap cleanly; no
Pallas required (the operations are VPU elementwise/reduction chains).
Error-free transforms rely on IEEE-exact single ops, which XLA preserves
(no fast-math reassociation).

Domain: full ~48-bit relative precision requires the LOW word to stay in
f32 normal range (XLA flushes subnormals to zero), i.e. magnitudes
|x| ≳ 1e-31; precision degrades gracefully to plain f32 below that.
GPRN quantities (kernel values, times, log-densities) sit far inside
the safe range.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["DF", "df", "to_f64", "from_f64", "df_add", "df_sub", "df_mul",
           "df_div", "df_sqrt", "df_neg", "df_sum", "df_dot",
           "df_cholesky", "df_logdet_from_chol", "df_tri_solve"]

# Veltkamp/Dekker split by MANTISSA BITMASK rather than the classic
# (2^12+1)·a multiply-subtract chain: XLA's algebraic simplifier
# rewrites t − (t − a) → a under jit in some fusion contexts (observed
# for df_mul(a, a) squares: the low word silently became 0 and df64
# kernel assembly degraded to ~1e-7), exactly the same class of rewrite
# that forced the trunc-based slice extraction in ops/df64_gemm.py.
# Masking the low 12 mantissa bits is bit-identical in effect (hi gets
# ≤12 significant bits, lo = a − hi is exact) and opaque to the
# simplifier.
_SPLIT_MASK = ~0xFFF


class DF(NamedTuple):
    """A double-single number/array: value ≈ hi + lo."""
    hi: jnp.ndarray
    lo: jnp.ndarray


def df(hi, lo=None) -> DF:
    hi = jnp.asarray(hi, dtype=jnp.float32)
    lo = jnp.zeros_like(hi) if lo is None else \
        jnp.asarray(lo, dtype=jnp.float32)
    return DF(hi, lo)


def from_f64(x) -> DF:
    """Split a CONCRETE float64 input into a double-single pair.

    The split happens on the host in numpy so it is exact regardless of
    ``jax_enable_x64`` — with the old jnp-based split, x64-off mode
    silently zeroed the low word and degraded everything downstream to
    plain f32.  Traced jax values are rejected (the whole point of df64
    is f32-only device code; f64 inputs enter from the host)."""
    import numpy as _np
    try:
        x64 = _np.asarray(x, dtype=_np.float64)
    except Exception as e:
        raise TypeError(
            "from_f64 needs a concrete (host) value — it splits in "
            "float64 on the host precisely so the device never needs "
            "x64") from e
    hi = x64.astype(_np.float32)
    lo = (x64 - hi.astype(_np.float64)).astype(_np.float32)
    return DF(jnp.asarray(hi), jnp.asarray(lo))


def to_f64(a: DF):
    """Recombine to a float64 NUMPY value (host transfer; exact
    independently of ``jax_enable_x64``)."""
    import numpy as _np
    return (_np.asarray(a.hi, dtype=_np.float64)
            + _np.asarray(a.lo, dtype=_np.float64))


# -- error-free transformations --------------------------------------------

def _two_sum(a, b):
    # s must be frozen: the simplifier folds (a + b) − a → b when it can
    # see the sum (observed with broadcast-constant operands, e.g. the
    # Matérn-5/2 1 + frac term), destroying the error term.
    s = _freeze(a + b)
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    """Requires |a| >= |b|."""
    s = _freeze(a + b)
    err = b - (s - a)
    return s, err


def _split(a):
    bits = lax.bitcast_convert_type(a, jnp.int32)
    hi = lax.bitcast_convert_type(
        jnp.bitwise_and(bits, jnp.int32(_SPLIT_MASK)), jnp.float32)
    lo = a - hi
    return hi, lo


def _freeze(x):
    """Pin ``x`` to its ROUNDED f32 value with an unfoldable select.

    XLA:CPU's fusion codegen contracts `mul → add` chains into fmas —
    even across ``lax.optimization_barrier`` and with every fast-math
    flag off (measured: jit of ``a*b + e`` returns fma(a,b,e), so
    ``df_mul`` silently lost its low word and df64 degraded to ~1e-7).
    Error-free transformations need the PRODUCT'S ROUNDED VALUE to be a
    single consistent quantity, so the product is routed through a
    select whose predicate (x == x) no simplifier can fold under IEEE
    NaN semantics; the contraction window closes and NaNs still
    propagate (both branches are NaN when x is).  One compare+select
    per df multiply — noise next to the arithmetic it protects."""
    return jnp.where(x == x, x, jnp.float32(jnp.nan))


def _two_prod(a, b):
    p = _freeze(a * b)
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


# -- double-single arithmetic ----------------------------------------------

def df_add(a: DF, b: DF) -> DF:
    s, e = _two_sum(a.hi, b.hi)
    e = e + a.lo + b.lo
    hi, lo = _quick_two_sum(s, e)
    return DF(hi, lo)


def df_neg(a: DF) -> DF:
    return DF(-a.hi, -a.lo)


def df_sub(a: DF, b: DF) -> DF:
    return df_add(a, df_neg(b))


def df_mul(a: DF, b: DF) -> DF:
    p, e = _two_prod(a.hi, b.hi)
    e = _freeze(e + a.hi * b.lo + a.lo * b.hi)
    hi, lo = _quick_two_sum(p, e)
    return DF(hi, lo)


def df_div(a: DF, b: DF) -> DF:
    q1 = a.hi / b.hi
    # r = a - q1*b, computed in df
    r = df_sub(a, df_mul(df(q1), b))
    q2 = (r.hi + r.lo) / b.hi
    hi, lo = _quick_two_sum(q1, q2)
    return DF(hi, lo)


def df_sqrt(a: DF) -> DF:
    """sqrt via one Karp-Markstein refinement of the f32 estimate."""
    s = jnp.sqrt(a.hi)
    safe = jnp.where(s > 0, s, 1.0)
    # r = a - s², then s + r/(2s)
    r = df_sub(a, df_mul(df(safe), df(safe)))
    corr = (r.hi + r.lo) / (2.0 * safe)
    hi, lo = _quick_two_sum(safe, corr)
    zero = a.hi <= 0
    return DF(jnp.where(zero, 0.0, hi), jnp.where(zero, 0.0, lo))


def df_sum(a: DF, axis=None) -> DF:
    """Sum of a DF array along ``axis`` with df-accurate accumulation.

    Two lowerings, chosen by backend at trace time:

    * TPU (default): pairwise halving — log₂(n) vectorized df_add
      rounds.  Fast on the VPU; the TPU compiler handles the halving
      tree's slice consumers fine.
    * CPU: ONE variadic ``lax.reduce`` with a df_add combiner.  The
      halving tree is a compile-time bomb on XLA:CPU — its fusion pass
      DUPLICATES the producer chain into every slice consumer, so with
      a transcendental producer (``df_log`` ≈ 10³ HLO ops) a 40-element
      log-sum took ~3 MINUTES of compile (measured;
      ``lax.optimization_barrier`` does not stop the duplication) —
      while the reduce compiles in ~1 s.  Conversely the tuple-reduce
      lowers to a slow serial loop on TPU (measured 100× on the blocked
      Cholesky), hence the split.

    Accuracy: each step is df-accurate, so error stays ≤ n·1e-14
    (sequential) / log n·1e-14 (halving) — both far inside the df64
    budget for the GPRN's N ≲ 10⁴ reductions."""
    hi, lo = a.hi, a.lo
    if axis is None:
        hi, lo = hi.ravel(), lo.ravel()
        axis = 0
    axis = axis % hi.ndim

    if jax.default_backend() != "cpu":
        hi = jnp.moveaxis(hi, axis, 0)
        lo = jnp.moveaxis(lo, axis, 0)
        n = hi.shape[0]
        while n > 1:
            m = (n + 1) // 2
            pad = 2 * m - n
            if pad:
                zshape = (pad,) + hi.shape[1:]
                hi = jnp.concatenate([hi, jnp.zeros(zshape, hi.dtype)])
                lo = jnp.concatenate([lo, jnp.zeros(zshape, lo.dtype)])
            s = df_add(DF(hi[:m], lo[:m]), DF(hi[m:], lo[m:]))
            hi, lo = s.hi, s.lo
            n = m
        return DF(hi[0], lo[0])

    def comb(acc, val):
        s = df_add(DF(acc[0], acc[1]), DF(val[0], val[1]))
        return (s.hi, s.lo)

    zero = (jnp.zeros((), hi.dtype), jnp.zeros((), lo.dtype))
    out_hi, out_lo = lax.reduce((hi, lo), zero, comb, dimensions=(axis,))
    return DF(out_hi, out_lo)


def df_dot(a: DF, b: DF, axis=-1) -> DF:
    """Inner product along ``axis`` with df-accurate accumulation."""
    return df_sum(df_mul(a, b), axis=axis)


# -- linear algebra --------------------------------------------------------

def df_cholesky(A: DF, max_n=None) -> DF:
    """Left-looking Cholesky of a symmetric positive-definite DF matrix.

    Column j: c = A[:, j] − L[:, :j] @ L[j, :j] (df-accumulated),
    L[j, j] = sqrt(c[j]), L[j+1:, j] = c[j+1:] / L[j, j].  The column
    update is vectorized over rows; the j-loop is a ``fori_loop``.
    O(N³) df-multiplies on the VPU — no MXU, but exactness where it
    matters (the reference-parity log-determinants)."""
    N = A.hi.shape[-1]
    L = DF(jnp.zeros_like(A.hi), jnp.zeros_like(A.lo))
    col_idx = jnp.arange(N)

    def body(j, L):
        # mask over already-computed columns k < j
        mask = (col_idx < j).astype(A.hi.dtype)          # (N,)
        Lj_hi = L.hi[j, :] * mask
        Lj_lo = L.lo[j, :] * mask
        # rows i: sum_k L[i,k] L[j,k]
        prod = df_mul(DF(L.hi * mask[None, :], L.lo * mask[None, :]),
                      DF(Lj_hi[None, :], Lj_lo[None, :]))
        acc = df_sum(prod, axis=1)                       # (N,)
        c = df_sub(DF(A.hi[:, j], A.lo[:, j]), acc)
        d = df_sqrt(DF(c.hi[j], c.lo[j]))
        inv_rows = df_div(c, DF(jnp.broadcast_to(d.hi, c.hi.shape),
                                jnp.broadcast_to(d.lo, c.lo.shape)))
        row_idx = jnp.arange(N)
        below = (row_idx > j)
        new_hi = jnp.where(below, inv_rows.hi, 0.0)
        new_lo = jnp.where(below, inv_rows.lo, 0.0)
        new_hi = jnp.where(row_idx == j, d.hi, new_hi)
        new_lo = jnp.where(row_idx == j, d.lo, new_lo)
        L = DF(L.hi.at[:, j].set(new_hi), L.lo.at[:, j].set(new_lo))
        return L

    n = N if max_n is None else max_n
    return lax.fori_loop(0, n, body, L)


def df_logdet_from_chol(L: DF):
    """log det A = 2 Σ log L_ii with the df-accurate ``df_log``
    (Newton-corrected; the hardware f32 log is several ulp off on TPU
    and its summed error dominated on-chip logdet accuracy)."""
    from gpyrn_tpu.ops.df64_math import df_log
    d_hi = jnp.diagonal(L.hi)
    d_lo = jnp.diagonal(L.lo)
    s = df_sum(df_log(DF(d_hi, d_lo)))
    return 2.0 * s.hi, 2.0 * s.lo


def df_tri_solve(L: DF, b: DF) -> DF:
    """Solve L x = b with L lower-triangular DF, forward substitution
    (vectorized across the trailing dims of b)."""
    N = L.hi.shape[0]
    col_idx = jnp.arange(N)

    def body(i, x):
        mask = (col_idx < i).astype(L.hi.dtype)
        Li = DF(L.hi[i, :] * mask, L.lo[i, :] * mask)
        acc = df_dot(Li, x, axis=0) if x.hi.ndim == 1 else \
            df_sum(df_mul(DF(Li.hi[:, None], Li.lo[:, None]), x), axis=0)
        r = df_sub(DF(b.hi[i], b.lo[i]), acc)
        xi = df_div(r, DF(jnp.broadcast_to(L.hi[i, i], r.hi.shape),
                          jnp.broadcast_to(L.lo[i, i], r.lo.shape)))
        return DF(x.hi.at[i].set(xi.hi), x.lo.at[i].set(xi.lo))

    x0 = DF(jnp.zeros_like(b.hi), jnp.zeros_like(b.lo))
    return lax.fori_loop(0, N, body, x0)
