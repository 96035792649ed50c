"""Double-single (df64) matrix multiplication on the MXU.

The missing piece between the VPU-only df64 arithmetic core
(:mod:`gpyrn_tpu.ops.df64`) and O(N³) linear algebra at realistic N: an
~f64-accurate GEMM whose FLOPs run on the TPU's systolic array instead
of element-wise loops.  It uses the *error-free slicing* idea of the
Ozaki scheme (Ozaki, Ogita, Oishi & Rump 2012, "Error-free
transformations of matrix multiplication"; the same recipe recent work
uses to run f64 GEMMs on f16/int8 tensor cores):

1. scale each row of A (column of B) by an exact power of two so
   entries sit in [-1, 1);
2. split every scaled double-single value into ``n_slices`` slices of
   ``M_BITS`` mantissa bits each — each slice is an exact multiple of a
   per-slice power-of-two grid, so it casts to bfloat16 EXACTLY
   (bf16 carries 8 significant bits ≥ M_BITS+1);
3. multiply slice pairs on the MXU: products of two ≤(M_BITS+1)-bit
   values are exact in the MXU's f32 accumulator, and a dot-product of
   K ≤ K_CHUNK of them stays an exact integer multiple of the pair's
   grid (K_CHUNK · 2^(2·M_BITS) ≤ 2²⁴ never rounds);
4. accumulate the slice-pair products in df64 on the VPU (cheap —
   O(MN) per product vs O(MNK) inside the MXU) and undo the scaling
   with exact power-of-two multiplies.

The only approximation is dropping slice pairs whose combined
significance is below ~2⁻⁵⁴ (``i + j > MAX_SIG``) and the ~2⁻⁴⁸
rounding of the final df64 accumulation — i.e. full double-single
accuracy at MXU speed.  Everything is pure jax (no Pallas needed: the
MXU work is plain ``jnp.matmul`` on bf16 slices) and batches/vmaps/jits
cleanly, so it runs unchanged on CPU for tests (f32 accumulation of
exact-integer grids is exact on any IEEE backend).

This is what the reference could never have: the reference does all
its ill-conditioned factorizations in NumPy float64 on the host
(/root/reference/gpyrn/meanfield.py:771,850,1087).  Here the same
≲1e-13-relative linear algebra rides the bf16 systolic array.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from gpyrn_tpu.ops.df64 import DF, df_add, df_mul, df_sub, df_sum

__all__ = ["df64_matmul", "df64_matvec", "M_BITS", "N_SLICES", "MAX_SIG",
           "K_CHUNK"]

# Slice geometry.  Exactness constraint: K_CHUNK · 2^(2·M_BITS) ≤ 2²⁴
# keeps every partial sum of slice-pair products exactly representable
# in the MXU's f32 accumulator.  M_BITS=6, K_CHUNK=2048: 2¹¹·2¹² = 2²³ ✓
# (slice magnitudes are ≤ 2^M_BITS in grid units after round-to-nearest,
# giving ≤ K_CHUNK·2^(2M) = 2²³ < 2²⁴ with a 2× safety margin).
M_BITS = 6
# 9 slices cover 54 bits — beyond double-single's ~49-bit significand.
N_SLICES = 9
# keep slice pairs with i + j ≤ MAX_SIG: dropped terms are below
# 2^-(MAX_SIG+1)·M_BITS ≈ 2⁻⁶⁰ per element (× K ≤ 2⁻⁴⁹ per dot).
MAX_SIG = 9
K_CHUNK = 2048
# Same-significance GROUPING capacity: all pairs (i, j) with i + j = g
# share the grid 2^-(g+2)·M_BITS, so their products can be summed in ONE
# f32 GEMM by concatenating the slices along K — the combined dot stays
# an exact integer multiple of the shared grid while
# c·K · 2^(2·M_BITS) ≤ 2²⁴, i.e. c·K ≤ 2¹² = 4096 (slices are ≤ 2^M_BITS
# grid units, products ≤ 2^(2M), and f32 holds integers to 2²⁴
# inclusive).  This collapses the 53 slice-pair products of a K=256
# GEMM (the blocked Cholesky's panel/trailing updates) into 12 grouped
# GEMMs with 12 df64 accumulator round trips — identical bits, ~4×
# less HBM accumulator traffic.
GROUP_UNITS = 4096


def _pow2_scale(mag):
    """Exact power-of-two scale s with ``mag/s ∈ [0.5, 1)`` (s=1 where
    mag==0).  Uses frexp so exact powers of two round correctly."""
    _, e = jnp.frexp(jnp.maximum(mag, jnp.finfo(jnp.float32).tiny))
    return jnp.ldexp(jnp.ones_like(mag), e), \
        jnp.ldexp(jnp.ones_like(mag), -e)


def _slices(a: DF, n_slices: int = N_SLICES, m: int = M_BITS):
    """Split a scaled DF array (|value| < 1) into ``n_slices`` bf16
    slices, each an exact multiple of 2^-(i+1)m with ≤ m+1 significant
    bits.  Returns a list of bf16 arrays; their sum reproduces the
    input to 2^-(n_slices·m)."""
    out = []
    t = a
    for i in range(n_slices):
        # truncate onto the 2^-(i+1)m grid.  NOT the classic
        # add-and-subtract trick — XLA's algebraic simplifier rewrites
        # (x + c) - c to x under jit, silently destroying the split
        # (verified on the CPU backend).  trunc(x·2^g)·2^-g is equally
        # exact (power-of-two scales, integer ≤ 2^(m+1) representable)
        # and opaque to the simplifier.
        grid = jnp.float32(2.0 ** (-(i + 1) * m))
        inv_grid = jnp.float32(2.0 ** ((i + 1) * m))
        s = jnp.trunc(t.hi * inv_grid) * grid
        out.append(s.astype(jnp.bfloat16))
        t = df_sub(t, DF(s, jnp.zeros_like(s)))
    return out


def _group_lists(n, max_sig, K):
    """Slice pairs (i, j) bucketed by significance g = i + j, each
    bucket split so ``len(bucket)·K ≤ GROUP_UNITS`` (the exact-f32
    grouped-accumulation capacity).  Most-significant groups first."""
    cap = max(1, GROUP_UNITS // max(1, K))
    groups = []
    for g in range(min(max_sig, 2 * (n - 1)) + 1):
        pairs = [(i, g - i)
                 for i in range(max(0, g - (n - 1)), min(n - 1, g) + 1)]
        for s in range(0, len(pairs), cap):
            groups.append(pairs[s:s + cap])
    return groups


def _group_matmul(sa, sb, pairs):
    """One exact f32 GEMM for a same-significance group of slice pairs:
    concatenate the A-slices along K and the B-slices along K."""
    if len(pairs) == 1:
        i, j = pairs[0]
        a, b = sa[i], sb[j]
    else:
        a = jnp.concatenate([sa[i] for i, _ in pairs], axis=-1)
        b = jnp.concatenate([sb[j] for _, j in pairs], axis=-2)
    return jnp.matmul(a, b, preferred_element_type=jnp.float32)


def _grouped_accumulate(sa, sb, K, max_sig, acc0=None, serialize=False):
    """df64-accumulate the grouped slice-pair GEMMs.  With
    ``serialize`` each GEMM is data-chained behind the previous
    accumulator through an optimization barrier so XLA cannot keep
    several full-size f32 products live at once (the unrolled form
    otherwise RESOURCE_EXHAUSTs large outputs — see
    SCAN_ACCUM_MIN_ELEMS)."""
    groups = _group_lists(len(sa), max_sig, K)
    acc = acc0
    for pairs in groups:
        if serialize and acc is not None:
            # make this group's (cheap, bf16) inputs depend on the
            # accumulator: one product live at a time
            sa = list(sa)
            i0 = pairs[0][0]
            sa[i0], _ = lax.optimization_barrier((sa[i0], acc.hi))
        p = _group_matmul(sa, sb, pairs)
        if acc is None:
            acc = DF(p, jnp.zeros_like(p))
        else:
            acc = df_add(acc, DF(p, jnp.zeros_like(p)))
    return acc


# Outputs at or above this element count serialize their grouped
# GEMMs behind the accumulator (optimization barriers): the free-form
# unrolled schedule lets XLA keep many full-size f32 products live at
# once (RESOURCE_EXHAUSTED on a 16 GB chip at N=5000, b=3), while the
# chained form bounds liveness to the df64 accumulator plus ONE
# product.  Small outputs keep the free schedule (better MXU
# pipelining; their liveness is irrelevant).
SCAN_ACCUM_MIN_ELEMS = 1 << 25


def df64_matmul(A: DF, B: DF, max_sig: int = MAX_SIG) -> DF:
    """C = A @ B with ~double-single accuracy, FLOPs on the MXU.

    A: DF with shape (..., M, K); B: DF with shape (..., K, N); leading
    batch dims broadcast like ``jnp.matmul``.  K is chunked to
    ``K_CHUNK`` to preserve exact f32 accumulation (chunk partials are
    df64-added)."""
    K = A.hi.shape[-1]
    if B.hi.shape[-2] != K:
        raise ValueError(f"inner dims mismatch: {A.hi.shape} @ "
                         f"{B.hi.shape}")
    # exact row/column scaling
    sA, isA = _pow2_scale(jnp.max(jnp.abs(A.hi), axis=-1, keepdims=True))
    sB, isB = _pow2_scale(jnp.max(jnp.abs(B.hi), axis=-2, keepdims=True))
    As = DF(A.hi * isA, A.lo * isA)
    Bs = DF(B.hi * isB, B.lo * isB)

    out_elems = A.hi.shape[-2] * B.hi.shape[-1]
    for d in jnp.broadcast_shapes(A.hi.shape[:-2], B.hi.shape[:-2]):
        out_elems *= d
    big_out = out_elems >= SCAN_ACCUM_MIN_ELEMS

    if K <= K_CHUNK:
        sa = _slices(As)
        sb = _slices(Bs)
        acc = _grouped_accumulate(sa, sb, K, max_sig, serialize=big_out)
    else:
        # pad K to a chunk multiple (zero columns/rows contribute 0
        # exactly) and scan over chunks, df64-accumulating partials
        n_chunks = -(-K // K_CHUNK)
        Kp = n_chunks * K_CHUNK
        padA = [(0, 0)] * (As.hi.ndim - 1) + [(0, Kp - K)]
        padB = [(0, 0)] * (Bs.hi.ndim - 2) + [(0, Kp - K), (0, 0)]
        Ah = jnp.pad(As.hi, padA)
        Al = jnp.pad(As.lo, padA)
        Bh = jnp.pad(Bs.hi, padB)
        Bl = jnp.pad(Bs.lo, padB)
        # move the chunk axis to the front for lax.scan
        Ah = jnp.moveaxis(Ah.reshape(Ah.shape[:-1] + (n_chunks, K_CHUNK)),
                          -2, 0)
        Al = jnp.moveaxis(Al.reshape(Al.shape[:-1] + (n_chunks, K_CHUNK)),
                          -2, 0)
        Bh = jnp.moveaxis(
            Bh.reshape(Bh.shape[:-2] + (n_chunks, K_CHUNK, Bh.shape[-1])),
            -3, 0)
        Bl = jnp.moveaxis(
            Bl.reshape(Bl.shape[:-2] + (n_chunks, K_CHUNK, Bl.shape[-1])),
            -3, 0)

        def chunk(acc, xs):
            ah, al, bh, bl = xs
            sa = _slices(DF(ah, al))
            sb = _slices(DF(bh, bl))
            return _grouped_accumulate(sa, sb, K_CHUNK, max_sig,
                                       acc0=acc, serialize=big_out), None

        probe = jnp.matmul(Ah[0, ..., :1], Bh[0, ..., :1, :],
                           preferred_element_type=jnp.float32)
        acc0 = DF(jnp.zeros(probe.shape, jnp.float32),
                  jnp.zeros(probe.shape, jnp.float32))
        acc, _ = lax.scan(chunk, acc0, (Ah, Al, Bh, Bl))

    # undo the exact scalings
    scale = sA * sB            # (..., M, 1)·(..., 1, N) broadcast, pow2
    return DF(acc.hi * scale, acc.lo * scale)


def df64_matvec(A: DF, x: DF) -> DF:
    """y = A @ x for a DF matrix (..., M, K) and DF vector (..., K):
    element-wise df products + pairwise df reduction (VPU; O(MK) work
    doesn't warrant the MXU slicing machinery)."""
    prod = df_mul(DF(A.hi, A.lo),
                  DF(x.hi[..., None, :], x.lo[..., None, :]))
    return df_sum(prod, axis=-1)
