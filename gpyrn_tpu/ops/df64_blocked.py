"""Blocked double-single Cholesky and triangular solves (MXU path).

Replaces the unblocked VPU-only ``df_cholesky``/``df_tri_solve`` of
:mod:`gpyrn_tpu.ops.df64` (O(N³) sequential element work, practical to
N≈500) with a right-looking blocked factorization whose O(N³) FLOPs run
through :func:`gpyrn_tpu.ops.df64_gemm.df64_matmul` — i.e. on the MXU
as exact bf16 slice products.  Only the O(N·B²) diagonal-block
factorizations stay element-sequential on the VPU.

Everything is batched over a mandatory leading axis (the GPRN's q·(1+p)
lattice of kernel matrices — one batched call factors the whole
lattice), jits cleanly, and works identically on CPU (tests) and TPU.

Algorithm (block size B, fori_loop over the ⌈N/B⌉ block columns with
masked full-width updates — static shapes, compact HLO):

  1. factor the B×B diagonal block in df64 (rank-1 right-looking loop)
     and invert it (row-recurrence), both O(B³) VPU;
  2. panel: L[k+1:, k] = A[k+1:, k] · (L_kk^{-1})ᵀ  — df64 GEMM;
  3. trailing update A -= L_panel · L_panelᵀ — df64 GEMM (rows above
     the panel are masked to zero, so the full-width update touches
     only the true trailing block).

The block-diagonal inverses are kept (returned in ``CholFactors``) so
the blocked triangular solves are pure GEMM pipelines as well.

Reference context: these factorizations replace the host float64
``np.linalg.solve``/``cholesky`` calls of the reference engine
(/root/reference/gpyrn/meanfield.py:771,850,1087) for the exact-parity
ELBO path at large N — double-single accuracy at f32-hardware speed.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from gpyrn_tpu.ops.df64 import (DF, df_div, df_mul, df_sqrt, df_sub,
                                df_sum)
from gpyrn_tpu.ops.df64_gemm import df64_matmul

__all__ = ["CholFactors", "df_cholesky_blocked", "df_tri_solve_blocked",
           "df_tri_solve_t_blocked", "df_cho_solve_blocked",
           "df_logdet_blocked", "DEFAULT_BLOCK"]

DEFAULT_BLOCK = 256


class CholFactors(NamedTuple):
    """Blocked Cholesky factorization of a batch of SPD matrices.

    L:      DF (b, Np, Np) lower-triangular factor (identity in the
            padded tail rows/cols)
    Linvs:  DF (nb, b, B, B) inverses of the diagonal blocks of L
    n:      true (unpadded) matrix dimension
    block:  block size B
    """
    L: DF
    Linvs: DF
    n: int
    block: int


def _dfT(a: DF) -> DF:
    return DF(jnp.swapaxes(a.hi, -1, -2), jnp.swapaxes(a.lo, -1, -2))


def _mask_rows(a: DF, rows, keep) -> DF:
    m = keep(rows)[None, :, None].astype(a.hi.dtype)
    return DF(a.hi * m, a.lo * m)


def _mask_cols(a: DF, cols, keep) -> DF:
    m = keep(cols)[None, None, :].astype(a.hi.dtype)
    return DF(a.hi * m, a.lo * m)


def _factor_block(D: DF):
    """Unblocked df64 Cholesky + inverse of a (b, B, B) SPD block.

    Right-looking rank-1 updates: each of the B steps is O(b·B²)
    vectorized VPU work (no inner reductions), then the inverse by row
    recurrence with log-depth pairwise df reductions."""
    b, B, _ = D.hi.shape
    idx = jnp.arange(B)

    def chol_step(j, carry):
        W, L = carry
        col = DF(lax.dynamic_slice(W.hi, (0, 0, j), (b, B, 1))[..., 0],
                 lax.dynamic_slice(W.lo, (0, 0, j), (b, B, 1))[..., 0])
        d = DF(lax.dynamic_slice(col.hi, (0, j), (b, 1)),
               lax.dynamic_slice(col.lo, (0, j), (b, 1)))
        d = df_sqrt(d)
        ell = df_div(col, DF(jnp.broadcast_to(d.hi, col.hi.shape),
                             jnp.broadcast_to(d.lo, col.lo.shape)))
        below = (idx > j)[None, :]
        ell_b = DF(jnp.where(below, ell.hi, 0.0),
                   jnp.where(below, ell.lo, 0.0))
        at_j = (idx == j)[None, :]
        lcol = DF(jnp.where(at_j, d.hi, ell_b.hi),
                  jnp.where(at_j, d.lo, ell_b.lo))
        L = DF(lax.dynamic_update_slice(L.hi, lcol.hi[:, :, None],
                                        (0, 0, j)),
               lax.dynamic_update_slice(L.lo, lcol.lo[:, :, None],
                                        (0, 0, j)))
        outer = df_mul(DF(ell_b.hi[:, :, None], ell_b.lo[:, :, None]),
                       DF(ell_b.hi[:, None, :], ell_b.lo[:, None, :]))
        W = df_sub(W, outer)
        return W, L

    L0 = DF(jnp.zeros_like(D.hi), jnp.zeros_like(D.lo))
    _, L = lax.fori_loop(0, B, chol_step, (D, L0))

    def inv_step(i, X):
        lrow = DF(lax.dynamic_slice(L.hi, (0, i, 0), (b, 1, B))[:, 0],
                  lax.dynamic_slice(L.lo, (0, i, 0), (b, 1, B))[:, 0])
        before = (idx < i)[None, :]
        lrow = DF(jnp.where(before, lrow.hi, 0.0),
                  jnp.where(before, lrow.lo, 0.0))
        prod = df_mul(DF(lrow.hi[:, :, None], lrow.lo[:, :, None]), X)
        s = df_sum(prod, axis=1)                       # (b, B)
        e_i = (idx == i)[None, :].astype(L.hi.dtype)
        r = df_sub(DF(jnp.broadcast_to(e_i, s.hi.shape),
                      jnp.zeros_like(s.lo)), s)
        lii = DF(lax.dynamic_slice(L.hi, (0, i, i), (b, 1, 1))[:, :, 0],
                 lax.dynamic_slice(L.lo, (0, i, i), (b, 1, 1))[:, :, 0])
        xrow = df_div(r, DF(jnp.broadcast_to(lii.hi, r.hi.shape),
                            jnp.broadcast_to(lii.lo, r.lo.shape)))
        return DF(lax.dynamic_update_slice(X.hi, xrow.hi[:, None, :],
                                           (0, i, 0)),
                  lax.dynamic_update_slice(X.lo, xrow.lo[:, None, :],
                                           (0, i, 0)))

    X0 = DF(jnp.zeros_like(D.hi), jnp.zeros_like(D.lo))
    Linv = lax.fori_loop(0, B, inv_step, X0)
    return L, Linv


def _pad_spd(A: DF, Np: int) -> DF:
    """Zero-pad to (b, Np, Np) with ones on the padded diagonal."""
    b, N, _ = A.hi.shape
    if N == Np:
        return A
    pad = ((0, 0), (0, Np - N), (0, Np - N))
    eye_tail = (jnp.arange(Np) >= N).astype(A.hi.dtype)
    diag = jnp.diag(eye_tail)[None]
    return DF(jnp.pad(A.hi, pad) + diag, jnp.pad(A.lo, pad))


def df_cholesky_blocked(A: DF, block: int = DEFAULT_BLOCK) -> CholFactors:
    """Blocked df64 Cholesky of a batch (b, N, N) of SPD DF matrices."""
    b, N, _ = A.hi.shape
    B = min(block, max(8, N))
    nb = -(-N // B)
    Np = nb * B
    Aw = _pad_spd(A, Np)
    rows = jnp.arange(Np)

    L0 = DF(jnp.zeros_like(Aw.hi), jnp.zeros_like(Aw.lo))
    Li0 = DF(jnp.zeros((nb, b, B, B), Aw.hi.dtype),
             jnp.zeros((nb, b, B, B), Aw.lo.dtype))

    def step(k, carry):
        Aw, L, Linvs = carry
        i0 = k * B
        Dkk = DF(lax.dynamic_slice(Aw.hi, (0, i0, i0), (b, B, B)),
                 lax.dynamic_slice(Aw.lo, (0, i0, i0), (b, B, B)))
        Lkk, Lkk_inv = _factor_block(Dkk)
        panel = DF(lax.dynamic_slice(Aw.hi, (0, 0, i0), (b, Np, B)),
                   lax.dynamic_slice(Aw.lo, (0, 0, i0), (b, Np, B)))
        panel = _mask_rows(panel, rows, lambda r: r >= i0 + B)
        G = df64_matmul(panel, _dfT(Lkk_inv))          # (b, Np, B)
        # embed the diagonal block into the column panel
        lcol = DF(lax.dynamic_update_slice(G.hi, Lkk.hi, (0, i0, 0)),
                  lax.dynamic_update_slice(G.lo, Lkk.lo, (0, i0, 0)))
        L = DF(lax.dynamic_update_slice(L.hi, lcol.hi, (0, 0, i0)),
               lax.dynamic_update_slice(L.lo, lcol.lo, (0, 0, i0)))
        # trailing update (G's rows < i0+B are zero ⇒ only the true
        # trailing block changes)
        U = df64_matmul(G, _dfT(G))                    # (b, Np, Np)
        Aw = df_sub(Aw, U)
        Linvs = DF(lax.dynamic_update_slice(
                       Linvs.hi, Lkk_inv.hi[None], (k, 0, 0, 0)),
                   lax.dynamic_update_slice(
                       Linvs.lo, Lkk_inv.lo[None], (k, 0, 0, 0)))
        return Aw, L, Linvs

    _, L, Linvs = lax.fori_loop(0, nb, step, (Aw, L0, Li0))
    return CholFactors(L=L, Linvs=Linvs, n=N, block=B)


def _block_inv(F: CholFactors, k):
    b = F.L.hi.shape[0]
    B = F.block
    return DF(lax.dynamic_slice(F.Linvs.hi, (k, 0, 0, 0),
                                (1, b, B, B))[0],
              lax.dynamic_slice(F.Linvs.lo, (k, 0, 0, 0),
                                (1, b, B, B))[0])


def _pad_rhs(R: DF, Np: int) -> DF:
    b, N, nrhs = R.hi.shape
    if N == Np:
        return R
    pad = ((0, 0), (0, Np - N), (0, 0))
    return DF(jnp.pad(R.hi, pad), jnp.pad(R.lo, pad))


def df_tri_solve_blocked(F: CholFactors, RHS: DF) -> DF:
    """Solve L X = RHS (forward substitution by blocks).

    RHS: DF (b, n, nrhs); returns X with the same (unpadded) shape."""
    b, Np, _ = F.L.hi.shape
    B = F.block
    nb = Np // B
    R = _pad_rhs(RHS, Np)
    nrhs = R.hi.shape[-1]
    cols = jnp.arange(Np)
    X0 = DF(jnp.zeros_like(R.hi), jnp.zeros_like(R.lo))

    def step(k, X):
        i0 = k * B
        Rk = DF(lax.dynamic_slice(R.hi, (0, i0, 0), (b, B, nrhs)),
                lax.dynamic_slice(R.lo, (0, i0, 0), (b, B, nrhs)))
        Lrow = DF(lax.dynamic_slice(F.L.hi, (0, i0, 0), (b, B, Np)),
                  lax.dynamic_slice(F.L.lo, (0, i0, 0), (b, B, Np)))
        Lrow = _mask_cols(Lrow, cols, lambda c: c < i0)
        S = df64_matmul(Lrow, X)                       # (b, B, nrhs)
        Xk = df64_matmul(_block_inv(F, k), df_sub(Rk, S))
        return DF(lax.dynamic_update_slice(X.hi, Xk.hi, (0, i0, 0)),
                  lax.dynamic_update_slice(X.lo, Xk.lo, (0, i0, 0)))

    X = lax.fori_loop(0, nb, step, X0)
    n = RHS.hi.shape[1]
    return DF(X.hi[:, :n], X.lo[:, :n])


def df_tri_solve_t_blocked(F: CholFactors, RHS: DF) -> DF:
    """Solve Lᵀ X = RHS (backward substitution by blocks)."""
    b, Np, _ = F.L.hi.shape
    B = F.block
    nb = Np // B
    R = _pad_rhs(RHS, Np)
    nrhs = R.hi.shape[-1]
    cols = jnp.arange(Np)
    X0 = DF(jnp.zeros_like(R.hi), jnp.zeros_like(R.lo))

    def step(kk, X):
        k = nb - 1 - kk
        i0 = k * B
        Rk = DF(lax.dynamic_slice(R.hi, (0, i0, 0), (b, B, nrhs)),
                lax.dynamic_slice(R.lo, (0, i0, 0), (b, B, nrhs)))
        # Lᵀ block-row k = (column panel k of L)ᵀ; keep strictly-below
        # rows (already solved block rows of X)
        Lcp = DF(lax.dynamic_slice(F.L.hi, (0, 0, i0), (b, Np, B)),
                 lax.dynamic_slice(F.L.lo, (0, 0, i0), (b, Np, B)))
        LT = _mask_cols(_dfT(Lcp), cols, lambda c: c >= i0 + B)
        S = df64_matmul(LT, X)
        Xk = df64_matmul(_dfT(_block_inv(F, k)), df_sub(Rk, S))
        return DF(lax.dynamic_update_slice(X.hi, Xk.hi, (0, i0, 0)),
                  lax.dynamic_update_slice(X.lo, Xk.lo, (0, i0, 0)))

    X = lax.fori_loop(0, nb, step, X0)
    n = RHS.hi.shape[1]
    return DF(X.hi[:, :n], X.lo[:, :n])


def df_cho_solve_blocked(F: CholFactors, RHS: DF) -> DF:
    """Solve (L Lᵀ) X = RHS."""
    return df_tri_solve_t_blocked(F, df_tri_solve_blocked(F, RHS))


def df_logdet_blocked(F: CholFactors) -> DF:
    """log det A = 2 Σ log L_ii per batch element, df-accumulated.
    The padded tail diagonal is 1 (log = 0), so no masking is needed.

    Uses the df-accurate ``df_log`` (Newton-corrected) rather than the
    hardware ``jnp.log``: the TPU VPU's f32 log is several ulp off and
    its per-element error sums to ~4e-7 RELATIVE logdet error at N=512
    (measured) — the limiting term of on-chip exact-ELBO parity —
    while df_log keeps the sum at the df64 floor."""
    from gpyrn_tpu.ops.df64_math import df_log
    d_hi = jnp.diagonal(F.L.hi, axis1=-2, axis2=-1)
    d_lo = jnp.diagonal(F.L.lo, axis1=-2, axis2=-1)
    s = df_sum(df_log(DF(d_hi, d_lo)), axis=-1)
    return DF(2.0 * s.hi, 2.0 * s.lo)
