"""Panel-sharded distributed dense linear algebra over the N axis.

This is the project's "sequence parallelism" (SURVEY.md §5.7): the
N×N kernel matrices themselves are distributed across the device mesh
as contiguous **row slabs** of ``Nl = Np/D`` rows, so multi-chip raises
the single-chip N ceiling instead of only batching the (q × p) lattice
(round-2 verdict item 3 — the ``lat`` axis capped out at the lattice
size, useless for q = 1, p = 1).

Everything here runs INSIDE ``jax.shard_map`` over one mesh axis.  The
building blocks are classic distributed right-looking blocked
factorizations expressed with XLA collectives:

* :func:`panel_cholesky_local` — right-looking blocked Cholesky.  Per
  block column k: the owner's B×B diagonal block is broadcast (psum of
  an owner-masked slice), every device factors it redundantly (O(B³),
  cheaper than a broadcast of the factor), solves its local panel
  rows against L_kkᵀ, the full N×B panel is ``all_gather``-ed, and the
  trailing submatrix update — where all the FLOPs are — is a local
  (Nl×B)·(B×Np) GEMM with static row/col masks.  Comm per step: B² +
  N·B, i.e. ~N² total over the factorization; FLOPs N³/3/D per device.
* :func:`panel_solve_local` / :func:`panel_solve_t_local` — blocked
  forward/back substitution with a replicated right-hand side, O(N²/D)
  local FLOPs, one fused (B×(B+1)) psum per block step.
* :func:`panel_diag_trace_local` — the Σ-free diag/trace pass of the
  GPRN sweep (models/gprn.py `_gp_diag_trace`): column norms² of
  B = L⁻¹K and of (Lᵀ − B), accumulated block-row by block-row while
  the wide solve streams, never materializing an N×N solution on one
  device.

Padding convention: ``Np = ceil(N / (D·B))·D·B``; padded rows/cols of
any matrix are identity (diag 1), padded vector entries 0.  Every op
here preserves that convention, so padded lanes never contaminate real
ones and logdets/norms need no final correction beyond slicing.

The model-level fit built on these lives in
:mod:`gpyrn_tpu.parallel.panel_fit`.

Callers must wrap these in ``jax.shard_map(..., check_vma=False)``:
several loop carries (solve partial sums, trailing-update accumulators)
start replicated-typed and become device-varying inside the loops, and
the final reductions (psum/all_gather) make the results replicated in
VALUE but not in the VMA type system, which has no varying→invariant
cast without an extra collective.

Reference context: the reference (iastro-pt/gpyrn) is single-process
NumPy with no distributed backend at all (SURVEY.md §5.8); this module
is the TPU-native capability extension that makes BASELINE config 5's
upper range (N = 20k+) a multi-chip problem.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "PanelDims", "panel_dims", "pad_vector", "slab_rows",
    "panel_cholesky_local", "panel_logdet_half_local",
    "panel_solve_local", "panel_solve_t_local", "panel_cho_solve_local",
    "panel_matvec_local", "panel_diag_trace_local",
    "panel_tri_inv_local", "panel_fro_cross_local", "gather_vector",
]

DEFAULT_BLOCK = 256


class PanelDims(NamedTuple):
    """Static geometry of a panel-sharded N×N problem.

    N:   true matrix dimension
    Np:  padded dimension (multiple of D·B)
    D:   devices along the panel axis
    Nl:  rows per device (= Np/D)
    B:   block size
    nb:  number of block columns (= Np/B)
    bpd: blocks per device (= Nl/B)
    """
    N: int
    Np: int
    D: int
    Nl: int
    B: int
    nb: int
    bpd: int


def panel_dims(N: int, n_devices: int, block: int = DEFAULT_BLOCK
               ) -> PanelDims:
    B = min(block, max(8, 1 << (max(N // max(n_devices, 1), 1) - 1)
                       .bit_length()))
    step = n_devices * B
    Np = math.ceil(N / step) * step
    Nl = Np // n_devices
    return PanelDims(N=N, Np=Np, D=n_devices, Nl=Nl, B=B,
                     nb=Np // B, bpd=Nl // B)


def pad_vector(v, dims: PanelDims, value=0.0):
    """Pad a (…, N) vector to (…, Np) with ``value`` (host/jit agnostic)."""
    v = jnp.asarray(v)
    pad = [(0, 0)] * (v.ndim - 1) + [(0, dims.Np - dims.N)]
    return jnp.pad(v, pad, constant_values=value)


def slab_rows(dims: PanelDims, axis_name: str):
    """Global row indices (Nl,) of this device's slab."""
    d = lax.axis_index(axis_name)
    return d * dims.Nl + jnp.arange(dims.Nl)


def gather_vector(x_local, axis_name: str):
    """all_gather a per-device (Nl, …) piece into the full (Np, …)."""
    return lax.all_gather(x_local, axis_name, tiled=True)


def _owner_block(dims: PanelDims, axis_name: str, k):
    """(mine, local_row_offset) for block column ``k``."""
    d = lax.axis_index(axis_name)
    owner = k // dims.bpd
    return d == owner, (k % dims.bpd) * dims.B


def panel_cholesky_local(A_local, dims: PanelDims, axis_name: str):
    """Distributed blocked Cholesky of a row-slab-sharded SPD matrix.

    Args:
        A_local: (Nl, Np) local row slab of A (padding: identity).
    Returns:
        (Nl, Np) local slab of the lower-triangular factor L.
    """
    B, Nl, Np = dims.B, dims.Nl, dims.Np
    gr = slab_rows(dims, axis_name)
    cols = jnp.arange(Np)

    def body(k, carry):
        W, L = carry
        mine, off = _owner_block(dims, axis_name, k)
        m = mine.astype(W.dtype)
        rows_k = lax.dynamic_slice(W, (off, 0), (B, Np))
        Dblk = lax.psum(m * lax.dynamic_slice(rows_k, (0, k * B), (B, B)),
                        axis_name)
        Lkk = jnp.linalg.cholesky(Dblk)
        colk = lax.dynamic_slice(W, (0, k * B), (Nl, B))
        # C = colk · L_kk⁻ᵀ; the diagonal block's rows come out as L_kk
        # itself (D·L⁻ᵀ = L), so one masked solve covers panel + diag
        C = lax.linalg.triangular_solve(
            Lkk, colk.T, left_side=True, lower=True).T
        Lcol = jnp.where((gr >= k * B)[:, None], C, 0.0)
        L = lax.dynamic_update_slice(L, Lcol, (0, k * B))
        P = lax.all_gather(Lcol, axis_name, tiled=True)       # (Np, B)
        mask = ((gr >= (k + 1) * B)[:, None] &
                (cols >= (k + 1) * B)[None, :])
        W = W - jnp.where(mask, Lcol @ P.T, 0.0)
        return W, L

    _, L_local = lax.fori_loop(
        0, dims.nb, body, (A_local, jnp.zeros_like(A_local)))
    return L_local


def panel_logdet_half_local(L_local, dims: PanelDims, axis_name: str):
    """Σ log diag(L) over the true N rows (replicated scalar).

    ``logdet(A) = 2 · panel_logdet_half_local(panel_cholesky(A))``."""
    gr = slab_rows(dims, axis_name)
    diag = L_local[jnp.arange(dims.Nl), gr]
    safe = jnp.where(gr < dims.N, diag, 1.0)
    return lax.psum(jnp.sum(jnp.log(safe)), axis_name)


def panel_matvec_local(K_local, v, dims: PanelDims, axis_name: str):
    """K @ v for a row-slab K and replicated (Np,) v → replicated (Np,)."""
    return lax.all_gather(K_local @ v, axis_name, tiled=True)


def panel_solve_local(L_local, b, dims: PanelDims, axis_name: str):
    """Forward substitution L x = b (replicated b (Np,) → replicated x).

    Maintains the local running partial sums s = L_local[:, :kB] x[:kB];
    each block step psums one owner-masked (B, B+1) tile (diagonal block
    ‖ partial sums) and solves the B×B triangle redundantly."""
    B, Nl = dims.B, dims.Nl

    def body(k, carry):
        x, s = carry
        mine, off = _owner_block(dims, axis_name, k)
        m = mine.astype(b.dtype)
        Lkk_l = lax.dynamic_slice(L_local, (off, k * B), (B, B))
        sk_l = lax.dynamic_slice(s, (off,), (B,))
        tile = lax.psum(m * jnp.concatenate([Lkk_l, sk_l[:, None]], 1),
                        axis_name)
        Lkk, sk = tile[:, :B], tile[:, B]
        bk = lax.dynamic_slice(b, (k * B,), (B,))
        xk = lax.linalg.triangular_solve(
            Lkk, (bk - sk)[:, None], left_side=True, lower=True)[:, 0]
        x = lax.dynamic_update_slice(x, xk, (k * B,))
        s = s + lax.dynamic_slice(L_local, (0, k * B), (Nl, B)) @ xk
        return x, s

    x, _ = lax.fori_loop(0, dims.nb, body,
                         (jnp.zeros_like(b), jnp.zeros(Nl, b.dtype)))
    return x


def panel_solve_t_local(L_local, b, dims: PanelDims, axis_name: str):
    """Back substitution Lᵀ x = b (replicated b (Np,) → replicated x).

    Each solved block broadcasts its correction Lᵀ[:, r_k]·x_k through a
    per-device accumulator; one (B,B) + one (B,) psum per step."""
    B, Np = dims.B, dims.Np

    def body(i, carry):
        x, s_dev = carry
        k = dims.nb - 1 - i
        mine, off = _owner_block(dims, axis_name, k)
        m = mine.astype(b.dtype)
        Lkk = lax.psum(
            m * lax.dynamic_slice(L_local, (off, k * B), (B, B)),
            axis_name)
        sk = lax.psum(lax.dynamic_slice(s_dev, (k * B,), (B,)), axis_name)
        bk = lax.dynamic_slice(b, (k * B,), (B,))
        xk = lax.linalg.triangular_solve(
            Lkk, (bk - sk)[:, None], left_side=True, lower=True,
            transpose_a=True)[:, 0]
        x = lax.dynamic_update_slice(x, xk, (k * B,))
        rows_k = lax.dynamic_slice(L_local, (off, 0), (B, Np))
        s_dev = s_dev + m * (rows_k.T @ xk)
        return x, s_dev

    x, _ = lax.fori_loop(0, dims.nb, body,
                         (jnp.zeros_like(b), jnp.zeros(Np, b.dtype)))
    return x


def panel_cho_solve_local(L_local, b, dims: PanelDims, axis_name: str):
    """A⁻¹ b from the panel factor: Lᵀ \\ (L \\ b)."""
    return panel_solve_t_local(
        L_local, panel_solve_local(L_local, b, dims, axis_name),
        dims, axis_name)


def panel_diag_trace_local(L_local, K_local, dims: PanelDims,
                           axis_name: str):
    """The GPRN sweep's Σ-free diag/trace pass, panel-distributed.

    Given the panel factor L of A = K + D⁻¹ and the slab of K, streams
    the wide solve B = L⁻¹K block-row by block-row and reduces

        qn_j = Σᵢ B²ᵢⱼ            (→ diag Σ = diag K − qn)
        cn_j = Σᵢ (Lᵀ − B)²ᵢⱼ     (→ tr(K⁻¹Σ) = Σⱼ Dⱼⱼ cn_j,
                                    via L⁻¹D⁻¹ = Lᵀ − B exactly)

    in place (single-chip analog: models/gprn.py `_gp_diag_trace`).
    Per step: one (B, Np) psum broadcast of the solved block row, one
    (Np, B) all_gather of L's block column, and the (Nl×B)·(B×Np)
    trailing GEMM that carries the O(N³/D) FLOPs.

    Returns:
        (dS, cn): replicated (Np,) arrays, ``dS = diag K − qn``.
        Padded lanes come out exactly 0 by the identity-padding
        convention.
    """
    B, Nl, Np = dims.B, dims.Nl, dims.Np
    gr = slab_rows(dims, axis_name)

    def body(k, carry):
        S, qn, cn = carry
        mine, off = _owner_block(dims, axis_name, k)
        m = mine.astype(K_local.dtype)
        Lkk = lax.psum(
            m * lax.dynamic_slice(L_local, (off, k * B), (B, B)),
            axis_name)
        rhs = lax.psum(
            m * (lax.dynamic_slice(K_local, (off, 0), (B, Np)) -
                 lax.dynamic_slice(S, (off, 0), (B, Np))),
            axis_name)
        Xk = lax.linalg.triangular_solve(Lkk, rhs, left_side=True,
                                         lower=True)          # (B, Np)
        qn = qn + jnp.sum(Xk * Xk, axis=0)
        Lcolk = lax.dynamic_slice(L_local, (0, k * B), (Nl, B))
        Lcol_full = lax.all_gather(Lcolk, axis_name, tiled=True)
        M = Lcol_full.T - Xk                                  # (B, Np)
        cn = cn + jnp.sum(M * M, axis=0)
        S = S + Lcolk @ Xk
        return S, qn, cn

    zero = jnp.zeros(Np, K_local.dtype)
    _, qn, cn = lax.fori_loop(
        0, dims.nb, body, (jnp.zeros_like(K_local), zero, zero))
    diag_local = K_local[jnp.arange(Nl), gr]
    diagK = lax.all_gather(diag_local, axis_name, tiled=True)
    return diagK - qn, cn


def panel_tri_inv_local(L_local, dims: PanelDims, axis_name: str):
    """Distributed triangular inversion: row slab of ``G = L⁻¹``.

    Streams the forward substitution ``L X = I`` block-row by
    block-row (same collective pattern as
    :func:`panel_diag_trace_local`, with the identity as the RHS); the
    owner of each block row keeps its (B, Np) piece, so G comes out in
    the SAME row-slab layout as L — the q > 1 cross-trace pass
    (:func:`panel_fro_cross_local`) consumes it column-strip-wise via
    one ``all_gather`` per step.

    Returns:
        ``(G_local, diag_inv)``: the (Nl, Np) local slab of L⁻¹ and the
        replicated (Np,) ``diag((L Lᵀ)⁻¹)`` = column norms² of L⁻¹
        (padded lanes of ``diag_inv`` are exactly 1 by the
        identity-padding convention — mask with ``< N`` as needed).
    """
    B, Nl, Np = dims.B, dims.Nl, dims.Np

    def body(k, carry):
        S, G, qn = carry
        mine, off = _owner_block(dims, axis_name, k)
        m = mine.astype(L_local.dtype)
        Lkk = lax.psum(
            m * lax.dynamic_slice(L_local, (off, k * B), (B, B)),
            axis_name)
        eye_k = lax.dynamic_update_slice(
            jnp.zeros((B, Np), L_local.dtype),
            jnp.eye(B, dtype=L_local.dtype), (0, k * B))
        rhs = eye_k - lax.psum(
            m * lax.dynamic_slice(S, (off, 0), (B, Np)), axis_name)
        Xk = lax.linalg.triangular_solve(Lkk, rhs, left_side=True,
                                         lower=True)          # (B, Np)
        qn = qn + jnp.sum(Xk * Xk, axis=0)
        cur = lax.dynamic_slice(G, (off, 0), (B, Np))
        G = lax.dynamic_update_slice(G, jnp.where(mine, Xk, cur),
                                     (off, 0))
        Lcolk = lax.dynamic_slice(L_local, (0, k * B), (Nl, B))
        S = S + Lcolk @ Xk
        return S, G, qn

    _, G_local, qn = lax.fori_loop(
        0, dims.nb, body,
        (jnp.zeros_like(L_local), jnp.zeros_like(L_local),
         jnp.zeros(Np, L_local.dtype)))
    return G_local, qn


def panel_fro_cross_local(LA_local, G_local, dscale, dims: PanelDims,
                          axis_name: str):
    """``‖L_A⁻¹ · diag(dscale) · Gᵀ‖²_F`` — the q > 1 cross-trace
    Frobenius norm (models/gprn.py `_sweep_free_lean`: W =
    L_{A_k}⁻¹ D_k⁻¹ L_j⁻ᵀ), fully panel-distributed.

    ``LA_local`` is the row slab of the panel factor L_A, ``G_local``
    the row slab of G = L_j⁻¹ (:func:`panel_tri_inv_local`), ``dscale``
    a replicated (Np,) diagonal (padded lanes 0).  Streams the wide
    forward solve Z = L_A⁻¹ W block-row by block-row: W's block row k
    is rebuilt from one ``all_gather`` of G's column strip (W[r, c] =
    dscale[r]·G[c, r]), the running update rides the gathered L_A
    block column as a local (Nl×B)·(B×Np) GEMM, and only Σ Z² is kept.
    Padded lanes contribute exactly 0 (dscale pad = 0; G pad rows are
    unit vectors pointing at padded columns).

    Returns the replicated scalar ``Σ Z²``.
    """
    B, Nl, Np = dims.B, dims.Nl, dims.Np

    def body(k, carry):
        S, frob = carry
        mine, off = _owner_block(dims, axis_name, k)
        m = mine.astype(LA_local.dtype)
        Lkk = lax.psum(
            m * lax.dynamic_slice(LA_local, (off, k * B), (B, B)),
            axis_name)
        strip = lax.all_gather(
            lax.dynamic_slice(G_local, (0, k * B), (Nl, B)),
            axis_name, tiled=True)                            # (Np, B)
        dk = lax.dynamic_slice(dscale, (k * B,), (B,))
        Wk = strip.T * dk[:, None]                            # (B, Np)
        Sk = lax.psum(
            m * lax.dynamic_slice(S, (off, 0), (B, Np)), axis_name)
        Zk = lax.linalg.triangular_solve(Lkk, Wk - Sk, left_side=True,
                                         lower=True)          # (B, Np)
        frob = frob + jnp.sum(Zk * Zk)
        LAcolk = lax.dynamic_slice(LA_local, (0, k * B), (Nl, B))
        S = S + LAcolk @ Zk
        return S, frob

    _, frob = lax.fori_loop(
        0, dims.nb, body,
        (jnp.zeros_like(LA_local), jnp.zeros((), LA_local.dtype)))
    return frob
