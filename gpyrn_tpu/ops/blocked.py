"""Blocked triangular-inverse diagonal — the MXU sweep path.

The coordinate-ascent sweep needs, per GP, ``diag(A⁻¹)`` for
A = K + D⁻¹ (chol L): through the identities

    diag Σ      = d − d² · diag(A⁻¹)          (Σ = K − K A⁻¹ K, d = D⁻¹ diag)
    tr(A⁻¹ D⁻¹) = Σⱼ dⱼ (A⁻¹)ⱼⱼ

every Σ-diagnostic the engine consumes reduces to diag(A⁻¹) — i.e. the
column norms² of L⁻¹ — replacing the dense-RHS N³ triangular solve the
engine previously chunk-scanned (and the reference materializes Σ
densely, meanfield.py:771-788).

Implementation note (measured on the target chip, N=5120, batch 4, f32
``highest``, call overhead subtracted — the remote tunnel adds ~31 ms
per host→device round trip, which inflated naive single-call timings):

* XLA triangular solve with a dense N×N RHS: ~50 ms (10.8 TFLOP/s).
* This module's blocked lower-triangular inversion: ~15.5 ms — the
  2N³/3 FLOPs are batched GEMMs (matmul here runs 31.7 TFLOP/s at
  ``highest``), plus nb tiny XLA factorizations (~0.5 ms each).
* A fused Pallas diagonal-block kernel was prototyped and REJECTED:
  Mosaic-compiled masked column recurrences cost 3–9 ms per (4, T, T)
  block vs XLA's 0.5 ms — the VPU full-width masked recurrence is
  algorithmically wasteful and XLA's small factorizations are already
  latency-fine once the tunnel overhead is accounted for.

Everything here is plain XLA, so it shards (the batch dimension) and
differentiates like any other engine code, and runs identically on the
CPU test mesh.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["blocked_cholesky", "diag_Ainv", "blocked_chol_diag_ainv",
           "DEFAULT_BLOCK"]

DEFAULT_BLOCK = int(os.environ.get("GPYRN_TPU_CHOL_BLOCK", "512"))


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _block_size(N: int, block: int) -> int:
    # keep the unrolled strip loop at <= ~16 steps for compile sanity
    T = min(block, _round_up(N, 128))
    while N > 16 * T:
        T *= 2
    return T


def _tri_inv_blocks(Ld):
    """(B, nb, T, T) lower-triangular diagonal blocks → inverses."""
    B, nb, T, _ = Ld.shape
    eye = jnp.broadcast_to(jnp.eye(T, dtype=Ld.dtype), Ld.shape)
    return lax.linalg.triangular_solve(Ld, eye, left_side=True,
                                       lower=True)


def _pad_chol(L, Npad):
    """Pad a lower factor with an identity tail block."""
    B, N, _ = L.shape
    if Npad == N:
        return L
    L = jnp.pad(L, ((0, 0), (0, Npad - N), (0, Npad - N)))
    idx = jnp.arange(N, Npad)
    return L.at[:, idx, idx].set(1.0)


def blocked_cholesky(A, block: int = DEFAULT_BLOCK, precision=None):
    """Left-looking blocked Cholesky of an SPD batch (B, N, N) →
    ``(L, Linv_d)``: the (identity-padded) lower factor and the
    (B, nb, T, T) inverses of its diagonal blocks.

    The O(N³) panel updates are batched GEMMs reading/writing a single
    in-place factor buffer (dynamic-update-slice aliases it; per-step
    strip concatenation instead kept an O(nb) cascade of near-N² temps
    live — OOM at N=20k); only the T×T diagonal factorizations use
    XLA's cholesky.  Same speed as XLA's monolithic cholesky on the
    chip today — it exists because callers get ``Linv_d`` for free,
    which :func:`diag_Ainv` reuses."""
    A = jnp.asarray(A)
    B, N, _ = A.shape
    T = _block_size(N, block)
    Npad = _round_up(N, T)
    nb = Npad // T
    if Npad != N:
        A = jnp.pad(A, ((0, 0), (0, Npad - N), (0, Npad - N)))
        idx = jnp.arange(N, Npad)
        A = A.at[:, idx, idx].set(1.0)
    mm = functools.partial(jnp.einsum, precision=precision)

    # History lives in ONE (B, Npad, Npad) buffer updated in place by
    # dynamic-update-slice: assembling the per-step history by
    # concatenating strip buffers instead (the round-3 design) left an
    # O(nb) cascade of near-N² concat temps live in the buffer plan —
    # measured ~7 GB of [1, 20480, k·2048] temps at N=20k, pushing
    # elbo_fit_lean 1.1 GB over the chip's HBM.
    L = jnp.zeros_like(A)
    linvs = []
    for i in range(nb):
        a = i * T
        if i:
            top = L[:, a:a + T, :a]                       # (B, T, a)
            Aii = A[:, a:a + T, a:a + T] - mm("bik,bjk->bij", top, top)
            Ari = A[:, a + T:, a:a + T] - mm("bik,bjk->bij",
                                             L[:, a + T:, :a], top)
        else:
            Aii = A[:, :T, :T]
            Ari = A[:, T:, :T]
        Lii = jnp.linalg.cholesky(Aii)
        Linv = lax.linalg.triangular_solve(
            Lii, jnp.broadcast_to(jnp.eye(T, dtype=A.dtype), Lii.shape),
            left_side=True, lower=True)
        linvs.append(Linv)
        L = L.at[:, a:a + T, a:a + T].set(Lii)
        if i + 1 < nb:
            Lri = mm("bik,bjk->bij", Ari, Linv)           # Ari Lii^-T
            L = L.at[:, a + T:, a:a + T].set(Lri)
    return L, jnp.stack(linvs, axis=1)


def diag_Ainv(L, Linv_d=None, block: int = DEFAULT_BLOCK, precision=None,
              n_valid: int | None = None):
    """``diag(A⁻¹)`` for ``A = L Lᵀ`` — column norms² of ``L⁻¹``.

    Blocked lower-triangular inversion: row strip i of X = L⁻¹ is
    ``X_i = Linv_ii @ [−L_i,:a @ X_:a,:a │ I]`` — one GEMM per strip —
    and the column norms accumulate as strips complete, so the 2N³/3
    FLOPs ride the MXU (~23 TFLOP/s measured vs 10.8 for the dense-RHS
    triangular solve this replaces).  ``L`` must be padded to a block
    multiple (identity tail — see :func:`blocked_cholesky`);
    ``n_valid`` slices the logical N back out."""
    L = jnp.asarray(L)
    B, Npad, _ = L.shape
    T = _block_size(Npad, block)
    if Npad % T:
        raise ValueError(f"padded N {Npad} not a multiple of block {T}")
    nb = Npad // T
    mm = functools.partial(jnp.einsum, precision=precision)
    if Linv_d is None:
        Ld = jnp.stack([L[:, i * T:(i + 1) * T, i * T:(i + 1) * T]
                        for i in range(nb)], axis=1)
        Linv_d = _tri_inv_blocks(Ld)

    # X = L⁻¹ accumulates in ONE (B, Npad, Npad) buffer (see the
    # matching note in blocked_cholesky: per-step history concatenation
    # left an O(nb) cascade of near-N² temps live at N=20k)
    X = jnp.zeros((B, Npad, Npad), dtype=L.dtype)
    for i in range(nb):
        a = i * T
        Linv = Linv_d[:, i]
        if i:
            S = mm("btk,bkn->btn", L[:, a:a + T, :a], X[:, :a, :a])
            Xi = -mm("bts,bsn->btn", Linv, S)
            X = X.at[:, a:a + T, :a].set(Xi)
        X = X.at[:, a:a + T, a:a + T].set(Linv)
    acc = jnp.sum(X * X, axis=1)
    n = Npad if n_valid is None else n_valid
    return acc[:, :n]


def blocked_chol_diag_ainv(A, block: int = DEFAULT_BLOCK, precision=None):
    """Fused convenience: ``(L, diag(A⁻¹))`` of an SPD batch (B, N, N).

    The engine's per-sweep workhorse (models/gprn.py): L comes from the
    blocked factorization (its per-block inverses feed straight into
    the triangular inversion), diag(A⁻¹) drives both
    ``diag Σ = d − d² diag(A⁻¹)`` and ``tr(A⁻¹D⁻¹) = Σ d·diag(A⁻¹)``.
    The returned L is (B, N, N) — padding sliced off."""
    A = jnp.asarray(A)
    N = A.shape[-1]
    Lp, Linv_d = blocked_cholesky(A, block=block, precision=precision)
    d = diag_Ainv(Lp, Linv_d=Linv_d, block=block, precision=precision,
                  n_valid=N)
    return Lp[:, :N, :N], d
