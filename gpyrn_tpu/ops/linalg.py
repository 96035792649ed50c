"""Kernel-matrix construction and batched linear algebra.

All functions are pure jax and designed to batch/vmap over the GPRN
(q nodes × p outputs) lattice.  Nugget conventions copied from the
reference for numerical parity:

* training covariance: ``K + 1e-6 I``   (reference meanfield.py:413-434)
* prediction/sampling covariance: ``K + 1.25e-12 I``
  (reference meanfield.py:436-453, _gp.py:40-50)
* non-stationary kernels (HarmonicPeriodic, QuasiHarmonicPeriodic,
  Polynomial, Linear) receive ``(t1, t2)`` coordinates and get *no*
  nugget, matching the reference branch (meanfield.py:426-431).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import vmap
from jax.scipy.linalg import cho_solve as _cho_solve

from gpyrn_tpu.ops import kernels as _k

TRAIN_NUGGET = 1e-6
PREDICT_NUGGET = 1.25e-12

import os

# Margin multiplier for the float32 trace-scaled jitter.  TPU's blocked
# Cholesky loses more precision than LAPACK's, so near-rank-deficient
# kernels (e.g. SquaredExponential with a long length-scale) need the
# condition number pushed further below 1/eps_f32: mult=m caps it at
# 1/(m·eps) ≈ 8.4e6/m, scale-invariantly.  Measured on a v5e: mult=1
# NaNs on the worst-case smooth kernel, mult=2 and 4 factor it cleanly;
# mult=4 keeps the f32 ELBO within ~0.4% of f64 at N=1000 (mult=32 was
# ~4%).  Immaterial in f64 (the scaled term stays far below the
# reference's fixed nuggets).
F32_JITTER_MULT = float(os.environ.get("GPYRN_TPU_F32_JITTER_MULT", "4"))

# Pallas blockwise kernel-matrix builder policy: 'auto' uses it on TPU
# for float32 problems with N >= threshold and supported structures
# (the large-N path, SURVEY.md §5.7); True forces, False disables.
PALLAS_KERNELS = os.environ.get("GPYRN_TPU_PALLAS_KERNELS", "auto")
PALLAS_MIN_N = int(os.environ.get("GPYRN_TPU_PALLAS_MIN_N", "2048"))


def set_pallas_kernels(mode) -> None:
    """Set the Pallas kernel-builder policy: True | False | 'auto'."""
    global PALLAS_KERNELS
    PALLAS_KERNELS = mode


def _use_pallas(structure, t) -> bool:
    if PALLAS_KERNELS in (False, "0", "off"):
        return False
    from gpyrn_tpu.ops.pallas_kernels import pallas_supported
    if not pallas_supported(structure):
        return False
    if PALLAS_KERNELS in (True, "1", "on"):
        return True
    import jax
    return (jax.default_backend() == "tpu"
            and t.dtype == jnp.float32
            and t.shape[0] >= PALLAS_MIN_N)

__all__ = [
    "TRAIN_NUGGET", "PREDICT_NUGGET",
    "kernel_matrix", "cross_kernel_matrix", "cholesky_nugget",
    "chol_solve", "batched_chol", "batched_chol_solve", "psd_jitter",
    "kernel_matrix_plain", "set_pallas_kernels",
]


def kernel_matrix(structure, params, t, nugget=TRAIN_NUGGET):
    """Dense covariance matrix K(t, t) for one kernel structure.

    The jitter added to the diagonal is ``max(nugget, eps(dtype)·tr(K))``:
    in float64 this is exactly the reference's fixed nugget (eps·tr ≈
    1e-13 for typical scales, far below 1e-6), while in float32 it scales
    with the spectral bound tr(K) ≥ λmax so the condition number stays
    below 1/eps ≈ 8.4e6 and the Cholesky remains finite — the dtype-aware
    equivalent of the reference's (commented-out) adaptive-nugget retry
    loop (reference meanfield.py:25-60)."""
    t = jnp.asarray(t)
    if _k.is_nonstationary(structure):
        # pass the lag too: composites can mix non-stationary and
        # stationary kernels (e.g. SE + LIN·C), and the stationary
        # children evaluate on r.  Reference quirk preserved: a
        # TOP-LEVEL HP/QHP/POLY kernel gets NO nugget (the reference's
        # isinstance dispatch, meanfield.py:426-433, returns the raw
        # matrix for exactly those three); composites and LIN — which
        # the reference cannot evaluate at all — get the standard one.
        K = _k.evaluate(structure, params, r=t[:, None] - t[None, :],
                        t1=t[:, None], t2=t[None, :])
        if structure[0] in ("HP", "QHP", "POLY"):
            return K
    else:
        if _use_pallas(structure, t):
            from gpyrn_tpu.ops.pallas_kernels import pallas_kernel_matrix
            return pallas_kernel_matrix(structure, jnp.asarray(params), t,
                                        nugget, F32_JITTER_MULT)
        K = _k.evaluate(structure, params, r=t[:, None] - t[None, :])
    eps = jnp.finfo(K.dtype).eps
    jitter = jnp.maximum(jnp.asarray(nugget, dtype=K.dtype),
                         F32_JITTER_MULT * eps * jnp.trace(K))
    return K + jitter * jnp.eye(t.shape[0], dtype=K.dtype)


def kernel_matrix_plain(structure, params, t, nugget=TRAIN_NUGGET):
    """Dense K(t, t) with the FIXED reference nugget only (no f32
    trace-scaling).  Safe wherever K is only used inside (K + D)⁻¹
    solves with a well-conditioned diagonal D — the coordinate-ascent
    updates — and required there for the mixed-precision fit to converge
    to the true-model (nugget 1e-6) fixed point."""
    t = jnp.asarray(t)
    if _k.is_nonstationary(structure):
        # same convention as kernel_matrix: lag + coordinate grids, no
        # nugget only for the reference's top-level HP/QHP/POLY quirk
        K = _k.evaluate(structure, params, r=t[:, None] - t[None, :],
                        t1=t[:, None], t2=t[None, :])
        if structure[0] in ("HP", "QHP", "POLY"):
            return K
        return K + jnp.asarray(nugget, dtype=K.dtype) * \
            jnp.eye(t.shape[0], dtype=K.dtype)
    if _use_pallas(structure, t):
        from gpyrn_tpu.ops.pallas_kernels import pallas_kernel_matrix
        return pallas_kernel_matrix(structure, jnp.asarray(params), t,
                                    nugget, 0.0)   # mult 0 ⇒ exact nugget
    r = t[:, None] - t[None, :]
    K = _k.evaluate(structure, params, r=r)
    return K + jnp.asarray(nugget, dtype=K.dtype) * \
        jnp.eye(t.shape[0], dtype=K.dtype)


def psd_jitter(S):
    """Per-matrix trace-scaled jitter for a batch of (nearly) PSD
    matrices (B, N, N): returns S + eps·tr(S)·I, a no-op at f64 scales
    and the f32 safety margin for posterior-covariance Choleskys."""
    eps = jnp.finfo(S.dtype).eps
    tr = jnp.trace(S, axis1=-2, axis2=-1)[..., None, None]
    return S + F32_JITTER_MULT * eps * tr * jnp.eye(S.shape[-1],
                                                    dtype=S.dtype)


def kernel_diag(structure, params, t, nugget=TRAIN_NUGGET):
    """diag(K(t, t)) + the same jitter ``kernel_matrix`` would add —
    WITHOUT materializing the N×N matrix (the registry is elementwise
    in the lag / coordinates, and the jitter's trace term is just the
    sum of this diagonal).  O(N) memory: what prediction variances and
    serving at large request sizes need."""
    t = jnp.asarray(t)
    if _k.is_nonstationary(structure):
        d = _k.evaluate(structure, params, r=jnp.zeros_like(t), t1=t, t2=t)
        d = jnp.broadcast_to(d, t.shape)
        if structure[0] in ("HP", "QHP", "POLY"):
            return d            # reference quirk: no nugget (see above)
    else:
        d = jnp.broadcast_to(
            _k.evaluate(structure, params, r=jnp.zeros_like(t)), t.shape)
    eps = jnp.finfo(d.dtype).eps
    jitter = jnp.maximum(jnp.asarray(nugget, dtype=d.dtype),
                         F32_JITTER_MULT * eps * jnp.sum(d))
    return d + jitter


def cross_kernel_matrix(structure, params, t_star, t):
    """Cross-covariance K(t*, t) (no nugget; reference meanfield.py:455-471)."""
    t_star = jnp.atleast_1d(jnp.asarray(t_star))
    t = jnp.asarray(t)
    if _k.is_nonstationary(structure):
        return _k.evaluate(structure, params,
                           r=t_star[:, None] - t[None, :],
                           t1=t_star[:, None], t2=t[None, :])
    r = t_star[:, None] - t[None, :]
    return _k.evaluate(structure, params, r=r)


def cholesky_nugget(K):
    """Lower Cholesky factor (the reference's `_cholNugget`,
    meanfield.py:70-89, is a plain cholesky with a vestigial name)."""
    return jnp.linalg.cholesky(K)


def chol_solve(L, b):
    """Solve K x = b given lower Cholesky factor L of K."""
    return _cho_solve((L, True), b)


def batched_chol(K):
    """Cholesky over a leading batch axis; ``jnp.linalg.cholesky`` batches
    natively and XLA maps it onto the MXU-friendly blocked algorithm."""
    return jnp.linalg.cholesky(K)


def batched_chol_solve(L, B):
    """cho_solve over a leading batch axis."""
    return vmap(lambda l, b: _cho_solve((l, True), b))(L, B)
