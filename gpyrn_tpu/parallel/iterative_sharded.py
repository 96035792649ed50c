"""Distributed matrix-free CG: kernel-matvec rows sharded over a mesh.

The single-chip matrix-free path (:mod:`gpyrn_tpu.ops.iterative`)
rebuilds K in row chunks — O(N·chunk) memory, O(N²) FLOPs per matvec.
Here the ROW dimension of that rebuild distributes over a mesh axis:
each device assembles and multiplies only its N/D-row slab of K, so
every matvec's O(N²) work divides by the device count while the CG
vectors stay replicated (an ``all_gather`` of the slab products is the
only collective per matvec, and all reductions run on replicated data
— the sharded solve is bitwise-deterministic given the slab sums).

This extends the N ≫ 20k matrix-free capability across chips the same
way :mod:`gpyrn_tpu.parallel.panel_fit` extends the dense path
(SURVEY.md §5.7/5.8); the reference package is single-process NumPy
throughout (meanfield.py:771,850) and has no counterpart.

Padding: N is padded to a multiple of the axis size with distant dummy
rows whose equations are set to the identity (unit diagonal, zero rhs,
masked matvec coupling), so any kernel — including non-decaying ones
(Periodic, Constant) — is handled exactly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from gpyrn_tpu.ops import kernels as _k
from gpyrn_tpu.parallel.mesh import DP_AXIS

__all__ = ["cg_solve_sharded"]


@functools.lru_cache(maxsize=32)
def _build(structure, mesh, axis_name, chunk, jacobi, nonstat,
           lowrank, refresh_every):
    n_dev = mesh.shape[axis_name]

    def inner(params, t_full, b_full, d_full, m_full, nugget, tol,
              maxiter, Uq, w, sqrt_h):
        Np = t_full.shape[0]
        Nl = Np // n_dev
        i = lax.axis_index(axis_name)
        t_loc = lax.dynamic_slice_in_dim(t_full, i * Nl, Nl)
        d_loc = lax.dynamic_slice_in_dim(d_full, i * Nl, Nl)
        m_loc = lax.dynamic_slice_in_dim(m_full, i * Nl, Nl)

        C = int(min(chunk, Nl))
        n_chunks = -(-Nl // C)
        t_loc_pad = jnp.pad(t_loc, (0, n_chunks * C - Nl),
                            constant_values=t_full[-1] + 1e6)

        def slab_mv(x_full):
            """(K[local rows, :] @ x_full) in C-row chunks; (Nl, k)."""
            def one(carry, kk):
                rows = lax.dynamic_slice_in_dim(t_loc_pad, kk * C, C)
                if nonstat:
                    Kb = _k.evaluate(structure, params,
                                     t1=rows[:, None],
                                     t2=t_full[None, :])
                else:
                    Kb = _k.evaluate(structure, params,
                                     r=rows[:, None] - t_full[None, :])
                return carry, Kb @ x_full
            _, parts = lax.scan(one, 0, jnp.arange(n_chunks))
            return parts.reshape(n_chunks * C, x_full.shape[1])[:Nl]

        def mv(p_full):
            # pad coupling masked on BOTH sides: pad columns never
            # contribute, pad rows reduce to the unit diagonal
            x = p_full * m_full[:, None]
            y_loc = slab_mv(x) * m_loc[:, None] \
                + (nugget * m_loc + d_loc)[:, None] \
                * lax.dynamic_slice_in_dim(p_full, i * Nl, Nl)
            return lax.all_gather(y_loc, axis_name, tiled=True)

        if lowrank:
            # low-rank split-form preconditioner on REPLICATED vectors
            # (ops/iterative.split_precond staged for shard_map: Uq, w,
            # sqrt_h precomputed outside — the apply is two m-GEMVs,
            # O(N·m) local work, no collective)
            def apply_precond(r):
                v = r / sqrt_h[:, None]
                v = v - Uq @ (w[:, None] * (Uq.T @ v))
                v = v - Uq @ (w[:, None] * (Uq.T @ v))
                return v / sqrt_h[:, None]
        else:
            if jacobi:
                z0 = jnp.zeros_like(t_loc)
                if nonstat:
                    dK = _k.evaluate(structure, params, r=z0, t1=t_loc,
                                     t2=t_loc)
                else:
                    dK = _k.evaluate(structure, params, r=z0)
                minv_loc = m_loc / (dK * m_loc + nugget * m_loc + d_loc)
                Minv = lax.all_gather(minv_loc, axis_name, tiled=True)
                Minv = Minv + (1.0 - m_full)     # pad rows: identity
            else:
                Minv = jnp.ones_like(m_full)

            def apply_precond(r):
                return r * Minv[:, None]

        x0 = jnp.zeros_like(b_full)
        r0 = b_full
        z0 = apply_precond(r0)
        rz0 = jnp.sum(r0 * z0, axis=0)
        bnorm = jnp.maximum(jnp.linalg.norm(b_full, axis=0), 1e-30)

        def cond(state):
            x, r, z, p, rz, it = state
            res = jnp.linalg.norm(r, axis=0) / bnorm
            return (jnp.max(res) > tol) & (it < maxiter)

        def body(state):
            x, r, z, p, rz, it = state
            Ap = mv(p)
            pAp = jnp.sum(p * Ap, axis=0)
            ok = (pAp > 0) & jnp.isfinite(pAp) & (rz > 0)
            alpha = jnp.where(ok, rz / jnp.where(ok, pAp, 1.0), 0.0)
            x = jnp.where(ok[None, :], x + alpha[None, :] * p, x)
            r = jnp.where(ok[None, :], r - alpha[None, :] * Ap, r)
            it = it + 1
            if refresh_every:
                # residual replacement, direction CONTINUED — see
                # ops/iterative.cg_solve (one extra distributed matvec
                # per refresh; the stop then acts on the honest b − A x)
                r = lax.cond(it % int(refresh_every) == 0,
                             lambda x_: b_full - mv(x_),
                             lambda x_: r, x)
            z = apply_precond(r)
            rz_new = jnp.sum(r * z, axis=0)
            beta = jnp.where(ok & (rz_new > 0) & jnp.isfinite(rz_new),
                             rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
            p = z + beta[None, :] * p
            return x, r, z, p, rz_new, it

        x, r, z, p, rz, it = lax.while_loop(
            cond, body, (x0, r0, z0, z0, rz0,
                         jnp.asarray(0, jnp.int32)))
        relres = jnp.max(jnp.linalg.norm(b_full - mv(x), axis=0)
                         / bnorm)
        return x, it, relres

    f = jax.shard_map(inner, mesh=mesh, axis_names={axis_name},
                      in_specs=P(), out_specs=(P(), P(), P()),
                      check_vma=False)
    return jax.jit(f)


def cg_solve_sharded(structure, params, t, b, mesh, d_add=None,
                     nugget=0.0, tol: float = 1e-6, maxiter: int = 200,
                     chunk: int = 1024, axis_name: str = DP_AXIS,
                     jacobi: bool = True, precond_rank: int = 0,
                     refresh_every: int = 0,
                     return_relres: bool = False):
    """Solve (K(t,t) + nugget·I + diag(d_add)) x = b over the mesh.

    Same contract as :func:`gpyrn_tpu.ops.iterative.cg_solve` with the
    kernel matvec's rows distributed over ``mesh``'s ``axis_name`` axis
    (per-matvec FLOPs divide by the axis size).  ``b`` may be (N,) or
    (N, k).  Preconditioning: Jacobi by default; ``precond_rank > 0``
    switches to the rank-m pivoted-Cholesky split-form preconditioner
    (:func:`gpyrn_tpu.ops.iterative.split_precond` semantics — the
    single-chip N=50k measurement is 200 stalled iterations → 5).  U is
    built once on the default device (O(N·m) memory, replicated into
    the solve); the per-iteration apply is two m-GEMVs of local work,
    so the distributed matvec stays the only collective.
    ``refresh_every``/``return_relres`` mirror
    :func:`gpyrn_tpu.ops.iterative.cg_solve`'s honesty controls (the
    f32 recursive residual drifts identically in the distributed
    solve; the true-residual recompute is one extra distributed
    matvec).  Returns ``(x, n_iters)`` as host arrays — plus the
    achieved true relative residual when ``return_relres``.
    """
    t = np.asarray(t)
    b = np.asarray(b)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    N = t.shape[0]
    n_dev = mesh.shape[axis_name]
    Np = -(-N // n_dev) * n_dev
    pad = Np - N
    dtype = jnp.asarray(t).dtype
    t_full = jnp.asarray(np.pad(t, (0, pad),
                                constant_values=t[-1] + 1e6), dtype)
    b_full = jnp.asarray(np.pad(b, ((0, pad), (0, 0))), dtype)
    m_full = jnp.asarray(np.pad(np.ones(N), (0, pad)), dtype)
    d = np.zeros(Np) if d_add is None else \
        np.pad(np.asarray(d_add, dtype=float), (0, pad))
    d_full = jnp.asarray(d, dtype) + (1.0 - m_full)   # pad diag = 1
    lowrank = int(precond_rank) > 0
    if lowrank:
        from gpyrn_tpu.ops.iterative import pivoted_cholesky
        from gpyrn_tpu.ops.linalg import TRAIN_NUGGET
        U, diag_res = pivoted_cholesky(structure,
                                       jnp.asarray(params, dtype),
                                       jnp.asarray(t, dtype),
                                       int(precond_rank), nugget=0.0)
        # pad rows: zero U rows + unit diagonal → M pad block = I
        U = jnp.pad(jnp.asarray(U, dtype), ((0, pad), (0, 0)))
        # h carries everything M must match beyond U Uᵀ: the pivoting's
        # remaining diagonal residual, the nugget, and d_add — floored
        # at TRAIN_NUGGET so h > 0 even for nugget=0, d_add=None (with
        # h = 0 the split form divides by sqrt_h = 0 and the NaN z
        # freezes every CG column into a silent x = 0 "solution")
        h_core = jnp.asarray(diag_res, dtype) + float(nugget) + \
            jnp.asarray(d[:N], dtype)
        h_core = jnp.maximum(h_core, jnp.asarray(TRAIN_NUGGET, dtype))
        h = jnp.pad(h_core, (0, pad), constant_values=1.0)
        sqrt_h = jnp.sqrt(h)
        Ut = U / sqrt_h[:, None]
        lam, Qe = jnp.linalg.eigh(Ut.T @ Ut)
        lam = jnp.maximum(lam, 0.0)
        w = jnp.where(lam > 1e-6,
                      (1.0 - 1.0 / jnp.sqrt(1.0 + lam))
                      / jnp.maximum(lam, 1e-30),
                      0.5 - 0.375 * lam)
        Uq = Ut @ Qe
    else:
        Uq = jnp.zeros((Np, 1), dtype)
        w = jnp.zeros((1,), dtype)
        sqrt_h = jnp.ones((Np,), dtype)
    run = _build(structure, mesh, axis_name, int(chunk), bool(jacobi),
                 bool(_k.is_nonstationary(structure)), lowrank,
                 int(refresh_every))
    x, it, relres = run(jnp.asarray(params, dtype), t_full, b_full,
                        d_full, m_full, jnp.asarray(nugget, dtype),
                        jnp.asarray(tol, dtype),
                        jnp.asarray(maxiter, jnp.int32), Uq, w, sqrt_h)
    x = np.asarray(x)[:N]
    out = (x[:, 0] if squeeze else x)
    if return_relres:
        return out, int(it), float(relres)
    return out, int(it)
