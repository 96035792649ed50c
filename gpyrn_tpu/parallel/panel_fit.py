"""Panel-distributed GPRN fit: the N axis sharded across the mesh.

Builds the mean-field coordinate-ascent fit of
:mod:`gpyrn_tpu.models.gprn` on top of the panel-sharded linear algebra
of :mod:`gpyrn_tpu.parallel.panel`: every N×N kernel matrix lives as
row slabs across the devices of one mesh axis, so per-device memory is
O(N²/D) and **multi-chip raises the N ceiling** instead of only
batching the (q × p) lattice (SURVEY.md §5.7's "sequence parallelism";
round-2 verdict item 3).

Three entry points (mirroring the single-chip lean engine semantics):

* ``fit_state_panel`` — updates-only fit (the f32/large-N path;
  semantics of ``Engine.fit_state_lean``: plain exact nugget, state
  delta stopping rule).  Any (q, p).
* ``elbo_refine_panel`` — fixed-sweep reference-semantics sweeps + ELBO
  at the final state (``Engine.elbo_refine_lean``).  Any (q, p): the
  q > 1 cumulative-sumSigmaF cross traces tr(K_j⁻¹Σ_k) stream as
  panel-distributed triangular inversions + Frobenius-norm solves
  (:func:`gpyrn_tpu.parallel.panel.panel_tri_inv_local` /
  :func:`~gpyrn_tpu.parallel.panel.panel_fro_cross_local`), and the
  raw-flatten weight-prior quirk re-pairs μᵀK⁻¹μ against the
  prefactored prior panels.
* ``elbo_fit_panel`` — full reference fit (rel-std(3) < 1e-3 ELBO
  stopping rule, per-sweep trace; ``Engine.elbo_fit_lean``).  Any
  (q, p).

The prior Choleskys L_K (and, for q > 1, the node inverses L_f⁻¹ with
diag(K⁻¹)) depend on θ only, so the ELBO paths factor them ONCE per
fit and carry them through the sweep loop — per sweep only the A =
K + D⁻¹ factorizations remain (the single-chip engine's `_prepare`
staging, models/gprn.py:916).

All small state (μ, diag Σ, data) is replicated; only the O(N²) matrix
work is distributed.  The whole fit — slab kernel assembly, distributed
Cholesky, solves, the Σ-free diag/trace reductions, and the stopping
rule — runs inside ONE ``jax.shard_map`` under ``jit``, so XLA overlaps
the per-step collectives with the trailing-update GEMMs.

Parity: the update map and every ELBO quirk (cumulative terms absent at
q = 1, raw-y likelihood, ÷q, exact nuggets, trace-scaled f32 jitter)
match the single-chip engine bit-for-bit in structure; equality is
enforced by tests/test_panel.py against ``fit_state``/``elbo_refine``
on an 8-device CPU mesh.

Reference context: the reference engine (meanfield.py:713-893) is
single-process NumPy; this module is the distributed capability the
TPU build adds on top of reference parity.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from gpyrn_tpu.ops import kernels as _k
from gpyrn_tpu.ops import means as means_mod
from gpyrn_tpu.ops.linalg import F32_JITTER_MULT, TRAIN_NUGGET
from gpyrn_tpu.models.gprn import GPRNSpec, unpack_parameters
from gpyrn_tpu.parallel.mesh import LAT_AXIS
from gpyrn_tpu.parallel.panel import (DEFAULT_BLOCK, PanelDims,
                                      panel_cholesky_local,
                                      panel_cho_solve_local,
                                      panel_diag_trace_local,
                                      panel_dims,
                                      panel_fro_cross_local,
                                      panel_logdet_half_local,
                                      panel_matvec_local,
                                      panel_tri_inv_local, slab_rows)

__all__ = ["PanelEngine", "make_panel_engine"]

# kernels the reference's _KMatrix returns WITHOUT a nugget when they
# are the top-level structure (meanfield.py:426-433); mirrored from
# ops/linalg.kernel_matrix
_NO_NUGGET = ("HP", "QHP", "POLY")


class PanelEngine(NamedTuple):
    """Jitted panel-distributed fit bundle for one model structure."""
    spec: GPRNSpec
    dims: PanelDims
    fit_state_panel: Callable    # (theta, t, y, yerr2, mu0, var0,
    #                             max_iter, tol) -> (mu, var, it, done)
    elbo_refine_panel: Callable  # (theta, t, y, yerr2, mu0, var0,
    #                             n_sweeps[static]) -> (elbo, mu, var)
    elbo_fit_panel: Callable     # (theta, t, y, yerr2, mu0, var0,
    #                             max_iter) -> (elbo, mu, var, it, done)


def make_panel_engine(spec: GPRNSpec, mesh: Mesh,
                      axis_name: str = LAT_AXIS,
                      block: int = DEFAULT_BLOCK,
                      core_maps=None) -> PanelEngine:
    """Build the panel-distributed fit for ``spec`` over ``mesh``'s
    ``axis_name`` axis (other mesh axes stay XLA-automatic)."""
    q, p, N = spec.q, spec.p, spec.N
    D = dict(zip(mesh.axis_names, mesh.devices.shape))[axis_name]
    dims = panel_dims(N, D, block)
    Np, Nl = dims.Np, dims.Nl
    qp = q * p

    node_maps = weight_maps = None
    if core_maps is not None:
        node_maps, weight_maps = core_maps

    def _core(params_list, maps):
        if maps is None:
            return params_list
        return [m(pp) if m is not None else pp
                for m, pp in zip(maps, params_list)]

    def _pad(v):
        return jnp.pad(jnp.asarray(v), (0, Np - N))

    # ---- slab kernel assembly (parity with ops/linalg) ----------------

    def _slab_kernel(structure, cp, t_pad, d_add, elbo_mode: bool):
        """This device's (Nl, Np) rows of K + jitter·I + diag(d_add),
        identity in the padded lanes.  ``elbo_mode`` selects the
        trace-scaled f32-safe jitter of `kernel_matrix`; otherwise the
        plain exact nugget of `kernel_matrix_plain`."""
        gr = slab_rows(dims, axis_name)
        cols = jnp.arange(Np)
        t_local = jnp.take(t_pad, gr)
        r = t_local[:, None] - t_pad[None, :]
        if _k.is_nonstationary(structure):
            K = _k.evaluate(structure, cp, r=r, t1=t_local[:, None],
                            t2=t_pad[None, :])
        else:
            K = _k.evaluate(structure, cp, r=r)
        eye = (gr[:, None] == cols[None, :]).astype(K.dtype)
        valid = (gr < N)[:, None] & (cols < N)[None, :]
        K = jnp.where(valid, K, eye)
        if structure[0] in _NO_NUGGET:
            jitter = jnp.zeros((), K.dtype)
        elif elbo_mode:
            eps = jnp.finfo(K.dtype).eps
            li = jnp.arange(Nl)
            dvals = jnp.where(gr < N, K[li, gr], 0.0)
            tr = lax.psum(jnp.sum(dvals), axis_name)
            jitter = jnp.maximum(jnp.asarray(TRAIN_NUGGET, K.dtype),
                                 F32_JITTER_MULT * eps * tr)
        else:
            jitter = jnp.asarray(TRAIN_NUGGET, K.dtype)
        add = jnp.where(gr < N, jitter + jnp.take(d_add, gr), 0.0)
        return K.at[jnp.arange(Nl), gr].add(add)

    # ---- per-GP panel updates ----------------------------------------

    def _gp_update(structure, cp, t_pad, d_add, pred):
        """Coordinate update for one GP (mirror of the single-chip
        `_gp_update_lean`): returns (Σ·pred, diag Σ) at true-N size."""
        A = _slab_kernel(structure, cp, t_pad, d_add, elbo_mode=False)
        gr = slab_rows(dims, axis_name)
        # K = A − diag(d_add) (reuse one assembly for both matrices)
        K = A.at[jnp.arange(Nl), gr].add(-jnp.take(d_add, gr))
        L = panel_cholesky_local(A, dims, axis_name)
        Krhs = panel_matvec_local(K, pred, dims, axis_name)
        t1 = panel_cho_solve_local(L, Krhs, dims, axis_name)
        sig_rhs = Krhs - panel_matvec_local(K, t1, dims, axis_name)
        dS, _ = panel_diag_trace_local(L, K, dims, axis_name)
        return sig_rhs[:N], dS[:N]

    def _prior_factors(theta, t_pad):
        """θ-only panel factors, computed ONCE per fit: each GP's prior
        Cholesky slab L_K + ½ log det K, and for q > 1 the node
        inverses G = L_f⁻¹ (row slabs) with diag(K_f⁻¹) for the
        cumulative cross traces (single-chip analog: `_prepare`'s
        L_all/Linv_nodes, models/gprn.py:916)."""
        node_p, weight_p, _, _ = unpack_parameters(spec, theta)
        node_c = _core(node_p, node_maps)
        weight_c = _core(weight_p, weight_maps)
        zeros = jnp.zeros(Np, t_pad.dtype)
        LKs, ldKhs, Gs, dKinvs = [], [], [], []
        for gi, (structs, cps) in enumerate(
                ((spec.node_structs, node_c),
                 (spec.weight_structs, weight_c))):
            for s, cp in zip(structs, cps):
                K = _slab_kernel(s, cp, t_pad, zeros, elbo_mode=True)
                L_K = panel_cholesky_local(K, dims, axis_name)
                LKs.append(L_K)
                ldKhs.append(panel_logdet_half_local(L_K, dims,
                                                     axis_name))
                if q > 1 and gi == 0:
                    G, dKinv = panel_tri_inv_local(L_K, dims, axis_name)
                    Gs.append(G)
                    dKinvs.append(dKinv)
        return (LKs, jnp.stack(ldKhs), Gs, dKinvs,
                node_c, weight_c)

    def _gp_free(structure, cp, t_pad, d_add, pred, L_K, keep_LA):
        """Update + ELBO ingredients for one GP (mirror of
        `_sweep_free_lean.gp_free`), against the prefactored prior
        ``L_K``; ``keep_LA`` also returns the A-factor slab (q > 1
        node cross traces need L_{A_k})."""
        K = _slab_kernel(structure, cp, t_pad, jnp.zeros(Np, t_pad.dtype),
                         elbo_mode=True)
        gr = slab_rows(dims, axis_name)
        A = K.at[jnp.arange(Nl), gr].add(
            jnp.where(gr < N, jnp.take(d_add, gr), 0.0))
        L_A = panel_cholesky_local(A, dims, axis_name)
        ldA = 2.0 * panel_logdet_half_local(L_A, dims, axis_name)
        Krhs = panel_matvec_local(K, pred, dims, axis_name)
        t1 = panel_cho_solve_local(L_A, Krhs, dims, axis_name)
        mu = Krhs - panel_matvec_local(K, t1, dims, axis_name)
        dS, cn = panel_diag_trace_local(L_A, K, dims, axis_name)
        alpha = panel_cho_solve_local(L_K, mu, dims, axis_name)
        muKmu = jnp.dot(mu, alpha)
        out = (mu[:N], dS[:N], cn[:N], ldA, muKmu)
        return out + ((L_A,) if keep_LA else ())

    # ---- sweep assembly (mirrors models/gprn lean sweeps) ------------

    def _mean_values(theta, t):
        _, _, mean_p, _ = unpack_parameters(spec, theta)
        rows = []
        for s, mp in zip(spec.mean_structs, mean_p):
            if s is None:
                rows.append(jnp.zeros(t.shape, dtype=t.dtype))
            else:
                rows.append(means_mod.evaluate(s, mp, t))
        return jnp.stack(rows)

    def _stage_inputs(y_c, variance, muF, muW, varW):
        dv = jnp.sum((muW * muW + varW) / variance[:, None, :], axis=0)
        total = jnp.einsum("pqn,qn->pn", muW, muF)
        resid = (y_c[None, :, :] - total[None, :, :] +
                 muW.transpose(1, 0, 2) * muF[:, None, :])
        pred = jnp.einsum("qpn,pqn->qn", resid,
                          muW / variance[:, None, :])
        return dv, pred

    def _weight_inputs(y_c, variance, muW, mu_f, dSf):
        dv2 = mu_f * mu_f + dSf
        ratio = (variance[None, :, :] /
                 dv2[:, None, :]).reshape(qp, N)
        total2 = jnp.einsum("pqn,qn->pn", muW, mu_f)
        resid2 = (y_c[None, :, :] - total2[None, :, :] +
                  muW.transpose(1, 0, 2) * mu_f[:, None, :])
        pred2 = (resid2 * mu_f[:, None, :] /
                 variance[None, :, :]).reshape(qp, N)
        return ratio, pred2

    def _sweep_updates(theta, t_pad, y_c, variance, muF, varF, muW, varW):
        node_p, weight_p, _, _ = unpack_parameters(spec, theta)
        node_c = _core(node_p, node_maps)
        weight_c = _core(weight_p, weight_maps)
        dv, pred = _stage_inputs(y_c, variance, muF, muW, varW)
        outs = [_gp_update(s, node_c[j], t_pad, _pad(1.0 / dv[j]),
                           _pad(pred[j]))
                for j, s in enumerate(spec.node_structs)]
        mu_f = jnp.stack([o[0] for o in outs])
        dSf = jnp.stack([o[1] for o in outs])

        ratio, pred2 = _weight_inputs(y_c, variance, muW, mu_f, dSf)
        outs = [_gp_update(s, weight_c[a], t_pad, _pad(ratio[a]),
                           _pad(pred2[a]))
                for a, s in enumerate(spec.weight_structs)]
        mu_w = jnp.stack([o[0] for o in outs]).reshape(q, p, N) \
            .transpose(1, 0, 2)
        dSw = jnp.stack([o[1] for o in outs]).reshape(q, p, N)
        return mu_f, dSf, mu_w, dSw.transpose(1, 0, 2)

    def _sweep_free(priors, t_pad, y_c, y_raw, variance,
                    muF, varF, muW, varW):
        """Reference-semantics sweep + ELBO, any (q, p), against the
        per-fit prior factors from `_prior_factors` (mirror of the
        single-chip `_sweep_free_lean`, models/gprn.py:619)."""
        LKs, ldKh, Gs, dKinvs, node_c, weight_c = priors

        dv, pred = _stage_inputs(y_c, variance, muF, muW, varW)
        inv_dv = 1.0 / dv
        n_out = [_gp_free(s, node_c[j], t_pad, _pad(inv_dv[j]),
                          _pad(pred[j]), LKs[j], keep_LA=q > 1)
                 for j, s in enumerate(spec.node_structs)]
        mu_f = jnp.stack([o[0] for o in n_out])
        dSf = jnp.stack([o[1] for o in n_out])
        cn_f = jnp.stack([o[2] for o in n_out])
        ldA_f = jnp.stack([o[3] for o in n_out])
        muKmu_f = jnp.stack([o[4] for o in n_out])

        ratio, pred2 = _weight_inputs(y_c, variance, muW, mu_f, dSf)
        w_out = [_gp_free(s, weight_c[a], t_pad, _pad(ratio[a]),
                          _pad(pred2[a]), LKs[q + a], keep_LA=False)
                 for a, s in enumerate(spec.weight_structs)]
        mu_w_flat = jnp.stack([o[0] for o in w_out])
        dSw = jnp.stack([o[1] for o in w_out])
        cn_w = jnp.stack([o[2] for o in w_out])
        ldA_w = jnp.stack([o[3] for o in w_out])
        muKmu_w = jnp.stack([o[4] for o in w_out])
        mu_w = mu_w_flat.reshape(q, p, N).transpose(1, 0, 2)
        dSw_qp = dSw.reshape(q, p, N)

        if q > 1:
            # reference quirk (meanfield.py:1021): weight means enter
            # the prior RAW-flattened (p,q,N)→(q·p,N), pairing row a
            # with weight GP a's prior kernel — recompute μᵀK⁻¹μ with
            # the scrambled partner against the prefactored panels
            muW_prior = mu_w.reshape(qp, N)
            muKmu_rows = []
            for a in range(qp):
                mp = _pad(muW_prior[a])
                alpha = panel_cho_solve_local(LKs[q + a], mp, dims,
                                              axis_name)
                muKmu_rows.append(jnp.dot(mp, alpha))
            muKmu_w = jnp.stack(muKmu_rows)

        # entropy: ½ Σ log det Σ via the determinant identity
        ldD_f = jnp.sum(jnp.log(dv), axis=1)
        ldD_w = -jnp.sum(jnp.log(ratio), axis=1)
        ldSig = (2.0 * ldKh - jnp.concatenate([ldA_f, ldA_w])
                 - jnp.concatenate([ldD_f, ldD_w]))
        ent = 0.5 * jnp.sum(ldSig) \
            + 0.5 * q * (p + 1) * N * (1 + jnp.log(2 * jnp.pi))

        # expected log prior; node j's trace term uses the CUMULATIVE
        # sum of sigma_f over nodes <= j (reference meanfield.py:1039):
        # cross terms tr(K_j⁻¹Σ_k) = Σ diag(K_j⁻¹)·inv_dv_k −
        # ‖L_{A_k}⁻¹ D_k⁻¹ L_j⁻ᵀ‖²_F, streamed panel-distributed
        tr_f_rows = [jnp.sum(cn_f[j] * dv[j]) for j in range(q)]
        if q > 1:
            L_Af = [o[5] for o in n_out]
            for j in range(1, q):
                for k in range(j):
                    term1 = jnp.dot(dKinvs[j][:N], inv_dv[k])
                    term2 = panel_fro_cross_local(
                        L_Af[k], Gs[j], _pad(inv_dv[k]), dims,
                        axis_name)
                    tr_f_rows[j] = tr_f_rows[j] + term1 - term2
        tr_f = jnp.stack(tr_f_rows)
        tr_w = jnp.sum(cn_w / ratio, axis=1)
        muKmu_all = jnp.concatenate([muKmu_f, muKmu_w])
        tr_all = jnp.concatenate([tr_f, tr_w])
        logp = jnp.sum(-ldKh - 0.5 * (muKmu_all + tr_all)) \
            - 0.5 * N * q * (p + 1) * jnp.log(2 * jnp.pi)

        # expected log likelihood (raw-y quirk, meanfield.py:940)
        logl = -0.5 * jnp.sum(jnp.log(2 * jnp.pi * variance))
        omega_nu = jnp.einsum("pqn,qn->pn", mu_w, mu_f)
        res = y_raw - omega_nu
        logl = logl - 0.5 * jnp.sum(res * res / variance)
        quad = (dSf[:, None, :] * (mu_w.transpose(1, 0, 2) ** 2) +
                dSw_qp * (mu_f[:, None, :] ** 2) +
                dSf[:, None, :] * dSw_qp) / variance[None, :, :]
        logl = logl - 0.5 * jnp.sum(quad)

        elbo = (logl + logp + ent) / q
        return elbo, mu_f, dSf, mu_w, dSw_qp.transpose(1, 0, 2)

    # ---- state plumbing ----------------------------------------------

    def _u_split(u):
        muF = u[:q * N].reshape(q, N)
        muW = u[q * N:].reshape(p, q, N)
        return muF, muW

    def _prepare(theta, t, y, yerr2):
        _, _, _, jitters = unpack_parameters(spec, theta)
        m = _mean_values(theta, t)
        y_raw = jnp.asarray(y)
        y_c = y_raw - m
        variance = jitters[:, None] ** 2 + jnp.asarray(yerr2)
        return y_c, y_raw, variance

    # ---- shard_map inner bodies --------------------------------------

    def _fit_state_inner(theta, t_pad, y_c, variance, muF0, varF0,
                         muW0, varW0, max_iter, tol):
        def body(state):
            muF, varF, muW, varW, _, it, done = state
            mu_f, varf, mu_w, varw = _sweep_updates(
                theta, t_pad, y_c, variance, muF, varF, muW, varW)
            scale = 1.0 + jnp.maximum(jnp.max(jnp.abs(mu_f)),
                                      jnp.max(jnp.abs(mu_w)))
            delta = jnp.maximum(jnp.max(jnp.abs(mu_f - muF)),
                                jnp.max(jnp.abs(mu_w - muW))) / scale
            it = it + 1
            done = delta < tol
            return mu_f, varf, mu_w, varw, delta, it, done

        def cond(state):
            *_, it, done = state
            return (~done) & (it < max_iter)

        init = (muF0, varF0, muW0, varW0,
                jnp.array(jnp.inf, muF0.dtype),
                jnp.array(0, jnp.int32), jnp.array(False))
        muF, varF, muW, varW, _, it, done = lax.while_loop(
            cond, body, init)
        return muF, varF, muW, varW, it, done

    def _refine_inner(theta, t_pad, y_c, y_raw, variance,
                      muF0, varF0, muW0, varW0, n_sweeps):
        priors = _prior_factors(theta, t_pad)

        def step(carry, _):
            muF, varF, muW, varW = carry
            elbo, mu_f, varf, mu_w, varw = _sweep_free(
                priors, t_pad, y_c, y_raw, variance, muF, varF,
                muW, varW)
            return (mu_f, varf, mu_w, varw), elbo

        (muF, varF, muW, varW), elbos = lax.scan(
            step, (muF0, varF0, muW0, varW0), None, length=n_sweeps)
        return elbos[-1], muF, varF, muW, varW

    def _elbo_fit_inner(theta, t_pad, y_c, y_raw, variance,
                        muF0, varF0, muW0, varW0, max_iter):
        priors = _prior_factors(theta, t_pad)

        def body(state):
            muF, varF, muW, varW, _, hist, it, done = state
            elbo, mu_f, varf, mu_w, varw = _sweep_free(
                priors, t_pad, y_c, y_raw, variance, muF, varF,
                muW, varW)
            hist = jnp.concatenate([hist[1:], jnp.array([elbo])])
            it = it + 1
            crit = jnp.abs(jnp.std(hist) / jnp.mean(hist))
            done = (it > 3) & (crit < 1e-3) & (crit != 0)
            return mu_f, varf, mu_w, varw, elbo, hist, it, done

        def cond(state):
            *_, it, done = state
            return (~done) & (it < max_iter)

        init = (muF0, varF0, muW0, varW0, jnp.array(0.0, muF0.dtype),
                jnp.full(3, jnp.inf, dtype=muF0.dtype),
                jnp.array(0, jnp.int32), jnp.array(False))
        muF, varF, muW, varW, elbo, _, it, done = lax.while_loop(
            cond, body, init)
        return elbo, muF, varF, muW, varW, it, done

    def _smap(f, n_out):
        return jax.shard_map(f, mesh=mesh, axis_names={axis_name},
                             in_specs=P(), out_specs=(P(),) * n_out,
                             check_vma=False)

    # ---- public jitted entry points ----------------------------------

    @jax.jit
    def fit_state_panel(theta, t, y, yerr2, mu0, var0, max_iter, tol):
        theta = jnp.asarray(theta)
        t_pad = _pad(jnp.asarray(t))
        y_c, _, variance = _prepare(theta, t, y, yerr2)
        muF0, muW0 = _u_split(jnp.asarray(mu0).ravel())
        varF0, varW0 = _u_split(jnp.asarray(var0).ravel())
        muF, varF, muW, varW, it, done = _smap(_fit_state_inner, 6)(
            theta, t_pad, y_c, variance, muF0, varF0, muW0, varW0,
            jnp.asarray(max_iter), jnp.asarray(tol, muF0.dtype))
        mu = jnp.concatenate([muF.ravel(), muW.ravel()])
        var = jnp.concatenate([varF.ravel(), varW.ravel()])
        return mu, var, it, done

    @partial(jax.jit, static_argnums=(6,))
    def elbo_refine_panel(theta, t, y, yerr2, mu0, var0, n_sweeps):
        theta = jnp.asarray(theta)
        t_pad = _pad(jnp.asarray(t))
        y_c, y_raw, variance = _prepare(theta, t, y, yerr2)
        muF0, muW0 = _u_split(jnp.asarray(mu0).ravel())
        varF0, varW0 = _u_split(jnp.asarray(var0).ravel())
        inner = partial(_refine_inner, n_sweeps=n_sweeps)
        elbo, muF, varF, muW, varW = _smap(inner, 5)(
            theta, t_pad, y_c, y_raw, variance, muF0, varF0, muW0, varW0)
        mu = jnp.concatenate([muF.ravel(), muW.ravel()])
        var = jnp.concatenate([varF.ravel(), varW.ravel()])
        return elbo, mu, var

    @jax.jit
    def elbo_fit_panel(theta, t, y, yerr2, mu0, var0, max_iter=10000):
        theta = jnp.asarray(theta)
        t_pad = _pad(jnp.asarray(t))
        y_c, y_raw, variance = _prepare(theta, t, y, yerr2)
        muF0, muW0 = _u_split(jnp.asarray(mu0).ravel())
        varF0, varW0 = _u_split(jnp.asarray(var0).ravel())
        elbo, muF, varF, muW, varW, it, done = _smap(_elbo_fit_inner, 7)(
            theta, t_pad, y_c, y_raw, variance, muF0, varF0, muW0,
            varW0, jnp.asarray(max_iter))
        mu = jnp.concatenate([muF.ravel(), muW.ravel()])
        var = jnp.concatenate([varF.ravel(), varW.ravel()])
        return elbo, mu, var, it, done

    return PanelEngine(spec=spec, dims=dims,
                       fit_state_panel=fit_state_panel,
                       elbo_refine_panel=elbo_refine_panel,
                       elbo_fit_panel=elbo_fit_panel)
