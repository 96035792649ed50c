"""On-chip exact-parity ELBO refine: blocked df64 coordinate-ascent.

The df64 analog of the engine's ``elbo_refine`` (models/gprn.py): a few
coordinate-ascent sweeps (eqs. 16-19 of Nguyen & Bonilla 2013) plus the
full reference-convention ELBO terms, computed end to end in
double-single arithmetic whose O(N³) FLOPs ride the MXU
(:mod:`gpyrn_tpu.ops.df64_blocked` / ``df64_gemm``).  This closes the
mixed-precision pipeline entirely on f32 hardware:

    f32 ``fit_state`` (exact nugget → true fixed point, fast)
    → df64 refine sweeps + ELBO terms (this module)
    → reference-grade (≲1e-8 relative) ELBO, no float64 ops anywhere.

It replaces the round-1 stopgap of routing the f64 polish to a CPU
device, and subsumes :mod:`gpyrn_tpu.models.exact` (host-driven,
unblocked, practical only to N≈500) — here the O(N³) work is jitted and
blocked, usable at N in the thousands.

Math: identical update dataflow to the engine's ``_sweep``
(pre-sweep muW for the node stage, fresh mu_f for the weight stage),
with every Σ-dependent ELBO quantity obtained through determinant /
trace identities on the WELL-conditioned A = K + D⁻¹ instead of
materializing Σ = K − K A⁻¹ K (with B = L_A⁻¹ K):

    diag Σ     = diag K − column-norms²(B)
    Σ·r        = K r − K L_A⁻ᵀ (B r)
    log det Σ  = log det K − log det A − log det D
    tr(K⁻¹ Σ)  = tr(A⁻¹ D⁻¹) = Σ_j d_j · column-norm²_j(L_Aᵀ − B)
                 (since L_A⁻¹ D⁻¹ = L_Aᵀ − B exactly)

so each sweep costs two blocked Choleskys and four blocked triangular
solves, and the term evaluation adds only vector solves (plus the q>1
cross-trace solves).  The engine is split into three separately-jitted
stages (prepare / sweep / terms) — intermediate arrays stay on device,
XLA compiles each stage once per model structure, and the sweep count
is a plain Python loop (no recompilation for different counts).

The reference's quirks are reproduced exactly: the cumulative
``sumSigmaF`` node traces (/root/reference/gpyrn/meanfield.py:1039,
via df64 cross-trace solves), the raw (p,q,N)→(q·p,N) weight-mean
flatten in the prior (:1021), the raw-y likelihood quadratic (:940) and
the ÷q ELBO scaling (:709).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from gpyrn_tpu.ops.df64 import DF, df_add, df_div, df_mul, df_neg, df_sub, \
    df_sum
from gpyrn_tpu.ops.df64_blocked import (DEFAULT_BLOCK, CholFactors,
                                        df_cholesky_blocked,
                                        df_logdet_blocked,
                                        df_tri_solve_blocked,
                                        df_tri_solve_t_blocked)
from gpyrn_tpu.ops.df64_gemm import df64_matvec
from gpyrn_tpu.ops.df64_kernels import (_c, _evaluate, df_nonstationary,
                                        df_supported)
from gpyrn_tpu.ops.df64_math import df_log
from gpyrn_tpu.ops.linalg import TRAIN_NUGGET

__all__ = ["make_exact_engine", "refine_exact", "exact_refine_supported"]


# -- small DF array helpers -------------------------------------------------

def _t(a: DF, axes) -> DF:
    return DF(jnp.transpose(a.hi, axes), jnp.transpose(a.lo, axes))


def _mT(a: DF) -> DF:
    return DF(jnp.swapaxes(a.hi, -1, -2), jnp.swapaxes(a.lo, -1, -2))


def _reshape(a: DF, shape) -> DF:
    return DF(a.hi.reshape(shape), a.lo.reshape(shape))


def _stack(dfs) -> DF:
    return DF(jnp.stack([d.hi for d in dfs]), jnp.stack([d.lo for d in dfs]))


def _concat(dfs, axis=0) -> DF:
    return DF(jnp.concatenate([d.hi for d in dfs], axis),
              jnp.concatenate([d.lo for d in dfs], axis))


def _expand(a: DF, axis) -> DF:
    return DF(jnp.expand_dims(a.hi, axis), jnp.expand_dims(a.lo, axis))


def _diag_part(a: DF) -> DF:
    return DF(jnp.diagonal(a.hi, axis1=-2, axis2=-1),
              jnp.diagonal(a.lo, axis1=-2, axis2=-1))


def _add_diag(K: DF, d: DF) -> DF:
    """K + diag(d) over a leading batch axis: K (b,N,N), d (b,N)."""
    eye = jnp.eye(K.hi.shape[-1], dtype=K.hi.dtype)
    return df_add(K, DF(d.hi[..., None, :] * eye, d.lo[..., None, :] * eye))


def _recip(a: DF) -> DF:
    one = DF(jnp.ones_like(a.hi), jnp.zeros_like(a.lo))
    return df_div(one, a)


def _half(a: DF) -> DF:
    return DF(0.5 * a.hi, 0.5 * a.lo)


def _scalar(a: DF, i) -> DF:
    return DF(a.hi[i], a.lo[i])


def _split64(x) -> DF:
    """Host float64 → DF (alias of ops.df64.from_f64 — ONE split
    implementation package-wide)."""
    from gpyrn_tpu.ops.df64 import from_f64
    return from_f64(x)


def _join64(a: DF) -> np.ndarray:
    from gpyrn_tpu.ops.df64 import to_f64
    return to_f64(a)


def _factors(L: DF, Linvs: DF, n: int, block: int) -> CholFactors:
    """Rebuild CholFactors across a jit boundary (n/block are static)."""
    return CholFactors(L=L, Linvs=Linvs, n=n, block=block)


def _lid_colnorms(L: DF, B_mat: DF, n: int, chunk: int = 512) -> DF:
    """Column norms² of (Lᵀ − B) per batch element, column-chunked:
    returns DF (b, n).  L may be padded (slices to n×n); B is (b,n,n)."""
    import jax.numpy as _jnp
    from jax import lax as _lax
    b = B_mat.hi.shape[0]
    n_chunks = -(-n // min(chunk, n))
    C = -(-n // n_chunks)       # minimal padding (zero when C | n)
    Np = n_chunks * C
    padL = ((0, 0), (0, max(0, Np - L.hi.shape[1])),
            (0, max(0, Np - L.hi.shape[2])))
    Lh = _jnp.pad(L.hi, padL)[:, :Np, :Np]
    Ll = _jnp.pad(L.lo, padL)[:, :Np, :Np]
    padB = ((0, 0), (0, Np - n), (0, Np - n))
    Bh = _jnp.pad(B_mat.hi, padB)
    Bl = _jnp.pad(B_mat.lo, padB)

    def chunk_fn(carry, k):
        j0 = k * C
        # col j of (Lᵀ − B) = L[j, :]ᵀ − B[:, j]
        Lrows = DF(_lax.dynamic_slice(Lh, (0, j0, 0), (b, C, Np)),
                   _lax.dynamic_slice(Ll, (0, j0, 0), (b, C, Np)))
        Bcols = DF(_lax.dynamic_slice(Bh, (0, 0, j0), (b, Np, C)),
                   _lax.dynamic_slice(Bl, (0, 0, j0), (b, Np, C)))
        M = df_sub(DF(_jnp.swapaxes(Lrows.hi, 1, 2),
                      _jnp.swapaxes(Lrows.lo, 1, 2)), Bcols)
        return carry, df_sum(df_mul(M, M), axis=-2)   # DF (b, C)

    _, parts = _lax.scan(chunk_fn, 0, _jnp.arange(n_chunks))
    out = DF(_jnp.moveaxis(parts.hi, 0, 1).reshape(b, Np),
             _jnp.moveaxis(parts.lo, 0, 1).reshape(b, Np))
    return DF(out.hi[:, :n], out.lo[:, :n])


def _factor_slice(F: CholFactors, k) -> CholFactors:
    """Single-matrix view of a batched CholFactors (batch element k)."""
    return CholFactors(
        L=DF(F.L.hi[k:k + 1], F.L.lo[k:k + 1]),
        Linvs=DF(F.Linvs.hi[:, k:k + 1], F.Linvs.lo[:, k:k + 1]),
        n=F.n, block=F.block)


# -- engine -----------------------------------------------------------------

class ExactEngine(NamedTuple):
    """Jitted df64 stage functions for one model structure (see
    :func:`make_exact_engine`); drive them with :func:`refine_exact` or
    the ``refine`` convenience method."""
    spec: object
    prepare: object      # (theta, t) -> (Kf, Kw, FK_L, FK_Linvs,
    #                                     logdetK, Linv_nodes)
    sweep_node: object   # node half-sweep (separate jit: program
    sweep_weight: object  # buffer plans stay small at large N)
    terms: object        # (... aux ...) -> elbo DF scalar
    block: int

    def refine(self, theta, t, y_c, y_raw, variance, mu0, var0,
               n_sweeps=3):
        """Run ``n_sweeps`` df64 sweeps from (mu0, var0) and evaluate
        the reference-convention ELBO at the final state.  All args are
        DF pairs; returns (elbo DF scalar, mu DF, var DF)."""
        Kf, Kw, *prep_tail = self.prepare(theta, t)
        q, p, N = self.spec.q, self.spec.p, self.spec.N
        muF = _reshape(DF(mu0.hi[:q * N], mu0.lo[:q * N]), (q, N))
        muW = _reshape(DF(mu0.hi[q * N:], mu0.lo[q * N:]), (p, q, N))
        varF = _reshape(DF(var0.hi[:q * N], var0.lo[:q * N]), (q, N))
        varW = _reshape(DF(var0.hi[q * N:], var0.lo[q * N:]), (p, q, N))
        node_aux = weight_aux = None
        for _ in range(max(1, int(n_sweeps))):
            (mu_f, dSf, Af_L, Af_Li, ldA_f, cn_f,
             dv, inv_dv) = self.sweep_node(
                Kf, y_c, variance, muF, varF, muW, varW)
            mu_w, dSw_qp, ldA_w, cn_w, ratio = self.sweep_weight(
                Kw, y_c, variance, muW, mu_f, dSf)
            muF, varF = mu_f, dSf
            muW, varW = mu_w, _t(dSw_qp, (1, 0, 2))
            node_aux = (Af_L, Af_Li, ldA_f, cn_f, dv, inv_dv)
            weight_aux = (ldA_w, cn_w, ratio, dSw_qp)
        del Kf, Kw       # free the kernel lattice before the terms stage
        aux = node_aux + weight_aux + (dSf,)
        elbo = self.terms(tuple(prep_tail), y_raw, variance,
                          (mu_f, mu_w), aux)
        mu = _concat([_reshape(mu_f, (-1,)), _reshape(mu_w, (-1,))])
        var = _concat([_reshape(dSf, (-1,)), _reshape(varW, (-1,))])
        return elbo, mu, var


def exact_refine_supported(spec) -> bool:
    """True when every kernel in the model has a df64 assembly rule."""
    return all(df_supported(s)
               for s in tuple(spec.node_structs) + tuple(spec.weight_structs))


@functools.lru_cache(maxsize=64)
def make_exact_engine(spec, block: int = DEFAULT_BLOCK) -> ExactEngine:
    """Build the jitted df64 stage functions for a model structure.

    ``spec`` is a :class:`gpyrn_tpu.models.gprn.GPRNSpec`.  The bound
    ``refine`` runs coordinate-ascent sweeps from a given variational
    state and evaluates the full reference-convention ELBO at the final
    (post-sweep) state — the same contract as the engine's
    ``elbo_refine`` (models/gprn.py), at double-single accuracy on f32
    hardware."""
    if not exact_refine_supported(spec):
        raise ValueError("model has kernels without df64 assembly rules; "
                         "use the f64 elbo_refine path")
    q, p, N = spec.q, spec.p, spec.N
    qp = q * p
    b_all = q * (p + 1)
    nug = _c(TRAIN_NUGGET)
    # block geometry must match across the stage boundary
    B = min(block, max(8, N))
    nb = -(-N // B)

    def _unpack(theta: DF):
        pos = 0
        groups = []
        for counts in (spec.n_node_pars, spec.n_weight_pars):
            out = []
            for n in counts:
                out.append([DF(theta.hi[pos + k], theta.lo[pos + k])
                            for k in range(n)])
                pos += n
            groups.append(out)
        return groups[0], groups[1]

    def prepare(theta: DF, t: DF):
        """Assemble the kernel lattice in df64, factor the priors, and
        precompute per-refine constants."""
        node_p, weight_p = _unpack(theta)
        t1 = DF(t.hi[:, None], t.lo[:, None])
        t2 = DF(t.hi[None, :], t.lo[None, :])
        r = df_sub(t1, t2)
        eye = jnp.eye(N, dtype=jnp.float32)
        nugI = DF(nug.hi * eye, nug.lo * eye)

        def kmat(s, pars):
            grids = (t1, t2) if df_nonstationary(s) else (None, None)
            K = _evaluate(s, pars, r, *grids)
            if s[0] in ("HP", "QHP", "POLY"):
                # reference quirk: no nugget for top-level HP/QHP/POLY
                # (meanfield.py:426-433; matches ops/linalg.kernel_matrix)
                return K
            return df_add(K, nugI)

        Kf = _stack([kmat(s, pp)
                     for s, pp in zip(spec.node_structs, node_p)])
        Kw = _stack([kmat(s, pp)
                     for s, pp in zip(spec.weight_structs, weight_p)])
        F_K = df_cholesky_blocked(_concat([Kf, Kw]), block)
        logdetK = df_logdet_blocked(F_K)                     # (b_all,)
        if q > 1:
            # L_j⁻¹ for the prior node factors (cross-trace quirk)
            I_q = DF(jnp.broadcast_to(eye, (q, N, N)),
                     jnp.zeros((q, N, N), jnp.float32))
            F_Kf = CholFactors(L=DF(F_K.L.hi[:q], F_K.L.lo[:q]),
                               Linvs=DF(F_K.Linvs.hi[:, :q],
                                        F_K.Linvs.lo[:, :q]),
                               n=F_K.n, block=F_K.block)
            Linv_nodes = df_tri_solve_blocked(F_Kf, I_q)     # (q,N,N)
        else:
            Linv_nodes = DF(jnp.zeros((1, 1, 1), jnp.float32),
                            jnp.zeros((1, 1, 1), jnp.float32))
        return Kf, Kw, F_K.L, F_K.Linvs, logdetK, Linv_nodes

    def _apply_sigma(F_A: CholFactors, K: DF, B_mat: DF, pred: DF):
        """(Σ @ pred, diag Σ) for Σ = K − K A⁻¹ K given the chol factors
        of A and B = L_A⁻¹ K: Σ r = K r − K L_A⁻ᵀ (B r), so only one
        (transposed) vector solve is needed."""
        Krhs = df64_matvec(K, pred)                          # (b, N)
        Bp = df64_matvec(B_mat, pred)                        # (b, N)
        t1 = df_tri_solve_t_blocked(F_A, _expand(Bp, -1))
        mu = df_sub(Krhs, df64_matvec(K, DF(t1.hi[..., 0], t1.lo[..., 0])))
        quad = df_sum(df_mul(B_mat, B_mat), axis=-2)         # col norms²
        dS = df_sub(_diag_part(K), quad)
        return mu, dS

    def sweep_node(Kf, y_c, variance, muF, varF, muW, varW):
        """Node half of a coordinate-ascent sweep (engine
        ``_sweep_updates`` in df64).  A separate jit from the weight
        half so each program's static buffer plan stays small —
        the fused sweep RESOURCE_EXHAUSTED the chip at N=5000."""
        var_b = _expand(variance, 1)                         # (p,1,N)
        dv = df_sum(df_div(df_add(df_mul(muW, muW), varW), var_b),
                    axis=0)                                  # (q,N)
        inv_dv = _recip(dv)
        F_Af = df_cholesky_blocked(_add_diag(Kf, inv_dv), block)
        Bf = df_tri_solve_blocked(F_Af, Kf)                  # (q,N,N)

        muF_b = _expand(muF, 0)                              # (1,q,N)
        total = df_sum(df_mul(muW, muF_b), axis=1)           # (p,N)
        muW_t = _t(muW, (1, 0, 2))                           # (q,p,N)
        resid = df_add(df_sub(_expand(y_c, 0), _expand(total, 0)),
                       df_mul(muW_t, _expand(muF, 1)))       # (q,p,N)
        mw_v = _t(df_div(muW, var_b), (1, 0, 2))             # (q,p,N)
        pred = df_sum(df_mul(resid, mw_v), axis=1)           # (q,N)
        mu_f, dSf = _apply_sigma(F_Af, Kf, Bf, pred)
        # reduce the factors to what the terms stage needs (logdet +
        # trace column-norms) so the N×N solve product is freed here;
        # the factors themselves are kept only for q>1 cross-traces
        ldA_f = df_logdet_blocked(F_Af)                      # (q,)
        cn_f = _lid_colnorms(F_Af.L, Bf, N)                  # (q,N)
        return mu_f, dSf, F_Af.L, F_Af.Linvs, ldA_f, cn_f, dv, inv_dv

    def sweep_weight(Kw, y_c, variance, muW, mu_f, dSf):
        """Weight half of a sweep (uses the fresh mu_f, dSf).  The
        q·p weight GPs are processed ONE at a time — same shapes, so
        XLA reuses the factorization workspace across them and the
        program's peak stays ~independent of the lattice size."""
        dv2 = df_add(df_mul(mu_f, mu_f), dSf)                # (q,N)
        ratio = _reshape(df_div(_expand(variance, 0),
                                _expand(dv2, 1)), (qp, N))   # (q·p,N)
        muf_b = _expand(mu_f, 0)                             # (1,q,N)
        muW_t = _t(muW, (1, 0, 2))                           # (q,p,N)
        total2 = df_sum(df_mul(muW, muf_b), axis=1)          # (p,N)
        resid2 = df_add(df_sub(_expand(y_c, 0), _expand(total2, 0)),
                        df_mul(muW_t, _expand(mu_f, 1)))     # (q,p,N)
        pred2 = _reshape(df_div(df_mul(resid2, _expand(mu_f, 1)),
                                _expand(variance, 0)), (qp, N))

        mus, dSs, lds, cns = [], [], [], []
        for a in range(qp):
            Kw_a = DF(Kw.hi[a:a + 1], Kw.lo[a:a + 1])
            r_a = DF(ratio.hi[a:a + 1], ratio.lo[a:a + 1])
            F_a = df_cholesky_blocked(_add_diag(Kw_a, r_a), block)
            B_a = df_tri_solve_blocked(F_a, Kw_a)            # (1,N,N)
            p_a = DF(pred2.hi[a:a + 1], pred2.lo[a:a + 1])
            m_a, dS_a = _apply_sigma(F_a, Kw_a, B_a, p_a)
            mus.append(m_a)
            dSs.append(dS_a)
            # reduce factor+solve to the terms-stage scalars/vectors so
            # no N×N array survives this GP's iteration
            lds.append(df_logdet_blocked(F_a))
            cns.append(_lid_colnorms(F_a.L, B_a, N))
        mu_w_flat = _concat(mus)
        dSw = _concat(dSs)
        ldA_w = _concat(lds)                                 # (qp,)
        cn_w = _concat(cns)                                  # (qp,N)
        mu_w = _t(_reshape(mu_w_flat, (q, p, N)), (1, 0, 2))  # (p,q,N)
        dSw_qp = _reshape(dSw, (q, p, N))
        return mu_w, dSw_qp, ldA_w, cn_w, ratio

    def terms(prep, y_raw, variance, state, aux):
        """Reference-convention ELBO at the post-sweep state (engine
        ``_sweep``'s entropy / log-prior / log-likelihood,
        meanfield.py:895-1093) via determinant/trace identities."""
        FK_L, FK_Linvs, logdetK, Linv_nodes = prep
        mu_f, mu_w = state
        (Af_L, Af_Li, ldA_f, cn_f, dv, inv_dv,
         ldA_w, cn_w, ratio, dSw_qp, dSf) = aux
        F_K = _factors(FK_L, FK_Linvs, N, B)
        F_Af = _factors(Af_L, Af_Li, N, B)

        # log det D elementwise (log det A arrived from the sweeps)
        ldD_f = df_sum(df_log(dv), axis=-1)                  # (q,)
        # D_w = diag(1/ratio) ⇒ log det D_w = −Σ log ratio
        ldD_w = df_neg(df_sum(df_log(ratio), axis=-1))       # (qp,)

        ldK_f = DF(logdetK.hi[:q], logdetK.lo[:q])
        ldK_w = DF(logdetK.hi[q:], logdetK.lo[q:])
        # log det Σ = log det K − log det A − log det D
        ldSig_f = df_sub(df_sub(ldK_f, ldA_f), ldD_f)
        ldSig_w = df_sub(df_sub(ldK_w, ldA_w), ldD_w)

        # -- entropy (meanfield.py:1069-1093) --
        ent = df_add(df_sum(ldSig_f, axis=0), df_sum(ldSig_w, axis=0))
        ent = _half(ent)
        c_ent = 0.5 * q * (p + 1) * N * (1.0 + float(np.log(2 * np.pi)))
        ent = df_add(ent, _c(c_ent))

        # -- expected log prior (meanfield.py:992-1067) --
        # quirk: weight means enter as the RAW (p,q,N) → (q·p,N) flatten
        mu_all = _concat([mu_f, _reshape(mu_w, (qp, N))])    # (b,N)
        w = df_tri_solve_blocked(F_K, _expand(mu_all, -1))
        w = DF(w.hi[..., 0], w.lo[..., 0])
        muKmu = df_sum(df_mul(w, w), axis=-1)                # (b_all,)

        # same-index traces tr(K⁻¹Σ) = tr(A⁻¹D⁻¹) = Σ_j d_j·‖(L_Aᵀ−B)_:j‖²
        # (exact identity L_A⁻¹D⁻¹ = L_Aᵀ − B); the column norms were
        # computed inside the sweeps while L and B were live
        tr_f_same = df_sum(df_mul(cn_f, dv), axis=-1)        # (q,)
        tr_w = df_sum(df_mul(cn_w, _recip(ratio)), axis=-1)  # (qp,)

        # cumulative-sumSigmaF quirk (meanfield.py:1039): node j's trace
        # adds tr(K_j⁻¹ Σ_k) for k < j, via the Woodbury cross-trace
        # Σ_k = D_k⁻¹ − D_k⁻¹ A_k⁻¹ D_k⁻¹ (all solves through the
        # well-conditioned A_k; cf. models/exact.py::_cross_trace)
        tr_f_parts = [_scalar(tr_f_same, j) for j in range(q)]
        if q > 1:
            diag_Kinv = df_sum(df_mul(Linv_nodes, Linv_nodes),
                               axis=-2)                      # (q,N)
            for j in range(1, q):
                Lj = DF(Linv_nodes.hi[j], Linv_nodes.lo[j])  # (N,N)
                for k in range(j):
                    dk = _scalar(inv_dv, k)                  # (N,)
                    term1 = df_sum(df_mul(_scalar(diag_Kinv, j), dk),
                                   axis=-1)
                    T = df_mul(Lj, DF(dk.hi[None, :], dk.lo[None, :]))
                    W = df_tri_solve_blocked(
                        _factor_slice(F_Af, k),
                        _expand(_mT(T), 0))                  # (1,N,N)
                    wss = df_sum(df_mul(W, W), axis=None)
                    tr_f_parts[j] = df_add(tr_f_parts[j],
                                           df_sub(term1, wss))
        tr_f = _stack(tr_f_parts)                            # (q,)

        ld_half = _half(_concat([ldK_f, ldK_w]))             # Σ log diag L
        tr_all = _concat([tr_f, tr_w])
        logp = df_neg(df_sum(df_add(ld_half,
                                    _half(df_add(muKmu, tr_all))), axis=0))
        logp = df_sub(logp, _c(0.5 * N * q * (p + 1)
                               * float(np.log(2 * np.pi))))

        # -- expected log likelihood (meanfield.py:895-990; raw-y quirk) --
        n_lik = variance.hi.size
        log_var = df_log(variance)
        logl = df_neg(_half(df_add(df_sum(log_var, axis=None),
                                   _c(float(n_lik * np.log(2 * np.pi))))))
        omega_nu = df_sum(df_mul(mu_w, _expand(mu_f, 0)), axis=1)  # (p,N)
        res = df_sub(y_raw, omega_nu)
        logl = df_sub(logl, _half(df_sum(
            df_div(df_mul(res, res), variance), axis=None)))
        mu_w_t = _t(mu_w, (1, 0, 2))                         # (q,p,N)
        dSf_b = _expand(dSf, 1)                              # (q,1,N)
        quad = df_div(
            df_add(df_add(df_mul(dSf_b, df_mul(mu_w_t, mu_w_t)),
                          df_mul(dSw_qp, df_mul(_expand(mu_f, 1),
                                                _expand(mu_f, 1)))),
                   df_mul(dSf_b, dSw_qp)),
            _expand(variance, 0))
        logl = df_sub(logl, _half(df_sum(quad, axis=None)))

        elbo = df_add(df_add(logl, logp), ent)
        return df_div(elbo, _c(float(q)))

    return ExactEngine(spec=spec,
                       prepare=jax.jit(prepare),
                       sweep_node=jax.jit(sweep_node),
                       sweep_weight=jax.jit(sweep_weight),
                       terms=jax.jit(terms),
                       block=block)


def refine_exact(gprn, mu0, var0, n_sweeps: int = 3,
                 block: int = DEFAULT_BLOCK, theta=None):
    """df64 on-chip refine from a variational state: the drop-in
    replacement for the f64 ``elbo_refine`` polish of the mixed-precision
    fit (inference/meanfield.py).  Host-side prep (mean subtraction,
    float64 splitting) is O(N); all O(N³) work is jitted df64.

    ``theta`` overrides the hyperparameter vector (reference-order
    flat packing) — ELBOcalc's per-call component overrides must reach
    the polish too, not just the f32 fit.  Default: the object's
    stored components.

    Returns ``(elbo: float, mu: float64 (d,), var: float64 (d,))``."""
    from gpyrn_tpu.models import gprn as _core
    from gpyrn_tpu.ops import means as means_mod

    gprn._require_components()
    spec = gprn.engine.spec
    eng = make_exact_engine(spec, block)

    if theta is None:
        theta = _core.pack_parameters(gprn.nodes, gprn.weights,
                                      gprn.means, gprn.jitters)
    _, _, mean_p, jitters = _core.unpack_parameters(spec,
                                                    np.asarray(theta))
    t64 = np.asarray(gprn.time, dtype=np.float64)
    rows = []
    for s, mp in zip(spec.mean_structs, mean_p):
        if s is None:
            rows.append(np.zeros_like(t64))
        else:
            rows.append(np.asarray(means_mod.evaluate(s, np.asarray(mp),
                                                      t64),
                        dtype=np.float64))
    m = np.stack(rows)
    y_raw = np.asarray(gprn.y, dtype=np.float64)
    y_c = y_raw - m
    variance = (np.asarray(jitters, dtype=np.float64)[:, None] ** 2
                + np.asarray(gprn.yerr2, dtype=np.float64))

    elbo, mu, var = eng.refine(
        _split64(theta), _split64(t64), _split64(y_c), _split64(y_raw),
        _split64(variance), _split64(np.asarray(mu0)),
        _split64(np.asarray(var0)), n_sweeps=n_sweeps)
    e = float(np.float64(np.asarray(elbo.hi))
              + np.float64(np.asarray(elbo.lo)))
    return e, _join64(mu), _join64(var)


def refine_converged(gprn, mu0, var0, rel_tol: float = 1e-8,
                     max_evals: int = 60, memory: int = 8,
                     block: int = DEFAULT_BLOCK, theta=None,
                     verbose: bool = False):
    """Drive the df64 sweep map to its FIXED POINT, Anderson-accelerated.

    Plain coordinate-ascent sweeps converge linearly with spectral
    radius → 1 as N grows (ρ ≈ 0.966 at the BASELINE N=5000 config:
    ~300 sweeps to stationarity); this wraps one df64 sweep + the
    reference-convention ELBO (``refine_exact``) as the map of
    :func:`gpyrn_tpu.ops.fixedpoint.anderson_fixed_point`, with the
    ELBO as the merit safeguard and extrapolated variances floored at
    a tiny positive value.  Ends with ONE extra plain sweep whose
    relative ELBO change is the measured stationarity.

    Returns ``(elbo, mu, var, info)`` — the post-plain-sweep state;
    ``info`` adds ``stationarity_rel`` and ``sweeps`` (total df64
    sweeps = F-evaluations + 1) to the solver's counters.
    """
    from gpyrn_tpu.ops.fixedpoint import anderson_fixed_point

    mu0 = np.asarray(mu0, dtype=np.float64)
    var0 = np.asarray(var0, dtype=np.float64)
    d = mu0.size
    var_floor = 1e-12 * float(np.max(var0))

    def _clamp(x):
        out = x.copy()
        out[d:] = np.maximum(out[d:], var_floor)
        return out

    def _F(x):
        e, mu, var = refine_exact(gprn, x[:d], x[d:], n_sweeps=1,
                                  block=block, theta=theta)
        return np.concatenate([mu, var]), e

    x, e, info = anderson_fixed_point(
        _F, np.concatenate([mu0, var0]), memory=memory,
        max_evals=max_evals, rel_tol=rel_tol, clamp=_clamp,
        verbose=verbose)
    e1, mu1, var1 = refine_exact(gprn, x[:d], x[d:], n_sweeps=1,
                                 block=block, theta=theta)
    info = dict(info)
    info["stationarity_rel"] = abs(e1 - e) / abs(e1)
    info["sweeps"] = info["evals"] + 1
    return e1, mu1, var1, info
