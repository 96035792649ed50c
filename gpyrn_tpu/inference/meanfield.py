"""Mean-field variational inference for GPRNs — user-facing API.

Thin object shell over the functional engine in
:mod:`gpyrn_tpu.models.gprn`, mirroring the reference class surface
(/root/reference/gpyrn/meanfield.py:92-1416): ``inference(q, time, y1,
y1err, ...)``, ``set_components``, ``get_parameters`` / ``set_parameters``,
``parameters_dict``, freeze/thaw, ``ELBO`` / ``ELBOcalc``, ``nELBO``,
``optimize``, ``mcmc``, ``predict`` / ``_Prediction``, ``sample``,
``plot_prediction`` — plus TPU-native additions: ``elbo_grad`` (autodiff
hyperparameter gradients through the coordinate-ascent sweeps),
``optimize_adam`` (on-device optax loop), and a vmapped batched ELBO used
by the native ensemble sampler.
"""
from __future__ import annotations

from itertools import chain
import os
import time as time_module

import numpy as np
import jax.numpy as jnp

from gpyrn_tpu.ops import kernels as covfunc
from gpyrn_tpu.ops import means as meanfunc
from gpyrn_tpu.models import gprn as _core

__all__ = ["inference"]

# the merit-stall stop (``mixed_stall``) arms only for mixed_tol at or
# above this: tightening mixed_tol below it is an explicit request for
# the deepest f32 state the plain state rule can deliver (see the
# ``mixed_stall`` attribute comment)
STALL_MIN_TOL = 1e-5


class inference:
    """Mean-field variational inference for GPRNs
    (Nguyen & Bonilla 2013).

    Args:
        q: number of latent node functions f(x)
        time: time coordinates
        *args: observed data as y1, y1error, y2, y2error, ...
    """

    def __init__(self, q: int, time, *args):
        self.q = q
        self.time = time
        self.N = np.asarray(time).size

        msg = 'Number of observed data arrays should be even: y1, y1error, ...'
        assert len(args) > 0 and len(args) % 2 == 0, msg
        msg = 'Output arrays should all have the same dimensions as time'
        assert np.all(np.array([len(a) for a in args]) == self.N), msg

        self.p = int(len(args) / 2)
        self.qp = self.q * self.p
        self.d = self.N * self.q * (self.p + 1)

        self.tt = np.tile(time, self.p)
        self.y = np.stack([np.asarray(a, dtype=float) for a in args[::2]])
        self.yerr = np.stack([np.asarray(a, dtype=float) for a in args[1::2]])
        self.yerr2 = self.yerr ** 2

        self._components_set = False
        self._frozen_mask = np.array([])
        self._mu, self._var = None, None
        self._mu_var_iters = 0
        self.update_muvar_after = 50
        self.elbo_max_iter = 5000
        self.refine_sweeps = 3      # polish sweeps in mixed precision:
        # an int, or 'converge' for the Anderson-accelerated
        # fixed-point polish (ops/fixedpoint.py) — sweeps until the
        # relative ELBO change per sweep < refine_tol, which reaches
        # TRUE stationarity in a few dozen sweeps where plain
        # iteration needs hundreds (sweep-map spectral radius → 1 at
        # large N; measured ρ ≈ 0.966 at N=5000)
        self.refine_tol = 1e-8      # 'converge' stationarity target
        self.refine_max_sweeps = 80  # 'converge' sweep cap
        self.mixed_tol = 1e-4       # f32 state-convergence tolerance
        self.mixed_stall = True     # merit-stall stop on the mixed
        # path's default 'state' branch (engine.fit_state_stall): at
        # realistic N the f32 sweep map has a ROUNDING FLOOR — the
        # state wobbles ~1e-3/sweep forever, so the plain state
        # tolerance never fires and the fit burns the whole max_iter
        # budget (measured: 4.75 s / 2000 sweeps at N=1000 where the
        # floor is reached by ~80).  The stall fit scores each block of
        # ``stall_block`` sweeps by its f32 ELBO and stops after
        # ``stall_patience`` consecutive blocks fail to improve the
        # best by > ``stall_tol``·|best|, returning the best-ELBO
        # state for the f64 polish.  ARMS ONLY at default-scale
        # tolerances (``mixed_tol`` ≥ 1e-5): explicitly tightening
        # mixed_tol below that is a request for the deepest f32 state
        # — small/well-conditioned problems CAN reach tight deltas and
        # for q > 1 an early stop can even settle a different
        # permutation basin than the long-run f64 trajectory — and
        # runs the plain state rule (the round-4 behavior, also
        # available via mixed_stall=False).  Ignored by
        # fit_method='cg'/'svi', mixed_stop='elbo', and
        # fit_accelerate=True.
        self.stall_block = 8        # f32 sweeps per merit evaluation
        self.stall_tol = 1e-4       # relative ELBO improvement floor
        self.stall_patience = 3     # non-improving blocks before stop
        self.mixed_stop = 'state'   # 'state'|'elbo': mixed-precision
        # stopping rule.  'state' (default) iterates the f32 updates
        # until max|Δμ|/(1+max|μ|) < mixed_tol — fastest, but a
        # different contract from the reference; 'elbo' runs the f32
        # fit under the REFERENCE rule (rel-std of the last 3 ELBO
        # values < 1e-3, meanfield.py:640-646) so iteration semantics
        # match reference scripts, then polishes as usual
        self.fit_accelerate = False  # Anderson-accelerate the f32 bulk
        # fit (the mixed path's dense/lean 'state'-stop branch only;
        # takes precedence over ``mixed_stall``): host-driven
        # fixed-point mixing (ops/fixedpoint.py) over blocks of
        # ``accel_sweeps`` f32 sweeps, with the f32 ELBO of each
        # block's own final sweep as the safeguard merit.  Relative to
        # the default on-device merit-stall fit it adds Anderson
        # MIXING (~2–3× fewer sweeps to a given ELBO level mid-ascent,
        # measured N=300–1000) at the cost of one tunnel round-trip
        # per block; the stopping rule is the same merit-stall idea
        # (stop when the f32 ELBO stops improving by > ``accel_tol``
        # relative, return the best-ELBO state).
        # CAVEAT — ``accel_tol`` trades
        # depth for time: near-unit spectral radii hide large geometric
        # tails behind small per-block gains (measured at N=5000: a
        # ρ≈0.999 mode still carried ~4% of |ELBO|; stopping on the
        # default threshold forfeited it and the subsequent polish
        # converged to a different, lower fixed point).  Lower
        # ``accel_tol`` at large N, or set ``mixed_stall=False`` for
        # the deepest f32 state per sweep budget.  Every device
        # call is one small bounded block.  Ignored by
        # fit_method='cg'/'svi' and mixed_stop='elbo', whose iteration
        # contracts are fixed by those modes.
        self.accel_sweeps = 5       # f32 sweeps per Anderson evaluation
        self.accel_tol = 2e-4       # merit stall threshold: a block
        # must improve the best f32 ELBO by > accel_tol·|ELBO| to count
        # as progress (f32 ELBO evaluation noise is ~1e-3 relative on
        # ill-conditioned configs; systematic ascent sits well above)
        self.accel_patience = 5     # consecutive non-improving blocks
        # before the fit is declared at the f32 floor and stopped
        self.refine_method = 'auto'  # 'auto'|'df64'|'f64': how the
        # mixed-precision polish runs.  'df64' = blocked double-single
        # sweeps + exact ELBO terms ON the accelerator (f32 hardware
        # only, models/exact_blocked.py); 'f64' = the float64 engine
        # sweeps; 'auto' picks df64 on TPU when every kernel has a df64
        # assembly rule, f64 otherwise (f64 is native speed on CPU)
        self.fit_method = 'dense'   # 'dense'|'cg'|'svi': how the
        # mixed-precision BULK fit runs.  'dense' = batched/lean
        # Cholesky engines (exact; single-chip ceiling ~N=20k).  'cg' =
        # matrix-free coordinate ascent (models/cg_fit.py): chunked
        # kernel matvecs + pivoted-Cholesky-preconditioned CG for μ and
        # the closed-form low-rank posterior diagonal — O(N·(rank +
        # chunk)) memory, the N ≫ 20k path.  Explicit opt-in: the
        # rank/tolerance knobs below change the accuracy contract
        # (f64 update-map agreement vs the dense engines measured at
        # ~2e-7 for cg_rank=128 on the BASELINE QP configs, N=300–1000;
        # raise cg_rank for rougher kernels.  In f32 both the dense and
        # CG maps carry ~1e-3/sweep rounding, identically.)
        # 'svi' = stochastic minibatch-over-outputs coordinate ascent
        # (models/svi.py) — the very-large-p path; max_iter counts SVI
        # steps and the svi_* knobs below control it.  Pair with
        # refine_sweeps='converge' to polish the stochastic state to
        # the exact fixed point.
        self.cg_rank = 128          # pivoted-Cholesky compression rank
        self.cg_tol = 1e-6          # inner CG relative-residual tol
        self.svi_batch_p = None     # outputs per SVI step (None → p//4)
        self.svi_kappa = 0.6        # Robbins–Monro decay exponent
        self.svi_t0 = 5.0           # Robbins–Monro delay
        self.svi_seed = 0
        self.refine_device = 'auto'  # 'auto'|'cpu'|None: where the f64
        # polish runs ('auto' prefers a CPU device when the default
        # backend is TPU — software-emulated f64 there is slow at
        # large N; run with JAX_PLATFORMS=tpu,cpu to make one available)
        self.verbose = False
        self._engine = None
        self._cg_engine = None      # keyed by (cg_rank, cg_tol)
        self._lattice_axis = None

    # ------------------------------------------------------------------
    # components & parameters
    # ------------------------------------------------------------------

    def set_components(self, nodes, weights, means, jitters):
        """Set the GPRN components: nodes, weights, means, and jitters."""
        if isinstance(nodes, covfunc.covFunction):
            nodes = [nodes]
        if len(nodes) != self.q:
            raise ValueError('Wrong number of nodes provided, '
                             f'expected {self.q} got {len(nodes)}')

        if isinstance(weights, covfunc.covFunction):
            weights = [weights]
        if len(weights) != self.qp:
            raise ValueError('Wrong number of weights provided, '
                             f'expected {self.qp} got {len(weights)}')

        if isinstance(means, (int, float, meanfunc.meanFunction)) \
                or means is None:
            means = [means]
        means = [None if isinstance(m, (int, float)) or m is None else m
                 for m in means]
        if len(means) != self.p:
            # the reference accepts a single mean for p outputs implicitly;
            # broadcast to p for convenience
            if len(means) == 1:
                means = means * self.p
            else:
                raise ValueError('Wrong number of means provided, '
                                 f'expected {self.p} got {len(means)}')

        if isinstance(jitters, (int, float)):
            jitters = [jitters]

        self.nodes = nodes
        self.weights = weights
        self.means = means
        self.jitters = np.array(jitters, dtype=float)
        self._components_set = True
        self._engine = None     # structure changed: rebuild lazily
        self._cg_engine = None

    def _require_components(self):
        msg = 'GPRN components not set, use set_components'
        assert self._components_set, msg

    def _get_components(self, nodes=None, weights=None, means=None,
                        jitters=None):
        all_none = all(i is None for i in (nodes, weights, means, jitters))
        if all_none and not self._components_set:
            raise ValueError('GPRN components not set, use set_components')
        nodes = self.nodes if nodes is None else nodes
        weights = self.weights if weights is None else weights
        means = self.means if means is None else means
        jitters = self.jitters if jitters is None else jitters
        return nodes, weights, means, jitters

    def get_parameters(self, nodes=None, weights=None, means=None,
                       jitters=None, include_frozen=False):
        """Values of all GPRN parameters as a flat vector, in the order
        nodes → weights → means → jitters."""
        nones = [nodes is None, weights is None, means is None,
                 jitters is None]
        if not self._components_set and all(nones):
            raise ValueError('Cannot get parameters. Provide arguments or '
                             'run set_components before.')
        if self._components_set and all(nones):
            nodes, weights, means, jitters = self._get_components()
        p = []
        for node in (nodes or []):
            p.append(np.atleast_1d(node.get_parameters()))
        for weight in (weights or []):
            p.append(np.atleast_1d(weight.get_parameters()))
        for mean in (means or []):
            if mean is not None:
                p.append(np.atleast_1d(mean.get_parameters()))
        for jitter in (jitters if jitters is not None else []):
            p.append(np.array([jitter], dtype=float))
        out = np.concatenate(p).ravel()
        if include_frozen or not self._components_set:
            return out
        return out[~self.frozen_mask]

    def set_parameters(self, parameters):
        """Set values for all GPRN parameters (full vector or only the
        non-frozen subset)."""
        self._require_components()
        parameters = np.atleast_1d(np.asarray(parameters, dtype=float))
        all_parameters = self.get_parameters(include_frozen=True)
        n_free = self.n_parameters - int(self.frozen_mask.sum())

        if parameters.size == self.n_parameters:
            parameters = parameters.copy()
            parameters[self.frozen_mask] = all_parameters[self.frozen_mask]
        elif parameters.size == n_free:
            full = all_parameters.copy()
            full[~self.frozen_mask] = parameters
            parameters = full
        else:
            NP, ep, fp = parameters.size, self.n_parameters, n_free
            msg = f'Wrong number of parameters provided: got {NP}, '
            msg += f'expected {ep}' if ep == fp else \
                f'expected {ep} (all) or {fp} (not frozen)'
            raise ValueError(msg)

        it = [self.nodes, self.weights,
              [m for m in self.means if m is not None]]
        for component in chain.from_iterable(it):
            parameters = component.set_parameters(parameters)
        self.jitters = np.atleast_1d(np.asarray(parameters, dtype=float))

    @property
    def n_parameters(self):
        """Total number of parameters."""
        self._require_components()
        n = 0
        it = [self.nodes, self.weights,
              [m for m in self.means if m is not None]]
        for component in chain.from_iterable(it):
            n += component.pars.size
        return n + self.jitters.size

    @property
    def parameters_dict(self):
        """Dictionary with parameter names and values, keyed like
        'node1.theta', 'weight2.ell', 'mean1.c', 'jitter1'."""
        self._require_components()
        p = {}
        for i, node in enumerate(self.nodes, start=1):
            for par, val in zip(node._param_names, node.pars):
                p[f'node{i}.{par}'] = val
        for i, weight in enumerate(self.weights, start=1):
            for par, val in zip(weight._param_names, weight.pars):
                p[f'weight{i}.{par}'] = val
        mean_i = 0
        for mean in self.means:
            mean_i += 1
            if mean is None:
                continue
            for par, val in zip(mean._param_names, mean.pars):
                p[f'mean{mean_i}.{par}'] = val
        for i, jit in enumerate(self.jitters, start=1):
            p[f'jitter{i}'] = jit
        return p

    # ------------------------------------------------------------------
    # freeze / thaw
    # ------------------------------------------------------------------

    def freeze_parameter(self, index=None, name=None):
        """Freeze (do not fit) a parameter by index or name; a '*' in
        `name` freezes every parameter whose name contains the rest."""
        self._set_frozen(index, name, True)

    def thaw_parameter(self, index=None, name=None):
        """Thaw (free) a parameter by index or name ('*' globs)."""
        self._set_frozen(index, name, False)

    def _set_frozen(self, index, name, value):
        self.frozen_mask  # materialize
        if index is None and name is None:
            raise ValueError('Provide either index or name')
        if name is None:
            self._frozen_mask[index] = value
        else:
            names = list(self.parameters_dict.keys())
            if '*' in name:
                frag = name.replace('*', '')
                for i, known in enumerate(names):
                    if frag in known:
                        self._frozen_mask[i] = value
            else:
                msg = f'Name "{name}" not found in parameters_dict'
                assert name in names, msg
                self._frozen_mask[names.index(name)] = value

    def freeze_all_parameters(self):
        """Freeze all parameters."""
        self._frozen_mask = np.ones(self.frozen_mask.size, dtype=bool)

    def thaw_all_parameters(self):
        """Thaw all parameters."""
        self._frozen_mask = np.zeros(self.frozen_mask.size, dtype=bool)

    fix_parameter = freeze_parameter
    fix_all_parameters = freeze_all_parameters
    free_parameter = thaw_parameter
    free_all_parameters = thaw_all_parameters

    @property
    def frozen_mask(self):
        """Boolean mask of frozen parameters."""
        self._require_components()
        if self._frozen_mask.size == 0:
            self._frozen_mask = np.full(self.n_parameters, False, dtype=bool)
        return self._frozen_mask

    @frozen_mask.setter
    def frozen_mask(self, mask):
        raise NotImplementedError(
            'Do not set frozen_mask, use thaw_parameter/freeze_parameter')

    def _apply_vars_selection(self, vars):
        """The `vars=` freeze/thaw sugar of optimize()/mcmc()
        (reference meanfield.py:1132-1147)."""
        if vars is None:
            return
        if isinstance(vars, str):
            if '-' in vars:
                vars = vars.replace('-', '')
                self.thaw_parameter(name='*')
                self.freeze_parameter(name=vars)
            else:
                self.freeze_parameter(name='*')
                self.thaw_parameter(name=vars)
        elif isinstance(vars, list):
            self.freeze_parameter(name='*')
            for var in vars:
                self.thaw_parameter(name=var)
        else:
            raise ValueError(f'`vars` should be str or list, got {type(vars)}')

    # ------------------------------------------------------------------
    # engine plumbing
    # ------------------------------------------------------------------

    def _spec_and_core_maps(self):
        spec = _core.spec_from_components(self.nodes, self.weights,
                                          self.means, self.N)
        core_maps = None
        if any(k.has_core_map() for k in
               list(self.nodes) + list(self.weights)):
            core_maps = (
                tuple(k.core_params_from if k.has_core_map() else None
                      for k in self.nodes),
                tuple(k.core_params_from if k.has_core_map() else None
                      for k in self.weights),
            )
        return spec, core_maps

    @property
    def engine(self) -> _core.Engine:
        """The jitted function bundle for the current model structure."""
        self._require_components()
        if self._engine is None:
            spec, core_maps = self._spec_and_core_maps()
            self._engine = _core.make_engine(spec, core_maps,
                                             self._lattice_axis)
        return self._engine

    @property
    def cg_engine(self):
        """Matrix-free fit bundle (models/cg_fit.py) for
        ``fit_method='cg'`` — rebuilt lazily when the structure or the
        (cg_rank, cg_tol) knobs change."""
        self._require_components()
        key = (self.cg_rank, self.cg_tol)
        if self._cg_engine is None or self._cg_engine[0] != key:
            from gpyrn_tpu.models.cg_fit import make_cg_fit
            spec, core_maps = self._spec_and_core_maps()
            self._cg_engine = (key, make_cg_fit(
                spec, rank=self.cg_rank, cg_tol=self.cg_tol,
                core_maps=core_maps))
        return self._cg_engine[1]

    @property
    def lattice_axis(self):
        """Mesh-axis name over which the (q × p) lattice of kernel
        matrices is sharded (None = unsharded).  Run inference inside
        ``gpyrn_tpu.parallel.use_mesh(mesh)`` when set."""
        return self._lattice_axis

    @lattice_axis.setter
    def lattice_axis(self, axis):
        self._lattice_axis = axis
        self._engine = None
        self._cg_engine = None

    def _theta(self, nodes=None, weights=None, means=None, jitters=None):
        nodes, weights, means, jitters = self._get_components(
            nodes, weights, means, jitters)
        return _core.pack_parameters(nodes, weights, means, jitters)

    def _use_df64_refine(self) -> bool:
        """Whether the mixed-precision polish runs as on-chip blocked
        df64 sweeps (models/exact_blocked.py) instead of f64 engine
        sweeps — the round-2 path that keeps the EXACT evaluation on
        the accelerator (f32 hardware only, no CPU hop)."""
        method = getattr(self, 'refine_method', 'auto')
        if method == 'f64':
            return False
        from gpyrn_tpu.models.exact_blocked import exact_refine_supported
        supported = exact_refine_supported(self.engine.spec)
        if method == 'df64':
            if not supported:
                raise ValueError(
                    "refine_method='df64' but a kernel in this model has "
                    "no df64 assembly rule; use 'auto' or 'f64'")
            return True
        import jax
        return supported and jax.default_backend() == 'tpu'

    def _refine_device_ctx(self):
        """Device context for the f64 polish stage of the mixed fit."""
        import contextlib
        import jax
        want_cpu = self.refine_device == 'cpu' or (
            self.refine_device == 'auto'
            and jax.default_backend() == 'tpu')
        if want_cpu:
            try:
                return jax.default_device(jax.devices('cpu')[0])
            except RuntimeError:
                pass    # no CPU backend registered — stay on default
        return contextlib.nullcontext()

    def _converged_refine(self, one_sweep, mu0, var0):
        """Anderson-accelerated fixed-point polish over a single-sweep
        map ``one_sweep(mu, var) -> (elbo, mu, var)`` (the f64-engine
        counterpart of exact_blocked.refine_converged; see
        ops/fixedpoint.py).  Ends with one plain sweep so the returned
        state is a genuine map application.  Returns
        ``(elbo, mu, var, n_sweeps)``."""
        from gpyrn_tpu.ops.fixedpoint import anderson_fixed_point
        d = mu0.size
        var_floor = 1e-12 * float(np.max(var0))

        def clamp(x):
            out = x.copy()
            out[d:] = np.maximum(out[d:], var_floor)
            return out

        def F(x):
            e, m2, v2 = one_sweep(x[:d], x[d:])
            return np.concatenate([np.asarray(m2, dtype=np.float64),
                                   np.asarray(v2, dtype=np.float64)]), e

        x, e, info = anderson_fixed_point(
            F, np.concatenate([mu0, var0]), rel_tol=self.refine_tol,
            max_evals=self.refine_max_sweeps, clamp=clamp)
        e1, mu1, var1 = one_sweep(x[:d], x[d:])
        return float(e1), np.asarray(mu1), np.asarray(var1), \
            info["evals"] + 1

    def _accelerated_fit32(self, f32_args, lean, max_iter):
        """Anderson-accelerated float32 bulk fit (``fit_accelerate``):
        the mixed path's coordinate ascent run as a host fixed-point
        solve.  F = one block of ``accel_sweeps`` f32 sweeps through the
        engine's refine map (whose final sweep also evaluates the f32
        ELBO — the safeguard merit for :func:`anderson_fixed_point`);
        the solver mixes block outputs on the host, so each device call
        stays small and bounded (the axon service kills long single
        calls).  The update map is identical to ``fit_state``'s — only
        the visit order of iterates differs — and the stop is the
        merit-stall rule: the fit ends when ``accel_patience``
        consecutive blocks fail to improve the best f32 ELBO by more
        than ``accel_tol`` relative (the f32 rounding floor — see the
        ``fit_accelerate`` attribute comment), returning the best-ELBO
        state.  Returns ``(mu32, var32, n_sweeps, converged)`` where
        ``converged`` means the floor was reached before ``max_iter``
        sweeps."""
        from gpyrn_tpu.ops.fixedpoint import anderson_fixed_point
        eng = self.engine
        refine = eng.elbo_refine_lean if lean else eng.elbo_refine
        theta32, t32, y32, ye32, mu0, var0 = f32_args
        d = int(np.asarray(mu0).size)
        k = max(1, int(self.accel_sweeps))
        var_floor = 1e-12 * float(np.max(np.asarray(var0)))

        def clamp(x):
            out = x.copy()
            out[d:] = np.maximum(out[d:], var_floor)
            return out

        def F(x):
            e, m2, v2 = refine(theta32, t32, y32, ye32,
                               jnp.asarray(x[:d], dtype=jnp.float32),
                               jnp.asarray(x[d:], dtype=jnp.float32), k)
            return np.concatenate([
                np.asarray(m2, dtype=np.float64),
                np.asarray(v2, dtype=np.float64)]), float(e)

        x0 = np.concatenate([np.asarray(mu0, dtype=np.float64),
                             np.asarray(var0, dtype=np.float64)])
        max_evals = max(4, int(max_iter) // k)
        # rel_tol=0 disables the calm rule: in f32 the per-block merit
        # change never settles below a tolerance (it wobbles at the
        # rounding floor), so the stall rule is the one stop that fires
        x, _, info = anderson_fixed_point(
            F, x0, rel_tol=0.0, max_evals=max_evals, clamp=clamp,
            stall_patience=int(self.accel_patience),
            stall_tol=float(self.accel_tol))
        return (jnp.asarray(x[:d], dtype=jnp.float32),
                jnp.asarray(x[d:], dtype=jnp.float32),
                info["evals"] * k, bool(info["stalled"]))

    def _resolve_mu_var(self, mu, var, theta):
        eng = self.engine
        if mu is None or var is None:
            mu = var = 'init'
        if isinstance(mu, str) and (mu == 'previous' or var == 'previous'):
            if self._mu is not None:
                return np.asarray(self._mu).ravel(), \
                    np.asarray(self._var).ravel()
            mu0, var0 = eng.init_mu_var(theta, self.y)
            return mu0, var0
        if isinstance(mu, str) and mu == 'random' and var == 'random':
            return self._randomMuVar()
        if isinstance(mu, str) and mu == 'init' and var == 'init':
            mu0, var0 = eng.init_mu_var(theta, self.y)
            return mu0, var0
        return np.asarray(mu).ravel(), np.asarray(var).ravel()

    def _u_to_fhatW(self, u):
        """Split a flat d-vector into node means (1, q, N) and weight
        means (p, q, N) (reference meanfield.py:473-489)."""
        u = np.asarray(u).ravel()
        f = u[:self.q * self.N].reshape((1, self.q, self.N))
        w = u[self.q * self.N:].reshape((self.p, self.q, self.N))
        return f, w

    def _initMuVar(self, nodes, weights, jitters):
        theta = self._theta(nodes=nodes, weights=weights, jitters=jitters)
        mu, var = self.engine.init_mu_var(theta, self.y)
        return np.asarray(mu), np.asarray(var)

    def _randomMuVar(self):
        mu = np.random.randn(self.d)
        var = np.random.rand(self.d)
        return mu, var

    # ------------------------------------------------------------------
    # ELBO
    # ------------------------------------------------------------------

    @property
    def ELBO(self):
        """The evidence lower bound for the GPRN."""
        return self.ELBOcalc()[0]

    def ELBOcalc(self, nodes=None, weights=None, means=None, jitters=None,
                 max_iter=None, mu=None, var=None, precision=None):
        """Run the coordinate-ascent fit of the variational parameters and
        return ``(ELBO, mu, var, iterNumber)``.

        mu/var may be arrays or 'init' | 'random' | 'previous'
        (reference meanfield.py:561-649).

        ``precision='mixed'`` runs the bulk of the coordinate ascent in
        float32 (fast on the MXU) and then polishes with
        ``self.refine_sweeps`` float64 sweeps, evaluating the final ELBO
        at reference fidelity — the TPU-native answer to the reference's
        all-float64 requirement.  Requires x64 enabled."""
        theta = self._theta(nodes, weights, means, jitters)
        mu0, var0 = self._resolve_mu_var(mu, var, theta)
        user_max_iter = max_iter
        if max_iter is None:
            max_iter = 10000

        t_arr = np.asarray(self.time, dtype=float)
        # past ~N=6k the batched lattice of kernel matrices no longer
        # fits one chip's HBM — use the lean engines (kernels rebuilt
        # per GP per sweep, identical update map and ELBO terms)
        lean_after = int(os.environ.get("GPYRN_TPU_LEAN_N", "6000"))
        lean = self.N >= lean_after
        if precision == 'mixed':
            # f32 updates-only fit with the EXACT reference nugget: the
            # (K + D)⁻¹ update solves are f32-safe, so this converges to
            # the true-model fixed point — only the ELBO terms need f64
            f32 = lambda x: jnp.asarray(np.asarray(x), dtype=jnp.float32)  # noqa: E731
            f32_args = (f32(theta), f32(t_arr), f32(self.y),
                        f32(self.yerr2), f32(mu0), f32(var0))
            if self.mixed_stop == 'elbo':
                # reference iteration semantics: f32 fit under the
                # rel-std(3) < 1e-3 ELBO rule (Σ-free f32 terms)
                fit = self.engine.elbo_fit_lean if lean \
                    else self.engine.elbo_fit
                _, mu32, var32, n_iter, converged, _ = fit(
                    *f32_args, max_iter)
            elif getattr(self, 'fit_method', 'dense') == 'cg':
                mu32, var32, n_iter, converged, cg_rres = \
                    self.cg_engine.fit_state_cg(
                        *f32_args, max_iter, self.mixed_tol)
                # achieved TRUE relative residual of the final sweep's
                # inner solves: in f32 the recursive CG residual drifts,
                # so the requested cg_tol may sit below the attainable
                # floor — the honest number is recorded, never assumed
                self.cg_achieved_relres = float(cg_rres)
            elif getattr(self, 'fit_method', 'dense') == 'svi':
                from gpyrn_tpu.models.svi import make_svi_fit
                bp = self.svi_batch_p or max(1, self.p // 4)
                spec, core_maps = self._spec_and_core_maps()
                # spec-keyed cache: survives set_components with a new
                # structure
                key = (spec, int(bp))
                cache = getattr(self, "_svi_engines", None)
                if cache is None:
                    cache = self._svi_engines = {}
                sv = cache.get(key)
                if sv is None:
                    sv = cache[key] = make_svi_fit(spec, bp,
                                                   core_maps=core_maps)
                # fixed-step stochastic run; the reference's 10000-sweep
                # default is the wrong scale for SVI steps
                n_iter = user_max_iter if user_max_iter is not None \
                    else 600
                mu32, var32 = sv.fit_state_svi(
                    *f32_args, int(n_iter), int(self.svi_seed),
                    float(self.svi_t0), float(self.svi_kappa))
                converged = True
            elif self.fit_accelerate:
                mu32, var32, n_iter, converged = self._accelerated_fit32(
                    f32_args, lean, max_iter)
            elif self.mixed_stall and self.mixed_tol >= STALL_MIN_TOL:
                fit = self.engine.fit_state_stall_lean if lean \
                    else self.engine.fit_state_stall
                mu32, var32, n_iter, converged = fit(
                    *f32_args, max_iter, self.mixed_tol,
                    int(self.stall_block), np.float32(self.stall_tol),
                    int(self.stall_patience))
            else:
                fit = self.engine.fit_state_lean if lean \
                    else self.engine.fit_state
                mu32, var32, n_iter, converged = fit(
                    *f32_args, max_iter, self.mixed_tol)
            converge = self.refine_sweeps == 'converge'
            mu64 = np.asarray(mu32, dtype=np.float64)
            var64 = np.asarray(var32, dtype=np.float64)
            theta64 = np.asarray(theta, dtype=np.float64)
            if self._use_df64_refine():
                from gpyrn_tpu.models.exact_blocked import (
                    refine_converged, refine_exact)
                if converge:
                    elbo, mu_out, var_out, rinfo = refine_converged(
                        self, mu64, var64, rel_tol=self.refine_tol,
                        max_evals=self.refine_max_sweeps, theta=theta64)
                    refine_count = rinfo["sweeps"]
                else:
                    elbo, mu_out, var_out = refine_exact(
                        self, mu64, var64, n_sweeps=self.refine_sweeps,
                        theta=theta64)
                    refine_count = self.refine_sweeps
            else:
                refine = self.engine.elbo_refine_lean if lean \
                    else self.engine.elbo_refine
                if converge:
                    def _sweep1(m, v):
                        with self._refine_device_ctx():
                            e, m2, v2 = refine(
                                theta, t_arr, self.y, self.yerr2,
                                jnp.asarray(m, dtype=jnp.float64),
                                jnp.asarray(v, dtype=jnp.float64), 1)
                        return float(e), np.asarray(m2), np.asarray(v2)
                    elbo, mu_out, var_out, refine_count = \
                        self._converged_refine(_sweep1, mu64, var64)
                else:
                    with self._refine_device_ctx():
                        elbo, mu_out, var_out = refine(
                            theta, t_arr, self.y, self.yerr2,
                            jnp.asarray(mu64, dtype=jnp.float64),
                            jnp.asarray(var64, dtype=jnp.float64),
                            self.refine_sweeps)
                    refine_count = self.refine_sweeps
            trace = np.full(1, float(elbo))
            hist_len = 1
            n_iter = int(n_iter) + refine_count
        else:
            fit = self.engine.elbo_fit_lean if lean \
                else self.engine.elbo_fit
            elbo, mu_out, var_out, n_iter, converged, trace = fit(
                theta, t_arr, self.y, self.yerr2, mu0, var0, max_iter)
            hist_len = int(n_iter)
        elbo = float(elbo)
        mu_out = np.asarray(mu_out)
        var_out = np.asarray(var_out)
        # per-iteration ELBO trajectory (diagnostics; trimmed to n_iter)
        self.elbo_history = np.asarray(trace)[:hist_len]
        if bool(converged):
            # the reference caches the variational state only on
            # convergence (meanfield.py:643-646)
            self._mu = mu_out
            self._var = var_out
        else:
            print('\nMax iterations reached')
        return elbo, mu_out, var_out, int(n_iter)

    def nELBO(self, parameters, max_iter=None):
        """Negative ELBO at the given hyperparameters (warm-started from
        the cached variational state)."""
        self._require_components()
        self.set_parameters(parameters)
        start = time_module.time()
        elbo, _, _, _ = self.ELBOcalc(max_iter=max_iter,
                                      mu='previous', var='previous')
        end = time_module.time()
        if self.verbose:
            spaces = 20 * ' '
            print(f'ELBO={elbo:7.2f} (took {1e3 * (end - start):5.2f} ms)'
                  f'{spaces}', end='\r', flush=True)
        return -elbo

    # -- TPU-native gradient surface ------------------------------------

    def elbo_grad(self, parameters=None, n_sweeps=30, mu=None, var=None,
                  method='unroll', fit_tol=None, fit_max_iter=2000,
                  adjoint='gmres', adjoint_maxiter=25,
                  adjoint_restart=20, adjoint_tol=None):
        """ELBO and its gradient w.r.t. all hyperparameters.

        ``method='unroll'`` (default) differentiates through ``n_sweeps``
        coordinate-ascent sweeps (one fused jitted computation — the
        reference has no gradient path at all): the exact gradient of the
        truncated objective, cost and memory linear in ``n_sweeps``.

        ``method='implicit'`` first converges the variational state
        (``fit_state`` warm-started from ``mu``/``var``, stopping at
        ``fit_tol`` relative state change within ``fit_max_iter``
        sweeps), then computes the gradient OF THE CONVERGED ELBO by the
        implicit function theorem at the fixed point
        (models/implicit.py): O(1) memory in the sweep count and exactly
        the objective the reference's ``optimize()`` descends
        (meanfield.py:1095-1152 semantics).  ``n_sweeps`` is ignored;
        the adjoint linear solve is controlled by ``adjoint``
        ('gmres' | 'neumann'), ``adjoint_maxiter``, ``adjoint_restart``
        and ``adjoint_tol`` (see
        :func:`gpyrn_tpu.models.implicit.make_implicit_value_and_grad`).
        The converged state is cached like a converged ``ELBOcalc``
        (warm-starting subsequent calls)."""
        self._require_components()
        if parameters is not None:
            self.set_parameters(parameters)
        theta = self._theta()
        if mu is None:
            mu, var = 'previous', 'previous'
        mu0, var0 = self._resolve_mu_var(mu, var, theta)
        t_arr = np.asarray(self.time, dtype=float)
        if method == 'unroll':
            value, grad = self.engine.elbo_value_and_grad(
                theta, t_arr, self.y, self.yerr2, mu0, var0, n_sweeps)
            return float(value), np.asarray(grad)
        if method != 'implicit':
            raise ValueError("method must be 'unroll' or 'implicit', "
                             f"got {method!r}")
        from gpyrn_tpu.models.implicit import implicit_value_and_grad_for
        mu_s, var_s, _, converged = self.engine.fit_state(
            theta, t_arr, self.y, self.yerr2, mu0, var0,
            int(fit_max_iter),
            fit_tol if fit_tol is not None else
            (1e-12 if np.asarray(mu0).dtype == np.float64 else 1e-6))
        if not bool(converged):
            print('\nMax iterations reached')
        res = implicit_value_and_grad_for(self.engine)(
            theta, t_arr, self.y, self.yerr2, mu_s, var_s,
            adjoint=adjoint, maxiter=int(adjoint_maxiter),
            restart=int(adjoint_restart), tol=adjoint_tol)
        self._mu = np.asarray(mu_s)
        self._var = np.asarray(var_s)
        return float(res.elbo), np.asarray(res.grad)

    # ------------------------------------------------------------------
    # optimization
    # ------------------------------------------------------------------

    def optimize(self, vars=None, **kwargs):
        """Maximize the ELBO over the (non-frozen) hyperparameters with
        scipy (default Nelder-Mead, like the reference meanfield.py:1149)."""
        from scipy.optimize import minimize
        self._apply_vars_selection(vars)
        kwargs.setdefault('method', 'Nelder-Mead')
        res = minimize(self.nELBO, self.get_parameters(), **kwargs)
        self.set_parameters(res.x)
        return res

    def optimize_device(self, vars=None, n_sweeps=30, xatol=1e-4,
                        fatol=1e-4, max_iter=None, n_restarts=1,
                        spread=0.1, seed=0, adaptive=False):
        """``optimize()`` without the host in the loop: scipy-trajectory
        Nelder-Mead (inference/neldermead.py) over the non-frozen
        hyperparameters, run entirely on the device as one jitted loop.

        The objective is the negative ELBO after ``n_sweeps``
        coordinate-ascent sweeps from the current variational state — a
        deterministic, batched objective (unlike ``nELBO``, whose cache
        warm-start makes each call depend on the previous one).  With
        ``n_restarts > 1``, that many simplexes start from
        log-normal-perturbed copies of the current parameters
        (``spread`` in log units) and run in lockstep as one vmapped
        population; the best restart wins.

        Returns a dict with scipy-style fields ``x``/``fun``/``nit``/
        ``nfev``/``success`` plus ``elbo`` at the optimum (the
        variational cache is refreshed there).
        """
        self._require_components()
        self._apply_vars_selection(vars)
        free = ~self.frozen_mask
        free_idx = np.flatnonzero(free)
        if free_idx.size == 0:
            raise ValueError("all parameters are frozen")
        base = jnp.asarray(self.get_parameters(include_frozen=True))
        theta0 = self._theta()
        mu0, var0 = self._resolve_mu_var('previous', 'previous', theta0)
        mu0, var0 = jnp.asarray(mu0), jnp.asarray(var0)
        eng = self.engine
        t = jnp.asarray(np.asarray(self.time, dtype=float))
        y, yerr2 = jnp.asarray(self.y), jnp.asarray(self.yerr2)
        idx = jnp.asarray(free_idx)

        # the STATIC sweep scan, not the masked power-of-two-bucketed
        # dispatch: under the simplex loop's vmap, lax.cond lowers to
        # select, so the masked form executes every bucketed sweep —
        # a 3-sweep objective would silently run 8 (measured: the
        # bench's opt_dev30 row dropped 1.85 s → 1.21 s from this
        # alone).  One compile per distinct n_sweeps value, which an
        # optimizer calls with one value anyway.
        elbo_static = eng.elbo_fixed.static

        def objective(x):
            theta = base.at[idx].set(x)
            return -elbo_static(theta, t, y, yerr2, mu0, var0,
                                int(n_sweeps))

        from gpyrn_tpu.inference.neldermead import (nelder_mead,
                                                    nelder_mead_multistart)
        x0 = base[idx]
        if n_restarts > 1:
            rng = np.random.default_rng(seed)
            x0s = np.asarray(x0)[None, :] * np.exp(
                spread * rng.standard_normal((n_restarts, free_idx.size)))
            x0s[0] = np.asarray(x0)     # keep the unperturbed start
            res, best = nelder_mead_multistart(
                objective, jnp.asarray(x0s), xatol=xatol, fatol=fatol,
                max_iter=max_iter, adaptive=adaptive)
            pick = lambda a: np.asarray(a)[int(best)]   # noqa: E731
            res = type(res)(*[pick(a) for a in res])
        else:
            res = nelder_mead(objective, x0, xatol=xatol, fatol=fatol,
                              max_iter=max_iter, adaptive=adaptive)
        x_best = np.asarray(res.x)
        self.set_parameters(x_best)
        elbo, *_ = self.ELBOcalc(mu='previous', var='previous')
        return {'x': x_best, 'fun': float(res.fun), 'nit': int(res.nit),
                'nfev': int(res.nfev), 'success': bool(res.converged),
                'elbo': elbo}

    def optimize_adam(self, vars=None, n_steps=200, learning_rate=5e-2,
                      n_sweeps=30, transform='log', callback=None,
                      grad='unroll', fit_tol=None, fit_max_iter=200,
                      adjoint='gmres', adjoint_maxiter=25,
                      adjoint_restart=20):
        """TPU-native gradient optimizer: optax Adam on the negative ELBO.

        ``grad='unroll'`` (default) differentiates through ``n_sweeps``
        coordinate-ascent sweeps from the state cached at entry — a
        fixed, deterministic objective.

        ``grad='implicit'`` is the bilevel optimizer: every step
        re-converges the variational state (``fit_state`` warm-started
        from the previous step's state — a handful of sweeps once the
        trajectory settles, capped at ``fit_max_iter``) and takes the
        EXACT gradient of the converged ELBO by the implicit function
        theorem (models/implicit.py), so the outer objective is the same
        fully-converged ELBO that ``optimize()``'s Nelder-Mead descends,
        with O(1) memory in the inner iteration count.  ``n_sweeps`` is
        ignored in this mode.

        ``transform='log'`` optimizes log-parameters (all GPRN amplitude /
        length-scale / jitter parameters are positive), which is both
        better conditioned and keeps parameters positive.
        """
        import optax
        self._apply_vars_selection(vars)
        free = ~self.frozen_mask
        theta_full = self.get_parameters(include_frozen=True)

        eng = self.engine
        t = np.asarray(self.time, dtype=float)
        theta0 = self._theta()
        mu0, var0 = self._resolve_mu_var('previous', 'previous', theta0)
        mu0 = jnp.asarray(mu0)
        var0 = jnp.asarray(var0)
        free_j = jnp.asarray(free)
        base = jnp.asarray(theta_full)

        use_log = transform == 'log'

        def to_opt(x):
            return jnp.log(x) if use_log else x

        def from_opt(z):
            return jnp.exp(z) if use_log else z

        z = to_opt(jnp.where(free_j, jnp.asarray(theta_full),
                             jnp.ones_like(base)))
        opt = optax.adam(learning_rate)
        state = opt.init(z)

        import jax as _jax

        if grad == 'implicit':
            from gpyrn_tpu.models.implicit import \
                implicit_value_and_grad_for
            ivag = implicit_value_and_grad_for(eng)
            tol = fit_tol if fit_tol is not None else \
                (1e-11 if np.asarray(mu0).dtype == np.float64 else 1e-6)

            @_jax.jit
            def update(z, state, mu, var):
                theta = jnp.where(free_j, from_opt(z), base)
                mu2, var2, _, _ = eng.fit_state(
                    theta, t, self.y, self.yerr2, mu, var,
                    fit_max_iter, tol)
                res = ivag(theta, t, self.y, self.yerr2, mu2, var2,
                           adjoint=adjoint, maxiter=adjoint_maxiter,
                           restart=adjoint_restart)
                g_theta = -res.grad                      # d(−ELBO)/dθ
                dtheta_dz = from_opt(z) if use_log else \
                    jnp.ones_like(z)
                gz = jnp.where(free_j, g_theta * dtheta_dz, 0.0)
                updates, state2 = opt.update(gz, state)
                return (optax.apply_updates(z, updates), state2,
                        -res.elbo, mu2, var2)
        else:
            def loss(zz):
                theta = jnp.where(free_j, from_opt(zz), base)
                return -eng.elbo_fixed(theta, t, self.y, self.yerr2,
                                       mu0, var0, n_sweeps)

            @_jax.jit
            def update(z, state):
                v, g = _jax.value_and_grad(loss)(z)
                updates, state = opt.update(g, state)
                return optax.apply_updates(z, updates), state, v

        best_v, best_z = np.inf, z
        mu_c, var_c = mu0, var0
        for step in range(n_steps):
            if grad == 'implicit':
                z, state, v, mu_c, var_c = update(z, state, mu_c, var_c)
            else:
                z, state, v = update(z, state)
            v = float(v)
            if v < best_v:
                best_v, best_z = v, z
            if callback is not None:
                callback(step, v)

        theta = np.asarray(jnp.where(free_j, from_opt(best_z), base))
        self.set_parameters(theta)
        if grad == 'implicit':
            # the trajectory's final state warm-starts the cache refresh
            self._mu, self._var = np.asarray(mu_c), np.asarray(var_c)
        # refresh the variational cache at the optimum
        elbo, *_ = self.ELBOcalc(mu='previous', var='previous')
        return {'fun': best_v, 'x': theta[free], 'elbo': elbo,
                'n_steps': n_steps}

    # ------------------------------------------------------------------
    # MCMC
    # ------------------------------------------------------------------

    def mcmc(self, priors, p0=None, vars=None, niter=500, sampler='native',
             checkpoint=None, **kwargs):
        """Sample the hyperparameter posterior using the ELBO as the
        log-likelihood surrogate (reference meanfield.py:1154-1286).

        ``sampler='native'`` uses the built-in vmapped affine-invariant
        ensemble sampler (all walkers' ELBO fits batched on device);
        ``sampler='hmc'`` uses vmapped Hamiltonian Monte Carlo with
        ∇ELBO (requires priors from :mod:`gpyrn_tpu.inference.priors`);
        ``sampler='emcee'`` uses emcee if installed (host parity path).
        """
        from gpyrn_tpu.inference.ensemble import run_ensemble
        self._require_components()
        self._apply_vars_selection(vars)

        all_names = np.array(list(self.parameters_dict.keys()))
        free_names = all_names[~self.frozen_mask]
        ndim = len(free_names)
        nwalkers_arg = kwargs.pop('nwalkers', None)
        nwalkers = 2 * ndim if nwalkers_arg is None else nwalkers_arg

        missing = [n for n in free_names if n not in priors]
        if missing:
            raise ValueError(f'missing priors for parameters: {missing}')

        if sampler == 'hmc':
            from gpyrn_tpu.inference.hmc import run_hmc
            if nwalkers_arg is not None:
                kwargs.setdefault('n_chains', nwalkers_arg)
            return run_hmc(self, priors, n_samples=niter, p0=p0,
                           checkpoint=checkpoint, **kwargs)
        if sampler == 'emcee':
            return self._mcmc_emcee(priors, free_names, p0, niter, **kwargs)

        return run_ensemble(self, priors, free_names, p0=p0, niter=niter,
                            nwalkers=nwalkers, checkpoint=checkpoint,
                            **kwargs)

    def _mcmc_emcee(self, priors, free_names, p0, niter, **kwargs):
        try:
            from emcee import EnsembleSampler, backends
            from emcee.utils import sample_ellipsoid
        except ImportError as e:
            raise ImportError(
                "emcee is not installed; use sampler='native'") from e

        def prior_rvs():
            return np.array([priors[name].rvs() for name in free_names])

        def logprior(parameters):
            return float(sum(priors[name].logpdf(par)
                             for par, name in zip(parameters, free_names)))

        def logposterior(parameters):
            lp = logprior(parameters)
            if np.isneginf(lp):
                return -np.inf, -np.inf
            elbo = -self.nELBO(parameters, max_iter=100)
            return lp + elbo, elbo

        ndim = len(free_names)
        nwalkers = 2 * ndim
        if p0 is None:
            p0 = np.array([prior_rvs() for _ in range(nwalkers)])
        else:
            sigma = []
            for name in free_names:
                try:
                    sigma.append(priors[name].std())
                except TypeError:
                    sigma.append(priors[name].std)
            p0 = sample_ellipsoid(p0, np.diag(sigma) / 100, size=nwalkers)
            for i, pw in enumerate(p0):
                if np.isneginf(logprior(pw)):
                    p0[i] = prior_rvs()

        # reference pre-run diagnostics (meanfield.py:1244-1250)
        progress = kwargs.pop('progress', True)
        if progress:
            print('initial values for parameters are set')
            _start = time_module.time()
            _ = [logposterior(pw) for pw in p0]
            _end = time_module.time()
            print()
            print(f'evaluation for initial values took '
                  f'{_end - _start:.0f} sec')
            print('- adjust your expectations accordingly')

        be = backends.HDFBackend(kwargs.pop('filename', 'gprn.h5'))
        be.reset(nwalkers, ndim)
        smplr = EnsembleSampler(nwalkers, ndim, logposterior, backend=be)

        old_tau = np.inf
        # progress bar + per-10-step log_prob print: reference
        # meanfield.py:1264-1266
        for sample in smplr.sample(p0, iterations=niter, progress=progress):
            if smplr.iteration % 10:
                continue
            if progress:
                print(sample.log_prob.max())
            tau = smplr.get_autocorr_time(tol=0)
            converged = np.all(tau * 100 < smplr.iteration)
            converged &= np.all(np.abs(old_tau - tau) / tau < 0.01)
            if converged:
                break
            old_tau = tau
        return smplr

    # ------------------------------------------------------------------
    # prediction & sampling
    # ------------------------------------------------------------------

    def _Prediction(self, nodes=None, weights=None, means=None, jitters=None,
                    tstar=None, mu=None, var=None, separate=False):
        """Posterior predictive of the GPRN per output
        (reference meanfield.py:1289-1379)."""
        nodes, weights, means, jitters = self._get_components(
            nodes, weights, means, jitters)
        if tstar is None:
            tstar = self.time
        theta = _core.pack_parameters(nodes, weights, means, jitters)
        if mu is None and var is None:
            if self._mu is None and self._var is None:
                mu, var = self.engine.init_mu_var(theta, self.y)
            else:
                mu, var = self._mu, self._var

        mean_out, var_out, n_pred, w_pred = self.engine.predict(
            theta, np.asarray(self.time, dtype=float), self.y, self.yerr2,
            np.asarray(mu).ravel(), np.asarray(var).ravel(),
            np.asarray(tstar, dtype=float))
        mean_out = np.asarray(mean_out)
        var_out = np.asarray(var_out)
        if separate:
            sep = np.array([np.asarray(n_pred), np.asarray(w_pred)],
                           dtype=object)
            return mean_out, var_out, sep
        return mean_out, var_out

    def predict(self, tstar=None, nn=1000):
        """GPRN prediction; returns (tstar, mean, std, (nodes, weights))."""
        if tstar is None:
            mi, ma = np.min(self.time), np.max(self.time)
            tptp = np.ptp(self.time)
            tstar = np.linspace(mi - 0.2 * tptp, ma + 0.2 * tptp, nn)
        aa, vv, bb = self._Prediction(tstar=tstar, separate=True)
        ss = np.sqrt(vv)
        return tstar, aa, ss, bb

    def export_predict(self, filename=None, **kw):
        """Ahead-of-time export of the fitted posterior predictive for
        serving (see ``gpyrn_tpu.serving``): returns the
        ``jax.export.Exported``, or — when ``filename`` is given —
        writes the serialized artifact there and returns its byte
        count.  Keywords (``platforms``, ``n_star``, ``dtype``) pass
        through to ``serving.export_predict``."""
        from gpyrn_tpu import serving
        if filename is not None:
            return serving.save_predict(self, filename, **kw)
        return serving.export_predict(self, **kw)

    def _sample_from_gp(self, kernel, time=None, rng=None):
        """A random function drawn from a kernel's GP prior."""
        from gpyrn_tpu.ops.linalg import PREDICT_NUGGET
        rng = np.random.default_rng() if rng is None else rng
        if time is None:
            time = self.time
        time = np.asarray(time, dtype=float)
        if covfunc.is_nonstationary(kernel.structure):
            K = np.asarray(covfunc.evaluate(kernel.structure,
                                            kernel.core_params(),
                                            t1=time[:, None],
                                            t2=time[None, :]))
        else:
            r = time[:, None] - time[None, :]
            K = np.asarray(covfunc.evaluate(kernel.structure,
                                            kernel.core_params(), r=r))
            K = K + PREDICT_NUGGET * np.eye(time.size)
        # eigendecomposition sampling tolerates semi-definite K (the
        # reference relied on scipy's allow_singular=True)
        w, V = np.linalg.eigh(K)
        w = np.clip(w, 0.0, None)
        return V @ (np.sqrt(w) * rng.standard_normal(time.size))

    def sample(self, time=None, rng=None):
        """Prior samples of all node and weight functions."""
        nodes, weights, _, _ = self._get_components()
        node_samples = np.array([self._sample_from_gp(n, time, rng)
                                 for n in nodes])
        weight_samples = np.array([self._sample_from_gp(w, time, rng)
                                   for w in weights])
        return node_samples, weight_samples

    def plot_prediction(self, nn=1000, tstar=None, over=0.2, title=None):
        from gpyrn_tpu.utils.plots import plot_prediction
        return plot_prediction(self, nn=nn, tstar=tstar, over=over,
                               title=title)

    def plot_structure(self, title=None):
        """Graphical-model sketch of the GPRN (the reference declares
        this but leaves it NotImplementedError, meanfield.py:1405-1416;
        here it draws the node→weight→output network)."""
        from gpyrn_tpu.utils.plots import plot_structure
        return plot_structure(self, title=title)

    # ------------------------------------------------------------------
    # checkpoint / resume
    # ------------------------------------------------------------------

    def save(self, filename):
        """Checkpoint hyperparameters, frozen mask and the variational
        warm-start state to a compressed npz file.

        The reference persisted nothing but the emcee HDF5 chain
        (meanfield.py:1253-1255); this also checkpoints the fit state so
        long optimizations resume warm."""
        self._require_components()
        np.savez_compressed(
            filename,
            parameters=self.get_parameters(include_frozen=True),
            frozen_mask=self.frozen_mask,
            mu=np.asarray(self._mu) if self._mu is not None else np.array([]),
            var=(np.asarray(self._var) if self._var is not None
                 else np.array([])),
            elbo_history=getattr(self, 'elbo_history', np.array([])))

    def load(self, filename):
        """Restore a checkpoint written by :meth:`save`.

        Components (kernels/means structure) must already be set via
        :meth:`set_components`; only parameter values and variational
        state are restored."""
        self._require_components()
        z = np.load(filename)
        # restore values with everything thawed (set_parameters would
        # otherwise preserve the *current* values at frozen positions)
        self._frozen_mask = np.zeros(self.n_parameters, dtype=bool)
        self.set_parameters(z['parameters'])
        self._frozen_mask = z['frozen_mask']
        if z['mu'].size:
            self._mu = z['mu']
            self._var = z['var']
        if z['elbo_history'].size:
            self.elbo_history = z['elbo_history']
        return self
