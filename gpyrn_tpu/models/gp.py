"""Single-GP conditional helper.

Equivalent of the reference's auxiliary GP layer
(/root/reference/gpyrn/_gp.py): a thin ``GP(time, y, yerr)`` holder
whose ``prediction(kernel, time, m, v)`` evaluates the standard GP
conditional — used by the GPRN predictive path and directly usable for
plain single-output GP regression.  The conditional is one jitted
computation (batched solve instead of the reference's O(N*·N²) Python
row loop, _gp.py:133-136), cached per kernel structure.

Deliberate fix: ``new_kernel`` rebuilds ``Multiplication`` composites
with each child's own type (reference _gp.py:99 used k1's type twice).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve

from gpyrn_tpu.ops import kernels as covfunc
from gpyrn_tpu.ops.linalg import (PREDICT_NUGGET, cross_kernel_matrix,
                                  kernel_diag, kernel_matrix)

__all__ = ["GP"]


@functools.lru_cache(maxsize=256)
def _conditional_fn(structure):
    """Jitted GP conditional for one kernel structure."""
    from gpyrn_tpu.config import ensure_compile_cache
    ensure_compile_cache()

    @jax.jit
    def conditional(params, t, tstar, m, v):
        K = kernel_matrix(structure, params, t, PREDICT_NUGGET) + jnp.diag(v)
        L = jnp.linalg.cholesky(K)
        sol = cho_solve((L, True), m)
        Ks = cross_kernel_matrix(structure, params, tstar, t)
        # O(n*) — same values/jitter as diagonal(kernel_matrix) without
        # the n*×n* buffer (ops/linalg.kernel_diag)
        Kss_diag = kernel_diag(structure, params, tstar, PREDICT_NUGGET)
        y_mean = Ks @ sol
        y_var = Kss_diag - jnp.einsum(
            "nk,kn->n", Ks, cho_solve((L, True), Ks.T))
        return y_mean, y_var

    return conditional


class GP:
    """A single Gaussian process over ``time`` with data ``y`` ± ``yerr``.

    Args:
        time: input coordinates
        y: measurements
        yerr: measurement uncertainties (default ~0)
    """

    def __init__(self, time, y, yerr=None):
        self.time = np.asarray(time, dtype=float)
        self.y = np.asarray(y, dtype=float)
        if yerr is None:
            self.yerr = np.full(self.time.size, 1e-12)
        else:
            self.yerr = np.asarray(yerr, dtype=float)
        self.yerr2 = self.yerr ** 2

    def _kernel_pars(self, kernel):
        return kernel.pars

    def _kernel_matrix(self, kernel, time):
        time = np.asarray(time, dtype=float)
        return np.asarray(kernel_matrix(kernel.structure,
                                        kernel.core_params(), time,
                                        PREDICT_NUGGET))

    def _predict_kernel_matrix(self, kernel, time):
        return np.asarray(cross_kernel_matrix(
            kernel.structure, kernel.core_params(),
            np.asarray(time, dtype=float), self.time))

    def new_kernel(self, kernel, new_pars):
        """Rebuild a kernel object with new hyperparameters (composites
        recurse into both children)."""
        new_pars = list(np.atleast_1d(new_pars))
        if isinstance(kernel, covfunc.Sum):
            n1 = kernel.k1.pars.size
            return self.new_kernel(kernel.k1, new_pars[:n1]) + \
                self.new_kernel(kernel.k2, new_pars[n1:])
        if isinstance(kernel, covfunc.Multiplication):
            n1 = kernel.k1.pars.size
            return self.new_kernel(kernel.k1, new_pars[:n1]) * \
                self.new_kernel(kernel.k2, new_pars[n1:])
        return type(kernel)(*new_pars)

    def prediction(self, kernel, time, m=None, v=None):
        """Conditional predictive distribution at ``time``.

        Args:
            kernel: covariance function object
            time: prediction coordinates
            m: observation vector to condition on (defaults to ``y``)
            v: per-point observation variances (defaults to ``yerr²``)

        Returns:
            (y_mean, y_var) arrays
        """
        time = np.atleast_1d(np.asarray(time, dtype=float))
        m = self.y if m is None else np.asarray(m, dtype=float)
        v = self.yerr2 if v is None else np.asarray(v, dtype=float)
        fn = _conditional_fn(kernel.structure)
        mean, var = fn(np.asarray(kernel.core_params(), dtype=float),
                       self.time, time, m, v)
        return np.asarray(mean), np.asarray(var)
