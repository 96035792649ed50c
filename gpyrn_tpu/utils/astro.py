"""Astronomy + statistics utilities.

TPU-native equivalents of the reference utility collection
(/root/reference/gpyrn/_utils.py): Keplerian RV curves, phase folding,
prior-building helpers, weighted RMS, and a Cholesky-based multivariate
normal log-density.  The Keplerian solver is a fixed-iteration, fully
vectorized Newton refinement (traceable under jit; the reference used
Python list comprehensions, _utils.py:62-118).
"""
from __future__ import annotations

from functools import wraps
from typing import Union

import numpy as np
import jax.numpy as jnp
from jax import Array as _JaxArray, lax

__all__ = [
    "Array", "semi_amplitude", "keplerian", "keplerian_rv",
    "phase_folding", "truncCauchy_rvs", "invGamma", "log_sum",
    "multivariate_normal", "rms", "wrms", "anderson_darling_test",
    "_array_input",
]

# type alias for annotations, as in the reference (_utils.py:17)
Array = Union[np.ndarray, _JaxArray]


def _array_input(f):
    """Decorator giving ``__call__``-style methods a 1-d array input
    (reference _utils.py:20-27)."""
    @wraps(f)
    def wrapped(self, t):
        return f(self, np.atleast_1d(t))
    return wrapped


def semi_amplitude(period, Mplanet, Mstar, ecc):
    """RV semi-amplitude K [m/s] for a planet of mass ``Mplanet`` [M_Jup]
    with ``period`` [yr] around a star of ``Mstar`` [M_Sun] and
    eccentricity ``ecc`` (reference _utils.py:32-58)."""
    per = np.power(1 / period, 1 / 3)
    Pmass = Mplanet / 1
    Smass = np.power(1 / Mstar, 2 / 3)
    Ecc = 1 / np.sqrt(1 - ecc ** 2)
    return 28.435 * per * Pmass * Smass * Ecc


def keplerian_rv(t, P=365.0, K=0.1, e=0.0, w=np.pi, T=0.0, phi=None,
                 gamma=0.0, n_iter=100):
    """Radial-velocity curve of a Keplerian orbit (pure jax, traceable).

    Solves Kepler's equation E - e sin E = M by Newton iteration from the
    starter E0 = M + e sin M + e²/2 sin 2M (same starter as the reference,
    _utils.py:104) with a fixed iteration count for static control flow.
    """
    t = jnp.atleast_1d(jnp.asarray(t))
    if phi is not None:
        T = t[0] - (P * phi) / (2.0 * jnp.pi)
    M = 2 * jnp.pi * (t - T) / P
    E0 = M + e * jnp.sin(M) + 0.5 * e ** 2 * jnp.sin(2 * M)

    def newton(_, E):
        # same update as the reference loop (_utils.py:109-115):
        # E <- E + (M - (E - e sin E)) / (1 - e cos E)
        return E + (M - (E - e * jnp.sin(E))) / (1 - e * jnp.cos(E))

    E = lax.fori_loop(0, n_iter, newton, E0)
    nu = 2 * jnp.arctan(jnp.sqrt((1 + e) / (1 - e)) * jnp.tan(E / 2))
    return gamma + K * (e * jnp.cos(w) + jnp.cos(w + nu))


def keplerian(P=365, K=0.1, e=0, w=np.pi, T=0, phi=None, gamma=0, t=None):
    """Reference-compatible wrapper returning ``(t, RV)``
    (reference _utils.py:62-118)."""
    if t is None:
        raise ValueError("keplerian() requires a time array t")
    rv = np.asarray(keplerian_rv(t, P=P, K=K, e=e, w=w, T=T, phi=phi,
                                 gamma=gamma))
    return t, rv


def phase_folding(t, y, yerr, period):
    """Phase-fold data on a period; returns (phase, folded_y, folded_yerr)
    sorted by phase (reference _utils.py:122-155)."""
    foldtimes = np.asarray(t) / period
    foldtimes = foldtimes % 1
    if yerr is None:
        yerr = 0 * np.asarray(y)
    phase, folded_y, folded_yerr = zip(*sorted(zip(foldtimes, y, yerr)))
    return phase, folded_y, folded_yerr


def truncCauchy_rvs(loc=0, scale=1, a=-1, b=1, size=None, rng=None):
    """Samples from a Cauchy truncated to [a, b]
    (reference _utils.py:159-181)."""
    rng = np.random.default_rng() if rng is None else rng
    ua = np.arctan((a - loc) / scale) / np.pi + 0.5
    ub = np.arctan((b - loc) / scale) / np.pi + 0.5
    U = rng.uniform(ua, ub, size=size)
    return loc + scale * np.tan(np.pi * (U - 0.5))


def invGamma(lower, upper, x0=(1, 5), showit=False):
    """Inverse-gamma distribution with ~98% of its mass in [lower, upper]
    — a prior-building helper (reference _utils.py:189-211)."""
    from scipy.stats import invgamma
    from scipy.optimize import minimize

    def loss(x, lims):
        d = invgamma(a=x[0], scale=x[1])
        return float(np.sum(np.array([d.cdf(lims[0]) - 0.01,
                                      d.sf(lims[1]) - 0.01]) ** 2))

    result = minimize(loss, x0=list(x0), args=([lower, upper],),
                      method="L-BFGS-B", bounds=[(0, None), (0, None)],
                      tol=1e-10)
    a, b = result.x
    if showit:  # pragma: no cover - plotting
        import matplotlib.pyplot as plt
        _, ax = plt.subplots(1, 1, constrained_layout=True)
        d = invgamma(a=a, scale=b)
        x = np.linspace(0.2 * lower, 2 * upper, 1000)
        ax.plot(x, d.pdf(x))
        ax.vlines([lower, upper], 0, d.pdf(x).max())
        plt.show()
    return invgamma(a=a, scale=b)


def log_sum(log_summands):
    """Numerically stable log of a sum of exponentials.

    Replaces the reference's shuffle-until-finite loop (_utils.py:215-222,
    evidence.py:183-190) with a proper logsumexp.
    """
    x = jnp.asarray(log_summands)
    return float(jax_logsumexp(x))


def jax_logsumexp(x):
    from jax.scipy.special import logsumexp
    return logsumexp(x)


def multivariate_normal(r, c, method="cholesky"):
    """Multivariate-normal log-density of residual vector ``r`` with
    covariance ``c`` (reference _utils.py:226-257)."""
    r = jnp.asarray(r)
    c = jnp.asarray(c)
    kk = r.shape[0] * jnp.log(2 * jnp.pi)
    if method == "cholesky":
        L = jnp.linalg.cholesky(c)
        alpha = jax_cho_solve(L, r)
        return float(-0.5 * (kk + r @ alpha +
                             2 * jnp.sum(jnp.log(jnp.diag(L)))))
    if method == "solve":
        _, d = jnp.linalg.slogdet(c)
        alpha = jnp.linalg.solve(c, r)
        return float(-0.5 * (kk + r @ alpha + d))
    raise ValueError(f"unknown method {method!r}")


def jax_cho_solve(L, b):
    from jax.scipy.linalg import cho_solve
    return cho_solve((L, True), b)


def rms(array):
    """Root mean square about the mean (reference _utils.py:261-275)."""
    array = np.asarray(array)
    mu = np.average(array)
    return np.sqrt(np.sum((array - mu) ** 2) / array.size)


def wrms(array, weights):
    """Weighted RMS about the weighted mean, weights = 1/err²
    (reference _utils.py:278-296)."""
    array = np.asarray(array)
    weights = np.asarray(weights)
    mu = np.average(array, weights=weights)
    return np.sqrt(np.sum(weights * (array - mu) ** 2) / np.sum(weights))


def anderson_darling_test(r):
    """Anderson-Darling normality test with a compact label
    (reference _utils.py:299-306).

    scipy ≥ 1.17 deprecates the critical-value attributes in favour of
    a ``method`` argument returning a p-value; both result shapes are
    handled so the label survives the scipy 1.19 removal."""
    import warnings
    from scipy.stats import anderson
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", FutureWarning)
        result = anderson(r)
    if hasattr(result, "significance_level"):
        s = result.significance_level[
            result.statistic > result.critical_values]
        if s.size == 0:
            return result, f"A-D: {result.significance_level[-1]:.0f}%"
        return result, f"A-D: {s.max():.0f}%"
    return result, f"A-D p: {result.pvalue:.2f}"  # pragma: no cover
