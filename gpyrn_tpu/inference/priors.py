"""Differentiable prior distributions.

The reference takes frozen ``scipy.stats`` objects as priors
(meanfield.py:1208-1212) — fine for emcee, but gradient-based samplers
(HMC) need log-densities that differentiate under jax.  These small
prior classes provide both: a traceable ``logpdf`` (jnp) and host-side
``rvs``/``std`` so they remain drop-in compatible with the ensemble
sampler and the reference's prior protocol.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.scipy import stats as jstats

__all__ = ["Normal", "LogNormal", "Uniform", "HalfNormal", "Gamma",
           "InvGamma", "Jeffreys"]


class _Prior:
    def rvs(self, size=None, rng=None):
        raise NotImplementedError

    def logpdf(self, x):
        raise NotImplementedError

    def std(self):
        return float(np.std(self.rvs(size=4096,
                                     rng=np.random.default_rng(0))))


class Normal(_Prior):
    def __init__(self, loc, scale):
        self.loc, self.scale = float(loc), float(scale)

    def logpdf(self, x):
        return jstats.norm.logpdf(x, self.loc, self.scale)

    def rvs(self, size=None, rng=None):
        rng = np.random.default_rng() if rng is None else rng
        return rng.normal(self.loc, self.scale, size=size)

    def std(self):
        return self.scale


class LogNormal(_Prior):
    def __init__(self, mu, sigma):
        self.mu, self.sigma = float(mu), float(sigma)

    def logpdf(self, x):
        x = jnp.asarray(x)
        valid = x > 0
        xs = jnp.where(valid, x, 1.0)
        lp = (-jnp.log(xs) - jnp.log(self.sigma)
              - 0.5 * jnp.log(2 * jnp.pi)
              - 0.5 * ((jnp.log(xs) - self.mu) / self.sigma) ** 2)
        return jnp.where(valid, lp, -jnp.inf)

    def rvs(self, size=None, rng=None):
        rng = np.random.default_rng() if rng is None else rng
        return rng.lognormal(self.mu, self.sigma, size=size)


class Uniform(_Prior):
    def __init__(self, lo, hi):
        self.lo, self.hi = float(lo), float(hi)

    def logpdf(self, x):
        x = jnp.asarray(x)
        inside = (x >= self.lo) & (x <= self.hi)
        return jnp.where(inside, -jnp.log(self.hi - self.lo), -jnp.inf)

    def rvs(self, size=None, rng=None):
        rng = np.random.default_rng() if rng is None else rng
        return rng.uniform(self.lo, self.hi, size=size)

    def std(self):
        return (self.hi - self.lo) / np.sqrt(12.0)


class HalfNormal(_Prior):
    def __init__(self, scale):
        self.scale = float(scale)

    def logpdf(self, x):
        x = jnp.asarray(x)
        lp = (0.5 * jnp.log(2.0 / jnp.pi) - jnp.log(self.scale)
              - 0.5 * (x / self.scale) ** 2)
        return jnp.where(x >= 0, lp, -jnp.inf)

    def rvs(self, size=None, rng=None):
        rng = np.random.default_rng() if rng is None else rng
        return np.abs(rng.normal(0.0, self.scale, size=size))


class Gamma(_Prior):
    def __init__(self, a, scale=1.0):
        self.a, self.scale = float(a), float(scale)

    def logpdf(self, x):
        return jstats.gamma.logpdf(jnp.asarray(x), self.a,
                                   scale=self.scale)

    def rvs(self, size=None, rng=None):
        rng = np.random.default_rng() if rng is None else rng
        return rng.gamma(self.a, self.scale, size=size)


class InvGamma(_Prior):
    """Inverse-gamma; pairs with :func:`gpyrn_tpu.utils.astro.invGamma`
    for the reference's 98%-mass prior-building workflow."""

    def __init__(self, a, scale=1.0):
        self.a, self.scale = float(a), float(scale)

    def logpdf(self, x):
        x = jnp.asarray(x)
        valid = x > 0
        xs = jnp.where(valid, x, 1.0)
        from jax.scipy.special import gammaln
        lp = (self.a * jnp.log(self.scale) - gammaln(self.a)
              - (self.a + 1) * jnp.log(xs) - self.scale / xs)
        return jnp.where(valid, lp, -jnp.inf)

    def rvs(self, size=None, rng=None):
        rng = np.random.default_rng() if rng is None else rng
        return 1.0 / rng.gamma(self.a, 1.0 / self.scale, size=size)


class Jeffreys(_Prior):
    """log-uniform on [lo, hi]."""

    def __init__(self, lo, hi):
        assert lo > 0
        self.lo, self.hi = float(lo), float(hi)

    def logpdf(self, x):
        x = jnp.asarray(x)
        inside = (x >= self.lo) & (x <= self.hi)
        xs = jnp.where(inside, x, 1.0)
        norm = jnp.log(jnp.log(self.hi / self.lo))
        return jnp.where(inside, -jnp.log(xs) - norm, -jnp.inf)

    def rvs(self, size=None, rng=None):
        rng = np.random.default_rng() if rng is None else rng
        return np.exp(rng.uniform(np.log(self.lo), np.log(self.hi),
                                  size=size))
