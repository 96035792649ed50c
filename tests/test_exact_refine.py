"""Blocked df64 on-chip refine (models/exact_blocked.py) tests.

Claim under test: the df64 stage engine reproduces the f64 engine's
``elbo_refine`` — same sweeps, same reference-convention ELBO terms —
to ~1e-9 relative, using only f32 hardware ops (blocked double-single
arithmetic).  This is the mixed-precision fit's on-chip polish stage,
replacing the round-1 CPU-f64 hop (VERDICT round 1, item 1).
"""
import numpy as np
import pytest

import gpyrn_tpu as g
from gpyrn_tpu.models.exact_blocked import (exact_refine_supported,
                                            refine_exact)


def _converged_state(gprn, tol=1e-10, max_iter=20000):
    eng = gprn.engine
    t = np.asarray(gprn.time, dtype=float)
    theta = gprn._theta()
    mu0, var0 = eng.init_mu_var(theta, gprn.y)
    mu, var, it, conv = eng.fit_state(theta, t, gprn.y, gprn.yerr2,
                                      mu0, var0, max_iter, tol)
    return np.asarray(mu), np.asarray(var)


def _compare(gprn, n_sweeps=2, rel=1e-7):
    mu, var = _converged_state(gprn)
    eng = gprn.engine
    t = np.asarray(gprn.time, dtype=float)
    theta = gprn._theta()
    e64, mu64, var64 = eng.elbo_refine(theta, t, gprn.y, gprn.yerr2,
                                       mu, var, n_sweeps)
    e_df, mu_df, var_df = refine_exact(gprn, mu, var, n_sweeps=n_sweeps)
    e64 = float(e64)
    assert e_df == pytest.approx(e64, rel=rel)
    scale = 1.0 + np.max(np.abs(np.asarray(mu64)))
    assert np.max(np.abs(mu_df - np.asarray(mu64))) / scale < 1e-7
    vscale = 1.0 + np.max(np.abs(np.asarray(var64)))
    assert np.max(np.abs(var_df - np.asarray(var64))) / vscale < 1e-7


@pytest.fixture(scope="module")
def dataset2():
    rng = np.random.default_rng(3)
    N = 34
    t = np.sort(rng.uniform(0, 40, N))
    data = []
    for i in range(2):
        data += [np.sin(2 * np.pi * t / (9 + 3 * i))
                 + 0.1 * rng.standard_normal(N), np.full(N, 0.1)]
    return t, data


@pytest.mark.slow
def test_refine_matches_f64_q1_p1():
    rng = np.random.default_rng(5)
    N = 30
    t = np.sort(rng.uniform(0, 40, N))
    y = np.sin(2 * np.pi * t / 10) + 0.1 * rng.standard_normal(N)
    gprn = g.inference(1, t, y, np.full(N, 0.1))
    gprn.set_components(g.covfunc.Periodic(1.0, 10.0, 0.5),
                        g.covfunc.SquaredExponential(1.0, 5.0),
                        g.meanfunc.Constant(0.1), 0.1)
    _compare(gprn)


@pytest.mark.slow
def test_refine_matches_f64_q1_p2(dataset2):
    t, data = dataset2
    gprn = g.inference(1, t, *data)
    gprn.set_components(g.covfunc.QuasiPeriodic(1.0, 15.0, 9.0, 0.7),
                        [g.covfunc.SquaredExponential(1.0, 15.0),
                         g.covfunc.Matern52(0.8, 10.0)],
                        [None, None], [0.1, 0.1])
    _compare(gprn)


@pytest.mark.slow
def test_refine_matches_f64_q2_cumulative_quirk(dataset2):
    """q=2 exercises the cumulative-sumSigmaF cross traces
    (reference meanfield.py:1039) and the raw weight-mean flatten."""
    t, data = dataset2
    gprn = g.inference(2, t, *data)
    gprn.set_components(
        [g.covfunc.Periodic(1.0, 9.0, 0.6), g.covfunc.Matern52(1.0, 6.0)],
        [g.covfunc.SquaredExponential(1.0 + 0.1 * k, 8.0)
         for k in range(4)],
        [None, None], [0.1, 0.1])
    _compare(gprn)


@pytest.mark.slow
def test_mixed_precision_uses_df64_refine(dataset2):
    """ELBOcalc(precision='mixed') with the df64 refine method lands on
    the converged f64 fixed-point ELBO (the end-to-end mixed pipeline
    with zero f64 device math).  The oracle is the f64 refine at the
    fully-converged state, NOT plain ELBOcalc — the reference stopping
    rule (rel-std < 1e-3) halts far short of the fixed point."""
    t, data = dataset2
    def build():
        m = g.inference(1, t, *data)
        m.set_components(g.covfunc.QuasiPeriodic(1.0, 15.0, 9.0, 0.7),
                         [g.covfunc.SquaredExponential(1.0, 15.0),
                          g.covfunc.Matern52(0.8, 10.0)],
                         [None, None], [0.1, 0.1])
        return m
    g64 = build()
    mu, var = _converged_state(g64)
    e64 = float(g64.engine.elbo_refine(
        g64._theta(), np.asarray(t, dtype=float), g64.y, g64.yerr2,
        mu, var, 3)[0])
    gmix = build()
    gmix.refine_method = 'df64'
    gmix.mixed_tol = 1e-7
    # this test pins df64-refine fidelity from a DEEP f32 state; the
    # default merit-stall stop trades that depth for wall-clock (its
    # own contract is covered by tests/test_fit_stall.py)
    gmix.mixed_stall = False
    emix, *_ = gmix.ELBOcalc(precision='mixed')
    assert emix == pytest.approx(e64, rel=2e-6)


@pytest.mark.slow
def test_refine_matches_f64_round3_kernels(dataset2):
    """Round-3 df64 assembly rules: a model spanning the NEW kernel
    families (NewRQP node; GammaExp and non-stationary Linear-composite
    weights) must refine on the df64 path to the same ELBO as f64."""
    t, data = dataset2
    gprn = g.inference(1, t, *data)
    gprn.set_components(
        g.covfunc.NewRQP(1.0, 0.9, 0.8, 30.0, 9.0, 0.7),
        [g.covfunc.GammaExp(1.0, 1.4, 12.0),
         g.covfunc.SquaredExponential(0.8, 10.0) +
         g.covfunc.Linear(80.0) * g.covfunc.Constant(0.02)],
        [None, None], [0.1, 0.1])
    assert exact_refine_supported(gprn.engine.spec)
    _compare(gprn, rel=1e-6)


def test_unsupported_structure_rejected():
    """Every reference-expressible construct now has a df64 rule (the
    Derivative wrapper was the last); unknown tags still report
    unsupported."""
    from gpyrn_tpu.ops.df64_kernels import df_supported
    assert df_supported(("d", ("SE",)))
    assert df_supported(("d", ("P",)))
    assert df_supported(("d", ("QP",)))
    assert not df_supported(("d", ("M52",)))   # not twice-differentiable
    assert not df_supported(("not-a-kernel",))


@pytest.mark.slow
def test_refine_matches_f64_derivative_node(dataset2):
    """A Derivative(SE) node model refines on the df64 path to the same
    ELBO as the f64 engine (the last kernel construct to gain a df64
    assembly rule)."""
    t, data = dataset2
    gprn = g.inference(1, t, data[0], data[1])
    gprn.set_components(g.covfunc.Derivative(
                            g.covfunc.SquaredExponential(1.0, 5.0)),
                        g.covfunc.SquaredExponential(1.0, 5.0),
                        [None], [0.1])
    assert exact_refine_supported(gprn.engine.spec)
    _compare(gprn, rel=1e-6)


@pytest.mark.slow
def test_mixed_component_overrides_reach_df64_polish(dataset2):
    """ELBOcalc(nodes', weights', ..., precision='mixed') must evaluate
    the df64 polish at the OVERRIDE hyperparameters, not the stored
    ones (the f64 branch always did; the df64 branch once re-packed
    theta from the object)."""
    t, data = dataset2
    def build():
        m = g.inference(1, t, *data)
        m.set_components(g.covfunc.QuasiPeriodic(1.0, 15.0, 9.0, 0.7),
                         [g.covfunc.SquaredExponential(1.0, 15.0),
                          g.covfunc.Matern52(0.8, 10.0)],
                         [None, None], [0.1, 0.1])
        return m
    # override: different node amplitude + jitters
    nodes_o = [g.covfunc.QuasiPeriodic(1.4, 15.0, 9.0, 0.7)]
    jit_o = [0.15, 0.2]

    m_df = build()
    m_df.refine_method = 'df64'
    e_df, *_ = m_df.ELBOcalc(nodes=nodes_o, jitters=jit_o,
                             precision='mixed')
    m_64 = build()
    m_64.refine_method = 'f64'
    e_64, *_ = m_64.ELBOcalc(nodes=nodes_o, jitters=jit_o,
                             precision='mixed')
    assert e_df == pytest.approx(e_64, rel=5e-6)
    # and both must differ from the non-override fit
    m_plain = build()
    m_plain.refine_method = 'f64'
    e_plain, *_ = m_plain.ELBOcalc(precision='mixed')
    assert abs(e_df - e_plain) > 1e-3 * abs(e_plain)
