"""The memory-lean reference-semantics ELBO path (`elbo_fit_lean` /
`elbo_refine_lean`, models/gprn.py) must agree with the dense engine:
same ELBO, same iteration count under the reference stopping rule, same
variational posteriors — for q=1 and the q>1 configurations that
exercise the cumulative-sumSigmaF cross traces and the raw weight-mean
reshape quirk.  Also covers the chunked branches via the test hook and
the `mixed_stop='elbo'` wrapper option."""
import numpy as np
import pytest

import gpyrn_tpu as g
from gpyrn_tpu.models import gprn as core


def _build(q, p, N, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 60, N))
    data = []
    for i in range(p):
        data += [np.sin(2 * np.pi * t / (9 + 4 * i))
                 + 0.1 * rng.standard_normal(N),
                 np.full(N, 0.1)]
    m = g.inference(q, t, *data)
    nodes = [g.covfunc.Periodic(1.0, 11.0, 0.6),
             g.covfunc.SquaredExponential(1.2, 8.0)][:q]
    weights = [g.covfunc.SquaredExponential(1.0 + 0.1 * a, 6.0 + a)
               for a in range(q * p)]
    means = [g.meanfunc.Constant(0.1)] + [None] * (p - 1)
    m.set_components(nodes, weights, means, [0.1] * p)
    return m


@pytest.mark.parametrize(
    "q,p", [(1, 1),
            pytest.param(1, 3, marks=pytest.mark.slow),
            pytest.param(2, 2, marks=pytest.mark.slow)])
def test_elbo_fit_lean_matches_dense(q, p):
    m = _build(q, p, N=24, seed=q * 10 + p)
    eng = m.engine
    t = np.asarray(m.time, dtype=float)
    theta = m._theta()
    mu0, var0 = eng.init_mu_var(theta, m.y)

    e_d, mu_d, var_d, it_d, conv_d, _ = eng.elbo_fit(
        theta, t, m.y, m.yerr2, mu0, var0, 80)
    e_l, mu_l, var_l, it_l, conv_l, _ = eng.elbo_fit_lean(
        theta, t, m.y, m.yerr2, mu0, var0, 80)

    assert int(it_d) == int(it_l)
    assert bool(conv_d) == bool(conv_l)
    np.testing.assert_allclose(float(e_l), float(e_d), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(mu_l), np.asarray(mu_d),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_l), np.asarray(var_d),
                               atol=1e-9)


@pytest.mark.slow
@pytest.mark.parametrize("q,p", [(1, 2), (2, 1)])
def test_elbo_refine_lean_matches_dense(q, p):
    m = _build(q, p, N=20, seed=5)
    eng = m.engine
    t = np.asarray(m.time, dtype=float)
    theta = m._theta()
    mu0, var0 = eng.init_mu_var(theta, m.y)

    e_d, mu_d, var_d = eng.elbo_refine(theta, t, m.y, m.yerr2,
                                       mu0, var0, 4)
    e_l, mu_l, var_l = eng.elbo_refine_lean(theta, t, m.y, m.yerr2,
                                            mu0, var0, 4)
    np.testing.assert_allclose(float(e_l), float(e_d), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(mu_l), np.asarray(mu_d),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(var_l), np.asarray(var_d),
                               atol=1e-10)


@pytest.mark.slow
def test_elbo_fit_lean_chunked_branch():
    """Force the column-chunked diag/trace path at small N."""
    m0 = _build(1, 2, N=22, seed=7)
    eng = m0.engine
    t = np.asarray(m0.time, dtype=float)
    theta = m0._theta()
    mu0, var0 = eng.init_mu_var(theta, m0.y)
    e0, mu_a, _, it0, _, _ = eng.elbo_fit_lean(theta, t, m0.y, m0.yerr2,
                                               mu0, var0, 60)

    core._CHUNK_OVERRIDE = 8
    core.make_engine.cache_clear()
    try:
        m1 = _build(1, 2, N=22, seed=7)
        eng1 = m1.engine
        e1, mu_b, _, it1, _, _ = eng1.elbo_fit_lean(
            theta, t, m1.y, m1.yerr2, mu0, var0, 60)
    finally:
        core._CHUNK_OVERRIDE = None
        core.make_engine.cache_clear()

    assert int(it0) == int(it1)
    np.testing.assert_allclose(float(e0), float(e1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(mu_a), np.asarray(mu_b),
                               atol=1e-10)


@pytest.mark.slow
def test_mixed_stop_elbo_reference_semantics(monkeypatch):
    """`mixed_stop='elbo'` must run the f32 fit under the reference
    stopping rule and land on the same converged ELBO as the default
    mixed fit (both polished identically)."""
    import jax
    if not jax.config.jax_enable_x64:
        pytest.skip("x64 disabled")
    m = _build(1, 2, N=24, seed=3)
    e_state, _, _, _ = m.ELBOcalc(precision='mixed')
    m2 = _build(1, 2, N=24, seed=3)
    m2.mixed_stop = 'elbo'
    e_elbo, _, _, n_iter = m2.ELBOcalc(precision='mixed')
    # the reference rule stops earlier than the tight state rule, so
    # the two mixed modes agree only to ~the reference rule's own
    # tolerance (rel-std(3) < 1e-3) — not bitwise
    np.testing.assert_allclose(e_elbo, e_state, rtol=5e-3)
    # iteration semantics: the count must be the f32 reference-rule
    # fit's own sweep count plus the polish sweeps
    import jax.numpy as jnp
    f32 = lambda x: jnp.asarray(np.asarray(x), dtype=jnp.float32)  # noqa
    t = np.asarray(m2.time, dtype=float)
    theta = m2._theta()
    mu0, var0 = m2.engine.init_mu_var(f32(theta), f32(m2.y))
    *_, it_ref, _, _ = m2.engine.elbo_fit(
        f32(theta), f32(t), f32(m2.y), f32(m2.yerr2), mu0, var0, 10000)
    assert n_iter == int(it_ref) + m2.refine_sweeps


def test_wrapper_lean_dispatch(monkeypatch):
    """ELBOcalc routes through the lean engines past GPYRN_TPU_LEAN_N."""
    monkeypatch.setenv("GPYRN_TPU_LEAN_N", "10")   # tiny threshold
    m = _build(1, 1, N=24, seed=1)
    e_lean, _, _, it_lean = m.ELBOcalc()
    m2 = _build(1, 1, N=24, seed=1)
    monkeypatch.setenv("GPYRN_TPU_LEAN_N", "1000000")
    e_dense, _, _, it_dense = m2.ELBOcalc()
    assert it_lean == it_dense
    np.testing.assert_allclose(e_lean, e_dense, rtol=1e-10)
