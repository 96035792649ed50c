"""Inference-class tests: constructor invariants (reference
tests/test_inference.py), the parameter system, and ELBO parity with the
reference coordinate-ascent engine to 1e-6 relative (SURVEY.md §4b —
verified in practice to ~1e-12)."""
import numpy as np
import pytest

import gpyrn_tpu as g
from .refutil import import_reference


def _sine_problem(q=1, p=1, N=25, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 30, N))
    data = []
    for i in range(p):
        data += [np.sin(2 * np.pi * t / (10 + 2 * i))
                 + 0.1 * rng.standard_normal(N), np.full(N, 0.1)]
    return t, data


# ---------------------------------------------------------------------------
# constructor invariants
# ---------------------------------------------------------------------------

def test_constructor_invariants(tiny_dataset):
    t, y, yerr = tiny_dataset
    gprn = g.inference(1, t, y, yerr)
    assert gprn.N == t.size
    assert gprn.q == 1 and gprn.p == 1 and gprn.qp == 1
    assert gprn.d == t.size * 1 * 2
    np.testing.assert_allclose(gprn.y, y[None, :])


def test_constructor_stacking():
    t, data = _sine_problem(p=2)
    gprn = g.inference(2, t, *data)
    assert gprn.p == 2 and gprn.qp == 4
    np.testing.assert_allclose(gprn.y[0], data[0])
    np.testing.assert_allclose(gprn.y[1], data[2])
    np.testing.assert_allclose(gprn.yerr2[1], data[3] ** 2)


def test_constructor_odd_args_raises(tiny_dataset):
    t, y, yerr = tiny_dataset
    with pytest.raises(AssertionError):
        g.inference(1, t, y, yerr, y)


def test_constructor_shape_mismatch_raises(tiny_dataset):
    t, y, yerr = tiny_dataset
    with pytest.raises((AssertionError, TypeError)):
        g.inference(1, t, y[:-1], yerr)


def test_set_components_scalar_normalization(tiny_dataset):
    t, y, yerr = tiny_dataset
    gprn = g.inference(1, t, y, yerr)
    node = g.covfunc.SquaredExponential(1.0, 5.0)
    weight = g.covfunc.Constant(1.0)
    gprn.set_components(node, weight, None, 0.1)
    assert len(gprn.nodes) == 1 and len(gprn.weights) == 1
    assert gprn.jitters.shape == (1,)


def test_set_components_wrong_counts(tiny_dataset):
    t, y, yerr = tiny_dataset
    gprn = g.inference(2, t, y, yerr)
    with pytest.raises(ValueError):
        gprn.set_components([g.covfunc.SquaredExponential(1, 5)],
                            [g.covfunc.Constant(1)] * 2, None, 0.1)


# ---------------------------------------------------------------------------
# parameter system
# ---------------------------------------------------------------------------

@pytest.fixture
def small_gprn(tiny_dataset):
    t, y, yerr = tiny_dataset
    gprn = g.inference(1, t, y, yerr)
    gprn.set_components([g.covfunc.Periodic(1.0, 10.0, 0.5)],
                        [g.covfunc.SquaredExponential(1.0, 5.0)],
                        [g.meanfunc.Constant(0.5)], [0.1])
    return gprn


def test_get_parameters_order(small_gprn):
    p = small_gprn.get_parameters()
    np.testing.assert_allclose(p, [1.0, 10.0, 0.5, 1.0, 5.0, 0.5, 0.1])


def test_n_parameters(small_gprn):
    assert small_gprn.n_parameters == 7


def test_parameters_dict_names(small_gprn):
    d = small_gprn.parameters_dict
    assert list(d.keys()) == ['node1.theta', 'node1.P', 'node1.ell',
                              'weight1.theta', 'weight1.ell',
                              'mean1.c', 'jitter1']


def test_set_parameters_roundtrip(small_gprn):
    newp = np.array([2.0, 8.0, 0.7, 1.5, 4.0, 0.2, 0.3])
    small_gprn.set_parameters(newp)
    np.testing.assert_allclose(small_gprn.get_parameters(), newp)
    np.testing.assert_allclose(small_gprn.nodes[0].pars, [2.0, 8.0, 0.7])
    np.testing.assert_allclose(small_gprn.jitters, [0.3])


def test_freeze_thaw(small_gprn):
    small_gprn.freeze_parameter(name='node1.P')
    assert small_gprn.frozen_mask[1]
    assert small_gprn.get_parameters().size == 6
    # set with reduced vector keeps frozen value
    small_gprn.set_parameters(np.array([2.0, 0.7, 1.5, 4.0, 0.2, 0.3]))
    np.testing.assert_allclose(small_gprn.nodes[0].pars, [2.0, 10.0, 0.7])
    small_gprn.thaw_parameter(name='node1.P')
    assert not small_gprn.frozen_mask.any()


def test_freeze_glob(small_gprn):
    small_gprn.freeze_parameter(name='node1.*')
    assert small_gprn.frozen_mask[:3].all()
    assert not small_gprn.frozen_mask[3:].any()
    small_gprn.thaw_all_parameters()
    assert not small_gprn.frozen_mask.any()


def test_vars_selection_sugar(small_gprn):
    small_gprn._apply_vars_selection('jitter*')
    assert small_gprn.get_parameters().size == 1
    small_gprn._apply_vars_selection('-jitter*')
    assert small_gprn.get_parameters().size == 6
    small_gprn._apply_vars_selection(['node1.theta', 'mean1.c'])
    assert small_gprn.get_parameters().size == 2
    small_gprn.thaw_all_parameters()


def test_set_parameters_wrong_size_raises(small_gprn):
    with pytest.raises(ValueError):
        small_gprn.set_parameters(np.arange(3, dtype=float))


# ---------------------------------------------------------------------------
# ELBO parity with the reference
# ---------------------------------------------------------------------------

def _build_pair(q, p, t, data, with_means=True):
    rc, rmn, rm = import_reference()
    nodes_o = [g.covfunc.Periodic(1.2, 9.0, 0.6),
               g.covfunc.Matern52(1.1, 4.0)][:q]
    nodes_r = [rc.Periodic(1.2, 9.0, 0.6), rc.Matern52(1.1, 4.0)][:q]
    w_o = [g.covfunc.SquaredExponential(1.0 + 0.1 * k, 5.0 + k)
           for k in range(q * p)]
    w_r = [rc.SquaredExponential(1.0 + 0.1 * k, 5.0 + k)
           for k in range(q * p)]
    if with_means:
        m_o = [g.meanfunc.Linear(0.01, 0.1 * i) for i in range(p)]
        m_r = [rmn.Linear(0.01, 0.1 * i) for i in range(p)]
    else:
        m_o, m_r = [None] * p, [None] * p
    jt = [0.1 + 0.05 * i for i in range(p)]

    ours = g.inference(q, t, *data)
    ours.set_components(nodes_o, w_o, m_o, jt)
    ref = rm.inference(q, t, *data)
    ref.set_components(nodes_r, w_r, m_r, jt)
    return ours, ref, (nodes_r, w_r, m_r, jt)


@pytest.mark.parametrize(
    "q,p", [(1, 1), (1, 2), (2, 2),
            pytest.param(2, 3, marks=pytest.mark.slow)])
def test_elbo_parity(q, p):
    t, data = _sine_problem(q=q, p=p, N=22, seed=q * 10 + p)
    ours, ref, refcomp = _build_pair(q, p, t, data)
    e1, mu1, var1, it1 = ours.ELBOcalc(max_iter=200)
    e2, mu2, var2, it2 = ref.ELBOcalc(*refcomp, max_iter=200)
    assert it1 == it2
    np.testing.assert_allclose(e1, e2, rtol=1e-8)
    np.testing.assert_allclose(mu1, np.asarray(mu2).ravel(), atol=1e-8)
    np.testing.assert_allclose(var1, np.asarray(var2).ravel(), atol=1e-8)


def test_elbo_parity_no_means():
    t, data = _sine_problem(q=2, p=2, N=20, seed=5)
    ours, ref, refcomp = _build_pair(2, 2, t, data, with_means=False)
    e1, *_ = ours.ELBOcalc(max_iter=100)
    e2, *_ = ref.ELBOcalc(*refcomp, max_iter=100)
    np.testing.assert_allclose(e1, e2, rtol=1e-8)


def test_elbo_property_smoke(small_gprn):
    elbo = small_gprn.ELBO
    assert np.isfinite(elbo)


def test_elbo_warm_start_previous(small_gprn):
    e1, mu1, var1, it1 = small_gprn.ELBOcalc()
    e2, mu2, var2, it2 = small_gprn.ELBOcalc(mu='previous', var='previous')
    # warm start must converge at least as fast and land at the same optimum
    assert it2 <= it1
    np.testing.assert_allclose(e1, e2, rtol=5e-3)


def test_nelbo_matches_negative_elbo(small_gprn):
    p = small_gprn.get_parameters()
    small_gprn.ELBOcalc()
    nelbo = small_gprn.nELBO(p)
    # a subsequent warm-started fit re-converges to (approximately) the
    # same optimum — the loose rel-std stopping rule permits small drift
    e = small_gprn.ELBOcalc(mu='previous', var='previous')[0]
    np.testing.assert_allclose(nelbo, -e, rtol=5e-3)


def test_elbocalc_explicit_mu_var_arrays():
    """Explicit mu/var arrays start the fit from the given state.

    (The reference crashes here on numpy >= 2 — its `mu == 'previous'`
    comparison against an array raises, meanfield.py:598 — so the oracle
    is our own engine called directly with the same state.)"""
    t, data = _sine_problem(N=20, seed=9)
    ours, _, _ = _build_pair(1, 1, t, data, with_means=False)
    rng = np.random.default_rng(3)
    d = ours.d
    mu0 = rng.standard_normal(d)
    var0 = rng.uniform(0.1, 1.0, d)
    e1, mu1, var1, it1 = ours.ELBOcalc(mu=mu0.copy(), var=var0.copy(),
                                       max_iter=80)
    eng = ours.engine
    out = eng.elbo_fit(ours._theta(), np.asarray(t, dtype=float),
                       ours.y, ours.yerr2, mu0, var0, 80)
    assert it1 == int(out[3])
    np.testing.assert_allclose(e1, float(out[0]), rtol=1e-12)
    np.testing.assert_allclose(mu1, np.asarray(out[1]), atol=1e-12)
