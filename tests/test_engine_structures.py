"""Engine coverage for non-trivial model structures: composite (Sum/
Product) kernels, non-stationary kernels, MultiConstant and Keplerian
means — including ELBO parity against the reference where the reference
supports the structure."""
import numpy as np
import pytest

import gpyrn_tpu as g
from .refutil import import_reference


def _data(N=18, p=1, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 30, N))
    data = []
    for i in range(p):
        data += [np.sin(2 * np.pi * t / (9 + 2 * i))
                 + 0.1 * rng.standard_normal(N), np.full(N, 0.1)]
    return t, data


def test_composite_sum_kernel_engine_parity():
    rc, _, rm = import_reference()
    t, data = _data()
    node_o = g.covfunc.Periodic(1.0, 9.0, 0.6) + \
        g.covfunc.SquaredExponential(0.5, 10.0)
    node_r = rc.Periodic(1.0, 9.0, 0.6) + rc.SquaredExponential(0.5, 10.0)
    w_o = [g.covfunc.SquaredExponential(1.0, 5.0)]
    w_r = [rc.SquaredExponential(1.0, 5.0)]

    ours = g.inference(1, t, *data)
    ours.set_components([node_o], w_o, [None], [0.1])
    e1, *_ = ours.ELBOcalc(max_iter=100)

    ref = rm.inference(1, t, *data)
    ref.set_components([node_r], w_r, [None], [0.1])
    e2, *_ = ref.ELBOcalc([node_r], w_r, [None], [0.1], max_iter=100)
    np.testing.assert_allclose(e1, e2, rtol=1e-8)


@pytest.mark.slow
def test_product_kernel_engine_runs():
    t, data = _data()
    node = g.covfunc.SquaredExponential(1.0, 8.0) * \
        g.covfunc.Periodic(1.0, 9.0, 0.6)
    gprn = g.inference(1, t, *data)
    gprn.set_components([node], [g.covfunc.Constant(1.0)], [None], [0.1])
    elbo, mu, var, it = gprn.ELBOcalc(max_iter=100)
    assert np.isfinite(elbo)
    # equals the closed-form QuasiPeriodic equivalent
    gprn2 = g.inference(1, t, *data)
    gprn2.set_components([g.covfunc.QuasiPeriodic(1.0, 8.0, 9.0, 0.6)],
                         [g.covfunc.Constant(1.0)], [None], [0.1])
    e2, *_ = gprn2.ELBOcalc(max_iter=100)
    np.testing.assert_allclose(elbo, e2, rtol=1e-10)


def test_harmonic_periodic_node_engine():
    """Non-stationary node kernel through the full engine."""
    t, data = _data()
    gprn = g.inference(1, t, *data)
    gprn.set_components([g.covfunc.HarmonicPeriodic(2, 1.0, 9.0, 0.8)],
                        [g.covfunc.SquaredExponential(1.0, 5.0)],
                        [None], [0.1])
    elbo, mu, var, it = gprn.ELBOcalc(max_iter=60)
    assert np.isfinite(elbo)
    m, v = gprn._Prediction(tstar=t)
    assert np.all(np.isfinite(m))


@pytest.mark.slow
def test_quasi_harmonic_static_extra_engine():
    """QuasiHarmonicPeriodic keeps N outside pars (core_params map)."""
    t, data = _data()
    gprn = g.inference(1, t, *data)
    k = g.covfunc.QuasiHarmonicPeriodic(2, 1.0, 8.0, 9.0, 0.8)
    assert k.pars.size == 4
    gprn.set_components([k], [g.covfunc.SquaredExponential(1.0, 5.0)],
                        [None], [0.1])
    elbo, *_ = gprn.ELBOcalc(max_iter=60)
    assert np.isfinite(elbo)
    # gradients flow through the core-params map
    val, grad = gprn.elbo_grad(n_sweeps=5)
    assert np.all(np.isfinite(grad))
    assert grad.shape == (gprn.n_parameters,)


def test_multiconstant_mean_engine():
    t, data = _data(N=18)
    obsid = np.r_[np.ones(9), 2 * np.ones(9)]
    mean = g.meanfunc.MultiConstant([0.3, 0.1], obsid, t)
    gprn = g.inference(1, t, *data)
    gprn.set_components([g.covfunc.Periodic(1.0, 9.0, 0.6)],
                        [g.covfunc.SquaredExponential(1.0, 5.0)],
                        [mean], [0.1])
    elbo, *_ = gprn.ELBOcalc(max_iter=60)
    assert np.isfinite(elbo)
    # prediction at new times exercises the digitize branch
    tstar, m, s, _ = gprn.predict(nn=30)
    assert np.all(np.isfinite(m))


@pytest.mark.slow
def test_keplerian_mean_engine():
    t, data = _data()
    gprn = g.inference(1, t, *data)
    gprn.set_components([g.covfunc.Periodic(1.0, 9.0, 0.6)],
                        [g.covfunc.SquaredExponential(1.0, 5.0)],
                        [g.meanfunc.Keplerian(12.0, 0.5, 0.1, 0.4, 1.0)],
                        [0.1])
    elbo, *_ = gprn.ELBOcalc(max_iter=60)
    assert np.isfinite(elbo)
    val, grad = gprn.elbo_grad(n_sweeps=5)
    assert np.all(np.isfinite(grad))


def test_sum_of_means_engine_parity():
    rc, rmn, rm = import_reference()
    t, data = _data()
    mean_o = g.meanfunc.Constant(0.2) + g.meanfunc.Linear(0.01, 0.0)
    mean_r = rmn.Constant(0.2) + rmn.Linear(0.01, 0.0)
    ours = g.inference(1, t, *data)
    ours.set_components([g.covfunc.Periodic(1.0, 9.0, 0.6)],
                        [g.covfunc.SquaredExponential(1.0, 5.0)],
                        [mean_o], [0.1])
    e1, *_ = ours.ELBOcalc(max_iter=80)
    rn = [rc.Periodic(1.0, 9.0, 0.6)]
    rw = [rc.SquaredExponential(1.0, 5.0)]
    ref = rm.inference(1, t, *data)
    ref.set_components(rn, rw, [mean_r], [0.1])
    e2, *_ = ref.ELBOcalc(rn, rw, [mean_r], [0.1], max_iter=80)
    np.testing.assert_allclose(e1, e2, rtol=1e-8)


def test_set_parameters_roundtrip_composite():
    t, data = _data()
    node = g.covfunc.Periodic(1.0, 9.0, 0.6) + \
        g.covfunc.SquaredExponential(0.5, 10.0)
    mean = g.meanfunc.Constant(0.2) + g.meanfunc.Linear(0.01, 0.0)
    gprn = g.inference(1, t, *data)
    gprn.set_components([node], [g.covfunc.Matern32(1.0, 4.0)],
                        [mean], [0.1])
    p = gprn.get_parameters()
    assert p.size == 5 + 2 + 3 + 1
    newp = p * 1.1
    gprn.set_parameters(newp)
    np.testing.assert_allclose(gprn.get_parameters(), newp)
    names = list(gprn.parameters_dict.keys())
    assert len(names) == len(set(names)), "duplicate parameter names"
