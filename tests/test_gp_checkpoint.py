"""Single-GP helper parity + checkpoint/resume + diagnostics tests."""
import numpy as np
import pytest

import gpyrn_tpu as g
from gpyrn_tpu.models.gp import GP
from .refutil import import_reference


@pytest.fixture(scope="module")
def gp_data():
    rng = np.random.default_rng(5)
    N = 30
    t = np.sort(rng.uniform(0, 30, N))
    y = np.sin(2 * np.pi * t / 9) + 0.1 * rng.standard_normal(N)
    yerr = np.full(N, 0.1)
    return t, y, yerr


def test_gp_prediction_parity_with_reference(gp_data):
    rc, _, _ = import_reference()
    import importlib
    ref_gp = importlib.import_module("gpyrn._gp")
    t, y, yerr = gp_data
    kernel = g.covfunc.SquaredExponential(1.0, 4.0)
    rkernel = rc.SquaredExponential(1.0, 4.0)
    tstar = np.linspace(0, 32, 25)

    ours = GP(t, y, yerr)
    m1, v1 = ours.prediction(kernel, tstar, y, yerr ** 2)
    ref = ref_gp.GP(t, y, yerr)
    m2, v2 = ref.prediction(rkernel, tstar, y, yerr ** 2)
    np.testing.assert_allclose(m1, m2, atol=1e-8)
    np.testing.assert_allclose(v1, np.asarray(v2), atol=1e-8)


def test_gp_interpolates_data(gp_data):
    t, y, yerr = gp_data
    gp = GP(t, y, yerr)
    m, v = gp.prediction(g.covfunc.SquaredExponential(1.0, 4.0), t)
    assert np.mean((m - y) ** 2) < np.mean(y ** 2) * 0.2
    assert np.all(v >= -1e-9)


def test_new_kernel_rebuild():
    gp = GP(np.arange(5.0), np.zeros(5))
    k = g.covfunc.SquaredExponential(1.0, 2.0)
    k2 = gp.new_kernel(k, [3.0, 4.0])
    np.testing.assert_allclose(k2.pars, [3.0, 4.0])
    # composite rebuild keeps each child's type (fixes reference
    # _gp.py:99 which used k1's type twice)
    comp = g.covfunc.SquaredExponential(1.0, 2.0) * \
        g.covfunc.Periodic(1.0, 5.0, 0.5)
    comp2 = gp.new_kernel(comp, [2.0, 3.0, 1.5, 6.0, 0.7])
    assert isinstance(comp2.k2, g.covfunc.Periodic)
    np.testing.assert_allclose(comp2.pars, [2.0, 3.0, 1.5, 6.0, 0.7])


# ---------------------------------------------------------------------------
# checkpoint / resume, diagnostics
# ---------------------------------------------------------------------------

def _build(tiny):
    t, y, yerr = tiny
    m = g.inference(1, t, y, yerr)
    m.set_components([g.covfunc.Periodic(1.0, 10.0, 0.5)],
                     [g.covfunc.SquaredExponential(1.0, 5.0)],
                     [None], [0.1])
    return m


def test_save_load_roundtrip(tiny_dataset, tmp_path):
    m1 = _build(tiny_dataset)
    m1.ELBOcalc()
    m1.freeze_parameter(name='node1.P')
    m1.save(tmp_path / "ckpt.npz")

    m2 = _build(tiny_dataset)
    m2.load(tmp_path / "ckpt.npz")
    np.testing.assert_allclose(m2.get_parameters(include_frozen=True),
                               m1.get_parameters(include_frozen=True))
    np.testing.assert_allclose(m2._mu, m1._mu)
    assert m2.frozen_mask[1]
    # resumed fit converges immediately from the warm state
    _, _, _, it = m2.ELBOcalc(mu='previous', var='previous')
    assert it <= 10


def test_load_restores_frozen_values(tiny_dataset, tmp_path):
    m1 = _build(tiny_dataset)
    m1.freeze_parameter(name='node1.P')
    m1.save(tmp_path / "c.npz")
    m2 = _build(tiny_dataset)
    m2.nodes[0].pars[1] = 99.0       # different frozen value pre-load
    m2.load(tmp_path / "c.npz")
    assert m2.nodes[0].pars[1] == 10.0


def test_elbo_history_diagnostics(tiny_dataset):
    m = _build(tiny_dataset)
    elbo, _, _, it = m.ELBOcalc()
    hist = m.elbo_history
    assert hist.shape == (it,)
    assert np.all(np.isfinite(hist))
    assert hist[-1] == pytest.approx(elbo)
    # coordinate ascent: monotone non-decreasing ELBO
    assert np.all(np.diff(hist) > -1e-6)


def test_stage_timer():
    from gpyrn_tpu.utils.profiling import StageTimer
    timer = StageTimer()
    with timer.stage("work"):
        _ = sum(range(1000))
    s = timer.summary()
    assert "work" in s and s["work"]["n"] == 1
    assert "work" in timer.report()
