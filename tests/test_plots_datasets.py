"""Plotting + bundled-dataset tests."""
import matplotlib
matplotlib.use("Agg")

import numpy as np
import pytest

import gpyrn_tpu as g
from gpyrn_tpu.datasets import SOLAR_COLUMNS, load_solar, solar_observations


def test_solar_observations_columns():
    d = solar_observations()
    assert set(d) == set(SOLAR_COLUMNS)
    assert d["BJD"].shape == (497,)
    assert np.all(np.isfinite(d["RV"]))


def test_load_solar_splat():
    time, data = load_solar(("RV", "FWHM"))
    assert time[0] == 0.0
    assert len(data) == 4
    assert abs(data[0].mean()) < 1e-8      # mean-subtracted
    assert np.all(data[1] > 0)             # errors positive


def test_load_solar_into_inference():
    time, data = load_solar(("RV", "BIS"))
    gprn = g.inference(1, time, *data)
    assert gprn.p == 2 and gprn.N == 497


@pytest.mark.slow
@pytest.mark.parametrize("p", [1, 2, 3, 4])
def test_plot_prediction(p, tiny_dataset):
    t, y, yerr = tiny_dataset
    data = [y, yerr] * p
    gprn = g.inference(1, t, *data)
    weights = [g.covfunc.SquaredExponential(1.0, 5.0) for _ in range(p)]
    means = [g.meanfunc.Constant(0.0)] * p
    gprn.set_components([g.covfunc.Periodic(1.0, 10.0, 0.5)], weights,
                        means, [0.1] * p)
    gprn.ELBOcalc(max_iter=50)
    fig, axs = gprn.plot_prediction(nn=40, title="test")
    assert "pred1" in axs and "node" in axs
    for i in range(2, p + 1):
        assert f"pred{i}" in axs and f"resid{i}" in axs
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_plot_elbo_history():
    from gpyrn_tpu.utils.plots import plot_elbo_history
    ax = plot_elbo_history(np.array([-10.0, -5.0, -4.0]))
    assert ax is not None
    import matplotlib.pyplot as plt
    plt.close(ax.figure)


@pytest.mark.parametrize("q,p", [(1, 1), (2, 3)])
def test_plot_structure(q, p, tiny_dataset):
    t, y, yerr = tiny_dataset
    gprn = g.inference(q, t, *([y, yerr] * p))
    gprn.set_components(
        [g.covfunc.Periodic(1.0, 10.0, 0.5)] * q,
        [g.covfunc.SquaredExponential(1.0, 5.0)] * (q * p),
        [g.meanfunc.Constant(0.0)] * p, [0.1] * p)
    fig, ax = gprn.plot_structure(title="structure")
    # every node, output, and (small-lattice) weight label is drawn
    texts = " ".join(txt.get_text() for txt in ax.texts)
    assert f"f$_{{{q}}}$" in texts and f"y$_{{{p}}}$" in texts
    assert "SquaredExponential" in texts     # weight-kernel caption
    assert "w$_{11}$" in texts               # q*p <= 12: edges tagged
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_plot_structure_requires_components(tiny_dataset):
    t, y, yerr = tiny_dataset
    gprn = g.inference(1, t, y, yerr)
    with pytest.raises(AssertionError):
        gprn.plot_structure()
