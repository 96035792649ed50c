"""Prediction/component plotting.

Equivalent of the reference plotting module
(/root/reference/gpyrn/_plots.py): a mosaic figure per output with the
data + posterior predictive band, residual panels with their std, the
posterior weight function(s) with the mean function on a twin axis, and
the posterior node function(s).  Layouts adapt to p ∈ {1, 2, 3} (larger
p falls back to a uniform per-output stack, which the reference did not
support)."""
from __future__ import annotations

import numpy as np

__all__ = ["plot_prediction", "plot_elbo_history", "equal_y_axis"]


def equal_y_axis(ax):
    """Symmetrize the y limits about zero."""
    ylim = ax.get_ylim()
    m = np.max(np.abs(ylim))
    ax.set_ylim(-m, m)


def _layout(p):
    if p == 1:
        return [['pred1', 'd1'],
                ['resid1', 'node']]
    if p == 2:
        return [['pred1', 'd1'],
                ['pred1', 'd1'],
                ['resid1', 'node'],
                ['pred2', 'node'],
                ['pred2', 'd2'],
                ['resid2', 'd2']]
    if p == 3:
        return [['node', 'node'],
                ['node', 'node'],
                ['pred1', 'd1'], ['pred1', 'd1'],
                ['resid1', 'd1'],
                ['pred2', 'd2'], ['pred2', 'd2'],
                ['resid2', 'd2'],
                ['pred3', 'd3'], ['pred3', 'd3'],
                ['resid3', 'd3']]
    # general fallback: one pred/resid/weight row block per output
    rows = [['node', 'node']]
    for i in range(1, p + 1):
        rows += [[f'pred{i}', f'd{i}'], [f'pred{i}', f'd{i}'],
                 [f'resid{i}', f'd{i}']]
    return rows


def plot_prediction(gprn, nn: int = 1000, tstar=None, over: float = 0.2,
                    title=None):
    """Plot the GPRN posterior predictive, residuals, weights and nodes.

    Returns ``(fig, axs)``; ``axs`` is the mosaic dict."""
    import matplotlib.pyplot as plt

    time = np.asarray(gprn.time)
    if tstar is None:
        tptp = np.ptp(time)
        tstar = np.linspace(time.min() - over * tptp,
                            time.max() + over * tptp, nn)

    a, _ = gprn._Prediction()                       # at the data times
    aa, vv, bb = gprn._Prediction(tstar=tstar, separate=True)
    ss = np.sqrt(vv)
    node_pred = np.asarray(bb[0], dtype=float)      # (q, n*)
    weight_pred = np.asarray(bb[1], dtype=float)    # (q*p, n*)

    fig = plt.figure(constrained_layout=False, figsize=(10, 4 * gprn.p))
    if title is not None:
        fig.suptitle(title)
    axs = fig.subplot_mosaic(_layout(gprn.p))

    means = []
    for i in range(gprn.p):
        ax = axs[f'pred{i + 1}']
        ax.set(xlabel='', ylabel=f'y{i + 1}')
        ax.errorbar(time, gprn.y[i], gprn.yerr[i], fmt='ok', ms=2)
        pred, std = aa[:, i].T, ss[:, i].T
        ax.fill_between(tstar, pred - std, pred + std, alpha=0.1)
        ax.plot(tstar, pred)
        ax.grid(which='major', alpha=0.5)
        ax.grid(which='minor', alpha=0.2)

        resid = gprn.y[i] - a[:, i]
        axr = axs[f'resid{i + 1}']
        axr.errorbar(time, resid, gprn.yerr[i], fmt='ok', ms=2)
        axr.axhline(y=0.0, ls='--', color='k', alpha=0.2)
        axr.set_title(f'std: {resid.std():.2f}', loc='right', fontsize=10)
        equal_y_axis(axr)
        axr.set_ylabel('residuals')

        mean_i = gprn.means[i]
        if mean_i is None or isinstance(mean_i, (int, float)):
            means.append(np.zeros_like(tstar))
        else:
            means.append(mean_i(tstar))

    for i in range(gprn.p):
        ax = axs[f'd{i + 1}']
        ax.set(xlabel='')
        ax.set_ylabel('weight', color='C0')
        ax.set_title('weight(s) and mean', loc='left', fontsize=10)
        for w in weight_pred[i::gprn.p]:
            ax.plot(tstar, w, alpha=0.6)
        ax.tick_params(axis='y', labelcolor='C0')
        ax2 = ax.twinx()
        ax2.plot(tstar, means[i], color='k', ls='--', alpha=0.6)
        ax2.tick_params(axis='y', labelcolor='k')
        ax2.set_ylabel('mean', color='k')

    axs['node'].set(xlabel='')
    axs['node'].set_title('node' + ('' if gprn.q == 1 else 's'),
                          loc='left', fontsize=10)
    axs['node'].plot(tstar, node_pred.T, '-')
    equal_y_axis(axs['node'])

    ax0 = axs['pred1']
    for ax in axs.values():
        ax.sharex(ax0)
    # hide intermediate x tick labels on the stacked panels so only the
    # bottom row keeps them (reference _plots.py:120-127)
    for i in range(gprn.p - 1):
        for key in (f'pred{i + 1}', f'resid{i + 1}', f'd{i + 1}'):
            plt.setp(axs[key].get_xticklabels(), visible=False)
    if gprn.p > 1:
        # the reference also hides pred{p} via its leaked loop index
        # (_plots.py:125-128; for p=1 that lookup KeyErrors and nothing
        # is hidden — reproduced by the p>1 guard)
        plt.setp(axs[f'pred{gprn.p}'].get_xticklabels(), visible=False)
    for ax in axs.values():
        ax.axvspan(time[0], time[-1], color='k', alpha=0.05, zorder=-1)
    fig.tight_layout()
    return fig, axs


def plot_elbo_history(elbos, ax=None):
    """Plot an ELBO trajectory (TPU-native addition: the fused engines
    return per-iteration ELBO trajectories for convergence diagnostics)."""
    import matplotlib.pyplot as plt
    if ax is None:
        _, ax = plt.subplots(1, 1, constrained_layout=True)
    elbos = np.asarray(elbos)
    ax.plot(np.arange(1, elbos.size + 1), elbos)
    ax.set(xlabel='iteration', ylabel='ELBO')
    ax.grid(alpha=0.4)
    return ax
