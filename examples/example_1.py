"""Example 1 — one dataset, one node.

TPU-native counterpart of the reference example
(/root/reference/gpyrn/examples/example_1.py, updated to the current
API): fit a 1-node × 1-output GPRN to a noisy sinusoid, compare two
weight length-scales, and plot the posterior predictive.
"""
import numpy as np

from gpyrn_tpu import inference, covfunc, meanfunc

time = np.linspace(0, 100, 25)
y1 = 20 * np.sin(2 * np.pi * time / 31)
y1err = np.random.default_rng(0).random(25)

gprn = inference(1, time, y1, y1err)

# short weight length-scale
gprn.set_components([covfunc.Periodic(15, 31, 0.5)],
                    [covfunc.SquaredExponential(1, 1)],
                    [meanfunc.Constant(0)], [0.5])
elbo, m, v, _ = gprn.ELBOcalc()
print('ELBO (ell_w = 1)   =', elbo)

# long weight length-scale — better ELBO: the weight should be ~constant
gprn.set_components([covfunc.Periodic(15, 31, 0.5)],
                    [covfunc.SquaredExponential(1, 100)],
                    [meanfunc.Constant(0)], [0.5])
elbo, m, v, _ = gprn.ELBOcalc()
print('ELBO (ell_w = 100) =', elbo)

tstar, mean, std, _ = gprn.predict(nn=1000)

try:
    import matplotlib.pyplot as plt
    plt.figure(figsize=(8, 4))
    plt.errorbar(time, y1, y1err, fmt='ob', markersize=7, label='data')
    plt.plot(tstar, mean[:, 0], '--k', linewidth=2, label='predictive')
    plt.fill_between(tstar, mean[:, 0] - std[:, 0], mean[:, 0] + std[:, 0],
                     alpha=0.2)
    plt.xlabel('Time (days)')
    plt.ylabel('Measurements')
    plt.legend(loc='upper right')
    plt.grid(which='major', alpha=0.5)
    plt.savefig('dataAndPrediction.png', bbox_inches='tight')
    print('saved dataAndPrediction.png')
except ImportError:
    pass
