"""Example 2 — two outputs, one node, on the bundled solar dataset.

Counterpart of reference example_2.py, using the bundled
Solar_observations.txt (RV + FWHM) and hyperparameter optimization.
"""
import numpy as np

from gpyrn_tpu import inference, covfunc, meanfunc
from gpyrn_tpu.datasets import load_solar

time, data = load_solar(("RV", "FWHM"))
# subsample for a quick demo
keep = slice(0, 200, 2)
time = time[keep]
data = [d[keep] for d in data]

gprn = inference(1, time, *data)
gprn.set_components(
    covfunc.QuasiPeriodic(1.0, 30.0, 27.0, 0.7),
    [covfunc.SquaredExponential(np.std(data[0]), 30.0),
     covfunc.SquaredExponential(np.std(data[2]), 30.0)],
    [meanfunc.Constant(0.0), meanfunc.Constant(0.0)],
    [np.std(data[0]) / 2, np.std(data[2]) / 2])

print('initial ELBO =', gprn.ELBO)

# TPU-native gradient optimization (the reference used Nelder-Mead)
res = gprn.optimize_adam(n_steps=100, learning_rate=2e-2)
print('optimized ELBO =', res["elbo"])
for name, val in gprn.parameters_dict.items():
    print(f'  {name:18s} = {val:.4f}')

try:
    import matplotlib.pyplot as plt
    fig, _ = gprn.plot_prediction(nn=500)
    fig.savefig('solar_prediction.png', bbox_inches='tight')
    print('saved solar_prediction.png')
except ImportError:
    pass
