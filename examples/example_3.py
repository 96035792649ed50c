"""Example 3 — two nodes, two outputs, mixed kernels.

Counterpart of reference example_3.py: a 2-node (Periodic + Matern-5/2)
× 2-output GPRN, with the sharded multi-start optimizer exploring the
multi-modal ELBO surface from several restarts in parallel.
"""
import numpy as np

from gpyrn_tpu import inference, covfunc
from gpyrn_tpu.parallel import make_mesh, multistart_optimize, use_mesh

rng = np.random.default_rng(1)
N = 40
time = np.sort(rng.uniform(0, 80, N))
activity = np.sin(2 * np.pi * time / 25)
trend = 0.02 * (time - 40)
y1 = 5 * activity + 2 * trend + 0.3 * rng.standard_normal(N)
y2 = -3 * activity + trend + 0.3 * rng.standard_normal(N)
e1 = e2 = np.full(N, 0.3)

gprn = inference(2, time, y1, e1, y2, e2)
gprn.set_components(
    [covfunc.Periodic(3.0, 25.0, 0.8), covfunc.Matern52(1.0, 30.0)],
    [covfunc.SquaredExponential(2.0, 40.0) for _ in range(4)],
    [None, None], [0.3, 0.3])

print('initial ELBO =', gprn.ELBO)

mesh = make_mesh()            # all available devices on the dp axis
with use_mesh(mesh):
    out = multistart_optimize(gprn, n_restarts=max(4, mesh.devices.size),
                              n_steps=60, n_sweeps=20, mesh=mesh, seed=0)
print('best ELBO     =', out["elbo"], f'(restart {out["winner"]})')
print('restart ELBOs =', np.round(out["restart_elbos"], 2))
