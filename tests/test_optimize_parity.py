"""Nelder-Mead optimize() parity with the reference.

Both implementations hand scipy the same x0 and (numerically identical,
~1e-10) objective, so short deterministic NM runs must track each other.
"""
import numpy as np
import pytest

import gpyrn_tpu as g
from .refutil import import_reference


def test_optimize_tracks_reference():
    rc, _, rm = import_reference()
    rng = np.random.default_rng(4)
    N = 20
    t = np.sort(rng.uniform(0, 30, N))
    y = np.sin(2 * np.pi * t / 9) + 0.1 * rng.standard_normal(N)
    e = np.full(N, 0.1)

    ours = g.inference(1, t, y, e)
    ours.set_components([g.covfunc.Periodic(1.0, 9.0, 0.7)],
                        [g.covfunc.SquaredExponential(1.0, 6.0)],
                        [g.meanfunc.Constant(0.0)], [0.1])
    ours.ELBOcalc()
    res_o = ours.optimize(options={'maxiter': 15, 'xatol': 1e-8,
                                   'fatol': 1e-8})

    rn = [rc.Periodic(1.0, 9.0, 0.7)]
    rw = [rc.SquaredExponential(1.0, 6.0)]
    _, rmn, _ = import_reference()
    rmean = [rmn.Constant(0.0)]
    ref = rm.inference(1, t, y, e)
    ref.set_components(rn, rw, rmean, [0.1])
    ref.ELBOcalc(rn, rw, rmean, [0.1])
    res_r = ref.optimize(options={'maxiter': 15, 'xatol': 1e-8,
                                  'fatol': 1e-8})

    # same number of NM iterations and closely-tracking optimum
    assert res_o.nit == res_r.nit
    np.testing.assert_allclose(res_o.fun, res_r.fun, rtol=5e-3)
    np.testing.assert_allclose(res_o.x, res_r.x, rtol=5e-2)
