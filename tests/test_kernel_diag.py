"""kernel_diag must equal diagonal(kernel_matrix) — same values, same
jitter — for every kernel and composites, in both calling conventions.
It is the O(N)-memory path behind prediction variances and serving
(models/gprn.py predict no longer materializes K(t*, t*))."""
import zlib

import numpy as np
import pytest

import gpyrn_tpu as g
from gpyrn_tpu.ops.linalg import (PREDICT_NUGGET, TRAIN_NUGGET,
                                  kernel_diag, kernel_matrix)
from tests.test_kernels import _NONSTATIONARY, _STATIONARY

_EXTRA = {"NewRQP": (1.2, 0.9, 0.8, 9.0, 0.8, 6.0)}


def _check(kern, t, nugget):
    cp = np.asarray(kern.core_params(), dtype=float)  # engine convention
    K = np.asarray(kernel_matrix(kern.structure, cp, t, nugget))
    d = np.asarray(kernel_diag(kern.structure, cp, t, nugget))
    np.testing.assert_allclose(d, np.diagonal(K), rtol=1e-13, atol=1e-14)


@pytest.mark.parametrize("name", sorted({**_STATIONARY, **_EXTRA,
                                         **_NONSTATIONARY}))
@pytest.mark.parametrize("nugget", [TRAIN_NUGGET, PREDICT_NUGGET])
def test_diag_matches_matrix(name, nugget):
    args = {**_STATIONARY, **_EXTRA, **_NONSTATIONARY}[name]
    kern = getattr(g.covfunc, name)(*args)
    # stable per-kernel seed (hash() is randomized per process via
    # PYTHONHASHSEED, which would make failures unreproducible)
    seed = zlib.crc32(name.encode())
    t = np.sort(np.random.default_rng(seed).uniform(0, 60, 33))
    _check(kern, t, nugget)


def test_diag_matches_matrix_composites():
    rng = np.random.default_rng(7)
    t = np.sort(rng.uniform(0, 60, 29))
    a = g.covfunc.SquaredExponential(1.2, 4.0)
    b = g.covfunc.Periodic(1.1, 9.0, 0.7)
    lin = g.covfunc.Linear(2.0)          # mixed stationary/non-stationary
    for kern in (a + b, a * b, a + lin, b * lin):
        _check(kern, t, TRAIN_NUGGET)
