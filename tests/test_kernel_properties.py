"""Property-style kernel tests: PSD, symmetry, stationarity and algebra
closure under randomized hyperparameters (lightweight substitute for a
hypothesis suite)."""
import numpy as np
import pytest

from gpyrn_tpu import covfunc

# kernel -> sampler of valid random hyperparameters
_SAMPLERS = {
    "Constant": lambda r: (r.uniform(0.1, 3),),
    "SquaredExponential": lambda r: (r.uniform(0.1, 3), r.uniform(0.5, 50)),
    "Periodic": lambda r: (r.uniform(0.1, 3), r.uniform(1, 50),
                           r.uniform(0.2, 2)),
    "QuasiPeriodic": lambda r: (r.uniform(0.1, 3), r.uniform(1, 80),
                                r.uniform(1, 50), r.uniform(0.2, 2)),
    "RationalQuadratic": lambda r: (r.uniform(0.1, 3), r.uniform(0.2, 5),
                                    r.uniform(0.5, 50)),
    "Cosine": lambda r: (r.uniform(0.1, 3), r.uniform(1, 50)),
    "Exponential": lambda r: (r.uniform(0.1, 3), r.uniform(0.5, 50)),
    "Matern32": lambda r: (r.uniform(0.1, 3), r.uniform(0.5, 50)),
    "Matern52": lambda r: (r.uniform(0.1, 3), r.uniform(0.5, 50)),
    "GammaExp": lambda r: (r.uniform(0.1, 3), r.uniform(0.5, 1.9),
                           r.uniform(0.5, 50)),
    "Piecewise": lambda r: (r.uniform(1, 20),),
    "NewPeriodic": lambda r: (r.uniform(0.1, 3), r.uniform(0.2, 5),
                              r.uniform(1, 50), r.uniform(0.2, 2)),
}

# NOTE: CosPeriodic / QuasiCosPeriodic are excluded — they are NOT valid
# covariance functions (exp(-2cos²(πr/P)/ℓ²) can exceed its zero-lag
# value, giving indefinite matrices; verified the reference's own
# implementation has the same property). They are reproduced for API
# parity but should be used with care.


@pytest.mark.parametrize("name", sorted(_SAMPLERS))
@pytest.mark.parametrize("trial", [0, 1, 2])
def test_random_hyperparams_psd_symmetric(name, trial):
    rng = np.random.default_rng(hash((name, trial)) % 2 ** 31)
    t = np.sort(rng.uniform(0, 60, 35))
    lag = t[:, None] - t[None, :]
    k = getattr(covfunc, name)(*_SAMPLERS[name](rng))
    K = k(lag)
    np.testing.assert_allclose(K, K.T, rtol=1e-10,
                               err_msg=f"{name} not symmetric")
    w = np.linalg.eigvalsh(K + 1e-7 * np.trace(K) * np.eye(35))
    assert w.min() > -1e-6 * np.trace(K), f"{name} not PSD: {w.min()}"
    # stationarity: constant diagonal
    d = np.diag(K)
    np.testing.assert_allclose(d, d[0], rtol=1e-10)


@pytest.mark.parametrize("trial", [0, 1])
def test_algebra_closure_psd(trial):
    """Random sums/products of PSD kernels stay PSD."""
    rng = np.random.default_rng(100 + trial)
    t = np.sort(rng.uniform(0, 60, 30))
    lag = t[:, None] - t[None, :]
    names = rng.choice(sorted(_SAMPLERS), size=3, replace=False)
    ks = [getattr(covfunc, n)(*_SAMPLERS[n](rng)) for n in names]
    combo = ks[0] * ks[1] + ks[2]
    K = combo(lag)
    w = np.linalg.eigvalsh(K + 1e-7 * np.trace(K) * np.eye(30))
    assert w.min() > -1e-6 * np.trace(K)


def test_kernel_value_at_zero_lag_is_amplitude_squared():
    rng = np.random.default_rng(7)
    for name in ("SquaredExponential", "Periodic", "QuasiPeriodic",
                 "Matern32", "Matern52", "Exponential",
                 "RationalQuadratic"):
        pars = _SAMPLERS[name](rng)
        k = getattr(covfunc, name)(*pars)
        val = k(np.zeros((1, 1)))[0, 0]
        assert val == pytest.approx(pars[0] ** 2, rel=1e-10), name
