"""Kernel library tests.

Strategy from the reference test suite, generalized (SURVEY.md §4):
mathematical-identity tests (closed-form kernels vs their compositional
equivalents), numerical parity against the reference library for every
kernel, and API-contract tests (algebra, prefix-consuming set_parameters,
child propagation)."""
import numpy as np
import pytest

from gpyrn_tpu import covfunc
from .refutil import import_reference


@pytest.fixture(scope="module")
def lag():
    rng = np.random.default_rng(7)
    t = np.sort(rng.uniform(0, 50, 40))
    return t[:, None] - t[None, :]


@pytest.fixture(scope="module")
def coords():
    rng = np.random.default_rng(8)
    t = np.sort(rng.uniform(0, 50, 40))
    return t[:, None], t[None, :]


# ---------------------------------------------------------------------------
# mathematical identities
# ---------------------------------------------------------------------------

def test_quasiperiodic_equals_se_times_periodic(lag):
    """The reference's own identity test (test_cov_functions.py:7-14)."""
    qp = covfunc.QuasiPeriodic(1.1, 8.0, 7.0, 0.6)
    prod = covfunc.SquaredExponential(1.1, 8.0) * covfunc.Periodic(1.0, 7.0, 0.6)
    np.testing.assert_allclose(qp(lag), prod(lag), rtol=1e-12)


def test_rqp_equals_rq_times_periodic(lag):
    rqp = covfunc.RQP(1.3, 0.8, 6.0, 9.0, 0.7)
    prod = covfunc.RationalQuadratic(1.3, 0.8, 6.0) * \
        covfunc.Periodic(1.0, 9.0, 0.7)
    np.testing.assert_allclose(rqp(lag), prod(lag), rtol=1e-12)


def test_quasi_cos_periodic_identity(lag):
    qcp = covfunc.QuasiCosPeriodic(1.2, 6.0, 9.0, 0.7)
    prod = covfunc.CosPeriodic(1.2, 9.0, 0.7) * \
        covfunc.SquaredExponential(1.0, 6.0)
    np.testing.assert_allclose(qcp(lag), prod(lag), rtol=1e-12)


def test_sum_kernel(lag):
    k1 = covfunc.SquaredExponential(1.0, 3.0)
    k2 = covfunc.Matern32(0.5, 2.0)
    np.testing.assert_allclose((k1 + k2)(lag), k1(lag) + k2(lag), rtol=1e-12)


def test_derivative_kernel_matches_finite_difference():
    """d²k/dxi dxj of SE via central finite differences of k(xi - xj)."""
    k = covfunc.SquaredExponential(1.3, 2.0)
    dk = covfunc.Derivative(k)
    r = np.array([[0.7]])
    h = 1e-4
    # d2/dxi dxj k(xi - xj) = -k''(r);  fd of k over r:
    kpp = (k(np.array([[0.7 + h]])) - 2 * k(r) +
           k(np.array([[0.7 - h]]))) / h ** 2
    np.testing.assert_allclose(dk(r), -kpp, rtol=1e-5)


def test_derivative_requires_twice_differentiable():
    with pytest.raises(ValueError):
        covfunc.Derivative(covfunc.Matern32(1.0, 1.0))


# ---------------------------------------------------------------------------
# parity with the reference library
# ---------------------------------------------------------------------------

# kernel-name -> constructor args (ours == reference signatures)
_STATIONARY = {
    "Constant": (1.4,),
    "WhiteNoise": (0.3,),
    "SquaredExponential": (1.2, 4.0),
    "Periodic": (1.1, 9.0, 0.7),
    "QuasiPeriodic": (1.1, 8.0, 7.0, 0.6),
    "RationalQuadratic": (1.3, 0.8, 6.0),
    "RQP": (1.3, 0.8, 6.0, 9.0, 0.7),
    "Cosine": (1.2, 7.0),
    "Exponential": (1.2, 5.0),
    "Matern32": (1.2, 5.0),
    "Matern52": (1.2, 5.0),
    "GammaExp": (1.2, 1.4, 5.0),
    "Piecewise": (4.0,),
    "Paciorek": (1.2, 3.0, 5.0),
    "NewPeriodic": (1.2, 0.9, 9.0, 0.8),
    "QuasiNewPeriodic": (1.2, 0.9, 6.0, 9.0, 0.8),
    "CosPeriodic": (1.0, 9.0, 0.8),   # reference drops the amplitude
                                      # (covfunc.py:659) so use amp=1
    "QuasiCosPeriodic": (1.2, 6.0, 9.0, 0.8),
}

_NONSTATIONARY = {
    "Linear": (2.0,),
    "Polynomial": (1.0, 0.5, 2.0, 2.0),
    "HarmonicPeriodic": (3, 1.2, 9.0, 0.8),
    "QuasiHarmonicPeriodic": (3, 1.2, 6.0, 9.0, 0.8),
}


@pytest.mark.parametrize("name", sorted(_STATIONARY))
def test_stationary_parity_with_reference(name, lag):
    rc, _, _ = import_reference()
    ours = getattr(covfunc, name)(*_STATIONARY[name])
    ref = getattr(rc, name)(*_STATIONARY[name])
    np.testing.assert_allclose(ours(lag), ref(lag), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("name", sorted(_NONSTATIONARY))
def test_nonstationary_parity_with_reference(name, coords):
    rc, _, _ = import_reference()
    t1, t2 = coords
    ours = getattr(covfunc, name)(*_NONSTATIONARY[name])
    ref = getattr(rc, name)(*_NONSTATIONARY[name])
    if name == "Linear":
        ref_val = ref(None, t1, t2)   # reference Linear takes (r, t1, t2)
    else:
        ref_val = ref(t1, t2)
    np.testing.assert_allclose(ours(t1, t2), ref_val, rtol=1e-10, atol=1e-12)


def test_newrqp_fixes_reference_typo(lag):
    """NewRQP crashes in the reference (np.sine, covfunc.py:574); ours is
    NewPeriodic × RationalQuadratic."""
    k = covfunc.NewRQP(1.2, 0.7, 0.9, 6.0, 9.0, 0.8)
    expect = covfunc.NewPeriodic(1.2, 0.9, 9.0, 0.8)(lag) * \
        covfunc.RationalQuadratic(1.0, 0.7, 6.0)(lag)
    np.testing.assert_allclose(k(lag), expect, rtol=1e-12)


def test_derivative_parity_with_reference(lag):
    rc, _, _ = import_reference()
    for name, args in (("SquaredExponential", (1.2, 4.0)),
                       ("Periodic", (1.1, 9.0, 0.7)),
                       ("QuasiPeriodic", (1.1, 8.0, 7.0, 0.6))):
        ours = covfunc.Derivative(getattr(covfunc, name)(*args))
        ref = rc.Derivative(getattr(rc, name)(*args))
        np.testing.assert_allclose(ours(lag), ref(lag), rtol=1e-10)


def test_white_noise_square_vs_vector():
    k = covfunc.WhiteNoise(0.5)
    K = k(np.zeros((5, 5)))
    np.testing.assert_allclose(K, 0.25 * np.eye(5))
    v = k(np.ones(4))
    np.testing.assert_allclose(v, 0.25 * np.ones(4))


# ---------------------------------------------------------------------------
# parameter API
# ---------------------------------------------------------------------------

def test_set_parameters_prefix_consuming():
    k = covfunc.SquaredExponential(1.0, 2.0)
    rest = k.set_parameters(np.array([3.0, 4.0, 5.0, 6.0]))
    np.testing.assert_allclose(k.pars, [3.0, 4.0])
    np.testing.assert_allclose(rest, [5.0, 6.0])


def test_composite_set_parameters_propagates(lag):
    """Fix of reference covfunc.py:30-41 (stale children after set)."""
    k = covfunc.SquaredExponential(1.0, 2.0) + covfunc.Periodic(1.0, 5.0, 0.5)
    k.set_parameters(np.array([2.0, 3.0, 1.5, 6.0, 0.7]))
    np.testing.assert_allclose(k.k1.pars, [2.0, 3.0])
    np.testing.assert_allclose(k.k2.pars, [1.5, 6.0, 0.7])
    direct = covfunc.SquaredExponential(2.0, 3.0)(lag) + \
        covfunc.Periodic(1.5, 6.0, 0.7)(lag)
    np.testing.assert_allclose(k(lag), direct, rtol=1e-12)


def test_composite_pars_concatenated():
    k = covfunc.SquaredExponential(1.0, 2.0) * covfunc.Constant(3.0)
    np.testing.assert_allclose(k.pars, [1.0, 2.0, 3.0])


def test_repr_contains_params():
    k = covfunc.SquaredExponential(1.0, 2.0)
    assert "theta" in repr(k)


def test_psd_of_main_kernels(lag):
    """Kernel matrices (+ tiny nugget) must be positive semi-definite."""
    for name in ("SquaredExponential", "Periodic", "QuasiPeriodic",
                 "Matern32", "Matern52", "RationalQuadratic", "Exponential"):
        k = getattr(covfunc, name)(*_STATIONARY[name])
        K = k(lag) + 1e-8 * np.eye(lag.shape[0])
        w = np.linalg.eigvalsh(K)
        assert w.min() > -1e-9, f"{name} not PSD"


def test_param_names_match_par_counts():
    """Metadata consistency: every kernel's _param_names length equals
    its parameter count (parameters_dict naming relies on this)."""
    import inspect
    from gpyrn_tpu.ops import kernels as K
    samples = dict(_STATIONARY)
    samples.update(_NONSTATIONARY)
    samples["NewRQP"] = (1.2, 0.7, 0.9, 6.0, 9.0, 0.8)
    for name, args in samples.items():
        k = getattr(K, name)(*args)
        assert len(k._param_names) == k.pars.size, name
        # registry count agrees with the OO shell (core map aware)
        assert K.n_params(k.structure) == len(np.atleast_1d(
            np.asarray(k.core_params()))), name
