"""Behavioral parity anchors for the evidence estimators against the
reference module itself (round-3 verdict item 5b).

The reference's evidence.py is unimportable as shipped (broken
`from gprn import utils`, evidence.py:8) — tests/refutil.py shims it
back to life, and these tests run the reference's own Perrakis and
harmonic-mean estimators on IDENTICAL samples as ours.  The only
randomness in either implementation is permutation noise (the
reference's `random.shuffle` column reshuffles and shuffle-until-finite
`log_sum`, evidence.py:161-190; our seeded rng equivalents), so both
sides get no-op shufflers: the estimators then see byte-identical
inputs and must agree to float round-off.
"""
import numpy as np
import pytest

from gpyrn_tpu.inference import evidence as ours
from tests.refutil import import_reference_evidence


class _NoShuffleRng:
    """np.random.Generator stand-in whose shuffle/choice preserve order
    (permutation-invariance is what the parity test factors out)."""

    def shuffle(self, x):
        return None

    def choice(self, a, size=None, replace=True):
        a = np.asarray(a)
        assert size is None or size <= len(a)
        return a[:size].copy()


@pytest.fixture
def no_ref_shuffle(monkeypatch):
    import random
    monkeypatch.setattr(random, "shuffle", lambda x: None)


@pytest.fixture(scope="module")
def samples():
    rng = np.random.default_rng(17)
    n, k = 400, 3
    x = rng.standard_normal((n, k)) * np.array([1.0, 0.5, 2.0]) \
        + np.array([0.3, -1.0, 2.0])
    return x


def _lnlike(theta):
    theta = np.atleast_2d(theta)
    return -0.5 * np.sum((theta - 0.2) ** 2, axis=1) - 1.7


def _lnprior(theta):
    theta = np.atleast_2d(theta)
    return -0.125 * np.sum(theta ** 2, axis=1) - 2.0


@pytest.mark.parametrize("density", ["histogram", "normal", "kde"])
def test_perrakis_matches_reference(samples, density, no_ref_shuffle):
    ref = import_reference_evidence()
    n = len(samples)
    z_ref = ref.compute_perrakis_estimate(
        samples.copy(), _lnlike, _lnprior, nsamples=n,
        densityestimation=density)
    z_ours = ours.compute_perrakis_estimate(
        samples.copy(), _lnlike, _lnprior, nsamples=n,
        densityestimation=density, rng=_NoShuffleRng())
    assert np.isfinite(z_ref)
    np.testing.assert_allclose(z_ours, z_ref, rtol=1e-10)


def test_harmonicmean_matches_reference(samples, no_ref_shuffle):
    ref = import_reference_evidence()
    lnlike_post = _lnlike(samples)
    np.random.seed(3)       # the reference permutes via global np.random
    z_ref = ref.compute_harmonicmean(lnlike_post)
    z_ours = ours.compute_harmonicmean(lnlike_post, rng=_NoShuffleRng())
    assert np.isfinite(z_ref)
    # full-sample HME is permutation-invariant up to fp reassociation
    np.testing.assert_allclose(z_ours, z_ref, rtol=1e-10)


def test_harmonicmean_from_posterior_sample_matches(samples,
                                                    no_ref_shuffle):
    ref = import_reference_evidence()
    # posterior_sample path: both sides evaluate lnlike on the full set
    z_ref = ref.compute_harmonicmean([], posterior_sample=samples.copy(),
                                     lnlikefunc=_lnlike)
    z_ours = ours.compute_harmonicmean(
        [], posterior_sample=samples.copy(), lnlikefunc=_lnlike,
        rng=_NoShuffleRng())
    np.testing.assert_allclose(z_ours, z_ref, rtol=1e-10)
