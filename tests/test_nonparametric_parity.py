"""Term-level parity anchors for nonparametric VI against the reference
(round-3 verdict item 5a).

The optimizer cannot be compared end-to-end — the reference's update is
a nested Nelder-Mead the author marked experimental and "almost certain
[to] fail for more than 1 node" (nonparametric.py:401) — but the ELBO
*terms at a fixed (μ, var) state* for q = 1 run fine under the np.float
shim, so each term our engine computes correctly by construction is
pinned here against the reference implementation directly:

* expected log-likelihood (nonparametric.py:348-385, "equation 3.22"):
  exactly equal at s → 0, where the reference's idiosyncratic second
  term (it scales the s⁴ piece by a further s² and divides by a summed
  error) vanishes on both sides;
* expected log-prior (nonparametric.py:388-407): equal at any s up to
  the −d/2·log 2π normalization constant the reference drops.

The mixture-entropy term is NOT comparable: the reference's `_entropy`
(nonparametric.py:330-345) clamps negative log-densities to zero and
evaluates only row 0 of its pairwise matrix — behavior with no
mathematical reading to anchor to (our engine uses the standard
Gershman–Hoffman–Blei pairwise lower bound, validated in
tests/test_nonparametric.py against closed forms).
"""
import numpy as np
import pytest

import gpyrn_tpu as g
from gpyrn_tpu.inference import nonparametric as ours
from tests.refutil import import_reference, import_reference_nonparametric

K = 2
N = 24


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(5)
    t = np.sort(rng.uniform(0, 30, N))
    y = np.sin(2 * np.pi * t / 9) + 0.1 * rng.standard_normal(N)
    yerr = np.full(N, 0.1)
    d = N * 1 * 2
    mu = 0.5 * rng.standard_normal((K, d))
    return t, y, yerr, mu


def _sides(problem):
    t, y, yerr, mu = problem
    rcov, _, _ = import_reference()
    rnp = import_reference_nonparametric()
    ref = rnp.inference(1, t, K, y, yerr)
    nodes_r = [rcov.SquaredExponential(1.2, 7.0)]
    weights_r = [rcov.SquaredExponential(0.9, 12.0)]

    mine = ours.inference(1, t, K, y, yerr)
    nodes_o = [g.covfunc.SquaredExponential(1.2, 7.0)]
    weights_o = [g.covfunc.SquaredExponential(0.9, 12.0)]
    eng = mine._engine(nodes_o, weights_o, [None])
    from gpyrn_tpu.models.gprn import pack_parameters
    theta = pack_parameters(nodes_o, weights_o, [None], np.array([0.1]))

    def our_terms(logs_value):
        logs = np.full(K, logs_value)
        ll, lp, ent = eng.terms(theta, mine.time, mine.y, mine.yerr2,
                                mu, logs)
        return np.asarray(ll), np.asarray(lp), float(ent)

    muF = np.array([ref._u_to_fhatW(mu[k_])[0] for k_ in range(K)])
    muW = np.array([ref._u_to_fhatW(mu[k_])[1] for k_ in range(K)])
    return ref, nodes_r, weights_r, our_terms, muF, muW


def test_expected_loglike_parity_at_zero_s(problem):
    ref, nodes_r, weights_r, our_terms, muF, muW = _sides(problem)
    ref_ll = np.asarray(ref._expectedLogLike(
        nodes_r, weights_r, [None], [0.1], muF, muW, np.zeros(K)),
        dtype=float)
    ll, _, _ = our_terms(-40.0)       # s² = e^-80: both second terms ~0
    assert ref_ll.shape == (K,)
    np.testing.assert_allclose(ll, ref_ll, rtol=1e-9)


def test_expected_logprior_parity(problem):
    ref, nodes_r, weights_r, our_terms, muF, muW = _sides(problem)
    from scipy.linalg import inv
    s = 0.3
    Kf = np.array([ref._kernelMatrix(i, ref.time) for i in nodes_r])
    invKf = np.array([inv(i) for i in Kf])
    Lf = np.array([ref._cholNugget(i.copy())[0] for i in Kf])
    Kw = np.array([ref._kernelMatrix(j, ref.time) for j in weights_r])
    invKw = np.array([inv(j) for j in Kw])
    Lw = np.array([ref._cholNugget(j.copy())[0] for j in Kw])
    ref_lp = np.asarray(ref._expectedLogPrior(
        Kf, invKf, Lf, Kw, invKw, Lw, muF, muW, np.full(K, s), [0.1]),
        dtype=float)
    _, lp, _ = our_terms(np.log(s))
    d = 2 * N
    # the reference drops the Gaussian normalization −d/2·log 2π
    np.testing.assert_allclose(lp + 0.5 * d * np.log(2 * np.pi),
                               ref_lp, rtol=1e-9)


def test_elbo_assembly_consistency(problem):
    """Our public ELBOaux equals mean(ll + lp) + entropy of the exposed
    terms — the assembly the reference builds at nonparametric.py:325."""
    t, y, yerr, mu = problem
    mine = ours.inference(1, t, K, y, yerr)
    nodes_o = [g.covfunc.SquaredExponential(1.2, 7.0)]
    weights_o = [g.covfunc.SquaredExponential(0.9, 12.0)]
    eng = mine._engine(nodes_o, weights_o, [None])
    from gpyrn_tpu.models.gprn import pack_parameters
    theta = pack_parameters(nodes_o, weights_o, [None], np.array([0.1]))
    logs = np.full(K, np.log(0.3))
    ll, lp, ent = eng.terms(theta, mine.time, mine.y, mine.yerr2, mu, logs)
    total = mine.ELBOaux(nodes_o, weights_o, [None], [0.1], mu,
                         np.full(K, 0.3))
    assert np.isclose(total,
                      float(np.mean(np.asarray(ll) + np.asarray(lp)))
                      + float(ent), rtol=1e-10)
