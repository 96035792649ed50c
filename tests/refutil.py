"""Helper to import the reference gpyrn package for parity tests.

The reference (mounted read-only at /root/reference) predates numpy 2.0
(`np.float`) and hard-imports emcee at module load; both are shimmed here
so the reference's numerics can serve as the parity oracle.  Tests that
use this helper skip cleanly when the reference isn't mounted.
"""
import sys
import types

import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"


def import_reference():
    """Import and return (covfunc, meanfunc, meanfield) from the reference,
    or skip the calling test if the reference isn't available."""
    import os
    if not os.path.isdir(REFERENCE_PATH):
        pytest.skip("reference package not available")
    if "emcee" not in sys.modules:
        emcee = types.ModuleType("emcee")
        emcee.EnsembleSampler = object
        emcee.backends = types.SimpleNamespace(HDFBackend=object)
        emcee.utils = types.SimpleNamespace(sample_ellipsoid=None)
        sys.modules["emcee"] = emcee
        sys.modules["emcee.utils"] = emcee.utils
    if not hasattr(np, "float"):
        np.float = float  # numpy>=1.24 removed the alias the reference uses
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", SyntaxWarning)
        from gpyrn import covfunc, meanfunc, meanfield
    return covfunc, meanfunc, meanfield


def ref_single_sweep(ref, nodes, weights, means, jitters, mu, var):
    """One reference coordinate-ascent sweep (ELBOaux) from a given
    variational state, with the same matrix prep as the reference's
    ELBOcalc (meanfield.py:619-627).  Returns (elbo, mu, var)."""
    j2 = np.array(jitters) ** 2
    from gpyrn.meanfield import _cholNugget
    Kf = np.array([ref._KMatrix(i, ref.time) for i in nodes])
    Kw = np.array([ref._KMatrix(j, ref.time) for j in weights])
    Lf = np.array([_cholNugget(j)[0] for j in Kf])
    Lw = np.array([_cholNugget(j)[0] for j in Kw])
    y = np.concatenate(ref.y) - ref._mean(means)
    y = np.array(np.array_split(y, ref.p))
    elbo, mu_n, var_n, _, _ = ref.ELBOaux(Kf, Kw, Lf, Lw, y, j2,
                                          np.asarray(mu), np.asarray(var))
    return float(elbo), np.asarray(mu_n).ravel(), np.asarray(var_n).ravel()


def import_reference_nonparametric():
    """Import the reference's experimental nonparametric module (it uses
    np.float at :344,:404-405 — covered by the same shim)."""
    import_reference()
    from gpyrn import nonparametric
    return nonparametric


def import_reference_evidence():
    """Import the reference's evidence module, which is unimportable
    as-shipped: evidence.py:8 does `from gprn import utils` (the package
    was renamed gprn->gpyrn) and uses `utils.MultivariateGaussian`
    (evidence.py:309), a class that does not exist in _utils.py either.
    The shim provides a `gprn` module whose `utils` carries the
    reference's _utils namespace plus OUR MultivariateGaussian."""
    import_reference()
    if "gprn" not in sys.modules:
        from gpyrn import _utils as _ref_utils
        from gpyrn_tpu.inference.evidence import MultivariateGaussian
        utils_mod = types.ModuleType("gprn.utils")
        for name in dir(_ref_utils):
            if not name.startswith("__"):
                setattr(utils_mod, name, getattr(_ref_utils, name))
        utils_mod.MultivariateGaussian = MultivariateGaussian
        gprn_mod = types.ModuleType("gprn")
        gprn_mod.utils = utils_mod
        sys.modules["gprn"] = gprn_mod
        sys.modules["gprn.utils"] = utils_mod
    from gpyrn import evidence
    return evidence
