"""Smoke imports (reference tests/test_imports.py) — plus the modules the
reference couldn't import (its evidence module was broken, SURVEY.md §2.9)."""


def test_import_package():
    import gpyrn_tpu  # noqa: F401


def test_import_covfunc():
    from gpyrn_tpu import covfunc  # noqa: F401


def test_import_meanfunc():
    from gpyrn_tpu import meanfunc  # noqa: F401


def test_import_meanfield():
    from gpyrn_tpu import meanfield  # noqa: F401


def test_import_api_names():
    from gpyrn_tpu import (inference, Constant, Linear,  # noqa: F401
                           SquaredExponential, QuasiPeriodic)


def test_version():
    import gpyrn_tpu
    assert hasattr(gpyrn_tpu, "__version__")
