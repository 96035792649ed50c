"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(`gpyrn_tpu.parallel`) are exercised without TPU hardware, as recommended
by the reference test plan (SURVEY.md §4e).  In the sandbox the axon
sitecustomize pre-imports jax with a TPU backend; `jax.config.update`
re-targets the (lazily initialised) backend to CPU as long as it runs
before any array is created, which this conftest guarantees.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:  # already initialised to cpu — fine
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def tiny_dataset():
    """25-point, 1-output synthetic sine dataset (BASELINE config 1)."""
    rng = np.random.default_rng(0)
    N = 25
    t = np.sort(rng.uniform(0, 30, N))
    y = np.sin(2 * np.pi * t / 10) + 0.1 * rng.standard_normal(N)
    yerr = np.full(N, 0.1)
    return t, y, yerr


@pytest.fixture(scope="session")
def multi_dataset():
    """25-point, 3-output dataset (BASELINE config 3 shape)."""
    rng = np.random.default_rng(3)
    N = 25
    t = np.sort(rng.uniform(0, 40, N))
    data = []
    for i in range(3):
        data += [np.sin(2 * np.pi * t / (8 + 3 * i))
                 + 0.1 * rng.standard_normal(N),
                 np.full(N, 0.1)]
    return (t, *data)
