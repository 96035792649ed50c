"""Pallas blockwise kernel-matrix builder tests (interpret mode on CPU;
the same code path compiles to Mosaic on TPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from gpyrn_tpu import covfunc
from gpyrn_tpu.ops import linalg
from gpyrn_tpu.ops.pallas_kernels import (TILE, pallas_kernel_matrix,
                                          pallas_supported)


@pytest.fixture(scope="module")
def t():
    rng = np.random.default_rng(0)
    return jnp.asarray(np.sort(rng.uniform(0, 100, 300)))


def test_supported_structures():
    assert pallas_supported(("SE",))
    assert pallas_supported(("+", ("SE",), ("M52",)))
    assert not pallas_supported(("WN",))       # branches on input shape
    assert not pallas_supported(("HP", 3))     # non-stationary
    assert not pallas_supported(("*", ("SE",), ("LIN",)))


@pytest.mark.parametrize("name,args", [
    ("SquaredExponential", (1.2, 8.0)),
    ("QuasiPeriodic", (1.1, 20.0, 13.0, 0.6)),
    ("Matern52", (1.2, 5.0)),
    ("Periodic", (1.1, 9.0, 0.7)),
])
def test_matches_xla_builder(name, args, t):
    k = getattr(covfunc, name)(*args)
    ref = linalg.kernel_matrix(k.structure, k.core_params(), t,
                               linalg.TRAIN_NUGGET)
    out = pallas_kernel_matrix(k.structure, jnp.asarray(k.core_params()),
                               t, linalg.TRAIN_NUGGET,
                               linalg.F32_JITTER_MULT, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_composite_structure(t):
    k = covfunc.SquaredExponential(1.0, 8.0) + covfunc.Matern32(0.5, 3.0)
    ref = linalg.kernel_matrix(k.structure, k.core_params(), t,
                               linalg.TRAIN_NUGGET)
    out = pallas_kernel_matrix(k.structure, jnp.asarray(k.core_params()),
                               t, linalg.TRAIN_NUGGET,
                               linalg.F32_JITTER_MULT, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_non_tile_multiple_sizes():
    rng = np.random.default_rng(1)
    for N in (3, TILE - 1, TILE + 1):
        tt = jnp.asarray(np.sort(rng.uniform(0, 50, N)))
        k = covfunc.SquaredExponential(1.0, 5.0)
        ref = linalg.kernel_matrix(k.structure, k.core_params(), tt,
                                   linalg.TRAIN_NUGGET)
        out = pallas_kernel_matrix(k.structure,
                                   jnp.asarray(k.core_params()), tt,
                                   linalg.TRAIN_NUGGET,
                                   linalg.F32_JITTER_MULT, interpret=True)
        assert out.shape == (N, N)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-12, atol=1e-12)
