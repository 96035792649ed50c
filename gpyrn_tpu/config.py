"""Global configuration for gpyrn_tpu.

The reference package (gpyrn/meanfield.py:9) force-enables float64 at import
because the coordinate-ascent ELBO relies on Cholesky factorizations of
ill-conditioned kernel matrices.  We follow the same default — numerical
parity with the reference to 1e-6 relative requires x64 — but make it
controllable through the environment variable ``GPYRN_TPU_X64`` ("0" to
disable) and through :func:`enable_x64`.

On TPU, float64 is emulated and slow on the MXU.  The compute dtype used by
the inference engine is therefore a separate knob (:data:`compute_dtype`)
so that speed-focused runs can use float32 while keeping the float64
default for parity.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = ["enable_x64", "default_dtype", "set_compute_dtype", "compute_dtype"]


def enable_x64(enable: bool = True) -> None:
    """Enable (or disable) 64-bit floating point in JAX."""
    jax.config.update("jax_enable_x64", bool(enable))


if os.environ.get("GPYRN_TPU_X64", "1") != "0":
    enable_x64(True)

# dtype used for kernel matrices / Cholesky inside the inference engine
_COMPUTE_DTYPE = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def set_compute_dtype(dtype) -> None:
    """Set the dtype used by the inference engine (float64 for parity,
    float32/bfloat16 for TPU speed)."""
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = jnp.dtype(dtype)


def compute_dtype():
    return _COMPUTE_DTYPE


def default_dtype():
    """Default floating dtype given the current x64 setting."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
