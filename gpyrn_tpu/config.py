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

__all__ = ["enable_x64", "default_dtype", "set_compute_dtype",
           "compute_dtype", "enable_nan_checks", "ensure_compile_cache"]


def enable_nan_checks(enable: bool = True) -> None:
    """Turn on jax's NaN debugging (``jax_debug_nans``): every jitted
    computation re-runs eagerly on NaN production and points at the
    offending primitive — the numerics-debugging substitute for the
    sanitizers the reference never had (SURVEY.md §5.2)."""
    jax.config.update("jax_debug_nans", bool(enable))


def enable_x64(enable: bool = True) -> None:
    """Enable (or disable) 64-bit floating point in JAX."""
    jax.config.update("jax_enable_x64", bool(enable))


if os.environ.get("GPYRN_TPU_X64", "1") != "0":
    enable_x64(True)

# On TPU, float32 matmuls default to fast bfloat16 MXU passes; the GPRN
# engine's Cholesky factors and Gram products (K − BᵀB) need genuine f32
# accumulation or the ill-conditioned kernel matrices go NaN.  "highest"
# uses the 6-pass f32-equivalent MXU schedule — still far faster than
# software-emulated f64.
_MATMUL_PRECISION = os.environ.get("GPYRN_TPU_MATMUL_PRECISION", "highest")
if _MATMUL_PRECISION:
    jax.config.update("jax_default_matmul_precision", _MATMUL_PRECISION)

# Persistent compilation cache: the fused fit/grad programs are large
# (batched Cholesky factorizations inside scan/while_loop) and TPU
# compiles are expensive — cache them across processes.  Enabled lazily
# (ensure_compile_cache, called by the engine factories) so the decision
# can consult the ACTUAL default backend: CPU AOT results compiled under
# one host-feature set can SIGILL when loaded under another, and CPU
# compiles are cheap anyway, so only accelerator backends are cached.
_CACHE_SETUP_DONE = False


def ensure_compile_cache() -> None:
    """Enable the persistent compilation cache for accelerator backends
    (idempotent; no-op on CPU or when GPYRN_TPU_COMPILE_CACHE=0)."""
    global _CACHE_SETUP_DONE
    if _CACHE_SETUP_DONE:
        return
    cache_dir = os.environ.get("GPYRN_TPU_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/gpyrn_tpu_xla"))
    if not cache_dir or cache_dir == "0":
        _CACHE_SETUP_DONE = True
        return
    try:
        backend = jax.default_backend()
    except Exception:
        return      # transient backend-init failure: retry on next call
    _CACHE_SETUP_DONE = True
    if backend == "cpu":
        return
    # scope by the primary platform so "tpu" and "tpu,cpu" share entries,
    # AND by the jax/jaxlib version: the runtime behind the remote-compile
    # tunnel changes between sandbox images, and executables cached under
    # an older libtpu CRASH the TPU worker when loaded by a newer one
    # (measured: round-1-cached N=5000 programs reproducibly killed the
    # worker, while fresh compiles of the same HLO ran fine)
    import jax as _jax
    try:
        import jaxlib
        ver = f"{_jax.__version__}-{jaxlib.__version__}"
    except Exception:
        ver = _jax.__version__
    try:        # server-side runtime (libtpu) version, when exposed
        pv = _jax.devices()[0].client.platform_version
        ver += "-" + "".join(c if c.isalnum() else "_" for c in str(pv))[:40]
    except Exception:
        pass
    platform = os.environ.get("JAX_PLATFORMS", "") or backend
    cache_dir = os.path.join(cache_dir,
                             f"{platform.split(',')[0] or backend}-{ver}")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError):  # read-only fs or older jax
        pass

# dtype used for kernel matrices / Cholesky inside the inference engine
_COMPUTE_DTYPE = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def set_compute_dtype(dtype) -> None:
    """Record a preferred compute dtype (advisory).

    The engines are dtype-polymorphic — they compute in whatever dtype
    the input arrays carry — so the actual switch is casting your
    inputs (or using ``ELBOcalc(precision='mixed')`` /
    ``GPYRN_TPU_X64=0``).  This knob only records a preference that
    :func:`compute_dtype` reports back."""
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = jnp.dtype(dtype)


def compute_dtype():
    return _COMPUTE_DTYPE


def default_dtype():
    """Default floating dtype given the current x64 setting."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
