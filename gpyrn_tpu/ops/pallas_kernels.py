"""Pallas blockwise kernel-matrix builder — the large-N path.

For the BASELINE large-N stress configs (N = 5k–20k) the dense pairwise
kernel matrix is the HBM-bandwidth hot spot: XLA materializes the (N, N)
lag matrix ``r = t[:,None] - t[None,:]`` in HBM before the elementwise
kernel chain consumes it.  This builder tiles the computation on a
(⌈N/T⌉ × ⌈N/T⌉) grid: each program reads two length-T slices of the 1-D
time vector from VMEM, forms the T×T lag tile in registers, applies the
kernel function (the same pure registry functions as
:mod:`gpyrn_tpu.ops.kernels` — they trace inside the Pallas kernel), and
adds the diagonal jitter in-tile.  The (N, N) lag matrix never exists in
memory.

Tiles are 256×256 (aligned to the 8×128 VPU lanes and 128×128 MXU); the
time vector is padded host-side to a tile multiple, so no masking is
needed — padded rows/columns are sliced away on return.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is optional at import time (CPU tests interpret)
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from gpyrn_tpu.ops import kernels as _k

__all__ = ["pallas_supported", "pallas_kernel_matrix"]

TILE = 256

# stationary kernels whose registry functions are pure elementwise jnp
# chains (safe to trace inside a Pallas kernel); composites of these are
# supported too
_SAFE_TAGS = frozenset({
    "C", "SE", "P", "QP", "RQ", "RQP", "COS", "EXP", "M32", "M52",
    "GammaExp", "PW", "PAC", "NP", "QNP", "NRQP", "CP", "QCP",
})


def pallas_supported(structure) -> bool:
    """Whether a kernel structure can run through the Pallas builder."""
    tag = structure[0]
    if tag in ("+", "*"):
        return pallas_supported(structure[1]) and \
            pallas_supported(structure[2])
    return tag in _SAFE_TAGS


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.partial(jax.jit,
                   static_argnames=("structure", "n_valid", "interpret"))
def _build(structure, params, t_padded, jitter, n_valid: int,
           interpret: bool = False):
    Np = t_padded.shape[0]
    grid = (Np // TILE, Np // TILE)
    dtype = t_padded.dtype

    def kernel_fn(params_ref, jit_ref, t_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        trow = t_ref[i, :]                       # (TILE,)
        tcol = t_ref[j, :]
        r = trow.reshape(TILE, 1) - tcol.reshape(1, TILE)
        # SMEM only serves scalar loads: unroll the (static) param fetch
        p = [params_ref[0, k] for k in range(n_par)]
        K = _k.evaluate(structure, p, r=r)
        # in-tile diagonal jitter on diagonal blocks
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
        eye = (row_ids == col_ids).astype(K.dtype)

        @pl.when(i == j)
        def _():
            out_ref[:, :] = K + jit_ref[0, 0] * eye

        @pl.when(i != j)
        def _():
            out_ref[:, :] = K

    n_par = params.shape[0]
    # the whole time vector rides along in VMEM as (n_tiles, TILE) —
    # at most N·4 bytes (80 kB at N = 20k) — and each program indexes
    # its row/col slices by program_id; this sidesteps Mosaic's
    # sublane-divisibility constraint on small blocked vectors
    t2d = t_padded.reshape(-1, TILE)
    n_tiles = t2d.shape[0]
    # NOTE: literal index-map zeros must be int32 — with jax_enable_x64
    # a Python ``0`` traces as int64 and Mosaic fails to legalize it
    z = np.int32(0)
    if _HAS_PLTPU and not interpret:
        smem = pltpu.SMEM
        vmem = pltpu.VMEM
        in_specs = [
            pl.BlockSpec((1, n_par), lambda i, j: (z, z),
                         memory_space=smem),
            pl.BlockSpec((1, 1), lambda i, j: (z, z), memory_space=smem),
            pl.BlockSpec((n_tiles, TILE), lambda i, j: (z, z),
                         memory_space=vmem),
        ]
        out_specs = pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                                 memory_space=vmem)
    else:
        in_specs = [
            pl.BlockSpec((1, n_par), lambda i, j: (z, z)),
            pl.BlockSpec((1, 1), lambda i, j: (z, z)),
            pl.BlockSpec((n_tiles, TILE), lambda i, j: (z, z)),
        ]
        out_specs = pl.BlockSpec((TILE, TILE), lambda i, j: (i, j))

    K = pl.pallas_call(
        kernel_fn,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((Np, Np), dtype),
        interpret=interpret,
    )(params.reshape(1, -1).astype(dtype),
      jitter.reshape(1, 1).astype(dtype), t2d)
    return K[:n_valid, :n_valid]


def pallas_kernel_matrix(structure, params, t, nugget, jitter_mult,
                         interpret: bool = False):
    """Dense K(t, t) + trace-scaled jitter via the tiled Pallas builder.

    Semantics match :func:`gpyrn_tpu.ops.linalg.kernel_matrix` for
    supported stationary structures: the diagonal jitter is
    ``max(nugget, jitter_mult·eps·N·k(0))`` (for stationary kernels
    ``tr K = N·k(0)``, so no extra pass over K is needed)."""
    t = jnp.asarray(t)
    N = t.shape[0]
    params = jnp.asarray(params)
    k0 = _k.evaluate(structure, params,
                     r=jnp.zeros((), dtype=t.dtype))
    eps = jnp.finfo(t.dtype).eps
    jitter = jnp.maximum(jnp.asarray(nugget, dtype=t.dtype),
                         jitter_mult * eps * N * k0)
    Np = _round_up(max(N, TILE), TILE)
    # pad with distant dummy points; padded region is sliced away
    t_padded = jnp.pad(t, (0, Np - N), constant_values=t[-1] + 1e6)
    return _build(structure, params, t_padded, jitter, N,
                  interpret=interpret)
