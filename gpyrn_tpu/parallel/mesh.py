"""Device-mesh helpers.

Two named axes cover the parallelism this model family exposes:

* ``dp`` — data parallel: MCMC walkers, multi-start optimization restarts,
  evidence importance samples.  Embarrassingly parallel; no collectives
  beyond the final gather.
* ``lat`` — the (q nodes × p outputs) lattice of N×N kernel matrices, the
  model-parallel axis: batched Cholesky factorizations and triangular
  solves shard one lattice entry per device (SURVEY.md §2, §5.7).

The reference has no distributed backend at all (SURVEY.md §5.8); here
XLA SPMD inserts the collectives from sharding annotations alone.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DP_AXIS = "dp"
LAT_AXIS = "lat"

__all__ = ["DP_AXIS", "LAT_AXIS", "make_mesh", "shard_along", "use_mesh"]


def make_mesh(n_devices: Optional[int] = None,
              shape: Optional[Tuple[int, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a 2-D ``(dp, lat)`` mesh.

    Args:
        n_devices: number of devices to use (defaults to all available).
            With ``shape`` unset, all devices go on the ``dp`` axis and
            ``lat`` has size 1 — the right default for walker/restart
            batching, which needs no cross-device collectives.
        shape: explicit ``(dp, lat)`` factorization.
        devices: explicit device list (defaults to ``jax.devices()``).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices) if shape is None else shape[0] * shape[1]
    devices = list(devices)[:n_devices]
    if shape is None:
        shape = (n_devices, 1)
    if shape[0] * shape[1] != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    dev_grid = np.asarray(devices).reshape(shape)
    return Mesh(dev_grid, (DP_AXIS, LAT_AXIS))


def use_mesh(mesh: Mesh):
    """Context manager making bare ``PartitionSpec`` sharding constraints
    resolvable inside jitted code (wraps ``jax.set_mesh``)."""
    return jax.set_mesh(mesh)


def shard_along(x, mesh: Mesh, axis_name: str = DP_AXIS, dim: int = 0):
    """Device-put ``x`` sharded over ``axis_name`` along array dim ``dim``."""
    spec = [None] * np.ndim(x)
    spec[dim] = axis_name
    return jax.device_put(x, NamedSharding(mesh, PartitionSpec(*spec)))
