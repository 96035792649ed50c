"""Config knobs, bench harness pieces, and driver entry points."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest


def test_enable_nan_checks_toggles():
    import jax
    from gpyrn_tpu import config
    config.enable_nan_checks(True)
    assert jax.config.jax_debug_nans
    config.enable_nan_checks(False)
    assert not jax.config.jax_debug_nans


def test_set_compute_dtype():
    import jax.numpy as jnp
    from gpyrn_tpu import config
    config.set_compute_dtype(jnp.float32)
    assert config.compute_dtype() == jnp.float32
    config.set_compute_dtype(jnp.float64)


def test_pallas_policy_switch():
    from gpyrn_tpu.ops import linalg
    old = linalg.PALLAS_KERNELS
    try:
        linalg.set_pallas_kernels(False)
        assert not linalg._use_pallas(("SE",), np.zeros(4, np.float32))
        linalg.set_pallas_kernels(True)
        assert linalg._use_pallas(("SE",), np.zeros(4, np.float32))
        assert not linalg._use_pallas(("WN",), np.zeros(4, np.float32))
    finally:
        linalg.set_pallas_kernels(old)


def test_graft_entry_callable():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = float(fn(*args))
    assert np.isfinite(out)


def test_bench_baseline_cache(tmp_path, monkeypatch):
    import bench
    monkeypatch.setattr(bench, "BASELINE_CACHE",
                        str(tmp_path / "b.json"))
    with open(bench.BASELINE_CACHE, "w") as f:
        json.dump({"N": bench.N, "n_sweeps": bench.N_SWEEPS,
                   "ms": 1234.5}, f)
    assert bench.measure_baseline() == 1234.5


def test_bench_problem_shapes():
    import bench
    t, data = bench._problem_data(64)
    assert t.shape == (64,) and len(data) == 6
