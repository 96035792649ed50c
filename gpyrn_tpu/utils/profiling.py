"""Tracing / profiling helpers.

The reference's only instrumentation was a wall-clock print per nELBO
call (reference meanfield.py:1101-1109).  Here: a ``jax.profiler`` trace
context for TensorBoard-compatible device profiles, and a lightweight
stage timer that forces device completion at each boundary.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import jax

__all__ = ["trace", "StageTimer"]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/gpyrn_tpu_trace"):
    """Profile the enclosed block with ``jax.profiler`` (view the result
    with TensorBoard's profile plugin or xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Wall-clock stage timer that blocks on device work at boundaries.

    >>> timer = StageTimer()
    >>> with timer.stage("fit"):
    ...     out = engine.elbo_fit(...)
    >>> timer.summary()
    """

    def __init__(self):
        self.times: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.times.setdefault(name, []).append(
                time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, ts in self.times.items():
            n = len(ts)
            out[name] = {"n": n, "total_s": sum(ts),
                         "mean_ms": sum(ts) / n * 1e3,
                         "last_ms": ts[-1] * 1e3}
        return out

    def report(self) -> str:
        lines = []
        for name, s in self.summary().items():
            lines.append(f"{name:24s} n={s['n']:<4d} "
                         f"mean={s['mean_ms']:9.2f} ms  "
                         f"total={s['total_s']:.3f} s")
        return "\n".join(lines)
