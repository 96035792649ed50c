"""The bench harness must record partial results under a mid-run kill.

Round-3 verdict item 1: the driver killed ``bench.py`` before it printed
a single byte, zeroing the round's perf evidence.  The fix is
incremental emission — a JSON snapshot line at startup and after every
phase, each a superset of the last.  These tests hard-kill a live bench
run (via an injected hang phase) and assert the surviving stdout tail
parses to a record containing everything measured before the kill.
"""
import json
import os
import signal
import subprocess
import sys
import time

BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


def _bench_env(**extra):
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu",
               GPYRN_BENCH_PROBE="0", GPYRN_BENCH_SKIP_BASELINE="1",
               GPYRN_BENCH_SKIP_F64="1", GPYRN_BENCH_N="60")
    env.update(extra)
    return env


def _read_json_lines(proc, want, deadline_s):
    """Read stdout lines until ``want`` JSON snapshots arrived or the
    deadline passes; returns the parsed snapshots."""
    snaps = []
    t0 = time.monotonic()
    while len(snaps) < want and time.monotonic() - t0 < deadline_s:
        line = proc.stdout.readline()
        if not line:
            break
        line = line.strip()
        if line.startswith("{"):
            snaps.append(json.loads(line))
    return snaps


def test_first_snapshot_emitted_immediately():
    """The skeleton line appears before any device work, so even a kill
    seconds into the run leaves valid JSON on stdout."""
    proc = subprocess.Popen(
        [sys.executable, BENCH],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=_bench_env(GPYRN_BENCH_PHASES="none"))
    try:
        snaps = _read_json_lines(proc, want=1, deadline_s=120)
    finally:
        proc.kill()
        proc.wait()
    assert snaps, "no JSON snapshot before any phase ran"
    assert snaps[0]["metric"].startswith("elbo_grad_30sweeps")
    assert "value" in snaps[0] and "vs_baseline" in snaps[0]


def test_mid_run_kill_keeps_headline_fields():
    """SIGKILL during a hanging phase: the last stdout line still holds
    the full headline measurement (the round-3 failure mode, inverted)."""
    proc = subprocess.Popen(
        [sys.executable, BENCH],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=_bench_env(GPYRN_BENCH_TEST_HANG="1",
                       GPYRN_BENCH_PHASES="headline,test_hang"))
    try:
        # snapshot 1 = skeleton, snapshot 2 = post-headline superset
        snaps = _read_json_lines(proc, want=2, deadline_s=600)
        assert len(snaps) == 2, f"got {len(snaps)} snapshots"
        # the process is now inside the hang phase — hard-kill it
        os.kill(proc.pid, signal.SIGKILL)
    finally:
        proc.kill()
        proc.wait()
    last = snaps[-1]
    assert set(snaps[0]) <= set(last), "snapshots are not supersets"
    assert last["value"] is not None and last["value"] > 0
    assert last["finite"] is True
    assert last["meanfield_iters_per_sec"] > 0
