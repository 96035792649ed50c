#!/bin/sh
# Full test suite in four fresh processes.
#
# Why not one process: after ~230 compile-heavy tests in a single
# process, XLA:CPU's compiler segfaults (deterministic at the same
# test position across runs; the same tests pass in fresh processes —
# accumulated in-process compiler state, not a test bug).  Four chunks
# keep every process well under the threshold.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/test_[a-e]*.py -q "$@"
python -m pytest tests/test_[f-k]*.py -q "$@"
python -m pytest tests/test_[l-r]*.py -q "$@"
python -m pytest tests/test_[s-z]*.py -q "$@"
