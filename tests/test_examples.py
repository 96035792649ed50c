"""Smoke-run the fastest worked example end-to-end (the reference's
examples were stale against its own API — SURVEY.md §2.8; ours must
stay runnable)."""
import os
import runpy

import matplotlib
matplotlib.use("Agg")

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")


def test_example_1_runs(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    runpy.run_path(os.path.join(EXAMPLES, "example_1.py"),
                   run_name="__main__")
    out = capsys.readouterr().out
    assert "ELBO (ell_w = 1)" in out
    assert "ELBO (ell_w = 100)" in out
    assert (tmp_path / "dataAndPrediction.png").exists()


@pytest.mark.slow
@pytest.mark.parametrize("name", ["example_2.py", "example_3.py",
                                  "example_4.py", "example_5.py",
                                  "example_6.py", "example_7.py",
                                  "example_8.py"])
def test_remaining_examples_run(tmp_path, monkeypatch, name):
    """Every shipped example must execute against the current API
    (the reference's own examples had gone stale — SURVEY.md §2.8)."""
    monkeypatch.chdir(tmp_path)
    runpy.run_path(os.path.join(EXAMPLES, name), run_name="__main__")
