"""Smoke tests for examples/: each script runs at toy scale as a subprocess
and must exit 0 with a sane final metric in its output. Guards the shipped
examples against API rot (they are documentation that executes)."""

import os
import re
import subprocess
import sys

import pytest

from tests.conftest import fixture_paths

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def run_example(script, args, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    return subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script)] + args,
        capture_output=True, text=True, env=env, timeout=timeout)


def _residuals(text):
    """All 'residual <float>'-ish values printed by a script."""
    return [float(m) for m in re.findall(
        r"residual[^\n]*?([0-9][0-9.]*e[+-]?[0-9]+)", text)]


def test_fem_gallery():
    r = run_example("fem_gallery.py", ["--cpu", "--dtype", "float64"])
    assert r.returncode == 0, r.stderr[-2000:]
    res = _residuals(r.stdout)
    assert res, f"no residual lines in output:\n{r.stdout[-2000:]}"
    assert max(res) <= 1e-10


def test_gmrf_learn():
    r = run_example("gmrf_learn.py", ["--dim", "12", "--levels", "3"])
    assert r.returncode == 0, r.stderr[-2000:]
    # recovers tau near the truth (printed as 'tau_hat ...')
    m = re.search(r"tau[^0-9-]*([0-9.]+)", r.stdout)
    assert m, r.stdout[-2000:]


def test_gp_variance():
    r = run_example("gp_variance.py", ["--dim", "12", "--levels", "3"])
    assert r.returncode == 0, r.stderr[-2000:]
    m = re.search(r"coverage of truth: ([0-9.]+)%", r.stdout)
    assert m, r.stdout[-2000:]
    assert float(m.group(1)) >= 80.0


def test_kkt_solve():
    r = run_example("kkt_solve.py", ["--nx", "12", "--m", "8"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "slogdet" in r.stdout, r.stdout[-2000:]
    res = _residuals(r.stdout)
    if res:
        assert max(res) <= 1e-8


def test_modal_analysis():
    r = run_example("modal_analysis.py",
                    ["--nx", "16", "--k", "3", "--cpu", "--dtype", "float64"])
    assert r.returncode == 0, r.stderr[-2000:]
    m = re.search(r"worst pencil residual: ([0-9.]+e[+-]?[0-9]+)", r.stdout)
    assert m, r.stdout[-2000:]
    assert float(m.group(1)) <= 1e-6


def test_solve_mtx():
    p = fixture_paths("lapl_25x25")
    r = run_example("solve_mtx.py",
                    [p["mat"], p["b"], "--dtype", "float64"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "logdet" in r.stdout and "condest" in r.stdout, r.stdout[-2000:]
    res = _residuals(r.stdout)
    assert res and max(res) <= 1e-10
