"""CLI driver tests — the reference's end-to-end harness contract
(test_matrices.py:23-35: run the binary with -i/-s/-c/-b/-o/-m, then
check_matrix + check_solution against SciPy)."""

import os
import subprocess
import sys

import numpy as np
import pytest
import scipy.io
import scipy.linalg

from cholesky_tpu.io import mmio
from tests.conftest import fixture_paths


def run_cli(args, cwd=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    return subprocess.run(
        [sys.executable, "-m", "cholesky_tpu.cli"] + args,
        capture_output=True, text=True, env=env, cwd=cwd, timeout=600)


def check_matrix(matrix_file, separator_file, factored_mat):
    """verify.py:278-287 — factor file vs scipy cholesky of permuted matrix."""
    from cholesky_tpu.io import ordering as ordio
    from cholesky_tpu.symbolic.plan import build_plan, permute_matrix_dense

    plan = build_plan(ordio.parse_ordering(separator_file))
    a = mmio.read_dense(matrix_file)
    pmat = permute_matrix_dense(plan, a)
    l_numpy = scipy.linalg.cholesky(pmat + np.tril(pmat, -1).T, lower=True)
    l_ours = np.tril(scipy.io.mmread(factored_mat).toarray())
    return np.allclose(l_numpy, l_ours, rtol=1e-4, atol=1e-4)


def check_solution(matrix_file, b_file, solution_file):
    """verify.py:290-302 — solution file vs scipy solve."""
    a = mmio.read_dense(matrix_file)
    b = mmio.read_array(b_file)
    sol = np.genfromtxt(solution_file).reshape(b.shape)
    ref = scipy.linalg.solve(a, b)
    return np.allclose(ref, sol, rtol=1e-4, atol=1e-4)


# ALL FOUR reference fixtures go through the CLI subprocess — the
# reference's harness contract includes its two largest fixtures through
# the binary (test_matrices.py:97-142, with -ll:csize 4000 on the largest).
@pytest.mark.parametrize("name", ["lapl_9x9", "lapl_25x25", "lapl_400x400",
                                  "lapl_3375x3375"])
def test_cli_end_to_end(name, tmp_path):
    p = fixture_paths(name)
    sol = str(tmp_path / "solution.txt")
    fac = str(tmp_path / "factored.mtx")
    perm = str(tmp_path / "permuted.mtx")
    # reference harness flags incl. Legion passthroughs (test_matrices.py:27;
    # the largest fixture also passes -ll:csize 4000, :137)
    extra = ["-ll:csize", "4000"] if name == "lapl_3375x3375" else []
    # the permuted-matrix dump is a dense-matrix file write; skip it for the
    # largest fixture (the reference's harness also only passes -o/-m there)
    dump = [] if name == "lapl_3375x3375" else ["-p", perm]
    r = run_cli(["-i", p["mat"], "-s", p["separators"], "-c", p["clusters"],
                 "-b", p["b"], "-o", sol, "-m", fac, *dump,
                 "-fflow", "0", "-ll:cpu", "3", "-fcuda", "0", *extra])
    assert r.returncode == 0, r.stderr
    assert "Done factoring" in r.stdout and "Done solve." in r.stdout
    assert check_matrix(p["mat"], p["separators"], fac)
    assert check_solution(p["mat"], p["b"], sol)
    if dump:
        # permuted matrix dump equals golden permutation
        from cholesky_tpu.io import ordering as ordio
        from cholesky_tpu.symbolic.plan import build_plan, permute_matrix_dense

        plan = build_plan(ordio.parse_ordering(p["separators"]))
        a = mmio.read_dense(p["mat"])
        pm = np.tril(scipy.io.mmread(perm).toarray())
        np.testing.assert_allclose(pm, permute_matrix_dense(plan, a))


def test_cli_debug_dump_oracle(tmp_path):
    """The bisecting oracle END-TO-END (reference verify.py:216-275): run the
    CLI with -d + --debug-dumps on lapl_400x400 so it writes the op log AND
    per-op .mtx snapshots, then drive verify.replay.debug_factor over the
    dumps — every intermediate state must match the NumPy replay, and the
    final factor must match scipy."""
    p = fixture_paths("lapl_400x400")
    dbg = str(tmp_path / "dbg")
    fac = str(tmp_path / "factored.mtx")
    r = run_cli(["-i", p["mat"], "-s", p["separators"], "-c", p["clusters"],
                 "-d", dbg, "--debug-dumps", "-m", fac])
    assert r.returncode == 0, r.stderr
    assert os.path.exists(os.path.join(dbg, "output"))
    import glob

    dumps = glob.glob(os.path.join(dbg, "*.mtx"))
    assert dumps, "no per-op dumps written"
    from cholesky_tpu.verify import replay

    assert replay.debug_factor(p["mat"], p["separators"], fac,
                               os.path.join(dbg, "output"), dbg,
                               rtol=1e-10, atol=1e-10)


def test_cli_iterations(tmp_path):
    p = fixture_paths("lapl_9x9")
    r = run_cli(["-i", p["mat"], "-s", p["separators"], "-c", p["clusters"],
                 "--iterations", "2"])
    assert r.returncode == 0, r.stderr
    assert "Done factoring Iteration: 0." in r.stdout
    assert "Done factoring Iteration: 1." in r.stdout


def test_cli_debug_log(tmp_path):
    p = fixture_paths("lapl_25x25")
    dbg = str(tmp_path / "dbg")
    r = run_cli(["-i", p["mat"], "-s", p["separators"], "-c", p["clusters"],
                 "-d", dbg])
    assert r.returncode == 0, r.stderr
    log = os.path.join(dbg, "output")
    assert os.path.exists(log)
    # the log replays to the correct factor (the debug_factor oracle)
    from cholesky_tpu.io import ordering as ordio
    from cholesky_tpu.symbolic.plan import build_plan, permute_matrix_dense
    from cholesky_tpu.verify import replay

    plan = build_plan(ordio.parse_ordering(p["separators"]))
    a = mmio.read_dense(p["mat"])
    pmat = permute_matrix_dense(plan, a)
    mat = replay.replay_log(pmat, log)
    lref = scipy.linalg.cholesky(pmat + np.tril(pmat, -1).T, lower=True)
    assert np.allclose(np.tril(mat), lref, rtol=1e-10, atol=1e-10)


def test_cli_factor_checkpoint(tmp_path):
    """--save-factor then --load-factor: the second run skips the numeric
    phase and still produces the verified solution."""
    p = fixture_paths("lapl_25x25")
    ckpt = str(tmp_path / "ckpt.npz")
    sol = str(tmp_path / "sol.txt")
    r = run_cli(["-i", p["mat"], "-s", p["separators"], "-c", p["clusters"],
                 "--save-factor", ckpt])
    assert r.returncode == 0, r.stderr
    assert os.path.exists(ckpt)
    r2 = run_cli(["-i", p["mat"], "-s", p["separators"], "-c", p["clusters"],
                  "--load-factor", ckpt, "-b", p["b"], "-o", sol])
    assert r2.returncode == 0, r2.stderr
    assert "Loaded factor" in r2.stdout
    assert "Done factoring" not in r2.stdout
    assert check_solution(p["mat"], p["b"], sol)


def test_cli_usage_error():
    r = run_cli([])
    assert r.returncode == 2
    assert "usage:" in r.stdout


def test_cli_inv_diag(tmp_path):
    """--inv-diag writes diag(A^-1) (selected inversion) in original order."""
    p = fixture_paths("lapl_25x25")
    out = tmp_path / "invdiag.txt"
    r = run_cli(["-i", p["mat"], "-s", p["separators"], "-c", p["clusters"],
                 "--inv-diag", str(out)])
    assert r.returncode == 0, r.stderr
    assert "INVDIAG:" in r.stdout
    d = np.genfromtxt(out)
    a = mmio.read_dense(p["mat"])
    np.testing.assert_allclose(d, np.diag(np.linalg.inv(a)), rtol=1e-9)


def test_cli_signs_quasi_definite(tmp_path):
    """--signs file: solve a quasi-definite matrix end-to-end from files
    (KKT-style workflow with no Python)."""
    p = fixture_paths("lapl_400x400")
    a = mmio.read_dense(p["mat"])
    n = a.shape[0]
    rng = np.random.default_rng(2)
    s = np.where(rng.random(n) < 0.5, -1.0, 1.0)
    aq = a.copy()
    np.fill_diagonal(aq, s * (np.abs(np.diag(a)) + 0.5))
    mtx = tmp_path / "qd.mtx"
    r, c = np.nonzero(np.tril(aq))
    mmio.write_coo(str(mtx), r, c, aq[r, c], (n, n), symmetry="symmetric")
    np.savetxt(tmp_path / "signs.txt", s, fmt="%d")
    sol = tmp_path / "sol.txt"
    res = run_cli(["-i", str(mtx), "-s", p["separators"],
                   "-c", p["clusters"], "-b", p["b"],
                   "--signs", str(tmp_path / "signs.txt"),
                   "-o", str(sol)])
    assert res.returncode == 0, res.stderr
    assert "quasi-definite" in res.stdout
    b = mmio.read_array(p["b"]).reshape(-1)
    x = np.genfromtxt(sol).reshape(-1)
    assert np.linalg.norm(aq @ x - b) / np.linalg.norm(b) <= 1e-10
