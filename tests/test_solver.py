"""End-to-end solver tests — the reference's integration contract
(test_matrices.py:51-142: factor matches scipy.linalg.cholesky of the permuted
matrix, solution matches scipy.linalg.solve) plus the tighter BASELINE
residual contract ||Ax-b||/||b|| <= 1e-10."""

import numpy as np
import pytest
import scipy.linalg

from cholesky_tpu import SparseCholesky
from cholesky_tpu.io import mmio
from cholesky_tpu.symbolic.plan import permute_matrix_dense
from tests.conftest import FIXTURES, fixture_paths


def run_fixture(name):
    p = fixture_paths(name)
    s = SparseCholesky.from_files(p["mat"], p["separators"], p["clusters"])
    s.factorize()
    b = mmio.read_array(p["b"]).reshape(-1)
    x = s.solve(b)
    return s, b, x, p


@pytest.mark.parametrize("name", list(FIXTURES))
def test_end_to_end(name):
    s, b, x, p = run_fixture(name)

    # BASELINE north-star: residual <= 1e-10
    assert s.residual(b, x) <= 1e-10

    a = mmio.read_dense(p["mat"])
    # reference check_solution (verify.py:290-302) at its 1e-4 tolerance and
    # tighter
    x_scipy = scipy.linalg.solve(a, b.reshape(-1, 1)).reshape(-1)
    assert np.allclose(x, x_scipy, rtol=1e-4, atol=1e-4)
    assert np.allclose(x, x_scipy, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("name", ["lapl_9x9", "lapl_25x25", "lapl_400x400"])
def test_factor_matches_scipy(name):
    """Reference check_matrix (verify.py:278-287): the factored matrix equals
    scipy's cholesky of the permuted matrix."""
    s, b, x, p = run_fixture(name)
    a = mmio.read_dense(p["mat"])
    pmat = permute_matrix_dense(s.plan, a)
    l_scipy = scipy.linalg.cholesky(pmat + np.tril(pmat, -1).T, lower=True)
    l_ours = s.factor_dense()
    assert np.allclose(l_ours, l_scipy, rtol=1e-4, atol=1e-4)
    assert np.allclose(l_ours, l_scipy, rtol=1e-9, atol=1e-9)


def test_factor_3375_factor():
    s, b, x, p = run_fixture("lapl_3375x3375")
    a = mmio.read_dense(p["mat"])
    pmat = permute_matrix_dense(s.plan, a)
    l_scipy = scipy.linalg.cholesky(pmat + np.tril(pmat, -1).T, lower=True)
    l_ours = s.factor_dense()
    assert np.allclose(l_ours, l_scipy, rtol=1e-4, atol=1e-4)


def test_refactorize_iterations():
    """The reference's --iterations flag refills and refactors
    (mmat.rg:1212-1224); assemble+factor must be idempotent across runs."""
    p = fixture_paths("lapl_25x25")
    s = SparseCholesky.from_files(p["mat"], p["separators"], p["clusters"])
    l1 = np.array(s.factor_dense())
    s.assemble()
    s.factorize()
    l2 = np.array(s.factor_dense())
    np.testing.assert_allclose(l1, l2)


def test_multiple_rhs():
    p = fixture_paths("lapl_400x400")
    s = SparseCholesky.from_files(p["mat"], p["separators"], p["clusters"])
    s.factorize()
    a = mmio.read_dense(p["mat"])
    rng = np.random.default_rng(1)
    for _ in range(3):
        b = rng.normal(size=a.shape[0])
        x = s.solve(b)
        assert s.residual(b, x) <= 1e-10


def test_permuted_dense_output():
    """-p flag parity: the permuted matrix dump equals the golden permutation."""
    p = fixture_paths("lapl_25x25")
    s = SparseCholesky.from_files(p["mat"], p["separators"], p["clusters"])
    a = mmio.read_dense(p["mat"])
    np.testing.assert_allclose(s.permuted_dense(), permute_matrix_dense(s.plan, a))
