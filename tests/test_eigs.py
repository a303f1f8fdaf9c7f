"""Spectral toolkit: shift-invert Lanczos eigenpairs through the factor.

Golden model: dense scipy.linalg.eigh on the assembled matrix (the suite's
problems are small enough to diagonalize exactly)."""

import numpy as np
import pytest
import scipy.linalg

from cholesky_tpu import SparseCholesky
from cholesky_tpu.utils.laplacian import generate_problem


def _solver(shape=(20, 20), levels=3, dtype=np.float64, signs=None):
    n, r, c, v, o, cl, b = generate_problem(shape, levels)
    return SparseCholesky.from_coo(n, r, c, v, o, cl, dtype=dtype,
                                   signs=signs)


@pytest.fixture(scope="module")
def grid400():
    s = _solver()
    dense = s._matrix_csr().toarray()
    w_all = scipy.linalg.eigh(dense, eigvals_only=True)
    return s, dense, w_all


def test_smallest_eigenpairs_match_dense(grid400):
    s, dense, w_all = grid400
    w, V = s.eigsh(k=4, which="smallest", tol=1e-10)
    np.testing.assert_allclose(w, w_all[:4], rtol=1e-8)
    # eigenvector residuals and orthonormality
    anorm = np.abs(dense).sum(axis=1).max()
    res = np.linalg.norm(dense @ V - V * w, axis=0)
    assert res.max() <= 1e-9 * anorm
    np.testing.assert_allclose(V.T @ V, np.eye(4), atol=1e-8)


def test_largest_eigenpairs_match_dense(grid400):
    s, dense, w_all = grid400
    w, V = s.eigsh(k=3, which="largest", tol=1e-10)
    np.testing.assert_allclose(w, w_all[-3:], rtol=1e-8)
    res = np.linalg.norm(dense @ V - V * w, axis=0)
    assert res.max() <= 1e-9 * np.abs(dense).sum(axis=1).max()


def test_condest_lanczos_is_tight(grid400):
    s, dense, w_all = grid400
    true_kappa = w_all[-1] / w_all[0]
    kappa = s.condest(method="lanczos")
    np.testing.assert_allclose(kappa, true_kappa, rtol=1e-6)
    # the power-iteration estimate is looser but in the ballpark — and the
    # Lanczos number should never be further from the truth
    est = s.condest(iters=30)
    assert abs(kappa - true_kappa) <= abs(est - true_kappa) + 1e-9 * true_kappa


def test_fp32_factor_still_gives_f64_eigenpairs():
    # the refined solves make the inverse operator f64-accurate even though
    # the factor itself is fp32
    s = _solver(dtype=np.float32)
    dense = s._matrix_csr().toarray()
    w_all = scipy.linalg.eigh(dense, eigvals_only=True)
    w, V = s.eigsh(k=2, which="smallest", tol=1e-9)
    np.testing.assert_allclose(w, w_all[:2], rtol=1e-7)


def test_smallest_3d_fixture_scale():
    s = _solver(shape=(9, 9, 9), levels=4)
    dense = s._matrix_csr().toarray()
    w_all = scipy.linalg.eigh(dense, eigvals_only=True)
    w, _ = s.eigsh(k=3, which="smallest", tol=1e-9)
    np.testing.assert_allclose(w, w_all[:3], rtol=1e-7)


def test_generalized_modal_matches_dense(grid400):
    # FEM modal problem K x = lambda M x with a lumped (diagonal) mass
    s, dense, _ = grid400
    rng = np.random.default_rng(3)
    mdiag = rng.uniform(0.5, 2.0, s.plan.n)
    import scipy.sparse
    M = scipy.sparse.diags(mdiag).tocsr()
    w_all = scipy.linalg.eigh(dense, np.diag(mdiag), eigvals_only=True)
    w, V = s.eigsh(k=4, M=M, tol=1e-10)
    np.testing.assert_allclose(w, w_all[:4], rtol=1e-8)
    # mass-normalization convention: V^T M V = I
    np.testing.assert_allclose(V.T @ (M @ V), np.eye(4), atol=1e-8)
    # true generalized residual
    res = np.linalg.norm(dense @ V - (M @ V) * w, axis=0)
    assert res.max() <= 1e-8


def test_generalized_consistent_mass():
    # non-diagonal SPD mass matrix (Laplacian-based, strictly diagonally
    # dominant) on a smaller grid
    s = _solver(shape=(10, 10), levels=2)
    dense = s._matrix_csr().toarray()
    n = s.plan.n
    M = np.eye(n) - 0.1 * (dense / np.abs(dense).sum(axis=1).max())
    M = (M + M.T) / 2
    w_all = scipy.linalg.eigh(dense, M, eigvals_only=True)
    w, V = s.eigsh(k=3, M=M, tol=1e-10)
    np.testing.assert_allclose(w, w_all[:3], rtol=1e-8)
    np.testing.assert_allclose(V.T @ (M @ V), np.eye(3), atol=1e-8)


def test_generalized_largest_raises(grid400):
    s, _, _ = grid400
    import scipy.sparse
    with pytest.raises(ValueError):
        s.eigsh(k=1, which="largest", M=scipy.sparse.eye(s.plan.n))
    with pytest.raises(ValueError):
        s.eigsh(k=1, M=scipy.sparse.eye(3))   # wrong shape


def test_quasi_definite_smallest_raises():
    n, r, c, v, o, cl, b = generate_problem((5, 5), 2)
    signs = np.ones(n)
    signs[: n // 2] = -1
    # quasi-definite LDL^T: shift-invert smallest is SPD-only
    s = SparseCholesky.from_coo(n, r, c, v + np.where(
        r == c, 10.0, 0.0), o, cl, signs=signs)
    with pytest.raises(NotImplementedError):
        s.eigsh(k=1, which="smallest")


def test_bad_arguments(grid400):
    s, _, _ = grid400
    with pytest.raises(ValueError):
        s.eigsh(k=0)
    with pytest.raises(ValueError):
        s.eigsh(which="middle")
