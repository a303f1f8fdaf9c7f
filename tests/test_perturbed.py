"""solve_perturbed: factor-preconditioned CG for general symmetric drift."""

import numpy as np
import pytest
import scipy.linalg

from cholesky_tpu import SparseCholesky
from cholesky_tpu.utils.laplacian import generate_problem


def _solver(dtype=np.float64, shape=(20, 20), levels=3):
    n, r, c, v, o, cl, b = generate_problem(shape, levels)
    s = SparseCholesky.from_coo(n, r, c, v, o, cl, dtype=dtype)
    return s, b


def _perturbation(s, scale, seed=0):
    # ±scale relative drift on every stored entry, diagonal kept dominant
    rng = np.random.default_rng(seed)
    dv = s.vals * rng.uniform(-scale, scale, s.vals.shape)
    dv = np.where(s.rows == s.cols, np.abs(dv), dv)
    return s.rows, s.cols, dv


def test_perturbed_matches_dense():
    s, b = _solver()
    dr, dc, dv = _perturbation(s, 0.1)
    x = s.solve_perturbed(b, dr, dc, dv, tol=1e-12)
    from cholesky_tpu.io import mmio
    import scipy.sparse
    rr, cc, vv = mmio.symmetrize_coo(dr, dc, dv)
    a_pert = (s._matrix_csr() + scipy.sparse.csr_matrix(
        (vv, (rr, cc)), shape=(s.plan.n, s.plan.n))).toarray()
    x_ref = scipy.linalg.solve(a_pert, b)
    np.testing.assert_allclose(x, x_ref, rtol=1e-9, atol=1e-9)
    assert np.linalg.norm(a_pert @ x - b) / np.linalg.norm(b) <= 1e-12


def test_perturbed_fp32_factor_preconditioner():
    s, b = _solver(dtype=np.float32)
    dr, dc, dv = _perturbation(s, 0.05, seed=1)
    x = s.solve_perturbed(b, dr, dc, dv, tol=1e-10)
    from cholesky_tpu.io import mmio
    import scipy.sparse
    rr, cc, vv = mmio.symmetrize_coo(dr, dc, dv)
    a_pert = s._matrix_csr() + scipy.sparse.csr_matrix(
        (vv, (rr, cc)), shape=(s.plan.n, s.plan.n))
    assert np.linalg.norm(a_pert @ x - b) / np.linalg.norm(b) <= 1e-10


def test_perturbed_multi_rhs():
    s, b = _solver()
    dr, dc, dv = _perturbation(s, 0.08, seed=2)
    B = np.stack([b, 2.0 * b + 1.0], axis=1)
    X = s.solve_perturbed(B, dr, dc, dv, tol=1e-11)
    assert X.shape == B.shape
    for j in range(2):
        xj = s.solve_perturbed(B[:, j], dr, dc, dv, tol=1e-11)
        np.testing.assert_allclose(X[:, j], xj)


def test_perturbed_zero_perturbation_is_plain_solve():
    s, b = _solver()
    x = s.solve_perturbed(b, s.rows[:1], s.cols[:1], np.zeros(1), tol=1e-12)
    assert s.residual(b, x) <= 1e-12


def test_perturbed_rejects_upper_triangle():
    s, b = _solver()
    with pytest.raises(ValueError):
        s.solve_perturbed(b, np.array([0]), np.array([1]), np.array([1.0]))


def test_perturbed_too_large_raises():
    s, b = _solver()
    # destroy definiteness: huge negative diagonal shift
    n = s.plan.n
    dr = dc = np.arange(n)
    dv = -10.0 * np.ones(n)
    with pytest.raises(RuntimeError):
        s.solve_perturbed(b, dr, dc, dv, max_iter=20)
