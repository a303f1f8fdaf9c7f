"""GMRF / GP-posterior sampling through the factor: sample() applies L⁻ᵀ
(covariance A⁻¹ for standard-normal input), whiten() applies Lᵀ (its exact
inverse). Deterministic checks against the extracted dense factor plus an
empirical-covariance sanity check.
"""

import numpy as np
import pytest
import scipy.linalg

from cholesky_tpu import SparseCholesky
from cholesky_tpu.utils.laplacian import generate_problem


def _build(dtype=np.float64, shape=(8, 8), levels=3):
    n, r, c, v, o, cl, b = generate_problem(shape, levels)
    s = SparseCholesky.from_coo(n, r, c, v, o, cl, dtype=dtype)
    s.factorize()
    return s


def test_sample_matches_dense_triangular_solve():
    s = _build()
    L = s.factor_dense()
    rng = np.random.default_rng(0)
    z = rng.standard_normal(s.plan.n)
    x = s.sample(z)
    # x_perm = L^-T z_perm; map both sides to permuted coordinates
    x_ref_perm = scipy.linalg.solve_triangular(
        L.T, z[s.plan.perm], lower=False)
    np.testing.assert_allclose(x[s.plan.perm], x_ref_perm,
                               rtol=1e-10, atol=1e-12)


def test_sample_multi_and_whiten_round_trip():
    s = _build(shape=(7, 7, 7), levels=4)
    rng = np.random.default_rng(1)
    z = rng.standard_normal((s.plan.n, 5))
    x = s.sample(z)
    assert x.shape == z.shape
    np.testing.assert_allclose(s.whiten(x), z, rtol=1e-9, atol=1e-11)


def test_whiten_matches_dense_matvec():
    s = _build()
    L = s.factor_dense()
    rng = np.random.default_rng(2)
    x = rng.standard_normal(s.plan.n)
    z = s.whiten(x)
    np.testing.assert_allclose(z[s.plan.perm], L.T @ x[s.plan.perm],
                               rtol=1e-10, atol=1e-12)


def test_sample_empirical_covariance():
    """Empirical second moments of sample() draws match A⁻¹ (loose — this
    is a statistical check with 4000 draws on a small problem)."""
    s = _build(shape=(4, 4), levels=2)
    n = s.plan.n
    rng = np.random.default_rng(3)
    z = rng.standard_normal((n, 4000))
    x = s.sample(z)
    emp = (x @ x.T) / z.shape[1]
    a = np.zeros((n, n))
    a[s.rows, s.cols] = s.vals
    a[s.cols, s.rows] = s.vals
    ainv = np.linalg.inv(a)
    scale = np.sqrt(np.outer(np.diag(ainv), np.diag(ainv)))
    assert np.max(np.abs(emp - ainv) / scale) < 0.25


def test_sample_f32():
    s = _build(dtype=np.float32, shape=(8, 8, 8), levels=4)
    rng = np.random.default_rng(4)
    z = rng.standard_normal(s.plan.n)
    x = s.sample(z)
    # f32 accuracy: compare against the dense factor to f32 tolerance
    L = s.factor_dense()
    x_ref = scipy.linalg.solve_triangular(L.T, z[s.plan.perm], lower=False)
    np.testing.assert_allclose(x[s.plan.perm], x_ref, rtol=2e-4, atol=2e-4)


def test_quasi_definite_raises():
    n, r, c, v, o, cl, b = generate_problem((5, 5), 2)
    s = SparseCholesky.from_coo(n, r, c, v, o, cl, signs=np.ones(n))
    s.signs = -np.ones(n)      # simulate a held LDL^T factor
    with pytest.raises(NotImplementedError):
        s.sample(np.ones(n))
