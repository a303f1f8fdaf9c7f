"""Static condensation: Schur complement onto the root separator.

The root front, fully assembled by the level-0 extend-add, IS the Schur
complement of A onto the root separator dofs — the object the reference's
SYRK/GEMM accumulation chain (mmat.rg:1293-1346) builds before the final
root POTRF. The reference always factors to completion; exposing
(S, condensed rhs, interior recovery) is the classic substructuring /
domain-decomposition workflow on top of the same machinery.
"""

import numpy as np
import pytest
import scipy.linalg

from cholesky_tpu import SparseCholesky
from cholesky_tpu.utils.laplacian import generate_problem


def _dense(s):
    a = np.zeros((s.plan.n, s.plan.n))
    a[s.rows, s.cols] = s.vals
    a[s.cols, s.rows] = s.vals
    return a


def _dense_schur(a, r_dofs):
    o_dofs = np.setdiff1d(np.arange(a.shape[0]), r_dofs)
    a_rr = a[np.ix_(r_dofs, r_dofs)]
    a_ro = a[np.ix_(r_dofs, o_dofs)]
    a_oo = a[np.ix_(o_dofs, o_dofs)]
    return a_rr - a_ro @ np.linalg.solve(a_oo, a_ro.T), o_dofs


def test_schur_complement_matches_dense():
    n, r, c, v, o, cl, b = generate_problem((9, 9), 3)
    s = SparseCholesky.from_coo(n, r, c, v, o, cl, dtype=np.float64)
    s.factorize()
    dofs = s.schur_dofs()
    S = s.schur_complement()
    assert S.shape == (len(dofs), len(dofs))
    S_ref, _ = _dense_schur(_dense(s), dofs)
    np.testing.assert_allclose(S, S_ref, rtol=1e-10, atol=1e-12)


def test_condense_rhs_matches_dense():
    n, r, c, v, o, cl, b = generate_problem((9, 9), 3)
    s = SparseCholesky.from_coo(n, r, c, v, o, cl, dtype=np.float64)
    s.factorize()
    dofs = s.schur_dofs()
    a = _dense(s)
    _, o_dofs = _dense_schur(a, dofs)
    b_hat_ref = b[dofs] - a[np.ix_(dofs, o_dofs)] @ np.linalg.solve(
        a[np.ix_(o_dofs, o_dofs)], b[o_dofs])
    np.testing.assert_allclose(s.condense_rhs(b), b_hat_ref,
                               rtol=1e-10, atol=1e-12)


def test_condensation_round_trip_3d():
    """Full substructuring loop: condense, solve the interface system with
    an external (dense) solver, expand — the result solves the original
    system to the 1e-10 residual contract."""
    n, r, c, v, o, cl, b = generate_problem((7, 7, 7), 4)
    s = SparseCholesky.from_coo(n, r, c, v, o, cl, dtype=np.float64)
    s.factorize()
    S = s.schur_complement()
    b_hat = s.condense_rhs(b)
    x_root = scipy.linalg.solve(S, b_hat, assume_a="pos")
    x = s.expand_solution(b, x_root)
    assert s.residual(b, x) <= 1e-10
    np.testing.assert_allclose(x, s.solve(b), rtol=1e-8, atol=1e-10)


def test_schur_interface_consistency_f32():
    """f32 factor: the condensation round trip holds to f32 accuracy."""
    n, r, c, v, o, cl, b = generate_problem((8, 8, 8), 4)
    s = SparseCholesky.from_coo(n, r, c, v, o, cl, dtype=np.float32)
    s.factorize()
    S = s.schur_complement()
    S_ref, _ = _dense_schur(_dense(s), s.schur_dofs())
    np.testing.assert_allclose(S, S_ref, rtol=5e-4, atol=5e-5)
    x_root = scipy.linalg.solve(S_ref, s.condense_rhs(b).astype(np.float64))
    x = s.expand_solution(b, x_root)
    assert s.residual(b, x) <= 1e-4


def test_schur_spd_and_solve_equivalence():
    """S is SPD and the interface block of the direct solution solves
    S x_r = b_hat (algebraic identity of the Schur complement)."""
    n, r, c, v, o, cl, b = generate_problem((10, 10), 3)
    s = SparseCholesky.from_coo(n, r, c, v, o, cl, dtype=np.float64)
    s.factorize()
    S = s.schur_complement()
    np.testing.assert_allclose(S, S.T, atol=1e-12)
    assert np.all(np.linalg.eigvalsh(S) > 0)
    x = s.solve(b)
    np.testing.assert_allclose(S @ x[s.schur_dofs()], s.condense_rhs(b),
                               rtol=1e-9, atol=1e-11)


def test_quasi_definite_raises():
    n, r, c, v, o, cl, b = generate_problem((5, 5), 2)
    s = SparseCholesky.from_coo(n, r, c, v, o, cl)
    s.signs = -np.ones(n)      # simulate a held LDL^T factor
    with pytest.raises(NotImplementedError):
        s.schur_complement()
