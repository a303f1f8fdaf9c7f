"""Symmetric quasi-definite LDLᵀ (numeric/ldlt.py): signed-Cholesky
factorization A = L̃·S·L̃ᵀ for saddle-point/KKT systems — a capability the
reference lacks entirely (its dpotrf path, blas.rg:63-79, is SPD-only)."""

import numpy as np
import pytest
import scipy.sparse

from cholesky_tpu import SparseCholesky
from cholesky_tpu.numeric import ldlt
from cholesky_tpu.utils.laplacian import generate_problem


def _qd_from_grid(shape, levels, seed=5, neg_frac=0.4):
    """Quasi-definite matrix on the grid pattern: flip a random subset of
    diagonal signs; both sign-blocks stay strictly diagonally dominant."""
    n, r, c, v, o, cl, b = generate_problem(shape, levels)
    rng = np.random.default_rng(seed)
    s = np.where(rng.random(n) < neg_frac, -1.0, 1.0)
    vq = v.copy()
    d = r == c
    vq[d] = s[r[d]] * (v[d] + 0.5)
    return n, r, c, vq, o, cl, b, s


def _dense(n, r, c, v):
    a = np.zeros((n, n))
    a[r, c] = v
    a[c, r] = v
    return a


def test_qd_solve_logdet_inertia():
    n, r, c, vq, o, cl, b, s = _qd_from_grid((10, 9), 3)
    solver = SparseCholesky.from_coo(n, r, c, vq, o, cl, signs=s)
    x = solver.solve(b)
    A = _dense(n, solver.rows, solver.cols, solver.vals)
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-9,
                               atol=1e-11)
    assert solver.residual(b, x) <= 1e-10

    sgn, ld = solver.slogdet()
    sgn_ref, ld_ref = np.linalg.slogdet(A)
    assert sgn == sgn_ref
    np.testing.assert_allclose(ld, ld_ref, rtol=1e-10)
    npos, nneg, nzero = solver.inertia()
    eigs = np.linalg.eigvalsh(A)
    assert (npos, nneg, nzero) == (int((eigs > 0).sum()),
                                   int((eigs < 0).sum()), 0)
    with pytest.raises(ValueError):
        solver.logdet()


def test_qd_factor_reconstructs():
    """L̃·S·L̃ᵀ == permuted A, assembled from the per-level factor slabs."""
    n, r, c, vq, o, cl, b, s = _qd_from_grid((8, 7), 3, seed=1)
    solver = SparseCholesky.from_coo(n, r, c, vq, o, cl, signs=s)
    solver.factorize(check=True)       # pivot check: diag(L̃) > 0
    fp = solver.fplan
    L = np.zeros((n, n))
    for lvl in range(fp.levels):
        fac = np.asarray(solver.panels[lvl])
        fr = fp.front_rows[lvl]
        for sl in range(fac.shape[0]):
            rows_g = fr[sl]
            cols_g = fr[sl][:fp.W[lvl]]
            ok_r = rows_g < n
            ok_c = cols_g < n
            L[np.ix_(rows_g[ok_r], cols_g[ok_c])] = \
                fac[sl][np.ix_(ok_r, ok_c)]
    sp = s[solver.plan.perm]
    A_perm = _dense(n, solver.rows, solver.cols, solver.vals)[
        np.ix_(solver.plan.perm, solver.plan.perm)]
    np.testing.assert_allclose(np.tril(L) @ np.diag(sp) @ np.tril(L).T,
                               A_perm, rtol=1e-9, atol=1e-9)


def test_qd_kkt_block_system_auto_nd():
    """A genuine KKT system [[H, Bᵀ], [B, −C]] through auto nested
    dissection (from_matrix) — the interior-point matrix class."""
    rng = np.random.default_rng(3)
    n1, n2 = 60, 25
    H = scipy.sparse.diags([4.0] * n1) + scipy.sparse.random(
        n1, n1, density=0.05, random_state=3)
    H = (H + H.T) * 0.5
    C = scipy.sparse.diags(rng.uniform(1.0, 2.0, n2))
    B = scipy.sparse.random(n2, n1, density=0.1, random_state=4)
    K = scipy.sparse.bmat([[H, B.T], [B, -C]]).tocoo()
    # keep one triangle; from_coo/from_matrix symmetrize via dedup_lower
    mask = K.row >= K.col
    n = n1 + n2
    s = np.concatenate([np.ones(n1), -np.ones(n2)])
    solver = SparseCholesky.from_matrix(
        n, K.row[mask], K.col[mask], K.data[mask], signs=s)
    b = rng.standard_normal(n)
    x = solver.solve(b)
    assert solver.residual(b, x) <= 1e-10
    sgn, ld = solver.slogdet()
    sgn_ref, ld_ref = np.linalg.slogdet(K.toarray())
    assert sgn == sgn_ref and abs(ld - ld_ref) < 1e-8
    assert solver.inertia() == (n1, n2, 0)


def test_qd_f32_iterative_refinement():
    """f32 signed factor + the host refinement loop reaches 1e-10."""
    n, r, c, vq, o, cl, b, s = _qd_from_grid((12, 12), 4, seed=7)
    solver = SparseCholesky.from_coo(n, r, c, vq, o, cl, signs=s,
                                     dtype=np.float32)
    x = solver.solve(b, tol=1e-12)
    assert solver.residual(b, x) <= 1e-10


def test_qd_multi_rhs_and_update_values():
    n, r, c, vq, o, cl, b, s = _qd_from_grid((9, 9), 3, seed=11)
    solver = SparseCholesky.from_coo(n, r, c, vq, o, cl, signs=s)
    rng = np.random.default_rng(0)
    B = rng.standard_normal((n, 3))
    X = solver.solve(B)
    A = _dense(n, solver.rows, solver.cols, solver.vals)
    np.testing.assert_allclose(X, np.linalg.solve(A, B), rtol=1e-9,
                               atol=1e-11)
    # same-pattern re-factorization keeps the signature
    v2 = solver.vals * 1.5
    solver.update_values(v2)
    x2 = solver.solve(b)
    assert solver.residual(b, x2) <= 1e-10


def test_qd_guards_and_validation():
    n, r, c, vq, o, cl, b, s = _qd_from_grid((8, 8), 3)
    solver = SparseCholesky.from_coo(n, r, c, vq, o, cl, signs=s)
    for call in (solver.inv_diag, solver.logdet_grad,
                 lambda: solver.sample(b), lambda: solver.whiten(b),
                 lambda: solver.factorize_many(vq[None, :]),
                 lambda: solver.save_factor("/tmp/x.npz"),
                 solver.schur_complement):
        with pytest.raises(NotImplementedError):
            call()
    with pytest.raises(ValueError):
        SparseCholesky.from_coo(n, r, c, vq, o, cl, signs=s[:-1])
    # all-positive signature degenerates to plain Cholesky
    n2, r2, c2, v2, o2, cl2, b2 = generate_problem((8, 8), 3)
    sp = SparseCholesky.from_coo(n2, r2, c2, v2, o2, cl2,
                                 signs=np.ones(n2))
    assert sp.signs is None
    assert sp.residual(b2, sp.solve(b2)) <= 1e-10


def test_qd_non_quasidefinite_nans():
    """A signature that doesn't match the matrix produces NaNs (the SPD
    path's LAPACK-info-free contract) and check=True names it."""
    n, r, c, v, o, cl, b = generate_problem((8, 8), 3)
    s = np.ones(n)
    s[0] = -1.0                     # SPD matrix, claimed negative pivot
    solver = SparseCholesky.from_coo(n, r, c, v, o, cl, signs=s)
    with pytest.raises(ArithmeticError):
        solver.factorize(check=True)
