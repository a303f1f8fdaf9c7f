"""scipy interop surface: SparseCholesky.from_scipy and the
scipy.sparse.linalg.spsolve-shaped one-shot `cholesky_tpu.spsolve`.
Triangle-handling contract: lower-only, upper-only, and fully-populated
symmetric stores of the same matrix must produce identical solvers."""

import numpy as np
import pytest
import scipy.sparse as sp

import cholesky_tpu
from cholesky_tpu import SparseCholesky, spsolve
from cholesky_tpu.utils.problems import fem_q4


def _spd_scipy(seed=0):
    n, r, c, v = fem_q4(12, 12, seed=seed)
    lower = sp.coo_matrix((v, (r, c)), shape=(n, n))
    full = lower + sp.tril(lower, -1).T
    return n, lower.tocsr(), full.tocsr()


def test_from_scipy_triangle_equivalence():
    n, lower, full = _spd_scipy()
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)
    xs = []
    for a in (lower, sp.triu(full), full, full.toarray()):
        s = SparseCholesky.from_scipy(a)
        s.factorize()
        xs.append(s.solve(b))
        assert s.residual(b, xs[-1]) <= 1e-10
    for x in xs[1:]:
        np.testing.assert_allclose(x, xs[0], rtol=1e-12, atol=1e-12)


def test_spsolve_matches_scipy():
    n, lower, full = _spd_scipy(seed=3)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n)
    x = spsolve(full, b)
    ref = sp.linalg.spsolve(full.tocsc(), b)
    np.testing.assert_allclose(x, ref, rtol=1e-8, atol=1e-10)


def test_spsolve_f32_refines_to_contract():
    # dtype=float32 factors on f32 values; the contract is relative to the
    # matrix actually passed (its entries are f32-rounded), evaluated in f64
    n, lower, full = _spd_scipy(seed=5)
    b = np.random.default_rng(2).standard_normal(n)
    a32 = full.astype(np.float32)
    x = spsolve(a32, b)
    a = a32.astype(np.float64)
    r = np.linalg.norm(a @ x - b) / np.linalg.norm(b)
    assert r <= 1e-10


def test_from_scipy_coo_duplicates_sum():
    # scipy COO convention: duplicate coordinates accumulate
    r = np.array([1, 1, 0, 2, 2])
    c = np.array([0, 0, 0, 2, 2])
    v = np.array([-0.5, -0.5, 4.0, 2.0, 1.0])
    a = sp.coo_matrix((v, (r, c)), shape=(3, 3))
    diag = sp.coo_matrix(([0.0, 3.0, 0.0], ([0, 1, 2], [0, 1, 2])))
    s = SparseCholesky.from_scipy(a + diag)
    s.factorize()
    dense = np.array([[4.0, -1.0, 0.0], [-1.0, 3.0, 0.0], [0.0, 0.0, 3.0]])
    b = np.array([1.0, 2.0, 3.0])
    x = s.solve(b)
    np.testing.assert_allclose(dense @ x, b, rtol=1e-12, atol=1e-12)


def test_from_scipy_accepts_nested_list():
    s = SparseCholesky.from_scipy([[4.0, -1.0], [-1.0, 4.0]])
    s.factorize()
    x = s.solve(np.array([1.0, 2.0]))
    np.testing.assert_allclose([4 * x[0] - x[1], -x[0] + 4 * x[1]],
                               [1.0, 2.0], rtol=1e-12)


def test_from_scipy_rejects_nonsymmetric():
    a = sp.coo_matrix((np.array([4.0, 4.0, -1.0, -0.5]),
                       (np.array([0, 1, 0, 1]), np.array([0, 1, 1, 0]))),
                      shape=(2, 2))
    with pytest.raises(ValueError, match="not symmetric"):
        SparseCholesky.from_scipy(a)
    # explicit stored zero opposite a nonzero is also asymmetric
    b = sp.coo_matrix((np.array([4.0, 4.0, 0.0, -0.5]),
                       (np.array([0, 1, 0, 1]), np.array([0, 1, 1, 0]))),
                      shape=(2, 2))
    with pytest.raises(ValueError, match="not symmetric"):
        SparseCholesky.from_scipy(b)


def test_spsolve_sparse_rhs():
    n, lower, full = _spd_scipy(seed=7)
    b = np.zeros(n)
    b[::7] = 1.0
    x = spsolve(full, sp.csr_matrix(b.reshape(-1, 1)))
    ref = sp.linalg.spsolve(full.tocsc(), b)
    np.testing.assert_allclose(x, ref, rtol=1e-8, atol=1e-10)


def test_force_cpu_after_backend_init_raises():
    import jax

    jax.devices()                   # ensure a backend is up (cpu in tests)
    cholesky_tpu.force_cpu()        # already-cpu plain call: no-op
    with pytest.raises(RuntimeError, match="before any other"):
        cholesky_tpu.force_cpu(4)   # device-count change can't apply now


def test_from_scipy_rejects_nonsquare():
    with pytest.raises(ValueError):
        SparseCholesky.from_scipy(sp.random(4, 5, density=0.5, format="csr"))
    with pytest.raises(ValueError):
        SparseCholesky.from_scipy(np.ones((3, 4)))


def test_spsolve_exported():
    assert cholesky_tpu.spsolve is spsolve


def test_from_scipy_on_mesh():
    # scipy entry point composes with multi-chip subtree sharding
    from cholesky_tpu.parallel.mesh import make_mesh

    n, lower, full = _spd_scipy(seed=9)
    s = SparseCholesky.from_scipy(full, mesh=make_mesh(8))
    s.factorize()
    b = np.random.default_rng(4).standard_normal(n)
    x = s.solve(b)
    assert s.residual(b, x) <= 1e-10


def test_aslinearoperator_inverse():
    import scipy.sparse.linalg as spla

    n, lower, full = _spd_scipy(seed=11)
    s = SparseCholesky.from_scipy(full)
    op = s.aslinearoperator()
    rng = np.random.default_rng(5)
    b = rng.standard_normal(n)
    x = op.matvec(b)
    assert s.residual(b, x) <= 1e-10
    # matmat = batched multi-RHS solve
    B = rng.standard_normal((n, 3))
    X = op.matmat(B)
    assert s.residual(B, X) <= 1e-10
    # forward operator view matches the CSR matvec
    fwd = s.aslinearoperator(inverse=False)
    np.testing.assert_allclose(fwd.matvec(x), s._matrix_csr() @ x)


def test_aslinearoperator_drives_scipy_eigsh():
    # the classic interop: scipy's ARPACK shift-invert driven by our factor
    import scipy.linalg
    import scipy.sparse.linalg as spla

    n, lower, full = _spd_scipy(seed=12)
    s = SparseCholesky.from_scipy(full)
    w = spla.eigsh(s.aslinearoperator(inverse=False), k=2, sigma=0,
                   OPinv=s.aslinearoperator(), return_eigenvectors=False)
    w_all = scipy.linalg.eigh(full.toarray(), eigvals_only=True)
    np.testing.assert_allclose(np.sort(w), w_all[:2], rtol=1e-8)
