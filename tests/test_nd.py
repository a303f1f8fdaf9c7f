"""General-graph nested-dissection tests: the auto-ordering path for
arbitrary SPD matrices (no precomputed ord/clust files)."""

import numpy as np
import pytest

from cholesky_tpu import SparseCholesky
from cholesky_tpu.numeric.assemble import assemble_panels_numpy
from cholesky_tpu.symbolic.nd import nested_dissection_graph
from cholesky_tpu.symbolic.plan import build_plan
from cholesky_tpu.utils.laplacian import grid_laplacian


def random_spd(n, density, rng):
    """Random sparse strictly-diagonally-dominant SPD matrix (lower COO)."""
    nnz = int(n * density)
    r = rng.integers(1, n, size=nnz)
    c = (rng.random(nnz) * r).astype(np.int64)
    uniq = np.unique(r * n + c)
    r, c = uniq // n, uniq % n
    v = rng.uniform(-1.0, 1.0, size=len(r))
    deg = np.zeros(n)
    np.add.at(deg, r, np.abs(v))
    np.add.at(deg, c, np.abs(v))
    rows = np.concatenate([np.arange(n), r])
    cols = np.concatenate([np.arange(n), c])
    vals = np.concatenate([deg + 1.0, v])
    return rows, cols, vals


def test_separator_property():
    """The ordering must satisfy the ND invariant: no entry couples two
    separators outside an ancestor relation (check_structure enforces)."""
    rng = np.random.default_rng(3)
    n = 500
    rows, cols, vals = random_spd(n, 6, rng)
    o, cl = nested_dissection_graph(n, rows, cols)
    plan = build_plan(o, cl)
    assemble_panels_numpy(plan, rows, cols, vals, check_structure=True)


def _check_split_invariants(n, rows, cols):
    from cholesky_tpu.symbolic.nd import _build_adjacency, _split

    indptr, indices = _build_adjacency(n, rows, cols)
    a, b, s = _split(indptr, indices, np.arange(n, dtype=np.int64))
    in_a = np.zeros(n, bool); in_a[a] = True
    in_b = np.zeros(n, bool); in_b[b] = True
    for vtx in s:
        nbrs = indices[indptr[vtx]:indptr[vtx + 1]]
        assert in_a[nbrs].any() and in_b[nbrs].any()
    for vtx in a:
        assert not in_b[indices[indptr[vtx]:indptr[vtx + 1]]].any()
    return len(a), len(b), len(s)


def test_separator_vertices_all_needed():
    """Refinement invariant (_split): every vertex kept in a separator has
    at least one neighbor on EACH side it separates — a vertex with all its
    edges into one side plus the separator would have been returned to the
    far side instead of enlarging the root front. Random graphs exercise
    both frontier branches (separator drawn from `rest` or from `a_side`)."""
    rng = np.random.default_rng(11)
    n, r, c, v = grid_laplacian((20, 20))
    p = rng.permutation(n)
    na, nb, ns = _check_split_invariants(n, p[r], p[c])
    assert na and nb and ns
    for seed in range(6):
        rng = np.random.default_rng(seed)
        m = 400
        rr, cc, _ = random_spd(m, 4, rng)
        off = rr != cc
        _check_split_invariants(m, rr[off], cc[off])


def test_partition_is_complete():
    n = 300
    rng = np.random.default_rng(0)
    rows, cols, vals = random_spd(n, 5, rng)
    o, _ = nested_dissection_graph(n, rows, cols, levels=4)
    all_dofs = np.concatenate([o.dofs[s] for s in range(1, 16)])
    assert sorted(all_dofs) == list(range(n))


def test_solve_random_spd():
    rng = np.random.default_rng(7)
    n = 800
    rows, cols, vals = random_spd(n, 6, rng)
    s = SparseCholesky.from_matrix(n, rows, cols, vals)
    b = rng.normal(size=n)
    x = s.solve(b)
    assert s.residual(b, x) <= 1e-10


def test_solve_shuffled_grid():
    """A grid Laplacian with randomly-permuted vertex ids — geometric
    structure hidden, the graph bisection must find it."""
    rng = np.random.default_rng(1)
    n, r, c, v = grid_laplacian((24, 24))
    p = rng.permutation(n)
    s = SparseCholesky.from_matrix(n, p[r], p[c], v, levels=5)
    b = rng.normal(size=n)
    x = s.solve(b)
    assert s.residual(b, x) <= 1e-10


def test_disconnected_graph():
    """Two disconnected components (block-diagonal SPD)."""
    rng = np.random.default_rng(2)
    n1, r1, c1, v1 = grid_laplacian((9, 9))
    n2, r2, c2, v2 = grid_laplacian((7, 8))
    n = n1 + n2
    rows = np.concatenate([r1, r2 + n1])
    cols = np.concatenate([c1, c2 + n1])
    vals = np.concatenate([v1, v2])
    s = SparseCholesky.from_matrix(n, rows, cols, vals, levels=4)
    b = rng.normal(size=n)
    x = s.solve(b)
    assert s.residual(b, x) <= 1e-10


def test_tiny_matrix():
    rows = np.array([0, 1, 1])
    cols = np.array([0, 0, 1])
    vals = np.array([4.0, 1.0, 3.0])
    s = SparseCholesky.from_matrix(2, rows, cols, vals)
    x = s.solve(np.array([1.0, 2.0]))
    a = np.array([[4.0, 1.0], [1.0, 3.0]])
    np.testing.assert_allclose(a @ x, [1.0, 2.0], atol=1e-12)
