"""I/O layer tests: MatrixMarket + ordering/cluster parsers against the
reference fixtures (formats defined by mmio.c and mnd.c)."""

import numpy as np
import pytest

from cholesky_tpu.io import mmio, ordering as ordio
from tests.conftest import FIXTURES, HAS_REFERENCE, fixture_paths

needs_reference = pytest.mark.skipif(
    not HAS_REFERENCE, reason="reference fixture values")


def test_banner_9x9():
    p = fixture_paths("lapl_9x9")
    b = mmio.read_banner(p["mat"])
    assert (b.rows, b.cols, b.nnz) == (9, 9, 21)
    assert b.symmetry == "hermitian"
    assert b.format == "coordinate"


def test_read_coo_9x9():
    p = fixture_paths("lapl_9x9")
    banner, r, c, v = mmio.read_coo(p["mat"])
    assert len(v) == 21
    assert r[0] == 0 and c[0] == 0 and v[0] == 4.0
    # lower triangle storage
    assert (r >= c).all()


def test_read_dense_symmetrizes():
    p = fixture_paths("lapl_9x9")
    a = mmio.read_dense(p["mat"])
    assert a.shape == (9, 9)
    assert np.allclose(a, a.T)
    assert a[0, 0] == 4.0 and a[0, 1] == -1.0 and a[1, 0] == -1.0


@needs_reference
def test_read_array_rhs():
    p = fixture_paths("lapl_9x9")
    b = mmio.read_array(p["b"])
    assert b.shape == (9, 1)
    assert b[0, 0] == 9.0 and b[1, 0] == 7.0


def test_write_coo_roundtrip(tmp_path):
    rows = np.array([0, 1, 2, 2])
    cols = np.array([0, 0, 1, 2])
    vals = np.array([4.0, -1.5, 2.25, 8.0])
    f = str(tmp_path / "t.mtx")
    mmio.write_coo(f, rows, cols, vals, (3, 3), symmetry="hermitian")
    banner, r, c, v = mmio.read_coo(f)
    assert banner.symmetry == "hermitian"
    np.testing.assert_array_equal(r, rows)
    np.testing.assert_array_equal(c, cols)
    np.testing.assert_allclose(v, vals)


def test_scipy_compat(tmp_path):
    """Our writer must be readable by scipy.io.mmread (the golden checker)."""
    scipy_io = pytest.importorskip("scipy.io")
    mat = np.tril(np.arange(16, dtype=float).reshape(4, 4) + 1)
    f = str(tmp_path / "t.mtx")
    mmio.write_dense_coo(f, mat, symmetry="hermitian")
    back = np.tril(scipy_io.mmread(f).toarray())
    np.testing.assert_allclose(back, mat)


@pytest.mark.parametrize("name", list(FIXTURES))
def test_parse_ordering(name):
    p = fixture_paths(name)
    o = ordio.parse_ordering(p["separators"])
    assert o.num_separators == (1 << o.levels) - 1
    n = int(name.split("_")[1].split("x")[0])
    assert o.n == n
    # dofs partition 0..n-1
    alldofs = np.concatenate([o.dofs[s] for s in range(1, o.num_separators + 1)])
    assert sorted(alldofs) == list(range(n))


@needs_reference
def test_parse_ordering_values():
    p = fixture_paths("lapl_9x9")
    o = ordio.parse_ordering(p["separators"])
    # file: 0;0,3,6,  1;2,5,8,  2;1,4,7,  -> seps become 1-based (mnd.c:50)
    np.testing.assert_array_equal(o.dofs[1], [0, 3, 6])
    np.testing.assert_array_equal(o.dofs[2], [2, 5, 8])
    np.testing.assert_array_equal(o.dofs[3], [1, 4, 7])


@needs_reference
def test_parse_clusters_25():
    p = fixture_paths("lapl_25x25")
    c = ordio.parse_clusters(p["clusters"])
    assert c.levels == 3 and c.num_separators == 7
    # root (file id 6 -> sep 7): "0,2,3,5,;0,3,;" -> two intervals
    np.testing.assert_array_equal(c.intervals[7][0], [0, 2, 3, 5])
    np.testing.assert_array_equal(c.intervals[7][1], [0, 3])
    assert c.num_clusters(7, 0) == 3
    assert c.num_clusters(7, 1) == 1
    # interval-1 clusters resolve to dof boundaries via the chain
    # (partition_separator's chase, mmat.rg:405-422)
    np.testing.assert_array_equal(c.cluster_dof_ranges(7, 1), [0, 5])
    np.testing.assert_array_equal(c.cluster_dof_ranges(7, 0), [0, 2, 3, 5])


def test_ordering_roundtrip(tmp_path):
    p = fixture_paths("lapl_25x25")
    o = ordio.parse_ordering(p["separators"])
    f = str(tmp_path / "ord.txt")
    ordio.write_ordering(f, o)
    o2 = ordio.parse_ordering(f)
    assert o2.levels == o.levels and o2.num_separators == o.num_separators
    for s in o.dofs:
        np.testing.assert_array_equal(o.dofs[s], o2.dofs[s])


def test_clusters_roundtrip(tmp_path):
    p = fixture_paths("lapl_400x400")
    c = ordio.parse_clusters(p["clusters"])
    f = str(tmp_path / "clust.txt")
    ordio.write_clusters(f, c)
    c2 = ordio.parse_clusters(f)
    for s in c.intervals:
        assert len(c.intervals[s]) == len(c2.intervals[s])
        for a, b in zip(c.intervals[s], c2.intervals[s]):
            np.testing.assert_array_equal(a, b)


def test_write_array_roundtrip(tmp_path):
    from cholesky_tpu.io import mmio

    p = str(tmp_path / "B_7x1.mtx")
    arr = np.arange(1, 8, dtype=np.float64)[:, None]
    mmio.write_array(p, arr, field="integer")
    got = mmio.read_array(p)
    np.testing.assert_array_equal(got, arr)


def test_generate_b_fixture_format(tmp_path):
    """generate_b (verify.py:305-308 parity): integers 1..10, [n,1],
    array-format .mtx readable by our reader and by the mnd.c-style skip."""
    from cholesky_tpu import verify as vfy
    from cholesky_tpu.io import mmio

    p = str(tmp_path / "B_12x1.mtx")
    b = vfy.generate_b(12, path=p, seed=3)
    assert b.shape == (12, 1)
    assert b.min() >= 1 and b.max() <= 10
    got = mmio.read_array(p)
    np.testing.assert_array_equal(got, b.astype(np.float64))
