"""Problem-generator tests: grid Laplacians + geometric nested dissection in
the reference's conventions."""

import numpy as np
import pytest

from cholesky_tpu import SparseCholesky
from cholesky_tpu.io import ordering as ordio
from cholesky_tpu.symbolic.plan import build_plan
from cholesky_tpu.utils.laplacian import (
    generate_problem, grid_laplacian, make_clusters, nested_dissection)


def test_grid_laplacian_matches_fixture():
    """Our generated 3x3 Laplacian equals the 9x9 reference fixture matrix."""
    from cholesky_tpu.io import mmio
    from tests.conftest import fixture_paths

    n, r, c, v = grid_laplacian((3, 3))
    a = np.zeros((9, 9))
    a[r, c] = v
    a = a + np.tril(a, -1).T
    ref = mmio.read_dense(fixture_paths("lapl_9x9")["mat"])
    np.testing.assert_allclose(a, ref)


def test_nested_dissection_partition():
    o, cl = nested_dissection((15, 15), 4)
    assert o.num_separators == 15
    all_dofs = np.concatenate([o.dofs[s] for s in range(1, 16)])
    assert sorted(all_dofs) == list(range(225))
    # root separator is the middle plane of the whole grid
    root_dofs = o.dofs[15]
    assert len(root_dofs) == 15


def test_nested_dissection_structure_valid():
    """The ordering must be a valid ND ordering: no entry couples
    non-ancestor separators (assemble enforces with check_structure)."""
    from cholesky_tpu.numeric.assemble import assemble_panels

    n, r, c, v, o, cl, b = generate_problem((10, 12), 4)
    plan = build_plan(o, cl)
    assemble_panels(plan, r, c, v, check_structure=True)   # must not raise


def test_cluster_hierarchy_invariant():
    """Every separator reaches one cluster by its elimination interval."""
    o, cl = nested_dissection((15, 15, 15), 5, cluster_size=4)
    levels = o.levels
    for s in range(1, o.num_separators + 1):
        heap = o.num_separators - s + 1
        lvl = heap.bit_length() - 1
        elim = max(0, levels - 2 - lvl)
        assert cl.num_clusters(s, elim) == 1, (s, lvl, elim)
        # boundary chains resolve to the full dof range
        rng = cl.cluster_dof_ranges(s, elim)
        assert rng[0] == 0 and rng[-1] == len(o.dofs[s])


def test_generated_problem_solves():
    n, r, c, v, o, cl, b = generate_problem((12, 13), 4)
    s = SparseCholesky.from_coo(n, r, c, v, o, cl)
    s.factorize()
    x = s.solve(b)
    assert s.residual(b, x) <= 1e-10


def test_generated_problem_fp32_ir():
    n, r, c, v, o, cl, b = generate_problem((16, 16), 4)
    s = SparseCholesky.from_coo(n, r, c, v, o, cl, dtype=np.float32)
    s.factorize()
    x = s.solve(b)
    assert s.residual(b, x) <= 1e-10        # IR recovers f64 accuracy
    x_raw = s.solve(b, refine="never")
    assert s.residual(b, x_raw) > 1e-10     # raw fp32 cannot hit it


def test_generated_ord_clust_files_roundtrip(tmp_path):
    """Generated orderings serialize to the reference's file formats and
    drive the file-based API."""
    from cholesky_tpu.io import mmio

    n, r, c, v, o, cl, b = generate_problem((9, 9), 3)
    mtx = str(tmp_path / "m.mtx")
    ordf = str(tmp_path / "ord.txt")
    clustf = str(tmp_path / "clust.txt")
    mmio.write_coo(mtx, r, c, v, (n, n), symmetry="hermitian")
    ordio.write_ordering(ordf, o)
    ordio.write_clusters(clustf, cl)
    s = SparseCholesky.from_files(mtx, ordf, clustf)
    x = s.solve(b)
    assert s.residual(b, x) <= 1e-10


def test_deep_tree_on_small_grid_no_duplicate_dofs():
    """Trees deeper than the grid create empty internal boxes; their
    separators must be empty, not steal ancestor dofs (regression: 1-D
    deep trees duplicated dofs across separators)."""
    for shape, levels in [((4,), 4), ((5,), 5), ((3, 3), 5)]:
        o, cl = nested_dissection(shape, levels)
        n = int(np.prod(shape))
        all_dofs = np.concatenate(
            [o.dofs[s] for s in range(1, o.num_separators + 1)])
        assert len(all_dofs) == n, (shape, levels)
        assert sorted(all_dofs) == list(range(n))


def test_make_clusters_empty_separator_with_cluster_size():
    """Empty separators are legal; the clustered path must produce one
    zero-size cluster for them (regression: AssertionError)."""
    o, cl = nested_dissection((3,), 3, cluster_size=2)
    for s in range(1, o.num_separators + 1):
        rng = cl.cluster_dof_ranges(s, 0)
        assert rng[0] == 0 and rng[-1] == len(o.dofs[s])


def test_deep_tree_problem_still_solves():
    """End to end on a grid whose tree has empty separators."""
    n, r, c, v, o, cl, b = generate_problem((6, 5), 5)
    s = SparseCholesky.from_coo(n, r, c, v, o, cl)
    s.factorize()
    x = s.solve(b)
    assert s.residual(b, x) <= 1e-10
