"""Symbolic layer tests: tree conventions, permutation layout, block bounds —
all checked against the reference's conventions (build_separator_tree
mmat.rg:835, partition_matrix mmat.rg:300, verify.py:127 permute_matrix)."""

import numpy as np
import pytest

from cholesky_tpu.io import mmio, ordering as ordio
from cholesky_tpu.symbolic.plan import build_plan, permute_matrix_dense
from cholesky_tpu.symbolic.tree import SeparatorTree
from tests.conftest import FIXTURES, fixture_paths


def test_tree_numbering():
    t = SeparatorTree(3, 7)
    # root is the highest separator number (mmat.rg:843: node = num_separators--)
    assert t.level_of(7) == 0
    assert t.level_seps(0) == [7]
    assert t.level_seps(1) == [6, 5]          # heap order -> node descending
    assert t.level_seps(2) == [4, 3, 2, 1]
    assert t.parent(6) == 7 and t.parent(5) == 7
    assert t.parent(4) == 6 and t.parent(3) == 6
    assert t.parent(2) == 5 and t.parent(1) == 5
    assert t.ancestors(1) == [5, 7]
    assert t.ancestor_at(1, 1) == 5 and t.ancestor_at(1, 0) == 7
    assert set(t.descendants(6)) == {4, 3}
    assert set(t.descendants(7)) == {6, 5, 4, 3, 2, 1}


def test_tree_slots():
    t = SeparatorTree(3, 7)
    assert [t.slot_of(s) for s in t.level_seps(2)] == [0, 1, 2, 3]
    # parent slot is child slot >> 1
    for s in t.level_seps(2):
        assert t.slot_of(t.parent(s)) == t.slot_of(s) >> 1


def test_tree_rejects_incomplete():
    with pytest.raises(ValueError):
        SeparatorTree(3, 6)


def reference_permute_matrix(matrix_file, separator_file):
    """Line-for-line port of verify.py:127-213 (the golden permutation),
    used only as a test oracle."""
    mat = mmio.read_dense(matrix_file)
    pmat = np.zeros(mat.shape)
    separators = {}
    with open(separator_file) as f:
        for idx, line in enumerate(f):
            if idx == 0:
                levels, num_separators = map(int, line.split())
                continue
            sep, dofs = line.split(";")
            sep = int(sep) + 1
            dofs = [d for d in dofs.rstrip().split(",") if d != ""]
            separators[sep] = list(map(int, dofs))

    tree = []
    end = None
    start = 1
    for level in range(levels - 1, -1, -1):
        end = 2 ** level + 1 if end is None else start + 2 ** level
        tree.append(list(range(start, end)))
        start = end

    sep_bounds = {}
    i, j = 0, 0
    for level, seps in enumerate(tree):
        for sep in seps:
            sep_bounds[sep] = (i, j)
            dofs = separators[sep]
            for idxi, row in enumerate(dofs):
                for idxj, col in enumerate(dofs):
                    if idxj <= idxi and mat[row, col]:
                        pmat[i + idxi, j + idxj] = mat[row, col]
            i += idxi + 1
            j += idxj + 1

    for level, seps in enumerate(tree):
        for sep_idx, sep in enumerate(seps):
            par_idx = sep_idx
            for par_level in range(level + 1, levels):
                par_idx = int(par_idx / 2)
                par_sep = tree[par_level][par_idx]
                lx, _ = sep_bounds[par_sep]
                _, ly = sep_bounds[sep]
                for idxi, ii in enumerate(separators[par_sep]):
                    for idxj, jj in enumerate(separators[sep]):
                        pmat[lx + idxi, ly + idxj] = mat[ii, jj]
    return pmat


@pytest.mark.parametrize("name", ["lapl_9x9", "lapl_25x25", "lapl_400x400"])
def test_permutation_matches_reference(name):
    p = fixture_paths(name)
    ordng = ordio.parse_ordering(p["separators"])
    plan = build_plan(ordng)
    a = mmio.read_dense(p["mat"])
    ours = permute_matrix_dense(plan, a)
    ref = reference_permute_matrix(p["mat"], p["separators"])
    np.testing.assert_allclose(ours, ref)


@pytest.mark.parametrize("name", list(FIXTURES))
def test_plan_geometry(name):
    p = fixture_paths(name)
    ordng = ordio.parse_ordering(p["separators"])
    plan = build_plan(ordng)
    assert plan.n == ordng.n
    # offsets ascend with separator number; root block ends at n
    t = plan.tree
    root = t.num_separators
    assert plan.sep_offset[root] + plan.sep_sizes[root] == plan.n
    # block bounds of (s, s) tile the diagonal
    total = 0
    for s in range(1, root + 1):
        lo_r, lo_c, hi_r, hi_c = plan.block_bounds(s, s)
        assert lo_r == lo_c == total
        total = hi_r + 1
    assert total == plan.n
    # panel geometry: H = S(L) + sum of ancestor S
    for L in range(plan.levels):
        assert plan.H[L] == plan.S[L] + sum(plan.S[lam] for lam in range(L))
        acc = plan.S[L]
        for lam in range(L - 1, -1, -1):
            assert plan.row_off[L, lam] == acc
            acc += plan.S[lam]


def test_perm_inverse():
    p = fixture_paths("lapl_400x400")
    plan = build_plan(ordio.parse_ordering(p["separators"]))
    np.testing.assert_array_equal(plan.perm[plan.iperm], np.arange(plan.n))
    np.testing.assert_array_equal(plan.iperm[plan.perm], np.arange(plan.n))
