"""Capacity-planning and profiling utility tests."""

import numpy as np

from cholesky_tpu import SparseCholesky
from cholesky_tpu.numeric import frontal, profile
from cholesky_tpu.utils.capacity import (
    depth, grid_plan_table, leaf_size, plan_flops, plan_memory_bytes,
    subregions)
from cholesky_tpu.utils.laplacian import generate_problem


def test_capacity_scalars():
    # utils.py:6-16 parity: 125000 dofs at max leaf 64 -> depth 12
    assert depth(125000, 64) == 12
    assert subregions(5) == 31
    assert leaf_size(400, 5) == 25.0


def test_grid_plan_table():
    rows = grid_plan_table((20, 20, 20), range(4, 7))
    assert [r["levels"] for r in rows] == [4, 5, 6]
    for r in rows:
        assert r["panel_gib"] > 0 and r["dense_gflop"] > 0
        assert r["separators"] == (1 << r["levels"]) - 1


def test_plan_estimators_consistent():
    from cholesky_tpu.symbolic.plan import build_plan
    from cholesky_tpu.utils.laplacian import nested_dissection

    o, cl = nested_dissection((12, 12), 4)
    plan = build_plan(o, cl)
    mem = plan_memory_bytes(plan, 4)
    assert mem == sum(4 * b * h * w for b, h, w in
                      (plan.panel_shape(l) for l in range(plan.levels)))
    assert plan_flops(plan) > 0


def test_profile_frontal_emits(capsys):
    n, r, c, v, o, cl, b = generate_problem((12, 12), 3)
    s = SparseCholesky.from_coo(n, r, c, v, o, cl, dtype=np.float32)
    fronts = frontal.assemble_fronts(s.fplan, s.rows, s.cols, s.vals,
                                     dtype=np.float32)
    lines = []
    recs = profile.profile_frontal(s.fplan, fronts, iters=1,
                                   emit=lines.append)
    ops = {rec["op"] for rec in recs}
    assert "POTRF" in ops and "TRSM" in ops
    assert all(line.startswith("BLAS: {") for line in lines)
    # reference format: dict literal parseable (blas.rg:74 style)
    import ast

    for line in lines:
        d = ast.literal_eval(line[len("BLAS: "):])
        assert "op" in d and "Time" in d


def test_profile_panels_emits():
    from cholesky_tpu.numeric import assemble

    n, r, c, v, o, cl, b = generate_problem((10, 10), 3)
    s = SparseCholesky.from_coo(n, r, c, v, o, cl, dtype=np.float32)
    panels = assemble.assemble_panels(s.plan, s.rows, s.cols, s.vals,
                                      dtype=np.float32)
    lines = []
    recs = profile.profile_factor(s.plan, panels, iters=1, emit=lines.append)
    assert any(rec["op"] == "POTRF" for rec in recs)
    assert len(lines) == len(recs)


def test_depth_clamped_for_small_problems():
    from cholesky_tpu.utils import capacity

    assert capacity.depth(16) == 1          # regression: was -1
    assert capacity.depth(64) == 1
    assert capacity.depth(125000) >= 8
    rows = capacity.grid_plan_table((4, 4))
    assert rows, "small grids must still tabulate candidate depths"


def test_selinv_memory_estimate():
    from cholesky_tpu.utils.capacity import selinv_memory_bytes

    n, r, c, v, o, cl, b = generate_problem((8, 8, 8), 4)
    s = SparseCholesky.from_coo(n, r, c, v, o, cl, dtype=np.float32)
    fp = s.fplan
    est = selinv_memory_bytes(fp, 4)
    p = [(1 << l) * fp.F[l] ** 2 * 4 for l in range(fp.levels)]
    expect = max(
        p[l - 1] + 2 * p[l]
        + 2 * (1 << l) * (fp.F[l] - fp.W[l]) * fp.F[l - 1] * 4
        for l in range(1, fp.levels))
    assert est == expect
    assert est > 0
