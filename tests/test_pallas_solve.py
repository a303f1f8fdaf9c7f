"""Frame-propagation Pallas solve (numeric/pallas_solve.py) vs the XLA
banded chain it replaces, in pallas interpret mode (the kernels run in a
reference interpreter on CPU; on-chip parity was additionally verified
against an f64 frame-recursion oracle per level — see the module
docstring). Mirrors the reference's solve-correctness contract
(verify.py:290-302) on the inner engine that backs it."""

import numpy as np
import pytest

import cholesky_tpu

cholesky_tpu.force_cpu()

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402

from cholesky_tpu import SparseCholesky                       # noqa: E402
from cholesky_tpu.numeric import frontal, pallas_solve, refine  # noqa: E402
from cholesky_tpu.utils.laplacian import generate_problem     # noqa: E402


@pytest.fixture(autouse=True)
def _interpret_mode():
    pallas_solve._INTERPRET = True
    yield
    pallas_solve._INTERPRET = False


def _setup(dims, levels):
    n, r, c, v, o, cl, b = generate_problem(dims, levels)
    s = SparseCholesky.from_coo(n, r, c, v, o, cl, dtype=np.float32)
    s.factorize()
    return s, b


@pytest.mark.parametrize("dims,levels", [((12, 12, 12), 6), ((25, 25), 5),
                                         ((9, 9), 3)])
def test_frames_matches_banded(dims, levels):
    s, b = _setup(dims, levels)
    fp = s.fplan
    inv = s._inv_pivots()
    n_pad, offs, inv_map, pad_of, _ = frontal._banded_maps(fp)
    bp = np.asarray(b[s.plan.perm], np.float32)
    b_ext = np.concatenate([bp, [0.0]]).astype(np.float32)
    g = jnp.asarray(np.concatenate([b_ext[inv_map], [0.0]])
                    .astype(np.float32))
    assert pallas_solve.usable(fp, s.panels)
    x_b = np.asarray(frontal._solve_banded_core(fp, s.panels, inv, g))
    x_f = np.asarray(pallas_solve.solve_frames(fp, s.panels, inv, g))
    rel = np.linalg.norm(x_f - x_b) / np.linalg.norm(x_b)
    assert rel < 1e-5, rel
    # sentinel-slot invariant: never polluted
    assert x_f[-1] == 0.0


def test_refined_solve_through_frames():
    """The full device-resident refinement loop with the frames inner
    engine reaches the 1e-10 contract with the usual sweep count."""
    s, b = _setup((12, 12, 12), 6)
    ell = s._ell_perm()
    host_ell = tuple(np.asarray(a) for a in ell)
    x, iters, rn = refine.solve_refined_df(
        s.fplan, s.panels, b[s.plan.perm], host_ell, tol=1e-10 / 3,
        inv_pivots=s._inv_pivots())
    xs = np.empty(s.plan.n)
    xs[s.plan.perm] = x
    assert s.residual(b, xs) <= 1e-10
    assert iters <= 6


def test_env_override(monkeypatch):
    s, _ = _setup((9, 9), 3)
    monkeypatch.setenv("CHOLESKY_TPU_FRAMES_SOLVE", "0")
    assert not pallas_solve.wanted(s.fplan, s.panels)
    monkeypatch.setenv("CHOLESKY_TPU_FRAMES_SOLVE", "1")
    assert pallas_solve.wanted(s.fplan, s.panels)


def test_frame_maps_windows():
    """Window maps invariants: rebased indices lie inside [0, S) or are
    the out-of-window sentinel; window offsets are 8-aligned and in
    range; the forward hull never exceeds chunk + 8 (the monotone-
    bijection guarantee the kernel design rests on); frame heights cover
    every window and the root-assembly sentinel addresses a zero row."""
    s, _ = _setup((25, 25), 5)
    fp = s.fplan
    m = pallas_solve.frame_maps(fp)
    for lvl in range(1, fp.levels):
        bndK = fp.F[lvl] - fp.W[lvl]
        assert m.Mu[lvl] > bndK
        for sel, src_M in (((m.fwd[lvl], m.Mu[lvl + 1])
                            if lvl < fp.levels - 1 else (None, 0)),
                           (m.bwd[lvl], m.Mz[lvl - 1])):
            if sel is None:
                continue
            for idx, lo in ((sel.idx0, sel.lo0), (sel.idx1, sel.lo1)):
                if idx is None:
                    continue
                real = idx < 2 * sel.S          # fwd child-1 offset by S
                assert idx[real].min() >= 0
                assert (lo % 8 == 0).all()
                assert lo.min() >= 0 and lo.max() + sel.S <= src_M
        if lvl < fp.levels - 1 and m.fwd[lvl] is not None:
            assert m.fwd[lvl].S == pallas_solve._CHUNK + 8
    # root assembly sentinel -> zero pad row of the level-1 u frame
    bnd1 = fp.F[1] - fp.W[1]
    assert m.root_asm.max() <= bnd1 < m.Mu[1]


def test_frames_engaged_at_design_target():
    """VERDICT r3 #1's gate: the frames path must be USABLE (not VMEM-
    gated off) at the 50^3 / 8-level design target's level shapes — the
    exact configuration where the round-3 kernels demanded 103.8 MB of
    scoped VMEM and were pinned off. Structure-only: builds the real
    FrontalPlan and checks the routing predicate plus the per-level VMEM
    model against the 56 MB budget."""
    from cholesky_tpu.numeric import frontal
    from cholesky_tpu.symbolic.plan import build_plan
    from cholesky_tpu.utils.laplacian import generate_problem

    n, r, c, v, o, cl, b = generate_problem((50, 50, 50), 8)
    plan = build_plan(o, cl)
    fp = frontal.build_frontal_plan(plan, r, c)
    assert (fp.front_rows[1].shape[0], fp.W[1], fp.F[1]) == (2, 1256, 3760)

    class _F32:                      # factors stand-in: dtype is all
        dtype = np.float32           # usable() reads from them

    factors = [_F32()] * fp.levels
    assert pallas_solve.usable(fp, factors)
    # the engine ENGAGES at these shapes when opted in (default routing
    # is the banded chain — measured faster; see wanted()'s docstring)
    import os

    os.environ["CHOLESKY_TPU_FRAMES_SOLVE"] = "1"
    try:
        assert pallas_solve.wanted(fp, factors)
    finally:
        del os.environ["CHOLESKY_TPU_FRAMES_SOLVE"]
    m = pallas_solve.frame_maps(fp)
    for lvl in range(1, fp.levels):
        fb = pallas_solve._fwd_vmem_bytes(fp, m, lvl)
        bb = pallas_solve._bwd_vmem_bytes(fp, m, lvl)
        assert max(fb, bb) < pallas_solve._VMEM_LIMIT - (4 << 20), (
            lvl, fb / 2**20, bb / 2**20)


def test_runtime_fallback_to_banded(monkeypatch):
    """If Mosaic refuses the frames program at compile/run time (e.g. the
    scoped-VMEM overflow usable()'s estimate can miss), refine() must fall
    back to the banded chain, still meet the caller's tolerance, and pin
    the plan off the frames path for later solves."""
    s, b = _setup((12, 12), 4)
    monkeypatch.setenv("CHOLESKY_TPU_FRAMES_SOLVE", "1")

    def boom(fp, factors, inv_pivots, rhs):
        raise RuntimeError("scoped vmem overflow (simulated)")

    monkeypatch.setattr(pallas_solve, "solve_frames", boom)
    pallas_solve._RUNTIME_FAILED.discard(s.fplan.key())
    try:
        ell = s._ell_perm()
        host_ell = tuple(np.asarray(a) for a in ell)
        x, iters, rn = refine.solve_refined_df(
            s.fplan, s.panels, b[s.plan.perm], host_ell, tol=1e-10 / 3,
            inv_pivots=s._inv_pivots())
        xs = np.empty(s.plan.n)
        xs[s.plan.perm] = x
        assert s.residual(b, xs) <= 1e-10
        assert s.fplan.key() in pallas_solve._RUNTIME_FAILED
        # later routing decisions skip frames for this plan
        assert not pallas_solve.wanted(s.fplan, s.panels)
    finally:
        pallas_solve._RUNTIME_FAILED.discard(s.fplan.key())
