"""High-level user API: load → plan → assemble → factor → solve.

The equivalent of the reference driver's main() flow (mmat.rg:1056-1496) as a
library object instead of a CLI-only binary.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from cholesky_tpu.io import mmio, ordering as ordio
from cholesky_tpu.numeric import assemble
from cholesky_tpu.numeric import factor as nfactor
from cholesky_tpu.symbolic.plan import SolvePlan, build_plan


class SparseCholesky:
    """Sparse SPD Cholesky solver over a nested-dissection ordering.

    Usage:
        solver = SparseCholesky.from_files(mtx, ord_file, clust_file)
        solver.factorize()
        x = solver.solve(b)          # b in original dof order
    """

    def __init__(self, plan: SolvePlan, rows: np.ndarray, cols: np.ndarray,
                 vals: np.ndarray, dtype=np.float64):
        self.plan = plan
        self.rows, self.cols, self.vals = rows, cols, vals
        self.dtype = dtype
        self.panels = None          # assembled (pre-factor) or factored panels
        self.factored = False

    # ------------------------------------------------------------------
    @classmethod
    def from_files(cls, matrix_file: str, separator_file: str,
                   clusters_file: Optional[str] = None, dtype=np.float64,
                   pad_to: int = 8) -> "SparseCholesky":
        ordng = ordio.parse_ordering(separator_file)
        clusters = ordio.parse_clusters(clusters_file) if clusters_file else None
        plan = build_plan(ordng, clusters, pad_to=pad_to)
        banner, r, c, v = mmio.read_coo(matrix_file)
        if banner.rows != plan.n:
            raise ValueError(
                f"matrix dim {banner.rows} != ordering dof count {plan.n}")
        # normalize to lower triangle (symmetric input may store either)
        swap = c > r
        r2 = np.where(swap, c, r)
        c2 = np.where(swap, r, c)
        return cls(plan, r2, c2, v, dtype=dtype)

    @classmethod
    def from_coo(cls, n: int, rows, cols, vals, ordng: ordio.Ordering,
                 clusters=None, dtype=np.float64, pad_to: int = 8):
        plan = build_plan(ordng, clusters, pad_to=pad_to)
        if plan.n != n:
            raise ValueError("ordering does not cover the matrix dimension")
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals, dtype=np.float64)
        swap = cols > rows
        r2 = np.where(swap, cols, rows)
        c2 = np.where(swap, rows, cols)
        return cls(plan, r2, c2, vals, dtype=dtype)

    # ------------------------------------------------------------------
    def assemble(self) -> List[np.ndarray]:
        """(Re)build the panel buffers from the COO input (the reference's
        fill loop, mmat.rg:1175-1183; re-run per --iterations, mmat.rg:1216)."""
        self.panels = assemble.assemble_panels(
            self.plan, self.rows, self.cols, self.vals, dtype=self.dtype)
        self.factored = False
        return self.panels

    def factorize(self):
        if self.panels is None or self.factored:
            self.assemble()
        self.panels = nfactor.factor(self.plan, self.panels)
        self.factored = True
        return self.panels

    def solve(self, b: np.ndarray) -> np.ndarray:
        """Solve A x = b; b and x are in ORIGINAL dof order."""
        if not self.factored:
            self.factorize()
        blv = assemble.assemble_rhs(self.plan, b, dtype=self.dtype)
        xlv = nfactor.solve(self.plan, self.panels, blv)
        return assemble.extract_solution(self.plan, [np.asarray(x) for x in xlv])

    # ------------------------------------------------------------------
    def factor_dense(self) -> np.ndarray:
        """The factor L as a dense lower-triangular array in permuted coords."""
        if not self.factored:
            self.factorize()
        return assemble.extract_factor_dense(
            self.plan, [np.asarray(p) for p in self.panels])

    def permuted_dense(self) -> np.ndarray:
        """The permuted (unfactored) matrix as written by -p (mmat.rg:1187-1189)."""
        panels = assemble.assemble_panels(
            self.plan, self.rows, self.cols, self.vals, dtype=np.float64)
        dense = assemble.extract_factor_dense(self.plan, panels)
        # strip the identity padding artifacts: extract_factor_dense never
        # copies padded rows/cols, so dense is exactly the permuted matrix.
        return dense

    def residual(self, b: np.ndarray, x: np.ndarray) -> float:
        """Relative residual ||Ax-b|| / ||b|| against the original COO matrix."""
        n = self.plan.n
        ax = np.zeros(n)
        np.add.at(ax, self.rows, self.vals * x[self.cols])
        off = self.rows != self.cols
        np.add.at(ax, self.cols[off], self.vals[off] * x[self.rows[off]])
        b = np.asarray(b).reshape(-1)
        return float(np.linalg.norm(ax - b) / np.linalg.norm(b))


def solve_spd(matrix_file: str, separator_file: str, b: np.ndarray,
              clusters_file: Optional[str] = None, dtype=np.float64) -> np.ndarray:
    """One-shot convenience: factor and solve from files."""
    s = SparseCholesky.from_files(matrix_file, separator_file, clusters_file,
                                  dtype=dtype)
    s.factorize()
    return s.solve(b)
