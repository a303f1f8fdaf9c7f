"""Op-by-op NumPy replay oracle.

Re-execution of the factorization schedule on the dense permuted matrix with
SciPy/NumPy — the rebuild of verify.py:40-58 (potrf/trsm/gemm golden ops) and
verify.py:216-275 (debug_factor log replay). Used two ways:

  1. `replay_schedule` executes our own generated schedule — an independent
     check that the batched TPU path computes the same factor.
  2. `replay_log` parses a reference-format debug log (POTRF:/TRSM:/GEMM:
     dict lines) and executes it, so our logs (or the reference's!) can be
     verified interchangeably.
"""

from __future__ import annotations

import ast
from typing import Dict, Iterable, List, Tuple

import numpy as np
import scipy.linalg

from cholesky_tpu.verify.schedule import Op


def _sl(lo, hi):
    return slice(lo, hi + 1)


def apply_potrf(mat: np.ndarray, a_rect) -> None:
    lo_r, lo_c, hi_r, hi_c = a_rect
    blk = mat[_sl(lo_r, hi_r), _sl(lo_c, hi_c)]
    mat[_sl(lo_r, hi_r), _sl(lo_c, hi_c)] = scipy.linalg.cholesky(
        np.tril(blk) + np.tril(blk, -1).T, lower=True)


def apply_trsm(mat: np.ndarray, a_rect, b_rect) -> None:
    # B := B A^{-T}, A lower (cblas_dtrsm Right/Lower/Trans/NonUnit, blas.rg:99)
    lo_r, lo_c, hi_r, hi_c = a_rect
    A = np.tril(mat[_sl(lo_r, hi_r), _sl(lo_c, hi_c)])
    lo_r, lo_c, hi_r, hi_c = b_rect
    B = mat[_sl(lo_r, hi_r), _sl(lo_c, hi_c)]
    mat[_sl(lo_r, hi_r), _sl(lo_c, hi_c)] = scipy.linalg.solve_triangular(
        A, B.T, lower=True).T


def apply_gemm(mat: np.ndarray, a_rect, b_rect, c_rect, syrk: bool) -> None:
    # C -= A B^T (alpha=-1, beta=1, NoTrans x Trans — blas.rg:139,187);
    # SYRK only updates the lower triangle (CblasLower, blas.rg:187)
    A = mat[_sl(a_rect[0], a_rect[2]), _sl(a_rect[1], a_rect[3])]
    B = mat[_sl(b_rect[0], b_rect[2]), _sl(b_rect[1], b_rect[3])]
    upd = A @ B.T
    C = mat[_sl(c_rect[0], c_rect[2]), _sl(c_rect[1], c_rect[3])]
    if syrk:
        C -= np.tril(upd)
    else:
        C -= upd


def replay_schedule(pmat: np.ndarray, ops: Iterable[Op]) -> np.ndarray:
    """Execute the schedule on a copy of the permuted matrix (lower-triangular
    storage); returns the factored matrix."""
    mat = np.array(pmat, dtype=np.float64)
    for op in ops:
        if op.kind == "POTRF":
            apply_potrf(mat, op.a_rect)
        elif op.kind == "TRSM":
            apply_trsm(mat, op.a_rect, op.b_rect)
        else:
            apply_gemm(mat, op.a_rect, op.b_rect, op.c_rect,
                       syrk=op.kind == "SYRK")
    return mat


# ---------------------------------------------------------------------------
# Log parsing / replay (reference format)


def parse_log(path: str) -> Tuple[List[Dict], List[Dict], List[Dict]]:
    """Parse a debug log into (blocks, clusters, ops) dict lists — the same
    three streams verify.py:233-262 extracts."""
    blocks, clusters, ops = [], [], []
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            for tag, dest in (("Block:", blocks), ("Cluster:", clusters)):
                if line.startswith(tag):
                    dest.append(ast.literal_eval(line[len(tag):].strip()))
                    break
            else:
                for tag in ("POTRF:", "TRSM:", "GEMM:"):
                    if line.startswith(tag):
                        d = ast.literal_eval(line[len(tag):].strip())
                        d["op"] = tag[:-1]
                        ops.append(d)
                        break
    return blocks, clusters, ops


def replay_log(pmat: np.ndarray, log_path: str) -> np.ndarray:
    """Execute a reference-format debug log against the permuted matrix
    (the semantics of verify.py:debug_factor's op loop, verify.py:246-273:
    a logged GEMM with identical A and B bounds is the SYRK case and
    re-tril's C)."""
    mat = np.array(pmat, dtype=np.float64)
    _, _, ops = parse_log(log_path)
    for d in ops:
        if d["op"] == "POTRF":
            apply_potrf(mat, _rect(d, "A"))
        elif d["op"] == "TRSM":
            apply_trsm(mat, _rect(d, "A"), _rect(d, "B"))
        else:
            syrk = d["A_Lo"] == d["B_Lo"] and d["A_Hi"] == d["B_Hi"]
            apply_gemm(mat, _rect(d, "A"), _rect(d, "B"), _rect(d, "C"), syrk)
    return mat


def _rect(d, key):
    lo = d[f"{key}_Lo"]
    hi = d[f"{key}_Hi"]
    return (lo[0], lo[1], hi[0], hi[1])
