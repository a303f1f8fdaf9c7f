"""Spectral analysis through the factor: Lanczos eigenpairs and a tight κ₂.

The reference solver (syamajala/cholesky) has no eigen capability — but a
completed sparse Cholesky factorization is exactly the engine a shift-invert
eigensolver needs (ARPACK's ``sigma=0`` mode is classically driven by a
CHOLMOD/direct factorization). This module supplies that companion:

- **Smallest eigenpairs** come from Lanczos on the *inverse* operator
  ``v ↦ A⁻¹v``, where every application is one forward/backward triangular
  solve pair through the already-computed factor (mixed-precision refined, so
  an fp32 MXU factor still yields f64-accurate Ritz pairs). Convergence is
  governed by the gaps of 1/λ, which are wide exactly where A's smallest
  eigenvalues cluster — the regime where plain Lanczos on A stalls.
- **Largest eigenpairs** use plain Lanczos on the sparse matvec (no factor
  needed beyond the symmetrized CSR the solver already holds).
- ``cond2`` pairs the two for a converged κ₂(A) = λmax/λmin, a strictly
  tighter answer than the power-iteration ``condest`` estimate.

All orchestration is host-side f64 NumPy on [n]-vectors (the O(n·m) Lanczos
bookkeeping is noise next to the solves); the heavy work per step — the
triangular solves — runs on device through ``SparseCholesky.solve``.

Algorithm: m-step Lanczos with full two-pass reorthogonalization (robust to
the slight nonsymmetry of inexact solves), Rayleigh–Ritz on the tridiagonal,
explicit residual check ‖Ax−λx‖ ≤ tol·‖A‖₁ against the true matrix, and
basis-doubling restarts until converged.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np


def _lanczos(op: Callable[[np.ndarray], np.ndarray], n: int, m: int,
             seed: int = 0) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """m-step Lanczos with full reorthogonalization. Returns (V, alpha, beta)
    with V [n, j] orthonormal, T = tridiag(beta, alpha, beta) its projection
    of the operator; stops early on breakdown (invariant subspace found)."""
    rng = np.random.default_rng(seed)
    q = rng.standard_normal(n)
    q /= np.linalg.norm(q)
    V = np.zeros((n, m))
    alpha = np.zeros(m)
    beta = np.zeros(max(m - 1, 0))
    for j in range(m):
        V[:, j] = q
        w = np.asarray(op(q), dtype=np.float64).reshape(n)
        a = float(q @ w)
        alpha[j] = a
        w = w - a * q
        if j > 0:
            w = w - beta[j - 1] * V[:, j - 1]
        # full reorthogonalization, two passes (classical Gram-Schmidt
        # twice): keeps the basis orthonormal despite inexact solves
        for _ in range(2):
            w -= V[:, :j + 1] @ (V[:, :j + 1].T @ w)
        b = float(np.linalg.norm(w))
        if j + 1 == m:
            break
        if b <= 1e-13 * max(1.0, abs(a)):
            return V[:, :j + 1], alpha[:j + 1], beta[:j]
        beta[j] = b
        q = w / b
    return V, alpha, beta


def _ritz(V, alpha, beta):
    j = len(alpha)
    T = np.diag(alpha)
    if j > 1:
        T += np.diag(beta[:j - 1], 1) + np.diag(beta[:j - 1], -1)
    theta, Y = np.linalg.eigh(T)
    return theta, V @ Y


def eigsh(solver, k: int = 6, which: str = "smallest", tol: float = 1e-9,
          m: int | None = None, seed: int = 0, solve_tol: float = 1e-11,
          max_restarts: int = 4) -> Tuple[np.ndarray, np.ndarray]:
    """k extremal eigenpairs of the solver's matrix A.

    which='smallest': Lanczos on A⁻¹ (one refined solve per step through the
    factor — shift-invert at σ=0; SPD only). which='largest': Lanczos on the
    sparse matvec (any symmetric matrix). Returns (w, V): eigenvalues
    ascending [k], orthonormal eigenvectors [n, k], converged to
    ‖Av−λv‖ ≤ tol·‖A‖₁ (columns of V have unit norm).

    Raises RuntimeError if the residual target is not met after
    `max_restarts` basis-doubling restarts (pathological clustering; loosen
    `tol` or pass a larger starting basis `m`).
    """
    if which not in ("smallest", "largest"):
        raise ValueError(f"which must be 'smallest' or 'largest', got {which!r}")
    n = int(solver.plan.n)
    if not 1 <= k <= n:
        raise ValueError(f"k must be in [1, {n}], got {k}")
    csr = solver._matrix_csr()
    anorm = float(np.abs(csr).sum(axis=1).max())   # ‖A‖₁ = ‖A‖∞ (symmetric)
    if which == "smallest":
        def op(v):
            return solver.solve(v, tol=solve_tol)
    else:
        def op(v):
            return csr @ v

    mj = int(m) if m is not None else min(n, max(2 * k + 16, 32))
    mj = max(mj, k + 2) if n > k + 2 else n
    res = None
    for _ in range(max_restarts):
        V, a, b = _lanczos(op, n, min(mj, n), seed)
        theta, X = _ritz(V, a, b)
        # both operators want the top of the Ritz spectrum: A⁻¹'s largest
        # θ are A's smallest λ; A's largest θ are its largest λ
        idx = np.argsort(theta)[::-1][:k]
        theta_k = theta[idx]
        if which == "smallest":
            if np.any(theta_k <= 0):
                raise RuntimeError(
                    "Lanczos on A^-1 produced a non-positive Ritz value - "
                    "the matrix is not positive definite to solver accuracy")
            lam = 1.0 / theta_k
        else:
            lam = theta_k
        Xk = X[:, idx]
        Xk = Xk / np.linalg.norm(Xk, axis=0, keepdims=True)
        res = np.linalg.norm(csr @ Xk - Xk * lam, axis=0)
        if np.all(res <= tol * anorm) or mj >= n:
            order = np.argsort(lam)
            return lam[order], Xk[:, order]
        mj = min(n, 2 * mj)
    raise RuntimeError(
        f"eigsh({which}) did not converge: worst residual "
        f"{float(res.max()):.3e} > tol*|A| = {tol * anorm:.3e} after "
        f"{max_restarts} restarts (final basis {mj})")


def cond2(solver, tol: float = 1e-8, seed: int = 0) -> float:
    """κ₂(A) = λmax(A)/λmin(A) with both extremes converged by Lanczos —
    the tight version of the power-iteration `condest` estimate."""
    lo, _ = eigsh(solver, k=1, which="smallest", tol=tol, seed=seed)
    hi, _ = eigsh(solver, k=1, which="largest", tol=tol, seed=seed)
    return float(hi[0] / lo[0])
