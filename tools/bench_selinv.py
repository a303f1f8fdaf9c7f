"""Measure selected inversion (diag(A^-1)) wall-clock on the current JAX
backend at benchmark scale, with a correctness probe against unit-vector
solves. Standalone so bench.py (whose source lines key the compile cache)
stays untouched.

Usage: python tools/bench_selinv.py [--dim 50] [--levels 8]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=50)
    ap.add_argument("--levels", type=int, default=8)
    ap.add_argument("--probes", type=int, default=3)
    args = ap.parse_args()

    from cholesky_tpu import SparseCholesky
    from cholesky_tpu.utils.laplacian import generate_problem

    shape = (args.dim,) * 3
    n, r, c, v, o, cl, b = generate_problem(shape, args.levels)
    s = SparseCholesky.from_coo(n, r, c, v, o, cl, dtype=np.float32)
    t0 = time.perf_counter()
    s.factorize()
    print(f"factorize: {time.perf_counter() - t0:.3f}s (n={n})")

    from cholesky_tpu.numeric import selinv

    # compile + first run
    t0 = time.perf_counter()
    d = selinv.selinv_diag(s.fplan, s.panels)
    print(f"inv_diag first (compile+run): {time.perf_counter() - t0:.3f}s")
    # steady state
    t0 = time.perf_counter()
    d = selinv.selinv_diag(s.fplan, s.panels)
    wall = time.perf_counter() - t0
    print(f"inv_diag steady: {wall*1e3:.1f} ms")

    dd = np.empty(n)
    dd[s.plan.perm] = d
    rng = np.random.default_rng(0)
    worst = 0.0
    for i in rng.integers(0, n, size=args.probes):
        e = np.zeros(n)
        e[i] = 1.0
        x = s.solve(e)
        worst = max(worst, abs(dd[i] / x[i] - 1.0))
    print(f"probe rel err vs refined unit solves: {worst:.2e}")


if __name__ == "__main__":
    main()
