#!/usr/bin/env python
"""Generate the committed irregular on-disk fixtures under tests/fixtures/.

The reference ships only regular grid-Laplacian fixtures (tests/lapl_*);
these pin the FILE-FORMAT path (mmio/ordering parsing — mmio.c:17-117 and
mnd.c:22-149 parity) on hostile sparsity structure: dense coupled rows
(circuit power rails), extreme separator imbalance, and an irregular random
graph. Each fixture directory holds matrix.mtx (coordinate real symmetric,
lower triangle), ord.txt + clust.txt (the same formats the reference's
mnd.c:22/71 parse), and B.mtx (array RHS).

Deterministic: re-running reproduces byte-identical files (seeded
generators; fixed float formatting). Run from the repo root:

    python tools/gen_fixtures.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from cholesky_tpu.io import mmio, ordering as ordio
from cholesky_tpu.symbolic.nd import nested_dissection_graph
from cholesky_tpu.utils import problems

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")

SPECS = {
    # name -> (generator, levels)
    "dense_rows": (lambda: problems.dense_row_spd((30, 30), k_dense=3), 5),
    "imbalanced": (lambda: problems.imbalanced_spd((40, 40), (40, 2),
                                                   bridge=3), 5),
    "circuit": (lambda: problems.random_spd(1500, avg_degree=8, seed=3,
                                            skew=True), 5),
}


def main():
    for name, (gen, levels) in SPECS.items():
        d = os.path.join(FIXDIR, name)
        os.makedirs(d, exist_ok=True)
        n, r, c, v = gen()
        ordng, clusters = nested_dissection_graph(n, r, c, levels)
        mmio.write_coo(os.path.join(d, "matrix.mtx"), r, c, v, (n, n),
                       symmetry="symmetric")
        ordio.write_ordering(os.path.join(d, "ord.txt"), ordng)
        ordio.write_clusters(os.path.join(d, "clust.txt"), clusters)
        rng = np.random.default_rng(7)
        b = rng.integers(1, 10, size=n)
        with open(os.path.join(d, "B.mtx"), "w") as f:
            f.write("%%MatrixMarket matrix array integer general\n%\n")
            f.write(f"{n} 1\n")
            for x in b:
                f.write(f"{x}\n")
        print(f"{name}: n={n}, nnz={len(v)}, levels={ordng.levels} -> {d}")


if __name__ == "__main__":
    main()
