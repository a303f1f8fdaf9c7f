"""General-graph nested dissection ordering.

The reference consumes orderings computed offline by external tools (its
`*_ord_*.txt` fixtures; SURVEY.md: "ordering computed offline"). For
standalone operation on arbitrary SPD matrices — SuiteSparse-style inputs
with no precomputed ordering — this module computes a complete-binary-tree
nested dissection directly from the sparsity graph:

  * recursive two-way partition by BFS level sets from a pseudo-peripheral
    vertex (the classic Gibbs-Poole-Stockmeyer-style heuristic),
  * vertex separator = the frontier of side A adjacent to side B,
  * recursion to a fixed depth, tolerating empty parts (empty separators
    are legal throughout the solver).

Output is a standard `Ordering` (+ single-cluster `ClusterHierarchy`), so
everything downstream — plan, fill, frontal engine, CLI, file writers — is
unchanged. Quality is heuristic (minimal separators are not guaranteed), but
the separator property (removing S disconnects A from B) is, which is what
correctness requires; fill quality only affects speed.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from cholesky_tpu.io.ordering import ClusterHierarchy, Ordering
from cholesky_tpu.utils.laplacian import make_clusters


def _build_adjacency(n: int, rows: np.ndarray, cols: np.ndarray):
    """CSR adjacency (symmetric, no self loops) from COO structure."""
    m = rows != cols
    r = np.concatenate([rows[m], cols[m]])
    c = np.concatenate([cols[m], rows[m]])
    order = np.argsort(r, kind="stable")
    r, c = r[order], c[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, r + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, c


def _gather_neighbors(indptr, indices, verts: np.ndarray) -> np.ndarray:
    """Concatenated neighbor lists of `verts` (with repeats), vectorized."""
    starts = indptr[verts]
    counts = indptr[verts + 1] - starts
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=indices.dtype)
    cc = np.cumsum(counts)
    pos = np.arange(total, dtype=np.int64) + np.repeat(starts - (cc - counts),
                                                       counts)
    return indices[pos]


def _bfs_levels(indptr, indices, mask: np.ndarray, start: int) -> np.ndarray:
    """BFS level of every vertex in the masked subgraph (-1 = unreached)."""
    n = len(mask)
    level = np.full(n, -1, dtype=np.int64)
    level[start] = 0
    frontier = np.array([start], dtype=np.int64)
    d = 0
    while len(frontier):
        d += 1
        nbrs = np.unique(_gather_neighbors(indptr, indices, frontier))
        nbrs = nbrs[mask[nbrs] & (level[nbrs] < 0)]
        level[nbrs] = d
        frontier = nbrs
    return level


def _frontier(indptr, indices, verts: np.ndarray,
              into: np.ndarray) -> np.ndarray:
    """Boolean mask over `verts`: which have a neighbor with into[nbr] True."""
    starts = indptr[verts]
    counts = indptr[verts + 1] - starts
    hits = into[_gather_neighbors(indptr, indices, verts)]
    seg = np.repeat(np.arange(len(verts), dtype=np.int64), counts)
    return np.bincount(seg[hits], minlength=len(verts)).astype(bool)


def _pseudo_peripheral(indptr, indices, verts: np.ndarray, mask
                       ) -> Tuple[int, np.ndarray]:
    """A vertex of near-maximal eccentricity in the masked subgraph, plus the
    BFS level array from it (reused by the caller — saves a full sweep).
    Three improvement hops, matching the pre-vectorization behavior."""
    v = int(verts[0])
    lv = _bfs_levels(indptr, indices, mask, v)
    for _ in range(3):
        reach = verts[lv[verts] >= 0]
        far = int(reach[np.argmax(lv[reach])])
        if lv[far] == 0:
            break
        v = far
        lv = _bfs_levels(indptr, indices, mask, v)
    return v, lv


def _split(indptr, indices, verts: np.ndarray
           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Partition `verts` into (A, B, S): S is a vertex separator such that no
    edge joins A and B."""
    if len(verts) <= 1:
        return verts, np.empty(0, np.int64), np.empty(0, np.int64)
    n = int(indices.max(initial=0) + 1) if len(indices) else len(verts)
    n = max(n, int(verts.max()) + 1)
    mask = np.zeros(n, dtype=bool)
    mask[verts] = True
    _, lv = _pseudo_peripheral(indptr, indices, verts, mask)
    reach = verts[lv[verts] >= 0]         # always contains src (lv[src] = 0)
    unreach = verts[lv[verts] < 0]        # disconnected pieces -> side B
    # Choose the cut level. In a BFS level structure every edge stays within
    # a level or joins consecutive levels, so a cut between levels t-1 and t
    # has its separator inside level t-1 or t — min(count[t-1], count[t]) is
    # an exact upper bound on the separator size. Among balanced cuts
    # (25-75% split) take the narrowest waist; fall back to the median cut
    # when no level cut is balanced.
    counts = np.bincount(lv[reach])
    cum = np.cumsum(counts)
    total = len(reach)
    cut_level = None
    if len(counts) > 1:
        fracs = cum[:-1] / total               # A-side share for t = 1..L
        ok = (fracs >= 0.25) & (fracs <= 0.75)
        if ok.any():
            proxy = np.minimum(counts[:-1], counts[1:])
            cand = np.flatnonzero(ok)
            cut_level = int(cand[np.argmin(proxy[cand])]) + 1
    if cut_level is None:                      # median-vertex fallback
        order = np.argsort(lv[reach], kind="stable")
        sorted_r = reach[order]
        cut = len(sorted_r) // 2
        cut_level = lv[sorted_r[min(cut, len(sorted_r) - 1)]]
    a_side = reach[lv[reach] < cut_level]
    rest = reach[lv[reach] >= cut_level]
    if len(a_side) == 0:                  # degenerate: one level dominates
        a_side = reach[: len(reach) // 2]
        rest = reach[len(reach) // 2:]
    # Two valid vertex separators exist for the (a_side, rest) bipartition:
    # the frontier of `rest` facing A, or the frontier of `a_side` facing
    # rest. Both satisfy "removing S leaves no A-B edge"; take the smaller
    # (fewer separator dofs -> smaller fronts -> less fill).
    in_a = np.zeros(n, dtype=bool)
    in_a[a_side] = True
    in_r = np.zeros(n, dtype=bool)
    in_r[rest] = True
    front_r = _frontier(indptr, indices, rest, in_a)     # rest facing A
    front_a = _frontier(indptr, indices, a_side, in_r)   # a_side facing rest
    # Refinement: a separator vertex missing a neighbor on one side separates
    # nothing — return it to the far side. Each branch's separator touches
    # its near side by construction, so only the far-side check can remove
    # vertices; all removals go to ONE side, so two adjacent removable
    # vertices can never land on opposite sides and re-join A to B.
    if int(front_r.sum()) <= int(front_a.sum()):
        sep = rest[front_r]                   # every sep vertex touches A
        a, b = a_side, rest[~front_r]
        if len(sep):
            in_b = np.zeros(n, dtype=bool)
            in_b[b] = True
            has_b = _frontier(indptr, indices, sep, in_b)
            a = np.concatenate([a, sep[~has_b]])
            sep = sep[has_b]
    else:
        sep = a_side[front_a]                 # every sep vertex touches B
        a, b = a_side[~front_a], rest
        if len(sep):
            in_a2 = np.zeros(n, dtype=bool)
            in_a2[a] = True
            has_a = _frontier(indptr, indices, sep, in_a2)
            b = np.concatenate([b, sep[~has_a]])
            sep = sep[has_a]
    return a, np.concatenate([b, unreach]), np.sort(sep)


def nested_dissection_graph(n: int, rows: np.ndarray, cols: np.ndarray,
                            levels: Optional[int] = None,
                            leaf_target: int = 96
                            ) -> Tuple[Ordering, ClusterHierarchy]:
    """Compute a nested-dissection Ordering for an arbitrary symmetric
    sparsity structure. `levels=None` picks depth so leaves are around
    `leaf_target` dofs (utils.py:6's heuristic)."""
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    if levels is None:
        levels = max(1, int(np.ceil(np.log2(max(n / leaf_target, 1)))) + 1)
    nsep = (1 << levels) - 1
    indptr, indices = _build_adjacency(n, rows, cols)

    boxes: Dict[int, np.ndarray] = {1: np.arange(n, dtype=np.int64)}
    dofs: Dict[int, np.ndarray] = {}
    for h in range(1, nsep + 1):
        verts = boxes[h]
        if h < (1 << (levels - 1)):
            a, b, s = _split(indptr, indices, verts)
            dofs[h] = s
            boxes[2 * h] = a
            boxes[2 * h + 1] = b
        else:
            dofs[h] = np.sort(verts)

    ordering = Ordering(
        levels=levels, num_separators=nsep,
        dofs={nsep - h + 1: dofs[h] for h in range(1, nsep + 1)})
    clusters = make_clusters(ordering, None)
    return ordering, clusters
