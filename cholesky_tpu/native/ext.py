"""ctypes bindings for the native host runtime (libmndio.so).

Importing this module raises ImportError when the library is absent and
cannot be built — callers probe with `from cholesky_tpu.native import ext`
and fall back to NumPy paths (the same layering as the reference, where
Terra links libmmio.so/libcholesky.so at startup, mmat.rg:19,24).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libmndio.so")

try:
    from cholesky_tpu.native.build import build

    # always goes through build(): it is a no-op when the library is newer
    # than src/mndio.cc, and rebuilds a stale one (a silently stale .so
    # would make native-vs-Python parity tests compare against old code)
    build()
except Exception as e:  # noqa: BLE001
    raise ImportError(f"libmndio.so unavailable: {e}") from e

_lib = ctypes.CDLL(_LIB_PATH)

_i64 = ctypes.c_int64
_u64 = ctypes.c_uint64
_dbl = ctypes.c_double
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_dblp = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

_lib.mnd_hash_sax.restype = _u64
_lib.mnd_hash_sax.argtypes = [_u64]
_lib.mnd_hash_fnv.restype = _u64
_lib.mnd_hash_fnv.argtypes = [_u64]
_lib.mnd_hash_ber.restype = _u64
_lib.mnd_hash_ber.argtypes = [_u64]
_lib.mnd_hash_oat.restype = _u64
_lib.mnd_hash_oat.argtypes = [_u64]
_lib.mnd_hash_jen.restype = _u64
_lib.mnd_hash_jen.argtypes = [_u64]
_lib.mnd_hash_sfh.restype = _u64
_lib.mnd_hash_sfh.argtypes = [_u64]

_lib.mm_read_coo_body.restype = _i64
_lib.mm_read_coo_body.argtypes = [ctypes.c_char_p, _i64, _i64p, _i64p, _dblp]

_lib.mm_write_coo.restype = _i64
_lib.mm_write_coo.argtypes = [ctypes.c_char_p, ctypes.c_char_p, _i64, _i64,
                              _i64, _i64p, _i64p, _dblp]

_lib.mnd_build_hash_table.restype = None
_lib.mnd_build_hash_table.argtypes = [_i64p, _i64p, _dblp, _i64, _u64, _i64,
                                      _i64p, _dblp]

_lib.mnd_hash_lookup.restype = _dbl
_lib.mnd_hash_lookup.argtypes = [_i64p, _dblp, _i64, _u64, _i64, _i64]

_lib.assemble_panels.restype = None
_lib.assemble_panels.argtypes = [_i64p, _i64p, _dblp, _i64, _i64p, _i64p,
                                 _i64, _i64, _i64p, _i64p, _i64p,
                                 ctypes.POINTER(ctypes.c_void_p)]

_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

_lib.fill_analyze.restype = _i64
_lib.fill_analyze.argtypes = [_i64, _i64, _i64, _i64p, _u8p, _i64p, _i64p,
                              _i64p, _i64p, _i64p, _i64p,
                              ctypes.POINTER(ctypes.c_void_p), _i64p]

_lib.fill_initial.restype = None
_lib.fill_initial.argtypes = [_i64, _i64, _i64p, _i64p, _dblp, _i64p, _i64p,
                              _i64p, _i64p, _i64p, _i64p, _u8p, _i64p, _i64p]


def hash_sax(key: int) -> int:
    return int(_lib.mnd_hash_sax(_u64(key)))


def hash_fnv(key: int) -> int:
    return int(_lib.mnd_hash_fnv(_u64(key)))


def hash_ber(key: int) -> int:
    return int(_lib.mnd_hash_ber(_u64(key)))


def hash_oat(key: int) -> int:
    return int(_lib.mnd_hash_oat(_u64(key)))


def hash_jen(key: int) -> int:
    return int(_lib.mnd_hash_jen(_u64(key)))


def hash_sfh(key: int) -> int:
    return int(_lib.mnd_hash_sfh(_u64(key)))


def read_coo_body(path: str, nnz: int):
    rows = np.empty(nnz, dtype=np.int64)
    cols = np.empty(nnz, dtype=np.int64)
    vals = np.empty(nnz, dtype=np.float64)
    got = _lib.mm_read_coo_body(path.encode(), _i64(nnz), rows, cols, vals)
    if got < 0:
        raise IOError(f"cannot read {path}")
    if got != nnz:
        raise IOError(f"{path}: expected {nnz} entries, read {got}")
    return rows, cols, vals


def write_coo(path: str, banner: str, m: int, n: int, rows, cols, vals):
    got = _lib.mm_write_coo(path.encode(), banner.encode(), _i64(m), _i64(n),
                            _i64(len(vals)), rows, cols, vals)
    if got < 0:
        raise IOError(f"cannot write {path}")


def build_hash_table(rows, cols, vals, ncols: int, capacity=None):
    """The reference's open-addressing COO table (mnd.c:152-199): returns
    (tbl_idx [cap,2], tbl_val [cap]) with hash_sax + linear probing.
    capacity defaults to the reference's ceil(nz/0.75) (mnd.c:168)."""
    import math

    vals = np.ascontiguousarray(vals, np.float64)
    if capacity is None:
        capacity = int(math.ceil(len(vals) / 0.75))
    stored = int(np.count_nonzero(vals))
    if capacity <= stored:
        # a full table would make the linear-probe insert spin forever
        # (zero values are the empty-slot marker, so only nonzeros occupy)
        raise ValueError(
            f"hash capacity {capacity} must exceed the {stored} nonzero "
            f"entries (reference uses ceil(nz/0.75), mnd.c:168)")
    tbl_idx = np.empty((capacity, 2), dtype=np.int64)
    tbl_val = np.empty(capacity, dtype=np.float64)
    _lib.mnd_build_hash_table(
        np.ascontiguousarray(rows, np.int64),
        np.ascontiguousarray(cols, np.int64),
        vals,
        _i64(len(vals)), _u64(ncols), _i64(capacity),
        tbl_idx.reshape(-1), tbl_val)
    return tbl_idx, tbl_val


def hash_lookup(tbl_idx, tbl_val, ncols: int, i: int, j: int) -> float:
    """Probe the table (search, mmat.rg:502-527)."""
    return float(_lib.mnd_hash_lookup(
        np.ascontiguousarray(tbl_idx.reshape(-1), np.int64),
        np.ascontiguousarray(tbl_val, np.float64),
        _i64(len(tbl_val)), _u64(ncols), _i64(i), _i64(j)))


def fill_initial(nsep, rows, cols, vals, sep_of, loc_of, base, bounds0,
                 b0_off, b0_len, arena, cur_off, cur_nc) -> None:
    """Interval-0 filled flags from the COO lower triangle (fill_block
    reporting parity, mmat.rg:614-616). Mutates `arena` in place."""
    _lib.fill_initial(
        _i64(int(nsep)), _i64(len(vals)),
        np.ascontiguousarray(rows, np.int64),
        np.ascontiguousarray(cols, np.int64),
        np.ascontiguousarray(vals, np.float64),
        np.ascontiguousarray(sep_of, np.int64),
        np.ascontiguousarray(loc_of, np.int64),
        base, bounds0, b0_off, b0_len, arena, cur_off, cur_nc)


def fill_analyze(levels, nsep, nblocks, base, arena, cur_off, cur_nr, cur_nc,
                 nclus, merge_off, merge_data, snap_arenas, snap_off) -> None:
    """Run the interval-scheduled fill propagation + merge loop in C++
    (compute_filled_clusters / merge_filled_clusters parity; see mndio.cc).
    Mutates `arena`, `cur_*` and fills the per-label `snap_arenas`."""
    ptrs = (ctypes.c_void_p * len(snap_arenas))()
    for i, a in enumerate(snap_arenas):
        assert a.dtype == np.uint8 and a.flags["C_CONTIGUOUS"]
        ptrs[i] = a.ctypes.data_as(ctypes.c_void_p)
    rc = _lib.fill_analyze(
        _i64(int(levels)), _i64(int(nsep)), _i64(int(nblocks)),
        base, arena, cur_off, cur_nr, cur_nc, nclus, merge_off, merge_data,
        ptrs, snap_off)
    if rc == -1:
        raise ValueError(
            "separator not merged to a single cluster at its elimination "
            "interval (reference invariant, mmat.rg:365-451)")
    if rc != 0:
        raise RuntimeError(f"fill_analyze failed with code {rc}")


def assemble_panels(rows, cols, vals, sep_of, loc_of, nsep, levels, row_off,
                    panels) -> None:
    """Scatter COO entries into the per-level panel buffers in place."""
    ptrs = (ctypes.c_void_p * len(panels))()
    H = np.empty(len(panels), dtype=np.int64)
    S = np.empty(len(panels), dtype=np.int64)
    for i, p in enumerate(panels):
        assert p.dtype == np.float64 and p.flags["C_CONTIGUOUS"]
        ptrs[i] = p.ctypes.data_as(ctypes.c_void_p)
        H[i] = p.shape[1]
        S[i] = p.shape[2]
    _lib.assemble_panels(
        np.ascontiguousarray(rows, np.int64),
        np.ascontiguousarray(cols, np.int64),
        np.ascontiguousarray(vals, np.float64),
        _i64(len(vals)),
        np.ascontiguousarray(sep_of, np.int64),
        np.ascontiguousarray(loc_of, np.int64),
        _i64(int(nsep)), _i64(int(levels)),
        np.ascontiguousarray(row_off, np.int64), H, S, ptrs)


_lib.nd_order_mt.restype = _i64
_lib.nd_order_mt.argtypes = [_i64, _i64, _i64p, _i64p, _i64, _i64p, _i64]


def nd_order(n: int, rows: np.ndarray, cols: np.ndarray,
             levels: int, threads: int | None = None) -> np.ndarray:
    """Native nested-dissection ordering core (statement-level mirror of
    symbolic/nd.py — see mndio.cc nd_order_mt). Returns sep_of [n]: the heap
    index h (1..2^levels-1) of the separator/leaf owning each dof.

    `threads=None` resolves CHOLESKY_TPU_ND_THREADS, else min(cpus, 8).
    Output is bit-identical for every thread count: a tree depth's parts
    are disjoint subgraphs split by workers with private workspaces
    (tests/test_nd.py::test_native_nd_threads_identical)."""
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    # The C++ core indexes CSR/workspace arrays with these values; an
    # out-of-range dof (e.g. 1-based input) must fail like the Python
    # path's IndexError, not corrupt the heap.
    for name, arr in (("rows", rows), ("cols", cols)):
        if len(arr) and (arr.min() < 0 or arr.max() >= n):
            raise IndexError(
                f"{name} contains dof indices outside [0, {n}) "
                f"(min {arr.min()}, max {arr.max()}) — COO indices must be "
                f"0-based")
    if threads is None:
        threads = int(os.environ.get("CHOLESKY_TPU_ND_THREADS",
                                     min(os.cpu_count() or 1, 8)))
    sep_of = np.zeros(int(n), dtype=np.int64)
    rc = _lib.nd_order_mt(_i64(int(n)), _i64(len(rows)), rows, cols,
                          _i64(int(levels)), sep_of, _i64(int(threads)))
    if rc != 0:
        raise RuntimeError(f"nd_order failed: rc={rc}")
    return sep_of


_lib.md_order.restype = _i64
_lib.md_order.argtypes = [_i64, _i64, _i64p, _i64p, _i64p]


def md_order(n: int, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
    """Native minimum-degree ordering core (statement-level mirror of
    symbolic/mdtree.min_degree_perm — see mndio.cc md_order). Returns
    perm [n] with perm[k] = original dof eliminated k-th; output is
    identical to the Python implementation (the lazy (deg, v) heap makes
    pop order container-independent)."""
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    perm = np.zeros(int(n), dtype=np.int64)
    rc = _lib.md_order(_i64(int(n)), _i64(len(rows)), rows, cols, perm)
    if rc == 2:
        raise IndexError("rows/cols contain dof indices outside [0, n) — "
                         "COO indices must be 0-based")
    if rc != 0:
        raise RuntimeError(f"md_order failed: rc={rc}")
    return perm


_lib.col_counts.restype = _i64
_lib.col_counts.argtypes = [_i64, _i64, _i64p, _i64p, _i64p]


def col_counts(n: int, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
    """Exact per-column factor nonzero counts (incl. diagonal) for the
    symmetric pattern eliminated in natural order — the Gilbert-Ng-Peyton
    O(nnz*alpha) core (mndio.cc col_counts). Relabel rows/cols by a
    candidate permutation first to cost that ordering; bit-parity with the
    Python symbolic elimination (symbolic/quality.fill_flops) is asserted
    in tests/test_mdtree.py."""
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    cc = np.zeros(int(n), dtype=np.int64)
    rc = _lib.col_counts(_i64(int(n)), _i64(len(rows)), rows, cols, cc)
    if rc == 2:
        raise IndexError("rows/cols contain dof indices outside [0, n) — "
                         "COO indices must be 0-based")
    if rc != 0:
        raise RuntimeError(f"col_counts failed: rc={rc}")
    return cc
