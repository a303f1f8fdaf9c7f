"""Native C++ host-runtime tests: hash parity, MatrixMarket parsing parity,
hashed-COO-table semantics (mnd.c:152-199), and assembly parity with the
NumPy oracle."""

import math

import numpy as np
import pytest

try:
    from cholesky_tpu.native import ext
except ImportError:                                  # toolchain missing
    ext = None

pytestmark = pytest.mark.skipif(ext is None, reason="native ext unavailable")

from cholesky_tpu.io import mmio, ordering as ordio
from cholesky_tpu.numeric import assemble as asm
from cholesky_tpu.symbolic.plan import build_plan
from cholesky_tpu.utils.laplacian import generate_problem
from tests.conftest import fixture_paths


def hash_sax_py(key: int) -> int:
    """Reference model of uthash.h HASH_SAX over the 8 key bytes."""
    h = 0
    for i in range(8):
        b = (key >> (8 * i)) & 0xFF
        h = (h ^ ((h << 5) + (h >> 2) + b)) & 0xFFFFFFFFFFFFFFFF
    return h


def hash_ber_py(key: int) -> int:
    h = 0
    for i in range(8):
        h = (h * 33 + ((key >> (8 * i)) & 0xFF)) & 0xFFFFFFFFFFFFFFFF
    return h


@pytest.mark.parametrize("key", [0, 1, 7, 12345, 2**40 + 17, 2**63 - 1])
def test_hash_functions_match_models(key):
    assert ext.hash_sax(key) == hash_sax_py(key)
    assert ext.hash_ber(key) == hash_ber_py(key)


def test_read_coo_matches_python():
    p = fixture_paths("lapl_400x400")["mat"]
    banner = mmio.read_banner(p)
    r, c, v = ext.read_coo_body(p, banner.nnz)
    # numpy fallback path (bypass native)
    with open(p) as f:
        lines = f.read().split("\n")
    i = 0
    while lines[i].startswith("%"):
        i += 1
    data = np.loadtxt(lines[i + 1:i + 1 + banner.nnz])
    np.testing.assert_array_equal(r, data[:, 0].astype(np.int64) - 1)
    np.testing.assert_array_equal(c, data[:, 1].astype(np.int64) - 1)
    np.testing.assert_allclose(v, data[:, 2])


def test_write_coo_roundtrip(tmp_path):
    rows = np.array([0, 2, 5], dtype=np.int64)
    cols = np.array([0, 1, 5], dtype=np.int64)
    vals = np.array([1.5, -2.25, 1e-17])
    f = str(tmp_path / "w.mtx")
    ext.write_coo(f, "%%MatrixMarket matrix coordinate real hermitian",
                  6, 6, rows, cols, vals)
    banner, r, c, v = mmio.read_coo(f)
    np.testing.assert_array_equal(r, rows)
    np.testing.assert_array_equal(c, cols)
    np.testing.assert_allclose(v, vals)


def test_hash_table_reference_semantics():
    """Build the open-addressing table exactly as mnd.c does and probe it
    exactly as mmat.rg's search() does — every original entry retrievable,
    absent entries return 0."""
    p = fixture_paths("lapl_25x25")["mat"]
    banner, r, c, v = mmio.read_coo(p)
    cap = int(math.ceil(banner.nnz / 0.75))          # mmat.rg:1125
    ti, tv = ext.build_hash_table(r, c, v, banner.cols, cap)
    for i, j, val in zip(r, c, v):
        assert ext.hash_lookup(ti, tv, banner.cols, int(i), int(j)) == val
    assert ext.hash_lookup(ti, tv, banner.cols, 0, 25 - 1) == 0.0


@pytest.mark.parametrize("name", ["lapl_9x9", "lapl_400x400"])
def test_assembly_parity_fixture(name):
    p = fixture_paths(name)
    o = ordio.parse_ordering(p["separators"])
    plan = build_plan(o)
    _, r, c, v = mmio.read_coo(p["mat"])
    native = asm.assemble_panels(plan, r, c, v)
    numpy_ = asm.assemble_panels_numpy(plan, r, c, v)
    for a, b in zip(native, numpy_):
        np.testing.assert_array_equal(a, b)


def test_assembly_parity_generated():
    n, r, c, v, o, cl, _ = generate_problem((13, 11, 7), 5)
    plan = build_plan(o, cl)
    native = asm.assemble_panels(plan, r, c, v)
    numpy_ = asm.assemble_panels_numpy(plan, r, c, v)
    for a, b in zip(native, numpy_):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("shape,levels", [((20, 20), 5), ((13, 11, 7), 5),
                                          ((15, 15, 15), 5)])
def test_fill_analysis_native_parity(shape, levels):
    """The C++ planning core (fill_initial + fill_analyze) reproduces the
    Python fill analysis bit-for-bit: same blocks, bounds, and filled flags
    at every interval label."""
    from cholesky_tpu.symbolic import fill

    n, r, c, v, o, cl, _ = generate_problem(shape, levels)
    plan = build_plan(o, cl)
    fa_py = fill._analyze_fill_py(plan, r, c, v)
    fa_cc = fill._analyze_fill_native(plan, r, c, v)
    assert len(fa_py.snapshots) == len(fa_cc.snapshots)
    for sp, sc in zip(fa_py.snapshots, fa_cc.snapshots):
        assert set(sp.keys()) == set(sc.keys())
        for k in sp:
            np.testing.assert_array_equal(sp[k].filled, sc[k].filled)
            np.testing.assert_array_equal(sp[k].row_bounds, sc[k].row_bounds)
            np.testing.assert_array_equal(sp[k].col_bounds, sc[k].col_bounds)


def test_read_coo_body_pattern_two_columns(tmp_path):
    """2-column (pattern) bodies parse line-bounded — a raw fscanf %lg
    would consume the next row's index as the value (regression)."""
    p = str(tmp_path / "pat.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n"
                "4 4 3\n3 1\n4 2\n4 4\n")
    r, c, v = ext.read_coo_body(p, 3)
    assert r.tolist() == [2, 3, 3]
    assert c.tolist() == [0, 1, 3]
    assert v.tolist() == [1.0, 1.0, 1.0]


def test_build_hash_table_capacity_validation():
    r = np.array([0, 1, 2], dtype=np.int64)
    c = np.array([0, 1, 2], dtype=np.int64)
    v = np.array([1.0, 2.0, 3.0])
    # default capacity = ceil(nz/0.75) (mnd.c:168)
    ti, tv = ext.build_hash_table(r, c, v, 3)
    assert len(tv) == 4
    assert ext.hash_lookup(ti, tv, 3, 2, 2) == 3.0
    with pytest.raises(ValueError):
        ext.build_hash_table(r, c, v, 3, capacity=3)   # would probe forever
    with pytest.raises(ValueError):
        ext.build_hash_table(r, c, v, 3, capacity=0)   # modulo-by-zero


def _jen_mix(a, b, c):
    M = 0xFFFFFFFF
    a = (a - b - c) & M; a ^= c >> 13
    b = (b - c - a) & M; b ^= (a << 8) & M
    c = (c - a - b) & M; c ^= b >> 13
    a = (a - b - c) & M; a ^= c >> 12
    b = (b - c - a) & M; b ^= (a << 16) & M
    c = (c - a - b) & M; c ^= b >> 5
    a = (a - b - c) & M; a ^= c >> 3
    b = (b - c - a) & M; b ^= (a << 10) & M
    c = (c - a - b) & M; c ^= b >> 15
    return a, b, c


def hash_jen_py(key: int) -> int:
    """Model of uthash.h HASH_JEN for an 8-byte little-endian key."""
    k = [(key >> (8 * i)) & 0xFF for i in range(8)]
    a = b = 0x9E3779B9
    c = (0xFEEDBEEF + 8) & 0xFFFFFFFF
    b = (b + ((k[7] << 24) | (k[6] << 16) | (k[5] << 8) | k[4])) & 0xFFFFFFFF
    a = (a + ((k[3] << 24) | (k[2] << 16) | (k[1] << 8) | k[0])) & 0xFFFFFFFF
    return _jen_mix(a, b, c)[2]


def hash_sfh_py(key: int) -> int:
    """Model of uthash.h HASH_SFH for an 8-byte little-endian key."""
    M = 0xFFFFFFFF
    k = [(key >> (8 * i)) & 0xFF for i in range(8)]
    h = 0xCAFEBABE
    for r in (0, 4):
        lo = k[r] | (k[r + 1] << 8)
        hi = k[r + 2] | (k[r + 3] << 8)
        h = (h + lo) & M
        tmp = ((hi << 11) & M) ^ h
        h = (((h << 16) & M) ^ tmp) & M
        h = (h + (h >> 11)) & M
    h ^= (h << 3) & M; h = (h + (h >> 5)) & M
    h ^= (h << 4) & M; h = (h + (h >> 17)) & M
    h ^= (h << 25) & M; h = (h + (h >> 6)) & M
    return h


@pytest.mark.parametrize("key", [0, 1, 7, 12345, 2**40 + 17, 2**63 - 1])
def test_hash_jen_sfh_match_models(key):
    assert ext.hash_jen(key) == hash_jen_py(key)
    assert ext.hash_sfh(key) == hash_sfh_py(key)
