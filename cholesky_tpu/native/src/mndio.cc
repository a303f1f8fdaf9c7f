// Native host runtime: MatrixMarket parsing/serialization, hashed COO ingest,
// and panel assembly.
//
// TPU-native re-implementation of the reference's native layer:
//   * mmio.c (NIST MatrixMarket reader/writer, mmio.c:96,189,386)
//   * mnd.c  (separator/cluster/matrix/vector readers + open-addressing COO
//     hash ingest with uthash hash functions, mnd.c:152-199,231-271)
//   * uthash.h hash macros (HASH_SAX/HASH_FNV/HASH_JEN..., used via mnd.c)
//
// Where the reference writes directly into Legion physical regions through
// the Legion C accessor API (mnd.c:34-35), this library writes into caller-
// provided host buffers (NumPy arrays via ctypes) that JAX consumes zero-copy
// with device_put.
//
// Build: cc -O3 -shared -fPIC -o libmndio.so mndio.cc   (see build.py)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// Hash functions — behavioral equivalents of the uthash macros the reference
// wraps in mnd.c:231-271. Each hashes an 8-byte little-endian key, as the
// reference does (HASH_SAX(&key, sizeof(uint64_t), hashv)).

uint64_t mnd_hash_sax(uint64_t key) {
  // uthash.h HASH_SAX: h = 0; h ^= (h<<5) + (h>>2) + byte
  uint64_t h = 0;
  const unsigned char* p = reinterpret_cast<const unsigned char*>(&key);
  for (size_t i = 0; i < sizeof(uint64_t); ++i)
    h ^= (h << 5) + (h >> 2) + p[i];
  return h;
}

uint64_t mnd_hash_fnv(uint64_t key) {
  // uthash.h HASH_FNV: h = 2166136261; h = (h * 16777619) ^ byte
  uint64_t h = 2166136261u;
  const unsigned char* p = reinterpret_cast<const unsigned char*>(&key);
  for (size_t i = 0; i < sizeof(uint64_t); ++i)
    h = (h * 16777619u) ^ p[i];
  return h;
}

uint64_t mnd_hash_ber(uint64_t key) {
  // uthash.h HASH_BER: h = 0; h = h*33 + byte
  uint64_t h = 0;
  const unsigned char* p = reinterpret_cast<const unsigned char*>(&key);
  for (size_t i = 0; i < sizeof(uint64_t); ++i)
    h = h * 33u + p[i];
  return h;
}

uint64_t mnd_hash_oat(uint64_t key) {
  // uthash.h HASH_OAT (one-at-a-time)
  uint64_t h = 0;
  const unsigned char* p = reinterpret_cast<const unsigned char*>(&key);
  for (size_t i = 0; i < sizeof(uint64_t); ++i) {
    h += p[i];
    h += (h << 10);
    h ^= (h >> 6);
  }
  h += (h << 3);
  h ^= (h >> 11);
  h += (h << 15);
  return h;
}

// ---------------------------------------------------------------------------
// MatrixMarket coordinate body reader (banner/size already parsed by Python).
// Returns number of entries read, or -1 on error. Indices converted to
// 0-based (mnd.c:176-177 `i -= 1; j -= 1`).

int64_t mm_read_coo_body(const char* path, int64_t nnz, int64_t* rows,
                         int64_t* cols, double* vals) {
  FILE* fp = std::fopen(path, "r");
  if (!fp) return -1;
  char buf[4096];
  // skip banner + comments; first non-comment line is the size line
  do {
    if (!std::fgets(buf, sizeof buf, fp)) { std::fclose(fp); return -1; }
  } while (buf[0] == '%' || buf[0] == '\n' || buf[0] == '\r');
  int64_t k = 0;
  for (; k < nnz; ++k) {
    long long i, j;
    double v = 1.0;
    int got = std::fscanf(fp, "%lld %lld %lg", &i, &j, &v);
    if (got < 2) break;
    if (got == 2) v = 1.0;  // pattern files
    rows[k] = i - 1;
    cols[k] = j - 1;
    vals[k] = v;
  }
  std::fclose(fp);
  return k;
}

// Coordinate writer (write_matrix parity, mmat.rg:128-144)
int64_t mm_write_coo(const char* path, const char* banner, int64_t m,
                     int64_t n, int64_t nnz, const int64_t* rows,
                     const int64_t* cols, const double* vals) {
  FILE* fp = std::fopen(path, "w");
  if (!fp) return -1;
  std::fprintf(fp, "%s\n", banner);
  std::fprintf(fp, "%lld %lld %lld\n", (long long)m, (long long)n,
               (long long)nnz);
  for (int64_t k = 0; k < nnz; ++k)
    std::fprintf(fp, "%lld %lld %.17g\n", (long long)rows[k] + 1,
                 (long long)cols[k] + 1, vals[k]);
  std::fclose(fp);
  return nnz;
}

// ---------------------------------------------------------------------------
// Open-addressing hashed COO table — exact semantics of the reference ingest
// (mnd.c:152-199): capacity = ceil(nz/0.75), slot = hash_sax(i*cols+j) % cap,
// linear probing on nonzero values; and the lookup (search, mmat.rg:502-527).

void mnd_build_hash_table(const int64_t* rows, const int64_t* cols,
                          const double* vals, int64_t nnz, uint64_t ncols,
                          int64_t capacity, int64_t* tbl_idx /* [2*cap] */,
                          double* tbl_val /* [cap] */) {
  for (int64_t k = 0; k < capacity; ++k) {
    tbl_idx[2 * k] = -1;
    tbl_idx[2 * k + 1] = -1;
    tbl_val[k] = 0.0;
  }
  for (int64_t k = 0; k < nnz; ++k) {
    uint64_t key = (uint64_t)rows[k] * ncols + (uint64_t)cols[k];
    uint64_t p = mnd_hash_sax(key) % (uint64_t)capacity;
    while (tbl_val[p] != 0.0) p = (p + 1) % (uint64_t)capacity;
    tbl_idx[2 * p] = rows[k];
    tbl_idx[2 * p + 1] = cols[k];
    tbl_val[p] = vals[k];
  }
}

double mnd_hash_lookup(const int64_t* tbl_idx, const double* tbl_val,
                       int64_t capacity, uint64_t ncols, int64_t i,
                       int64_t j) {
  uint64_t key = (uint64_t)i * ncols + (uint64_t)j;
  uint64_t p = mnd_hash_sax(key) % (uint64_t)capacity;
  if (tbl_idx[2 * p] == i && tbl_idx[2 * p + 1] == j) return tbl_val[p];
  while (tbl_val[p] != 0.0) {
    p = (p + 1) % (uint64_t)capacity;
    if (tbl_idx[2 * p] == i && tbl_idx[2 * p + 1] == j) return tbl_val[p];
  }
  return 0.0;
}

// ---------------------------------------------------------------------------
// Panel assembly: route COO entries (lower triangle, original dofs) into the
// per-level panel buffers (fill_block parity, mmat.rg:530-633, including the
// symmetric-entry swap :581-585 and the diagonal tril guard :591).
//
// panels: array of `levels` pointers; panels[L] is [2^L, H(L), S(L)] f64,
// row-major. heap(sep) = nsep - sep + 1; level = floor(log2(heap));
// slot = heap - 2^level.

static inline int ilog2_u64(uint64_t x) { return 63 - __builtin_clzll(x); }

void assemble_panels(const int64_t* rows, const int64_t* cols,
                     const double* vals, int64_t nnz, const int64_t* sep_of,
                     const int64_t* loc_of, int64_t nsep, int64_t levels,
                     const int64_t* row_off /* [levels*levels] */,
                     const int64_t* H, const int64_t* S, double** panels) {
  for (int64_t k = 0; k < nnz; ++k) {
    for (int swap = 0; swap < 2; ++swap) {
      int64_t r = swap ? cols[k] : rows[k];
      int64_t c = swap ? rows[k] : cols[k];
      if (swap && r == c) break;
      int64_t sr = sep_of[r], sc = sep_of[c];
      int64_t lr = loc_of[r], lc = loc_of[c];
      uint64_t hr = (uint64_t)(nsep - sr + 1);
      uint64_t hc = (uint64_t)(nsep - sc + 1);
      int lvl_r = ilog2_u64(hr), lvl_c = ilog2_u64(hc);
      int64_t prow;
      if (sr == sc) {
        if (lr < lc) continue;  // strict upper triangle of diag block
        prow = lr;
      } else if (lvl_r < lvl_c && (hc >> (lvl_c - lvl_r)) == hr) {
        prow = row_off[lvl_c * levels + lvl_r] + lr;
      } else {
        continue;  // non-ancestor coupling: not representable (must be 0)
      }
      int64_t slot = (int64_t)(hc - (1ull << lvl_c));
      double* p = panels[lvl_c];
      p[(slot * H[lvl_c] + prow) * S[lvl_c] + lc] = vals[k];
    }
  }
}

}  // extern "C"
