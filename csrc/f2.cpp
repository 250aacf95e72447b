// Packed GF(2) linear algebra for Tanner-graph construction.
//
// The Python builders (tpugnn/utils/f2.py) perform row reduction, rank,
// nullspace and linear solves over GF(2) when deriving logical operators and
// pure-error tables.  Those routines are O(rows^2 * cols) row operations; at
// d >= 25 toric codes (thousands of checks/qubits) the numpy uint8 path takes
// minutes.  This translation packs rows into 64-bit words (64 XORs per
// instruction) and is loaded via ctypes with a pure-Python fallback
// (tpugnn/utils/native.py).
//
// C ABI: matrices are row-major uint8 (one element per byte, values 0/1);
// packing is internal so the Python side stays trivial.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Packed {
  int rows, cols, words;
  std::vector<uint64_t> data;  // rows * words

  Packed(const uint8_t* a, int r, int c)
      : rows(r), cols(c), words((c + 63) / 64), data((size_t)r * words, 0) {
    for (int i = 0; i < r; ++i)
      for (int j = 0; j < c; ++j)
        if (a[(size_t)i * c + j] & 1)
          data[(size_t)i * words + (j >> 6)] |= (uint64_t)1 << (j & 63);
  }

  inline uint64_t* row(int i) { return data.data() + (size_t)i * words; }
  inline bool get(int i, int j) const {
    return (data[(size_t)i * words + (j >> 6)] >> (j & 63)) & 1;
  }
  void unpack(uint8_t* out) const {
    for (int i = 0; i < rows; ++i)
      for (int j = 0; j < cols; ++j)
        out[(size_t)i * cols + j] = get(i, j) ? 1 : 0;
  }
  void xor_rows(int dst, int src) {
    uint64_t* d = row(dst);
    uint64_t* s = row(src);
    for (int w = 0; w < words; ++w) d[w] ^= s[w];
  }
  void swap_rows(int a, int b) {
    if (a == b) return;
    uint64_t* pa = row(a);
    uint64_t* pb = row(b);
    for (int w = 0; w < words; ++w) std::swap(pa[w], pb[w]);
  }
};

// In-place reduced row echelon form; returns rank, fills pivots[rank].
int rref(Packed& m, int32_t* pivots) {
  int rank = 0;
  for (int col = 0; col < m.cols && rank < m.rows; ++col) {
    int piv = -1;
    for (int i = rank; i < m.rows; ++i)
      if (m.get(i, col)) { piv = i; break; }
    if (piv < 0) continue;
    m.swap_rows(rank, piv);
    for (int i = 0; i < m.rows; ++i)
      if (i != rank && m.get(i, col)) m.xor_rows(i, rank);
    if (pivots) pivots[rank] = col;
    ++rank;
  }
  return rank;
}

}  // namespace

extern "C" {

// In-place RREF of a [rows x cols] uint8 matrix; returns rank.
// pivots (len >= min(rows, cols)) receives pivot column indices.
int f2_row_reduce(uint8_t* a, int rows, int cols, int32_t* pivots) {
  Packed m(a, rows, cols);
  int rank = rref(m, pivots);
  m.unpack(a);
  return rank;
}

int f2_rank(const uint8_t* a, int rows, int cols) {
  Packed m(a, rows, cols);
  return rref(m, nullptr);
}

// Right-nullspace basis of a; basis_out must hold cols*cols uint8.
// Returns the nullspace dimension (rows of basis_out used).
int f2_nullspace(const uint8_t* a, int rows, int cols, uint8_t* basis_out) {
  Packed m(a, rows, cols);
  std::vector<int32_t> pivots(std::min(rows, cols));
  int rank = rref(m, pivots.data());
  std::vector<uint8_t> is_pivot(cols, 0);
  for (int i = 0; i < rank; ++i) is_pivot[pivots[i]] = 1;
  std::memset(basis_out, 0, (size_t)cols * cols);
  int k = 0;
  for (int fc = 0; fc < cols; ++fc) {
    if (is_pivot[fc]) continue;
    uint8_t* v = basis_out + (size_t)k * cols;
    v[fc] = 1;
    for (int i = 0; i < rank; ++i) v[pivots[i]] = m.get(i, fc) ? 1 : 0;
    ++k;
  }
  return k;
}

// One solution of a @ x = b (x len cols). Returns 1 on success, 0 if
// inconsistent.
int f2_solve(const uint8_t* a, const uint8_t* b, int rows, int cols,
             uint8_t* x_out) {
  std::vector<uint8_t> aug((size_t)rows * (cols + 1));
  for (int i = 0; i < rows; ++i) {
    std::memcpy(&aug[(size_t)i * (cols + 1)], a + (size_t)i * cols, cols);
    aug[(size_t)i * (cols + 1) + cols] = b[i] & 1;
  }
  Packed m(aug.data(), rows, cols + 1);
  std::vector<int32_t> pivots(std::min(rows, cols + 1));
  int rank = rref(m, pivots.data());
  std::memset(x_out, 0, cols);
  for (int i = 0; i < rank; ++i) {
    if (pivots[i] == cols) return 0;  // pivot in augmented column
    x_out[pivots[i]] = m.get(i, cols) ? 1 : 0;
  }
  return 1;
}

}  // extern "C"
