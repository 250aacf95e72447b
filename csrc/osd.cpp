// Batched OSD-0 (ordered-statistics, order 0) post-processing for the BP
// baseline decoder.
//
// Per shot: order the parity-check columns by BP reliability (ascending
// posterior |LLR| proxy supplied by the caller — least reliable first),
// Gauss-eliminate H (packed 64-bit words, augmented with the syndrome) to
// reduced row-echelon form picking pivots greedily in that order, set all
// non-pivot bits to zero and read the pivot bits off the augmented column.
// The result is the most-likely-bits-first syndrome-consistent correction —
// the standard classical companion to BP on degenerate quantum codes.
//
// Shapes are tiny (m, n <= a few hundred for d <= 25), so per-shot
// elimination is microseconds; the batch loop is the hot path and stays in
// one C call.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

using u64 = uint64_t;

inline int get_bit(const u64* row, int j) { return (row[j >> 6] >> (j & 63)) & 1; }
inline void set_bit(u64* row, int j) { row[j >> 6] |= u64(1) << (j & 63); }

}  // namespace

extern "C" {

// h: uint8[m, n] (0/1) parity-check matrix of one sector.
// syndromes: uint8[batch, m]; llrs: float[batch, n] (posterior LLRs; columns
// are ordered by ASCENDING value — most-likely-flipped first).
// out: uint8[batch, n] corrections.  Returns the number of shots whose
// syndrome was inconsistent with the column space (those get best-effort
// output with the inconsistent checks ignored).
int osd0_decode_batch(const uint8_t* h, int m, int n,
                      const uint8_t* syndromes, const float* llrs, int batch,
                      uint8_t* out) {
  const int words = (n + 1 + 63) / 64;  // +1 augmented syndrome column
  const int aug = n;                    // bit index of the augmented column
  std::vector<u64> base(size_t(m) * words, 0);
  for (int i = 0; i < m; ++i) {
    u64* row = base.data() + size_t(i) * words;
    for (int j = 0; j < n; ++j)
      if (h[size_t(i) * n + j] & 1) set_bit(row, j);
  }

  std::vector<u64> work(size_t(m) * words);
  std::vector<int> order(n), pivot_row_of_col(n);
  std::vector<int> pivot_cols; pivot_cols.reserve(m);
  int inconsistent = 0;

  for (int s = 0; s < batch; ++s) {
    const uint8_t* syn = syndromes + size_t(s) * m;
    const float* llr = llrs + size_t(s) * n;
    uint8_t* cor = out + size_t(s) * n;
    std::memset(cor, 0, n);

    std::memcpy(work.data(), base.data(), work.size() * sizeof(u64));
    for (int i = 0; i < m; ++i)
      if (syn[i] & 1) set_bit(work.data() + size_t(i) * words, aug);

    for (int j = 0; j < n; ++j) order[j] = j;
    std::sort(order.begin(), order.end(),
              [&](int a, int b) { return llr[a] < llr[b]; });

    // RREF with pivots chosen in reliability order
    pivot_cols.clear();
    int rank = 0;
    for (int oj = 0; oj < n && rank < m; ++oj) {
      const int j = order[oj];
      int r = -1;
      for (int i = rank; i < m; ++i)
        if (get_bit(work.data() + size_t(i) * words, j)) { r = i; break; }
      if (r < 0) continue;
      if (r != rank)
        for (int w = 0; w < words; ++w)
          std::swap(work[size_t(r) * words + w], work[size_t(rank) * words + w]);
      u64* prow = work.data() + size_t(rank) * words;
      for (int i = 0; i < m; ++i) {
        if (i == rank) continue;
        u64* row = work.data() + size_t(i) * words;
        if (get_bit(row, j))
          for (int w = 0; w < words; ++w) row[w] ^= prow[w];
      }
      pivot_row_of_col[j] = rank;
      pivot_cols.push_back(j);
      ++rank;
    }

    // consistency: rows beyond rank must have zero augmented bit
    for (int i = rank; i < m; ++i)
      if (get_bit(work.data() + size_t(i) * words, aug)) { ++inconsistent; break; }

    // OSD-0 solution: non-pivot bits 0, pivot bits from the augmented column
    for (int j : pivot_cols)
      cor[j] = (uint8_t)get_bit(
          work.data() + size_t(pivot_row_of_col[j]) * words, aug);
  }
  return inconsistent;
}

}  // extern "C"
