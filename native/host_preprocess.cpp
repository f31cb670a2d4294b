// Native host-side graph preprocessing: degree-sorted CSR construction.
//
// The TPU-native analog of the reference's import pipeline hot path
// (vgl_datastructures/graphs/undirected_containers/vect_csr/import.hpp:257-337:
// degree count → ASL sort_by_degree → renumber → construct CSR). Used via ctypes
// with a NumPy fallback (vectorgraphlibrary_tpu/native.py); at scale-24+ this path
// is several times faster than the NumPy argsort pipeline.

#include <algorithm>
#include <cstdint>
#include <numeric>
#include <vector>

extern "C" int build_csr(int64_t v, int64_t e, const int32_t* src,
                         const int32_t* dst, int64_t* row_ptr /* v+1 */,
                         int32_t* col_idx /* e */, int64_t* edge_perm /* e */,
                         int32_t* sorted_to_orig /* v */,
                         int32_t* orig_to_sorted /* v */) {
  std::vector<int64_t> deg(v, 0);
  for (int64_t i = 0; i < e; ++i) {
    if (src[i] < 0 || src[i] >= v || dst[i] < 0 || dst[i] >= v) return 1;
    ++deg[src[i]];
  }
  // stable sort vertices by descending degree
  std::vector<int32_t> order(v);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
    return deg[a] > deg[b];
  });
  for (int64_t i = 0; i < v; ++i) {
    sorted_to_orig[i] = order[i];
    orig_to_sorted[order[i]] = (int32_t)i;
  }
  row_ptr[0] = 0;
  for (int64_t i = 0; i < v; ++i) row_ptr[i + 1] = row_ptr[i] + deg[order[i]];
  // counting placement, preserving original edge order within a row (stable)
  std::vector<int64_t> cursor(row_ptr, row_ptr + v);
  for (int64_t i = 0; i < e; ++i) {
    const int32_t s2 = orig_to_sorted[src[i]];
    const int64_t slot = cursor[s2]++;
    col_idx[slot] = orig_to_sorted[dst[i]];
    edge_perm[slot] = i;
  }
  return 0;
}
