// Beneš-network routing for static permutations — the native preprocessing core.
//
// TPU-native context: XLA's per-element gather/scatter on TPU runs ~0.1 G elem/s,
// while masked fixed-distance exchanges and intra-128 lane shuffles run at memory
// bandwidth. The framework therefore executes the graph advance's src→dst edge-value
// motion (the hot gather of the reference's advance kernels,
// vgl_compute_api/nec/advance_all_active.hpp) as a STATIC routing network computed
// once at import: a Beneš network over N=2^k slots whose stages are
//   input exchanges  at distances N/2, N/4, ..., 128
//   one arbitrary intra-128 lane shuffle (the collapsed middle of the network)
//   output exchanges at distances 128, ..., N/4, N/2.
// This file computes the per-stage swap masks + lane indices for a given
// permutation in O(N log N) via the classic looping (2-coloring) algorithm.
//
// Exposed C ABI (used from Python via ctypes):
//   benes_route(n, perm, in_masks, out_masks, lane_idx) -> 0 on success
//     n         : power of two, >= 128
//     perm      : int64[n], perm[dst] = src  (apply_route(x)[dst] == x[perm[dst]])
//     in_masks  : uint8[levels*n]  (levels = log2(n) - 7), stage order top-down
//     out_masks : uint8[levels*n]
//     lane_idx  : int32[n], per-128-block gather indices (values 0..127)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// 2-color one block [lo, lo+m) given q (position -> block-local destination).
// side[a] = 0 (upper subnet) / 1 (lower). qinv is scratch of size >= m.
void color_block(const int32_t* q, int64_t lo, int32_t m, int8_t* side,
                 int32_t* qinv) {
  const int32_t h = m / 2;
  for (int32_t j = 0; j < m; ++j) qinv[q[lo + j]] = j;  // block-local
  for (int32_t j = 0; j < m; ++j) side[j] = -1;
  for (int32_t a0 = 0; a0 < h; ++a0) {
    if (side[a0] != -1) continue;
    int32_t a = a0;
    int8_t s = 0;
    while (side[a] == -1) {
      side[a] = s;
      const int32_t p = a ^ h;      // input partner
      side[p] = (int8_t)(1 - s);
      const int32_t b = q[lo + p];  // p's destination
      const int32_t nxt = qinv[b ^ h];  // element sharing p's output switch
      a = nxt;                      // must take side s again
    }
  }
}

}  // namespace

extern "C" int benes_route(int64_t n, const int64_t* perm, uint8_t* in_masks,
                           uint8_t* out_masks, int32_t* lane_idx) {
  if (n < 128 || (n & (n - 1)) != 0) return 1;
  int k = 0;
  while ((int64_t(1) << k) < n) ++k;
  const int levels = k - 7;  // block sizes 2^k .. 2^8

  std::vector<int32_t> q(n);       // q[pos] = block-local destination of element
  for (int64_t i = 0; i < n; ++i) {
    if (perm[i] < 0 || perm[i] >= n) return 2;
    q[perm[i]] = (int32_t)i;
  }
  // Every level touches all n elements; blocks within a level are disjoint, so
  // they parallelize (each thread gets block-sized scratch). The first level is
  // one n-sized block — its cycle-following loop is inherently sequential — so
  // wall time is ~2n sequential steps + (levels-2)·n/threads instead of
  // levels·n (measured 37 s -> ~8 s for n = 2^24 on 16 cores).
  for (int lev = 0; lev < levels; ++lev) {
    const int64_t m = int64_t(1) << (k - lev);
    const int32_t h = (int32_t)(m / 2);
    const int64_t nblocks = n / m;
    uint8_t* im = in_masks + (int64_t)lev * n;
    uint8_t* om = out_masks + (int64_t)lev * n;
    int nthreads = 1;
#ifdef _OPENMP
    nthreads = (int)std::min<int64_t>(nblocks, omp_get_max_threads());
#endif
#pragma omp parallel num_threads(nthreads) if (nblocks > 1)
    {
      std::vector<int32_t> qinv((size_t)m);
      std::vector<int8_t> side((size_t)m);
#pragma omp for schedule(dynamic, 1)
      for (int64_t b = 0; b < nblocks; ++b) {
        const int64_t lo = b * m;
        color_block(q.data(), lo, (int32_t)m, side.data(), qinv.data());
        // masks + apply input swaps + fill output masks + reduce q to subnets
        for (int32_t j = 0; j < h; ++j) {
          const uint8_t swap = (uint8_t)(side[j] == 1);
          im[lo + j] = swap;
          im[lo + j + h] = swap;
          if (swap) {
            const int32_t t = q[lo + j];
            q[lo + j] = q[lo + j + h];
            q[lo + j + h] = t;
          }
        }
        // upper subnet at [lo, lo+h): exit slot q%h; out swap iff dest >= h
        for (int32_t j = 0; j < h; ++j) {
          const int32_t d = q[lo + j];
          const uint8_t swap = (uint8_t)((d & h) != 0);
          om[lo + (d & (h - 1))] = swap;
          om[lo + (d & (h - 1)) + h] = swap;
        }
        for (int32_t j = 0; j < (int32_t)m; ++j) q[lo + j] &= (h - 1);
      }
    }
  }

  // base case: blocks of 128 — arbitrary lane shuffle, out[b] = in[lane_idx[b]]
  for (int64_t lo = 0; lo < n; lo += 128) {
    for (int32_t j = 0; j < 128; ++j) lane_idx[lo + q[lo + j]] = j;
  }
  return 0;
}

// Reference executor for tests: applies the computed network to int64 values.
extern "C" void benes_apply_ref(int64_t n, const uint8_t* in_masks,
                                const uint8_t* out_masks,
                                const int32_t* lane_idx, const int64_t* x,
                                int64_t* y) {
  int k = 0;
  while ((int64_t(1) << k) < n) ++k;
  const int levels = k - 7;
  std::vector<int64_t> cur(x, x + n), nxt(n);
  for (int lev = 0; lev < levels; ++lev) {
    const int64_t d = int64_t(1) << (k - 1 - lev);
    const uint8_t* im = in_masks + (int64_t)lev * n;
    for (int64_t i = 0; i < n; ++i)
      nxt[i] = im[i] ? cur[i ^ d] : cur[i];
    cur.swap(nxt);
  }
  for (int64_t lo = 0; lo < n; lo += 128) {
    for (int32_t j = 0; j < 128; ++j) nxt[lo + j] = cur[lo + lane_idx[lo + j]];
  }
  cur.swap(nxt);
  for (int lev = levels - 1; lev >= 0; --lev) {
    const int64_t d = int64_t(1) << (k - 1 - lev);
    const uint8_t* om = out_masks + (int64_t)lev * n;
    for (int64_t i = 0; i < n; ++i)
      nxt[i] = om[i] ? cur[i ^ d] : cur[i];
    cur.swap(nxt);
  }
  std::memcpy(y, cur.data(), sizeof(int64_t) * n);
}
