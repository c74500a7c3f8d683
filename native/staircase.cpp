// Staircase color phase: orientation + Konig coloring + dual-side Kempe
// compaction (the expensive host work of the staircase half-list builder,
// newtonnet_tpu/ops/staircase.py -- see its module docstring for the
// algorithm and the measured TPU impact).
//
// The compaction repeatedly takes, per atom (worst overshoot over its own
// ceil(deg/2) bound first), the edge holding its highest color on EITHER
// side and moves it to the lowest color free on the edge's out-row --
// directly when also free on the in-row, else via the same alternating
// chain flip the Konig construction uses. After convergence each atom's
// out-colors AND in-colors sit just above its own need, which is what
// lets the staircase chunks carry only the atom prefix that needs them.
//
// ~50 ms at N=4096 / 106k edges (vs ~9 s for the pure-python builder),
// fast enough for dataset preprocessing at scale and amortized MD skin
// rebuilds.
//
// C ABI consumed via ctypes (newtonnet_tpu/native/__init__.py).
// Build: make -C native

#include <algorithm>
#include <cstdint>
#include <numeric>
#include <vector>

#include "graphcolor.h"

namespace {

// Per-atom need: 1 + highest color on either side.
void per_atom_need(const std::vector<int32_t>& src,
                   const std::vector<int32_t>& dst,
                   const std::vector<int32_t>& color, int64_t n,
                   std::vector<int32_t>* need) {
  need->assign(n, 0);
  for (size_t e = 0; e < src.size(); ++e) {
    (*need)[src[e]] = std::max((*need)[src[e]], color[e] + 1);
    (*need)[dst[e]] = std::max((*need)[dst[e]], color[e] + 1);
  }
}

void compact_colors(graphcolor::KonigState* st,
                    const std::vector<int32_t>& src,
                    const std::vector<int32_t>& dst,
                    const std::vector<int32_t>& out_deg,
                    const std::vector<int32_t>& in_deg, int32_t sweeps) {
  const int64_t n = st->n;
  const int32_t cap = st->cap;
  const int64_t m = static_cast<int64_t>(src.size());
  std::vector<int32_t> need, key(n);
  std::vector<int32_t> order(n);
  for (int32_t sweep = 0; sweep < sweeps; ++sweep) {
    int64_t moved = 0;
    per_atom_need(src, dst, st->color, n, &need);
    for (int64_t i = 0; i < n; ++i)
      key[i] = need[i] - std::max(out_deg[i], in_deg[i]);
    std::iota(order.begin(), order.end(), 0);
    std::stable_sort(order.begin(), order.end(),
                     [&](int32_t a, int32_t b) { return key[a] > key[b]; });
    for (int64_t oi = 0; oi < n; ++oi) {
      const int32_t au = order[oi];
      const int64_t* so_u = &st->slot_out[static_cast<size_t>(au) * cap];
      const int64_t* si_u = &st->slot_in[static_cast<size_t>(au) * cap];
      for (int32_t iter = 0; iter < cap; ++iter) {
        int32_t co = -1, ci = -1;
        for (int32_t w = cap - 1; w >= 0; --w) {
          if (co < 0 && so_u[w] >= 0) co = w;
          if (ci < 0 && si_u[w] >= 0) ci = w;
          if (co >= 0 && ci >= 0) break;
        }
        const int32_t top = std::max(co, ci);
        if (top <= 0) break;
        const int64_t e = (co >= ci) ? so_u[co] : si_u[ci];
        const int32_t u = src[e], v = dst[e], ce = st->color[e];
        int64_t* su = &st->slot_out[static_cast<size_t>(u) * cap];
        int64_t* sv = &st->slot_in[static_cast<size_t>(v) * cap];
        // lowest colors free on u's out-row, below ce
        int32_t direct = -1, first_free = -1;
        for (int32_t a = 0; a < ce; ++a) {
          if (su[a] >= 0) continue;
          if (first_free < 0) first_free = a;
          if (sv[a] < 0) {
            direct = a;
            break;
          }
        }
        if (first_free < 0) break;  // u's palette is already compact
        if (direct >= 0) {
          st->color[e] = direct;
          su[ce] = sv[ce] = -1;
          su[direct] = sv[direct] = e;
          ++moved;
          continue;
        }
        su[ce] = sv[ce] = -1;  // lift e out before flipping
        if (st->chain_flip(u, v, first_free, ce)) {
          st->color[e] = first_free;
          su[first_free] = sv[first_free] = e;
          ++moved;
        } else {  // chain ended occupying first_free at u: put e back
          su[ce] = sv[ce] = e;
          break;
        }
      }
    }
    if (moved < std::max<int64_t>(50, m / 2000)) break;
  }
}

}  // namespace

extern "C" {

// Orient + color + compact one frame's symmetric list. Writes the m
// oriented edges' (src, dst, color) into the caller's buffers (capacity
// m_cap). cap_in = 0 uses the Konig optimum palette; a larger cap_in
// (e.g. a dataset-wide shape plan) colors into that palette instead.
// Returns m, or -1 when m > m_cap or cap_in is below the Konig optimum.
int64_t staircase_color_edges(const int32_t* idx, const uint8_t* mask,
                              int64_t n, int32_t k_in, int32_t sweeps,
                              int32_t cap_in, int32_t* src_out,
                              int32_t* dst_out, int32_t* color_out,
                              int64_t m_cap) {
  std::vector<std::pair<int32_t, int32_t>> edges;
  graphcolor::collect_edges(idx, mask, n, k_in, &edges);
  const int64_t m = static_cast<int64_t>(edges.size());
  if (m > m_cap) return -1;
  std::vector<int32_t> src, dst;
  graphcolor::euler_orient(edges, n, &src, &dst);

  std::vector<int32_t> out_deg(n, 0), in_deg(n, 0);
  for (int64_t e = 0; e < m; ++e) {
    ++out_deg[src[e]];
    ++in_deg[dst[e]];
  }
  int32_t delta = 1;
  for (int64_t i = 0; i < n; ++i)
    delta = std::max(delta, std::max(out_deg[i], in_deg[i]));
  const int32_t cap = cap_in > 0 ? cap_in : delta;
  if (cap < delta) return -1;

  graphcolor::KonigState st;
  st.init(src, dst, n, cap);
  if (!st.color_all()) return -1;  // cannot happen (Konig)
  compact_colors(&st, src, dst, out_deg, in_deg, sweeps);

  for (int64_t e = 0; e < m; ++e) {
    src_out[e] = src[e];
    dst_out[e] = dst[e];
    color_out[e] = st.color[e];
  }
  return m;
}

}  // extern "C"
