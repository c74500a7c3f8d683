// Newton's-third-law half-list construction.
//
// Orients + slot-colors a symmetric padded neighbor list (idx, mask) of
// shape (N, K_in) into a HALF list: each undirected edge (i, j) is stored
// exactly once, on the row of one chosen endpoint. The message-passing
// layer then computes every per-edge quantity once and aggregates it onto
// BOTH endpoints (newtonnet_tpu/models/newtonnet.py, newton3 mode), which
// halves gather rows, pair-MLP FLOPs, and backward traffic.
//
// Two phases (mirrors newtonnet_tpu/ops/nlist.py: newton3_half_list):
//   1. Eulerian orientation: odd-degree vertices are paired with virtual
//      edges (making every component Eulerian), then Eulerian circuits
//      are walked -- each visit enters and leaves a node, so out-degree
//      == in-degree == deg'/2 exactly; dropping the virtual edges leaves
//      both <= ceil(deg/2). (Plain trails without the augmentation can
//      restart at a node and pile up out-edges there.)
//   2. Konig bipartite edge coloring of the oriented edges under the
//      constraint that no two out-edges of i and no two in-edges of j
//      share a slot. The in-side constraint makes each slot's
//      n -> idx[k, n] map injective, which is what inv_scatter_sum needs
//      for the scatter-free in-side aggregation. Konig's theorem bounds
//      the slot count at max(out-degree, in-degree) exactly: when no slot
//      is free at both endpoints, flip an alternating two-colored chain.
//
// C ABI consumed via ctypes (newtonnet_tpu/native/__init__.py).
// Build: make -C native

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Eulerian-circuit orientation over a CSR adjacency (odd-degree vertices
// paired with virtual edges first). Fills src/dst for the m real edges.
void euler_orient(const std::vector<std::pair<int32_t, int32_t>>& edges,
                  int64_t n, std::vector<int32_t>* src,
                  std::vector<int32_t>* dst) {
  const int64_t m = static_cast<int64_t>(edges.size());
  std::vector<int32_t> deg(n, 0);
  for (const auto& e : edges) {
    ++deg[e.first];
    ++deg[e.second];
  }
  // pair odd-degree vertices (always an even count) with virtual edges so
  // every component becomes Eulerian and circuits balance in/out exactly
  std::vector<std::pair<int32_t, int32_t>> all(edges);
  {
    int32_t prev = -1;
    for (int64_t v = 0; v < n; ++v) {
      if (deg[v] % 2 == 0) continue;
      if (prev < 0) {
        prev = static_cast<int32_t>(v);
      } else {
        all.emplace_back(prev, static_cast<int32_t>(v));
        prev = -1;
      }
    }
  }
  const int64_t m_all = static_cast<int64_t>(all.size());
  std::vector<int64_t> ptr(n + 1, 0);
  for (const auto& e : all) {
    ++ptr[e.first + 1];
    ++ptr[e.second + 1];
  }
  for (int64_t i = 0; i < n; ++i) ptr[i + 1] += ptr[i];
  std::vector<int64_t> adj(2 * m_all);
  {
    std::vector<int64_t> cur(ptr.begin(), ptr.end() - 1);
    for (int64_t e = 0; e < m_all; ++e) {
      adj[cur[all[e].first]++] = e;
      adj[cur[all[e].second]++] = e;
    }
  }
  std::vector<int64_t> cursor(ptr.begin(), ptr.end() - 1);
  std::vector<uint8_t> used(m_all, 0);
  std::vector<int32_t> asrc(m_all), adst(m_all);
  auto next_edge = [&](int32_t u) -> int64_t {
    int64_t c = cursor[u], end = ptr[u + 1];
    while (c < end && used[adj[c]]) ++c;
    cursor[u] = c;
    return c < end ? adj[c] : -1;
  };
  for (int64_t s = 0; s < n; ++s) {
    for (;;) {  // all degrees even: every walk is a circuit back to s
      int64_t e = next_edge(static_cast<int32_t>(s));
      if (e < 0) break;
      int32_t u = static_cast<int32_t>(s);
      while (e >= 0) {
        used[e] = 1;
        int32_t v = all[e].first == u ? all[e].second : all[e].first;
        asrc[e] = u;
        adst[e] = v;
        u = v;
        e = next_edge(u);
      }
    }
  }
  src->assign(asrc.begin(), asrc.begin() + m);
  dst->assign(adst.begin(), adst.begin() + m);
}

}  // namespace

extern "C" {

// Returns the number of slots used (== max(out-degree, in-degree) of the
// orientation, the Konig optimum), or -1 if k_out is insufficient.
int64_t newton3_half_list(const int32_t* idx, const uint8_t* mask, int64_t n,
                          int32_t k_in, int32_t k_out, int32_t* idx_out,
                          uint8_t* mask_out) {
  // collect undirected edges (deduplicated: keep i < j)
  std::vector<std::pair<int32_t, int32_t>> edges;
  edges.reserve(static_cast<size_t>(n) * k_in / 2);
  for (int64_t i = 0; i < n; ++i) {
    for (int32_t k = 0; k < k_in; ++k) {
      if (!mask[i * k_in + k]) continue;
      int32_t j = idx[i * k_in + k];
      if (i < j) edges.emplace_back(static_cast<int32_t>(i), j);
    }
  }
  const int64_t m = static_cast<int64_t>(edges.size());
  std::vector<int32_t> src, dst;
  euler_orient(edges, n, &src, &dst);

  std::vector<int32_t> out_deg(n, 0), in_deg(n, 0);
  for (int64_t e = 0; e < m; ++e) {
    ++out_deg[src[e]];
    ++in_deg[dst[e]];
  }
  int32_t delta = 1;
  for (int64_t i = 0; i < n; ++i)
    delta = std::max(delta, std::max(out_deg[i], in_deg[i]));
  if (delta > k_out) return -1;

  // Konig coloring. slot_out[i*delta + c] / slot_in[j*delta + c] hold the
  // edge id occupying slot c on that side, or -1.
  std::vector<int64_t> slot_out(static_cast<size_t>(n) * delta, -1);
  std::vector<int64_t> slot_in(static_cast<size_t>(n) * delta, -1);
  std::vector<int32_t> color(m, -1);
  std::vector<int64_t> chain;
  for (int64_t e = 0; e < m; ++e) {
    const int32_t u = src[e], v = dst[e];
    int64_t* su = &slot_out[static_cast<size_t>(u) * delta];
    int64_t* sv = &slot_in[static_cast<size_t>(v) * delta];
    int32_t c = -1, a = -1, b = -1;
    for (int32_t w = 0; w < delta; ++w) {
      const bool fu = su[w] < 0, fv = sv[w] < 0;
      if (fu && fv) {
        c = w;
        break;
      }
      if (a < 0 && fu) a = w;  // free at u, taken at v
      if (b < 0 && fv) b = w;  // free at v, taken at u
    }
    if (c < 0) {
      // walk the maximal a/b-alternating chain from v's a-in-edge, then
      // swap the two colors along it (Konig's theorem: the chain is a
      // simple path that never reaches slot a at u)
      chain.clear();
      int32_t node = v, col = a;
      bool side_in = true;
      for (;;) {
        const int64_t e2 =
            side_in ? slot_in[static_cast<size_t>(node) * delta + col]
                    : slot_out[static_cast<size_t>(node) * delta + col];
        if (e2 < 0) break;
        chain.push_back(e2);
        col = (col == a) ? b : a;
        node = side_in ? src[e2] : dst[e2];
        side_in = !side_in;
      }
      for (int64_t e2 : chain) {
        const int32_t old = color[e2];
        slot_out[static_cast<size_t>(src[e2]) * delta + old] = -1;
        slot_in[static_cast<size_t>(dst[e2]) * delta + old] = -1;
      }
      for (int64_t e2 : chain) {
        const int32_t nw = (color[e2] == a) ? b : a;
        color[e2] = nw;
        slot_out[static_cast<size_t>(src[e2]) * delta + nw] = e2;
        slot_in[static_cast<size_t>(dst[e2]) * delta + nw] = e2;
      }
      c = a;
      if (su[c] >= 0 || sv[c] >= 0) return -1;  // cannot happen (Konig)
    }
    color[e] = c;
    su[c] = e;
    sv[c] = e;
  }

  std::memset(idx_out, 0, sizeof(int32_t) * static_cast<size_t>(n) * k_out);
  std::memset(mask_out, 0, static_cast<size_t>(n) * k_out);
  for (int64_t e = 0; e < m; ++e) {
    idx_out[static_cast<size_t>(src[e]) * k_out + color[e]] = dst[e];
    mask_out[static_cast<size_t>(src[e]) * k_out + color[e]] = 1;
  }
  return delta;
}

}  // extern "C"
