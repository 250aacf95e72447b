// Exact minimum-weight perfect matching (MWPM) decoder core.
//
// The reference evaluates its GNN against MWPM [SURVEY.md §2.1 C6
// "typically compared against MWPM"; §1 L4 "MWPM/baseline comparison"].
// This file provides the host-side exact matcher the TPU build uses for
// that comparison column:
//
//   * mwpm_match       — maximum-weight matching on a dense general graph
//                        (Galil's O(V^3) blossom with dual variables).
//                        Exposed raw so tests can diff it against a
//                        brute-force oracle on small instances.
//   * mwpm_decode_batch— per-shot decoding-graph MWPM: defects are paired
//                        (or matched to the open boundary via the standard
//                        virtual-partner construction) with weights taken
//                        from precomputed geodesic distances; matched pairs
//                        XOR their shortest-path edges into the correction.
//
// Minimisation is encoded as maximisation of (B - cost) with
// B > n * max_cost so that cardinality strictly dominates: the maximum
// weight matching is then a maximum-cardinality (perfect, when one
// exists) matching of minimum total cost.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <deque>
#include <vector>

namespace {

typedef long long ll;
const ll KINF = (ll)1e18;

// O(V^3) maximum-weight general matching, dual/blossom formulation.
// Vertices are 1-based; b > n are blossom ids (at most n/2 live at once,
// capacity 2n is safe).  Weights are doubled internally so dual labels
// stay integral.
struct Blossom {
  struct E {
    int u, v;
    ll w;
  };
  int n, n_x, cap;
  std::vector<std::vector<E>> g;
  std::vector<ll> lab;
  std::vector<int> match, slack, st, pa, S, vis;
  std::vector<std::vector<int>> from, flower;
  std::deque<int> q;
  int lca_t = 0;

  explicit Blossom(int n_) : n(n_) {
    cap = 2 * n + 3;
    g.assign(cap, std::vector<E>(cap));
    lab.assign(cap, 0);
    match.assign(cap, 0);
    slack.assign(cap, 0);
    st.assign(cap, 0);
    pa.assign(cap, 0);
    S.assign(cap, 0);
    vis.assign(cap, 0);
    from.assign(cap, std::vector<int>(n + 1, 0));
    flower.assign(cap, {});
    for (int u = 0; u < cap; ++u)
      for (int v = 0; v < cap; ++v) g[u][v] = {u, v, 0};
  }

  void add_edge(int u, int v, ll w) { g[u][v].w = g[v][u].w = w; }

  ll e_delta(const E& e) const { return lab[e.u] + lab[e.v] - g[e.u][e.v].w * 2; }

  void update_slack(int u, int x) {
    if (!slack[x] || e_delta(g[u][x]) < e_delta(g[slack[x]][x])) slack[x] = u;
  }

  void set_slack(int x) {
    slack[x] = 0;
    for (int u = 1; u <= n; ++u)
      if (g[u][x].w > 0 && st[u] != x && S[st[u]] == 0) update_slack(u, x);
  }

  void q_push(int x) {
    if (x <= n) {
      q.push_back(x);
    } else {
      for (int i : flower[x]) q_push(i);
    }
  }

  void set_st(int x, int b) {
    st[x] = b;
    if (x > n)
      for (int i : flower[x]) set_st(i, b);
  }

  int get_pr(int b, int xr) {
    int pr = (int)(std::find(flower[b].begin(), flower[b].end(), xr) -
                   flower[b].begin());
    if (pr % 2 == 1) {  // odd position: flip the cycle so the path is even
      std::reverse(flower[b].begin() + 1, flower[b].end());
      return (int)flower[b].size() - pr;
    }
    return pr;
  }

  void set_match(int u, int v) {
    match[u] = g[u][v].v;
    if (u > n) {
      E e = g[u][v];
      int xr = from[u][e.u];
      int pr = get_pr(u, xr);
      for (int i = 0; i < pr; ++i) set_match(flower[u][i], flower[u][i ^ 1]);
      set_match(xr, v);
      std::rotate(flower[u].begin(), flower[u].begin() + pr, flower[u].end());
    }
  }

  void augment(int u, int v) {
    for (;;) {
      int xnv = st[match[u]];
      set_match(u, v);
      if (!xnv) return;
      set_match(xnv, st[pa[xnv]]);
      u = st[pa[xnv]];
      v = xnv;
    }
  }

  int get_lca(int u, int v) {
    for (++lca_t; u || v; std::swap(u, v)) {
      if (u == 0) continue;
      if (vis[u] == lca_t) return u;
      vis[u] = lca_t;
      u = st[match[u]];
      if (u) u = st[pa[u]];
    }
    return 0;
  }

  void add_blossom(int u, int lca, int v) {
    int b = n + 1;
    while (b <= n_x && st[b]) ++b;
    if (b > n_x) ++n_x;
    lab[b] = 0;
    S[b] = 0;
    match[b] = match[lca];
    flower[b].clear();
    flower[b].push_back(lca);
    for (int x = u, y; x != lca; x = st[pa[y]]) {
      flower[b].push_back(x);
      flower[b].push_back(y = st[match[x]]);
      q_push(y);
    }
    std::reverse(flower[b].begin() + 1, flower[b].end());
    for (int x = v, y; x != lca; x = st[pa[y]]) {
      flower[b].push_back(x);
      flower[b].push_back(y = st[match[x]]);
      q_push(y);
    }
    set_st(b, b);
    for (int x = 1; x <= n_x; ++x) g[b][x].w = g[x][b].w = 0;
    for (int x = 1; x <= n; ++x) from[b][x] = 0;
    for (int xs : flower[b]) {
      for (int x = 1; x <= n_x; ++x)
        if (g[b][x].w == 0 || e_delta(g[xs][x]) < e_delta(g[b][x])) {
          g[b][x] = g[xs][x];
          g[x][b] = g[x][xs];
        }
      for (int x = 1; x <= n; ++x)
        if (from[xs][x]) from[b][x] = xs;
    }
    set_slack(b);
  }

  void expand_blossom(int b) {
    for (int i : flower[b]) set_st(i, i);
    int xr = from[b][g[b][pa[b]].u];
    int pr = get_pr(b, xr);
    for (int i = 0; i < pr; i += 2) {
      int xs = flower[b][i], xns = flower[b][i + 1];
      pa[xs] = g[xns][xs].u;
      S[xs] = 1;
      S[xns] = 0;
      slack[xs] = 0;
      set_slack(xns);
      q_push(xns);
    }
    S[xr] = 1;
    pa[xr] = pa[b];
    for (int i = pr + 1; i < (int)flower[b].size(); ++i) {
      int xs = flower[b][i];
      S[xs] = -1;
      set_slack(xs);
    }
    st[b] = 0;
  }

  bool on_found_edge(const E& e) {
    int u = st[e.u], v = st[e.v];
    if (S[v] == -1) {
      pa[v] = e.u;
      S[v] = 1;
      int nu = st[match[v]];
      slack[v] = slack[nu] = 0;
      S[nu] = 0;
      q_push(nu);
    } else if (S[v] == 0) {
      int lca = get_lca(u, v);
      if (!lca) {
        augment(u, v);
        augment(v, u);
        return true;
      }
      add_blossom(u, lca, v);
    }
    return false;
  }

  bool matching() {
    std::fill(S.begin(), S.begin() + n_x + 1, -1);
    std::fill(slack.begin(), slack.begin() + n_x + 1, 0);
    q.clear();
    for (int x = 1; x <= n_x; ++x)
      if (st[x] == x && !match[x]) {
        pa[x] = 0;
        S[x] = 0;
        q_push(x);
      }
    if (q.empty()) return false;
    for (;;) {
      while (!q.empty()) {
        int u = q.front();
        q.pop_front();
        if (S[st[u]] == 1) continue;
        for (int v = 1; v <= n; ++v)
          if (g[u][v].w > 0 && st[u] != st[v]) {
            if (e_delta(g[u][v]) == 0) {
              if (on_found_edge(g[u][v])) return true;
            } else {
              update_slack(u, st[v]);
            }
          }
      }
      ll d = KINF;
      for (int b = n + 1; b <= n_x; ++b)
        if (st[b] == b && S[b] == 1) d = std::min(d, lab[b] / 2);
      for (int x = 1; x <= n_x; ++x)
        if (st[x] == x && slack[x]) {
          if (S[x] == -1)
            d = std::min(d, e_delta(g[slack[x]][x]));
          else if (S[x] == 0)
            d = std::min(d, e_delta(g[slack[x]][x]) / 2);
        }
      for (int u = 1; u <= n; ++u) {
        if (S[st[u]] == 0) {
          if (lab[u] <= d) return false;  // a free exposed vertex hit 0
          lab[u] -= d;
        } else if (S[st[u]] == 1) {
          lab[u] += d;
        }
      }
      for (int b = n + 1; b <= n_x; ++b)
        if (st[b] == b) {
          if (S[b] == 0)
            lab[b] += d * 2;
          else if (S[b] == 1)
            lab[b] -= d * 2;
        }
      q.clear();
      for (int x = 1; x <= n_x; ++x)
        if (st[x] == x && slack[x] && st[slack[x]] != x &&
            e_delta(g[slack[x]][x]) == 0)
          if (on_found_edge(g[slack[x]][x])) return true;
      for (int b = n + 1; b <= n_x; ++b)
        if (st[b] == b && S[b] == 1 && lab[b] == 0) expand_blossom(b);
    }
  }

  // Runs the solver; match[1..n] holds partners (0 = unmatched).
  ll solve() {
    std::fill(match.begin(), match.end(), 0);
    n_x = n;
    for (int u = 0; u <= n; ++u) {
      st[u] = u;
      flower[u].clear();
    }
    ll w_max = 0;
    for (int u = 1; u <= n; ++u)
      for (int v = 1; v <= n; ++v) {
        from[u][v] = (u == v ? u : 0);
        w_max = std::max(w_max, g[u][v].w);
      }
    for (int u = 1; u <= n; ++u) lab[u] = w_max;
    while (matching()) {
    }
    ll tot = 0;
    for (int u = 1; u <= n; ++u)
      if (match[u] && match[u] < u) tot += g[u][match[u]].w;
    return tot;
  }
};

}  // namespace

extern "C" {

// Maximum-weight matching on a dense graph.  w is [n*n] row-major; entries
// <= 0 mean "no edge" (the solver only uses strictly positive weights).
// mate[i] = partner of i, or -1 if unmatched.  Returns the total matched
// weight (>= 0), or -1 on bad input.
long long mwpm_match(const long long* w, int n, int32_t* mate) {
  if (n < 0 || (n > 0 && (!w || !mate))) return -1;
  if (n == 0) return 0;
  Blossom bl(n);
  for (int u = 0; u < n; ++u)
    for (int v = u + 1; v < n; ++v) {
      ll wv = std::max(w[(size_t)u * n + v], w[(size_t)v * n + u]);
      if (wv > 0) bl.add_edge(u + 1, v + 1, wv);
    }
  ll tot = bl.solve();
  for (int u = 0; u < n; ++u) mate[u] = bl.match[u + 1] ? bl.match[u + 1] - 1 : -1;
  return tot;
}

// Batched decoding-graph MWPM.
//
//   dist     [(nv+1)*(nv+1)] int64 geodesic costs between decoding-graph
//            vertices; index nv is the open boundary (virtual vertex).
//            Entries >= inf_sentinel mean unreachable.
//   par_v    [(nv+1)*(nv+1)] int32: par_v[u*(nv+1)+t] = predecessor of t in
//            the shortest-path tree rooted at u (-1 at the root/unreached).
//   par_e    same shape: decoding-graph edge id connecting t to par_v.
//   has_boundary  nonzero when the code has an open boundary (dist[.,nv]
//            meaningful); zero for closed (toric) codes.
//   syndromes [batch, nv] uint8; out [batch, n_edges] uint8 (written).
//
// Returns 0 on success; -1 on bad input; -2 if some shot has an odd defect
// count with no boundary; -3 if a required pair is unreachable.
int mwpm_decode_batch(const int64_t* dist, const int32_t* par_v,
                      const int32_t* par_e, int nv, int n_edges,
                      int has_boundary, int64_t inf_sentinel,
                      const uint8_t* syndromes, int batch, uint8_t* out) {
  if (!dist || !par_v || !par_e || nv <= 0 || n_edges < 0 || batch < 0 ||
      (batch > 0 && (!syndromes || !out)))
    return -1;
  const int stride = nv + 1;
  std::vector<int> defects;
  defects.reserve(nv);
  std::memset(out, 0, (size_t)batch * n_edges);

  // XOR the geodesic u -> t into the correction row.
  auto xor_path = [&](uint8_t* row, int u, int t) -> bool {
    int guard = stride + 1;
    while (t != u) {
      if (--guard < 0) return false;
      int e = par_e[(size_t)u * stride + t];
      int p = par_v[(size_t)u * stride + t];
      if (e < 0 || e >= n_edges || p < 0) return false;
      row[e] ^= 1;
      t = p;
    }
    return true;
  };

  for (int b = 0; b < batch; ++b) {
    const uint8_t* syn = syndromes + (size_t)b * nv;
    uint8_t* row = out + (size_t)b * n_edges;
    defects.clear();
    for (int v = 0; v < nv; ++v)
      if (syn[v]) defects.push_back(v);
    const int k = (int)defects.size();
    if (k == 0) continue;
    if (!has_boundary && (k % 2)) return -2;

    // Node layout: 0..k-1 = defects; with a boundary, k..2k-1 = each
    // defect's virtual boundary partner (partner-partner edges cost 0).
    const int n = has_boundary ? 2 * k : k;
    ll cmax = 1;
    for (int i = 0; i < k; ++i) {
      for (int j = i + 1; j < k; ++j) {
        ll c = dist[(size_t)defects[i] * stride + defects[j]];
        if (c < inf_sentinel) cmax = std::max(cmax, c);
      }
      if (has_boundary) {
        ll c = dist[(size_t)defects[i] * stride + nv];
        if (c < inf_sentinel) cmax = std::max(cmax, c);
      }
    }
    // B > n * cmax makes cardinality strictly dominate cost.
    const ll B = cmax * (ll)(n + 1) + 1;
    Blossom bl(n);
    for (int i = 0; i < k; ++i) {
      for (int j = i + 1; j < k; ++j) {
        ll c = dist[(size_t)defects[i] * stride + defects[j]];
        if (c < inf_sentinel) bl.add_edge(i + 1, j + 1, B - c);
      }
      if (has_boundary) {
        ll c = dist[(size_t)defects[i] * stride + nv];
        if (c < inf_sentinel) bl.add_edge(i + 1, k + i + 1, B - c);
        for (int j = i + 1; j < k; ++j) bl.add_edge(k + i + 1, k + j + 1, B);
      }
    }
    bl.solve();
    for (int i = 0; i < k; ++i) {
      int m = bl.match[i + 1] - 1;  // 0-based partner
      if (m < 0) return -3;         // no perfect matching: disconnected pair
      if (m < k) {
        if (m > i && !xor_path(row, defects[i], defects[m])) return -3;
      } else {
        if (!xor_path(row, defects[i], nv)) return -3;
      }
    }
  }
  return 0;
}

}  // extern "C"
