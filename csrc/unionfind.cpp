// Union-find decoder (Delfosse–Nickerson style, full-edge growth + peeling).
//
// The reference compares its GNN decoder against a classical matching
// baseline [SURVEY.md §1 L4 "MWPM/baseline comparison"]; this provides the
// standard near-MWPM union-find baseline as a batched native routine.
//
// Decoding-graph model (one CSS sector): vertices are stabilizer checks,
// edges are data qubits.  Each qubit touches 1 or 2 checks of the sector;
// weight-1 qubits are boundary edges (edge_v = -1).  A correction is a set
// of edges whose vertex parities reproduce the syndrome.
//
// Algorithm per sample:
//   1. grow:  clusters around defect vertices grow by whole edges until
//      every cluster has even defect parity or touches the boundary
//      (union-find with parity + boundary flags).
//   2. forest: spanning forest of grown edges inside each cluster.
//   3. peel:  remove leaves; a leaf carrying a defect flips its edge into
//      the correction and hands the defect to its neighbor.  Boundary
//      vertices absorb leftover parity.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct DSU {
  std::vector<int32_t> parent, rank_;
  std::vector<uint8_t> parity;    // defect count mod 2 in the component
  std::vector<uint8_t> boundary;  // component touches the virtual boundary

  void init(int n) {
    parent.resize(n);
    rank_.assign(n, 0);
    parity.assign(n, 0);
    boundary.assign(n, 0);
    for (int i = 0; i < n; ++i) parent[i] = i;
  }
  int find(int x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  }
  // returns new root
  int unite(int a, int b) {
    a = find(a);
    b = find(b);
    if (a == b) return a;
    if (rank_[a] < rank_[b]) std::swap(a, b);
    parent[b] = a;
    parity[a] ^= parity[b];
    boundary[a] |= boundary[b];
    if (rank_[a] == rank_[b]) ++rank_[a];
    return a;
  }
  bool odd(int x) {
    int r = find(x);
    return parity[r] && !boundary[r];
  }
};

}  // namespace

extern "C" {

// edge_u/edge_v: int32[E] endpoints (edge_v == -1 for boundary edges).
// syndromes: uint8[batch, V]; corrections out: uint8[batch, E].
// Returns 0 on success, -1 on failure (growth did not converge).
int uf_decode_batch(const int32_t* edge_u, const int32_t* edge_v, int E, int V,
                    const uint8_t* syndromes, int batch, uint8_t* corrections) {
  DSU dsu;
  std::vector<uint8_t> grown(E);
  std::vector<uint8_t> in_forest(E);
  std::vector<uint8_t> defect(V);
  std::vector<int32_t> deg(V);
  // forest adjacency: per vertex list of (edge, other endpoint)
  std::vector<std::vector<std::pair<int32_t, int32_t>>> adj(V);
  std::vector<int32_t> stack;

  for (int s = 0; s < batch; ++s) {
    const uint8_t* syn = syndromes + (size_t)s * V;
    uint8_t* cor = corrections + (size_t)s * E;
    std::memset(cor, 0, E);

    dsu.init(V);
    std::fill(grown.begin(), grown.end(), 0);
    for (int v = 0; v < V; ++v) {
      defect[v] = syn[v] & 1;
      dsu.parity[v] = defect[v];
    }

    // --- growth ---------------------------------------------------------
    // smallest-cluster-first HALF-edge growth (Delfosse-Nickerson): grow
    // the smallest odd cluster's boundary edges by +1; an edge joins at
    // growth >= 2.  This recovers the sub-threshold scaling on 3-D
    // spacetime detector graphs that full-edge growth loses.
    std::vector<int8_t> growth(E, 0);
    std::vector<std::vector<int32_t>> members(V);
    std::vector<std::vector<int32_t>> vadj(V);
    for (int v = 0; v < V; ++v) members[v] = {v};
    for (int e = 0; e < E; ++e) {
      if (edge_u[e] < 0) continue;  // detached edge (no checks in sector)
      vadj[edge_u[e]].push_back(e);
      if (edge_v[e] >= 0) vadj[edge_v[e]].push_back(e);
    }
    std::vector<int32_t> newly;
    long guard = 0;
    const long guard_max = 4L * E + 2L * V + 4;
    while (true) {
      // smallest odd root
      int best = -1;
      size_t best_size = 0;
      for (int v = 0; v < V; ++v) {
        if (dsu.parent[v] != v || !dsu.parity[v] || dsu.boundary[v]) continue;
        size_t sz = members[v].size();
        if (best < 0 || sz < best_size) { best = v; best_size = sz; }
      }
      if (best < 0) break;
      if (++guard > guard_max) return -1;
      newly.clear();
      for (int32_t v : members[best]) {
        for (int32_t e : vadj[v]) {
          if (grown[e]) continue;
          if (++growth[e] >= 2) {
            grown[e] = 1;
            newly.push_back(e);
          }
        }
      }
      for (int32_t e : newly) {
        int u = edge_u[e], v = edge_v[e];
        if (v >= 0) {
          int ru = dsu.find(u), rv = dsu.find(v);
          if (ru != rv) {
            int nr = dsu.unite(u, v);
            int other = (nr == ru) ? rv : ru;
            auto& dst = members[nr];
            auto& src = members[other];
            dst.insert(dst.end(), src.begin(), src.end());
            src.clear();
            src.shrink_to_fit();
          }
        } else {
          dsu.boundary[dsu.find(u)] = 1;
        }
      }
    }

    // --- spanning forest of grown edges ---------------------------------
    // boundary edges never create cycles across the virtual vertex if we
    // allow at most one boundary edge per component: track via a fresh DSU.
    DSU forest;
    forest.init(V + 1);  // V = virtual boundary vertex
    for (int v = 0; v < V; ++v) adj[v].clear();
    std::fill(in_forest.begin(), in_forest.end(), 0);
    std::fill(deg.begin(), deg.end(), 0);
    for (int e = 0; e < E; ++e) {
      if (!grown[e] || edge_u[e] < 0) continue;
      int u = edge_u[e];
      int v = edge_v[e] >= 0 ? edge_v[e] : V;
      if (forest.find(u) == forest.find(v)) continue;  // cycle
      forest.unite(u, v);
      in_forest[e] = 1;
      adj[u].push_back({e, edge_v[e]});
      if (edge_v[e] >= 0) adj[edge_v[e]].push_back({e, u});
      ++deg[u];
      if (edge_v[e] >= 0) ++deg[edge_v[e]];
    }

    // --- peeling ---------------------------------------------------------
    // repeatedly remove degree-1 vertices; boundary endpoint (-1) counts as
    // root and is never peeled.
    stack.clear();
    for (int v = 0; v < V; ++v)
      if (deg[v] == 1) stack.push_back(v);
    while (!stack.empty()) {
      int leaf = stack.back();
      stack.pop_back();
      if (deg[leaf] != 1) continue;
      // find its single live forest edge
      int edge = -1, other = -2;
      for (auto& pr : adj[leaf]) {
        if (in_forest[pr.first]) {
          edge = pr.first;
          other = pr.second;
          break;
        }
      }
      if (edge < 0) continue;
      in_forest[edge] = 0;
      --deg[leaf];
      if (other >= 0) --deg[other];
      if (defect[leaf]) {
        cor[edge] = 1;
        defect[leaf] = 0;
        if (other >= 0) defect[other] ^= 1;
        // other == -1: boundary absorbs the defect
      }
      if (other >= 0 && deg[other] == 1) stack.push_back(other);
    }
  }
  return 0;
}

}  // extern "C"
