// Transportation-problem network simplex — exact OT for GENERAL marginals.
//
// Role: host-side exact earth-mover's-distance engine matching the semantics
// of POT's `pot.emd(a, b, M)` (used by the reference at
// /root/reference/torchcfm/optimal_transport.py:87 and :286), which handles
// arbitrary marginal weights and rectangular cost matrices. The JV solver in
// lap.cc covers only the square/uniform case (where the plan is a
// permutation); this solver covers everything else: n != m, non-uniform
// a/b, zero-mass atoms.
//
// Algorithm: primal network simplex on the bipartite transportation graph
// (n supply nodes, m demand nodes, n*m arcs). Northwest-corner initial
// basis, dual recomputation by tree traversal, Dantzig-style entering-arc
// selection with a row-block candidate list, cycle pivots via parent
// pointers. Worst case exponential like all simplex variants, but on
// minibatch-sized dense instances (n, m <= 4096) it terminates in
// O((n+m) .. small multiple) pivots in practice.
//
// Exposed to Python through ctypes (cfm_tpu/ops/native.py: emd_solve).

#include <algorithm>
#include <cmath>
#include <cstddef>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

using std::vector;

constexpr double kInf = std::numeric_limits<double>::infinity();

// Basis arc: tree edge between supply node r (0..n-1) and demand node c
// (0..m-1) carrying `flow`.
struct Arc {
  int32_t r, c;
  double flow;
};

// Tree representation over nodes 0..n+m-1 (rows first, then cols offset by
// n). Rebuilt from the basis arc list each pivot — O(n+m), cheap relative to
// the O(nm) entering-arc scan.
class Basis {
 public:
  Basis(int n, int m) : n_(n), m_(m), head_(n + m, -1) {
    arcs_.reserve(n + m);  // n+m-1 basis arcs + 1 transient entering arc
    next_.reserve(2 * (n + m));
    to_.reserve(2 * (n + m));
    arc_id_.reserve(2 * (n + m));
  }

  int AddArc(int32_t r, int32_t c, double flow) {
    int id = static_cast<int>(arcs_.size());
    arcs_.push_back({r, c, flow});
    return id;
  }

  void RemoveArc(int id) {
    arcs_[id] = arcs_.back();
    arcs_.pop_back();
  }

  vector<Arc>& arcs() { return arcs_; }

  // Rebuild adjacency lists from the arc list.
  void RebuildAdjacency() {
    std::fill(head_.begin(), head_.end(), -1);
    next_.clear();
    to_.clear();
    arc_id_.clear();
    for (int id = 0; id < static_cast<int>(arcs_.size()); ++id) {
      const Arc& a = arcs_[id];
      AddHalfEdge(a.r, n_ + a.c, id);
      AddHalfEdge(n_ + a.c, a.r, id);
    }
  }

  // BFS from node 0: computes duals (u for rows, v for cols) with u[0] = 0,
  // and parent pointers (parent node + parent arc id) for cycle finding.
  void ComputeDualsAndParents(const double* cost, double* u, double* v,
                              int32_t* parent_node, int32_t* parent_arc) {
    int total = n_ + m_;
    visited_.assign(total, 0);
    queue_.clear();
    queue_.push_back(0);
    visited_[0] = 1;
    u[0] = 0.0;
    parent_node[0] = -1;
    parent_arc[0] = -1;
    for (size_t qi = 0; qi < queue_.size(); ++qi) {
      int node = queue_[qi];
      for (int e = head_[node]; e >= 0; e = next_[e]) {
        int nb = to_[e];
        if (visited_[nb]) continue;
        visited_[nb] = 1;
        parent_node[nb] = node;
        parent_arc[nb] = arc_id_[e];
        const Arc& a = arcs_[arc_id_[e]];
        double cij = cost[static_cast<size_t>(a.r) * m_ + a.c];
        if (nb >= n_) {
          v[nb - n_] = cij - u[node];  // node is the row side
        } else {
          u[nb] = cij - v[node - n_];  // node is the col side
        }
        queue_.push_back(nb);
      }
    }
  }

 private:
  void AddHalfEdge(int from, int to, int arc_id) {
    next_.push_back(head_[from]);
    to_.push_back(to);
    arc_id_.push_back(arc_id);
    head_[from] = static_cast<int>(next_.size()) - 1;
  }

  int n_, m_;
  vector<Arc> arcs_;
  vector<int> head_, next_, to_, arc_id_;
  vector<uint8_t> visited_;
  vector<int> queue_;
};

// Northwest-corner initial basic feasible solution. Produces exactly
// n + m - 1 basis arcs (adding zero-flow arcs on simultaneous exhaustion).
void NorthwestCorner(int n, int m, const double* a, const double* b,
                     Basis* basis) {
  vector<double> supply(a, a + n), demand(b, b + m);
  int i = 0, j = 0;
  while (i < n && j < m) {
    double f = std::min(supply[i], demand[j]);
    basis->AddArc(i, j, f);
    supply[i] -= f;
    demand[j] -= f;
    bool row_done = supply[i] <= 1e-15;
    bool col_done = demand[j] <= 1e-15;
    if (i == n - 1 && j == m - 1) break;
    if (row_done && col_done) {
      // Degenerate: advance one index only, keep the tree connected.
      if (i < n - 1) {
        ++i;
      } else {
        ++j;
      }
    } else if (row_done) {
      ++i;
    } else {
      ++j;
    }
  }
}

// One network-simplex solve. plan is n*m row-major output (caller-zeroed).
// Returns total transport cost, or -1.0 on non-convergence.
double SolveEmd(int n, int m, const double* a, const double* b,
                const double* cost, double* plan, int64_t max_pivots) {
  Basis basis(n, m);
  NorthwestCorner(n, m, a, b, &basis);

  int total_nodes = n + m;
  vector<double> u(n), v(m);
  vector<int32_t> parent_node(total_nodes), parent_arc(total_nodes);
  vector<int32_t> path_arcs;
  path_arcs.reserve(total_nodes);
  vector<int8_t> path_sign;
  path_sign.reserve(total_nodes);

  // Scale-aware tolerance for "negative reduced cost".
  double cmax = 0.0;
  for (size_t k = 0; k < static_cast<size_t>(n) * m; ++k)
    cmax = std::max(cmax, std::abs(cost[k]));
  const double tol = 1e-12 * std::max(1.0, cmax);

  if (max_pivots <= 0)
    max_pivots = 256LL * (static_cast<int64_t>(n) + m) + 1000000LL;

  // Block-search pricing state: block ~ sqrt(#arcs), circular scan cursor.
  const size_t num_arcs_total = static_cast<size_t>(n) * m;
  size_t block_size = std::max<size_t>(
      64, static_cast<size_t>(std::sqrt(static_cast<double>(num_arcs_total))));
  size_t scan_pos_ = 0;

  for (int64_t pivot = 0;; ++pivot) {
    if (pivot >= max_pivots) return -1.0;
    basis.RebuildAdjacency();
    basis.ComputeDualsAndParents(cost, u.data(), v.data(), parent_node.data(),
                                 parent_arc.data());

    // Entering arc: block-search pricing (LEMON-style). Scan blocks of the
    // row-major arc list circularly from where the last scan stopped; take
    // the most negative reduced cost found in the first block containing
    // one. Only a full wrap-around with no candidate proves optimality.
    double best = -tol;
    int32_t er = -1, ec = -1;
    {
      const size_t num_arcs = static_cast<size_t>(n) * m;
      size_t scanned_total = 0;
      while (scanned_total < num_arcs) {
        size_t block_end = std::min(scan_pos_ + block_size, num_arcs);
        for (size_t k = scan_pos_; k < block_end; ++k) {
          int32_t i = static_cast<int32_t>(k / m);
          int32_t j = static_cast<int32_t>(k % m);
          double red = cost[k] - u[i] - v[j];
          if (red < best) {
            best = red;
            er = i;
            ec = j;
          }
        }
        scanned_total += block_end - scan_pos_;
        scan_pos_ = block_end == num_arcs ? 0 : block_end;
        if (er >= 0) break;
      }
    }
    if (er < 0) break;  // optimal

    // Cycle: tree path from row er to col ec, plus the entering arc.
    // Walk both endpoints to the root, recording arcs; the cycle is the
    // symmetric difference. Simpler: collect root paths, trim the common
    // suffix.
    static thread_local vector<int32_t> path_a, path_b;  // arc ids
    static thread_local vector<int32_t> nodes_a, nodes_b;
    path_a.clear(); path_b.clear(); nodes_a.clear(); nodes_b.clear();
    for (int node = er; node != -1; node = parent_node[node]) {
      nodes_a.push_back(node);
      if (parent_arc[node] >= 0) path_a.push_back(parent_arc[node]);
    }
    for (int node = n + ec; node != -1; node = parent_node[node]) {
      nodes_b.push_back(node);
      if (parent_arc[node] >= 0) path_b.push_back(parent_arc[node]);
    }
    // Trim common tail (shared ancestors up to the root).
    while (nodes_a.size() > 1 && nodes_b.size() > 1 &&
           nodes_a[nodes_a.size() - 1] == nodes_b[nodes_b.size() - 1] &&
           nodes_a[nodes_a.size() - 2] == nodes_b[nodes_b.size() - 2]) {
      nodes_a.pop_back();
      nodes_b.pop_back();
      path_a.pop_back();
      path_b.pop_back();
    }

    // Orientation: traversing from er along path_a to the junction, then
    // back along path_b to ec, alternating signs starting with + on the
    // entering arc (er, ec). An arc at even position along the cycle from
    // the entering arc gets +, odd gets -. Walking from er: the first tree
    // arc on path_a is adjacent to er, so it alternates starting with -.
    path_arcs.clear();
    path_sign.clear();
    {
      int8_t s = -1;
      for (int32_t id : path_a) {
        path_arcs.push_back(id);
        path_sign.push_back(s);
        s = static_cast<int8_t>(-s);
      }
      // path_b traversed from ec upward also alternates starting with -.
      s = -1;
      for (int32_t id : path_b) {
        path_arcs.push_back(id);
        path_sign.push_back(s);
        s = static_cast<int8_t>(-s);
      }
    }

    // Leaving arc: min flow among arcs with sign -1.
    double theta = kInf;
    int leave_pos = -1;
    vector<Arc>& arcs = basis.arcs();
    for (size_t k = 0; k < path_arcs.size(); ++k) {
      if (path_sign[k] < 0) {
        double f = arcs[path_arcs[k]].flow;
        if (f < theta - 1e-18) {
          theta = f;
          leave_pos = static_cast<int>(k);
        }
      }
    }
    if (leave_pos < 0) return -1.0;  // should not happen on a tree cycle

    // Apply flow change.
    for (size_t k = 0; k < path_arcs.size(); ++k) {
      arcs[path_arcs[k]].flow += path_sign[k] * theta;
    }
    int32_t leaving_id = path_arcs[leave_pos];
    arcs[leaving_id] = {er, ec, theta};  // replace leaving arc with entering
  }

  double total = 0.0;
  for (const Arc& arc : basis.arcs()) {
    if (arc.flow > 0.0) {
      plan[static_cast<size_t>(arc.r) * m + arc.c] = arc.flow;
      total += arc.flow * cost[static_cast<size_t>(arc.r) * m + arc.c];
    }
  }
  return total;
}

}  // namespace

extern "C" {

// Exact OT plan for general marginals. a: (n,), b: (m,), cost: (n, m)
// row-major, plan: (n, m) output (zero-filled here). Requires
// sum(a) == sum(b) up to rounding (caller normalizes). Returns total cost,
// or -1.0 if the pivot cap was hit (caller should fall back).
double cfm_emd_solve(int32_t n, int32_t m, const double* a, const double* b,
                     const double* cost, double* plan, int64_t max_pivots) {
  std::memset(plan, 0, sizeof(double) * static_cast<size_t>(n) * m);
  if (n <= 0 || m <= 0) return 0.0;
  if (n == 1) {
    double total = 0.0;
    for (int j = 0; j < m; ++j) {
      plan[j] = b[j];
      total += b[j] * cost[j];
    }
    return total;
  }
  if (m == 1) {
    double total = 0.0;
    for (int i = 0; i < n; ++i) {
      plan[i] = a[i];
      total += a[i] * cost[i];
    }
    return total;
  }
  return SolveEmd(n, m, a, b, cost, plan, max_pivots);
}

}  // extern "C"
