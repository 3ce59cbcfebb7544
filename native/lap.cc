// Dense linear-assignment solver (Jonker–Volgenant) — the framework's native
// host-side exact-OT engine.
//
// Role: TPU-native replacement for the C++ solvers the reference reaches
// through Python packages — POT's network-simplex `pot.emd` (used at
// /root/reference/torchcfm/optimal_transport.py:49,87) and scipy's Hungarian
// `linear_sum_assignment` (:179). For uniform equal-size minibatch marginals
// (the only case the reference's training path exercises) the exact OT plan
// is a permutation, so a dense LAP solve IS the exact EMD solve.
//
// The on-device auction kernel (cfm_tpu/ops/assignment.py) is the production
// path inside jitted train steps; this native solver is the host fallback and
// correctness oracle, exposed to Python via ctypes (cfm_tpu/ops/native.py).
//
// Algorithm: Jonker & Volgenant (1987): column reduction, augmenting row
// reduction, then shortest augmenting paths with Dijkstra. O(n^3) worst case,
// very fast in practice on minibatch-sized (n <= 4096) matrices.

#include <cstddef>
#include <cstdint>
#include <limits>
#include <vector>

namespace {

using std::vector;

constexpr double kInf = std::numeric_limits<double>::infinity();

// Solves min sum_i cost[i, rowsol[i]] over permutations. cost is row-major
// n x n. Returns the optimal total cost; fills rowsol (row -> col).
double lapjv(int n, const double* cost, int32_t* rowsol) {
  vector<int32_t> colsol(n, -1);
  vector<double> u(n, 0.0), v(n, 0.0);
  vector<int32_t> free_rows;
  free_rows.reserve(n);

  // --- Column reduction (scan columns backwards, greedy assign to min row).
  {
    vector<int32_t> matches(n, 0);
    for (int j = n - 1; j >= 0; --j) {
      double min_val = cost[0 * n + j];
      int32_t imin = 0;
      for (int i = 1; i < n; ++i) {
        double c = cost[i * n + j];
        if (c < min_val) {
          min_val = c;
          imin = i;
        }
      }
      v[j] = min_val;
      if (matches[imin]++ == 0) {
        rowsol[imin] = j;
        colsol[j] = imin;
      }
    }
    for (int i = 0; i < n; ++i) {
      if (matches[i] == 0) {
        rowsol[i] = -1;
        free_rows.push_back(i);
      } else if (matches[i] > 1) {
        // Row assigned multiple times during scan keeps only its last match.
      }
    }
  }

  // --- Augmenting row reduction (two passes).
  for (int pass = 0; pass < 2 && !free_rows.empty(); ++pass) {
    vector<int32_t> new_free;
    new_free.reserve(free_rows.size());
    for (int32_t i : free_rows) {
      // Find smallest and second-smallest reduced cost of row i.
      double umin = kInf, usubmin = kInf;
      int32_t j1 = -1, j2 = -1;
      for (int j = 0; j < n; ++j) {
        double h = cost[i * n + j] - v[j];
        if (h < usubmin) {
          if (h < umin) {
            usubmin = umin;
            j2 = j1;
            umin = h;
            j1 = j;
          } else {
            usubmin = h;
            j2 = j;
          }
        }
      }
      int32_t i0 = colsol[j1];
      if (umin < usubmin) {
        v[j1] -= usubmin - umin;
      } else if (i0 >= 0 && j2 >= 0) {
        j1 = j2;
        i0 = colsol[j2];
      }
      rowsol[i] = j1;
      colsol[j1] = i;
      if (i0 >= 0) {
        if (umin < usubmin) {
          // i0 goes to the head for immediate re-processing.
          new_free.insert(new_free.begin(), i0);
        } else {
          new_free.push_back(i0);
        }
        rowsol[i0] = -1;
      }
    }
    free_rows.swap(new_free);
  }

  // --- Shortest augmenting paths for remaining free rows.
  vector<double> d(n);
  vector<int32_t> pred(n);
  vector<uint8_t> done(n);
  vector<int32_t> scanned;
  scanned.reserve(n);
  for (int32_t f : free_rows) {
    for (int j = 0; j < n; ++j) {
      d[j] = cost[f * n + j] - v[j];
      pred[j] = f;
      done[j] = 0;
    }
    scanned.clear();
    int32_t endj = -1;
    double mind = 0.0;
    while (endj < 0) {
      // Find unscanned column with minimal d.
      mind = kInf;
      int32_t jmin = -1;
      for (int j = 0; j < n; ++j) {
        if (!done[j] && d[j] < mind) {
          mind = d[j];
          jmin = j;
        }
      }
      done[jmin] = 1;
      scanned.push_back(jmin);
      int32_t irow = colsol[jmin];
      if (irow < 0) {
        endj = jmin;
        break;
      }
      // Relax through irow.
      double h = cost[irow * n + jmin] - v[jmin] - mind;
      for (int j = 0; j < n; ++j) {
        if (!done[j]) {
          double nd = cost[irow * n + j] - v[j] - h;
          if (nd < d[j]) {
            d[j] = nd;
            pred[j] = irow;
          }
        }
      }
    }
    // Price update for scanned columns.
    for (int32_t j : scanned) {
      if (j != endj) v[j] += d[j] - mind;
    }
    // Augment along the alternating path.
    int32_t j = endj;
    while (true) {
      int32_t i = pred[j];
      colsol[j] = i;
      int32_t tmp = rowsol[i];
      rowsol[i] = j;
      if (i == f) break;
      j = tmp;
    }
  }

  double total = 0.0;
  for (int i = 0; i < n; ++i) {
    u[i] = cost[i * n + rowsol[i]] - v[rowsol[i]];
    total += cost[i * n + rowsol[i]];
  }
  return total;
}

}  // namespace

extern "C" {

// rowsol must have space for n int32. Returns total assignment cost.
double cfm_lap_solve(int32_t n, const double* cost, int32_t* rowsol) {
  if (n <= 0) return 0.0;
  if (n == 1) {
    rowsol[0] = 0;
    return cost[0];
  }
  return lapjv(n, cost, rowsol);
}

// Batched variant: costs is (b, n, n) row-major, rowsols is (b, n).
void cfm_lap_solve_batch(int32_t b, int32_t n, const double* costs,
                         int32_t* rowsols, double* totals) {
#pragma omp parallel for schedule(dynamic)
  for (int32_t k = 0; k < b; ++k) {
    totals[k] = cfm_lap_solve(n, costs + (size_t)k * n * n,
                              rowsols + (size_t)k * n);
  }
}

}  // extern "C"
