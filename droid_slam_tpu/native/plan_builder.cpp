// Host-side native runtime for the TPU SLAM pipeline.
//
// The reference keeps its host-side graph/solver bookkeeping in C++ —
// the CSR construction of accum_cuda (/root/reference/src/droid_kernels.cu:957-995)
// and the Schur pair-list build of schur_block (:1253-1281). This library is
// their counterpart for the XLA design: it builds the static-shape BA index
// plan (Schur row grouping per depth frame) and runs the greedy NMS proximity
// edge proposer (factor_graph.py:346-412), both of which sit on the frame
// critical path between device dispatches.
//
// Exposed via a plain C ABI and loaded with ctypes (no pybind11 dependency).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Build the Schur row grouping for the windowed BA.
//
// Inputs:
//   ii, jj        : edge endpoint frame ids, length n_edges
//   n_edges, t0, t1, g0 : window parameters (depth window starts at g0)
//   NW, E, RMAX_CAP     : bucket sizes (row table is [NW + E] rows)
// Outputs (caller-allocated):
//   row_pose [NW+E]  : solve-local pose per Schur row, -1 when outside window
//   row_depth [NW+E] : window-local depth frame per row
//   k_valid [NW]     : 1 when the window frame is a depth variable
//   rk_idx [NW*RMAX_CAP] : row ids grouped by depth frame, -1 padded
// Returns the max rows in any depth group (<= RMAX_CAP needed), or -1 if
// RMAX_CAP was too small.
int build_ba_rows(const int64_t* ii, const int64_t* jj, int n_edges,
                  int t0, int t1, int g0, int NW, int E, int RMAX_CAP,
                  int32_t* row_pose, int32_t* row_depth, uint8_t* k_valid,
                  int32_t* rk_idx) {
  const int NR = NW + E;
  for (int r = 0; r < NR; r++) {
    row_pose[r] = -1;
    row_depth[r] = 0;
  }
  std::memset(k_valid, 0, NW);
  std::fill(rk_idx, rk_idx + (int64_t)NW * RMAX_CAP, -1);

  // depth variables: kx = unique(ii ∪ [t0,t1))
  for (int f = t0; f < t1; f++) {
    int k = f - g0;
    if (0 <= k && k < NW) k_valid[k] = 1;
  }
  for (int e = 0; e < n_edges; e++) {
    int k = (int)ii[e] - g0;
    if (0 <= k && k < NW) k_valid[k] = 1;
  }

  // rows: NW per-frame accumulated Eii rows then per-edge Eij rows
  for (int r = 0; r < NW; r++) {
    int f = g0 + r;
    row_depth[r] = r;
    if (t0 <= f && f < t1) row_pose[r] = f - t0;
  }
  for (int e = 0; e < n_edges; e++) {
    row_depth[NW + e] = (int)ii[e] - g0;
    if (t0 <= jj[e] && jj[e] < t1) row_pose[NW + e] = (int)jj[e] - t0;
  }

  // group rows with a valid pose by depth frame
  std::vector<int> count(NW, 0);
  int rmax = 0;
  for (int r = 0; r < NR; r++) {
    if (row_pose[r] < 0) continue;
    if (r >= NW + n_edges) continue;  // padded edge slots
    int k = row_depth[r];
    if (k < 0 || k >= NW) continue;
    if (count[k] >= RMAX_CAP) return -1;
    rk_idx[(int64_t)k * RMAX_CAP + count[k]] = r;
    count[k]++;
    rmax = std::max(rmax, count[k]);
  }
  return rmax;
}

// Masked variant: the padded edge layout is given directly (ii_p/jj_p of
// length E with a validity mask), so Schur row NW+e corresponds to device
// edge slot e.
int build_ba_rows_masked(const int32_t* ii_p, const int32_t* jj_p,
                         const uint8_t* valid, int t0, int t1, int g0,
                         int NW, int E, int RMAX_CAP, int32_t* row_pose,
                         int32_t* row_depth, uint8_t* k_valid,
                         int32_t* rk_idx) {
  const int NR = NW + E;
  for (int r = 0; r < NR; r++) {
    row_pose[r] = -1;
    row_depth[r] = 0;
  }
  std::memset(k_valid, 0, NW);
  std::fill(rk_idx, rk_idx + (int64_t)NW * RMAX_CAP, -1);

  for (int f = t0; f < t1; f++) {
    int k = f - g0;
    if (0 <= k && k < NW) k_valid[k] = 1;
  }
  for (int e = 0; e < E; e++) {
    if (!valid[e]) continue;
    int k = ii_p[e] - g0;
    if (0 <= k && k < NW) k_valid[k] = 1;
  }

  for (int r = 0; r < NW; r++) {
    int f = g0 + r;
    row_depth[r] = r;
    if (t0 <= f && f < t1) row_pose[r] = f - t0;
  }
  for (int e = 0; e < E; e++) {
    row_depth[NW + e] = ii_p[e] - g0;
    if (valid[e] && t0 <= jj_p[e] && jj_p[e] < t1)
      row_pose[NW + e] = jj_p[e] - t0;
  }

  std::vector<int> count(NW, 0);
  int rmax = 0;
  for (int r = 0; r < NR; r++) {
    if (row_pose[r] < 0) continue;
    int k = row_depth[r];
    if (k < 0 || k >= NW) continue;
    if (count[k] >= RMAX_CAP) return -1;
    rk_idx[(int64_t)k * RMAX_CAP + count[k]] = r;
    count[k]++;
    rmax = std::max(rmax, count[k]);
  }
  return rmax;
}

// Greedy NMS proximity edge proposal (factor_graph.py:346-412).
//
// d            : distance matrix flattened [(t - t0) * (t - t1)], row-major
//                over (i - t0, j - t1); modified in place (suppression)
// ii_exist/jj_exist : existing edges (active + bad + inactive)
// out_edges    : caller buffer [2 * max_out]; returns count of (i, j) pairs
//                written (bidirectional pairs count as two entries)
int proximity_edges(double* d, int t0, int t1, int t, int rad, int nms,
                    double thresh, int max_factors, int stereo,
                    const int64_t* ii_exist, const int64_t* jj_exist,
                    int n_exist, int64_t* out_edges, int max_out) {
  const int cols = t - t1;
  const int rows = t - t0;
  if (cols <= 0 || rows <= 0) return 0;
  const double INF = std::numeric_limits<double>::infinity();

  auto suppress = [&](int i, int j) {
    int n = std::max(std::min(std::abs(i - j) - 2, nms), 0);
    for (int di = -nms; di <= nms; di++) {
      for (int dj = -nms; dj <= nms; dj++) {
        if (std::abs(di) + std::abs(dj) <= n) {
          int i1 = i + di, j1 = j + dj;
          if (t0 <= i1 && i1 < t && t1 <= j1 && j1 < t)
            d[(int64_t)(i1 - t0) * cols + (j1 - t1)] = INF;
        }
      }
    }
  };

  for (int64_t k = 0; k < (int64_t)rows * cols; k++) {
    int i = t0 + (int)(k / cols);
    int j = t1 + (int)(k % cols);
    if (i - rad < j) d[k] = INF;
    if (d[k] > 100.0) d[k] = INF;
  }

  for (int e = 0; e < n_exist; e++)
    suppress((int)ii_exist[e], (int)jj_exist[e]);

  int n_out = 0;
  auto push = [&](int i, int j) {
    if (n_out < max_out) {
      out_edges[2 * n_out] = i;
      out_edges[2 * n_out + 1] = j;
      n_out++;
    }
  };

  for (int i = t0; i < t; i++) {
    if (stereo) {
      push(i, i);
      if (t1 <= i) d[(int64_t)(i - t0) * cols + (i - t1)] = INF;
    }
    for (int j = std::max(i - rad - 1, 0); j < i; j++) {
      push(i, j);
      push(j, i);
      if (t1 <= j && j < t)
        d[(int64_t)(i - t0) * cols + (j - t1)] = INF;
    }
  }

  // stable argsort of d
  std::vector<int64_t> order((int64_t)rows * cols);
  for (int64_t k = 0; k < (int64_t)order.size(); k++) order[k] = k;
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return d[a] < d[b]; });

  for (int64_t k : order) {
    if (d[k] > thresh) continue;
    if (max_factors > 0 && n_out > max_factors) break;
    int i = t0 + (int)(k / cols);
    int j = t1 + (int)(k % cols);
    push(i, j);
    push(j, i);
    suppress(i, j);
  }
  return n_out;
}

}  // extern "C"
