// Native host kernels for pyflwdir_tpu.
//
// The inherently heap-ordered algorithms (Wang & Liu 2006 priority-flood,
// Dijkstra observation spreading) run on the host; these C++ kernels give
// them numba-equivalent performance (the reference relies on numba JIT for
// the same loops, reference dem.py:18-143, gis_utils.py:32-114).
// Also contains the sequential topological-sweep flow accumulation used as
// the CPU baseline in bench.py (reference streams.py:37-41 semantics).
//
// Build: make -C csrc   ->   libpyflwdir_host.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// sequential flow-accumulation sweep (CPU baseline; numba-equivalent)
// accu[ds[i]] += accu[i] over the up->downstream order.
// ---------------------------------------------------------------------------
void accuflux_sweep(const int64_t* idxs_ds, const int64_t* seq, int64_t nseq,
                    double* accu) {
  for (int64_t k = nseq - 1; k >= 0; --k) {
    int64_t i = seq[k];
    int64_t ds = idxs_ds[i];
    if (ds != i) accu[ds] += accu[i];
  }
}

// ---------------------------------------------------------------------------
// Wang & Liu (2006) priority-flood depression filling + D8 derivation.
//
// Exact semantics of the reference (dem.py:92-143):
//  * min-heap ordered by (float32 z, uint8 boundary, uint32 r, uint32 c);
//    seeds carry boundary=1 so interior cells win elevation ties
//  * neighbors scanned in row-major (dr, dc) order over the structuring
//    element (8- or 4-connectivity)
//  * max_depth >= 0: pour points deeper than max_depth stay pits; their
//    neighbors are revisited and previously-filled cells reset
//  * d8 of a popped neighbor points back at the popping cell
// ---------------------------------------------------------------------------

struct QItem {
  float z;
  uint8_t boundary;
  uint32_t r, c;
};

struct QCmp {
  bool operator()(const QItem& a, const QItem& b) const {
    // std::priority_queue is a max-heap; invert for min ordering with
    // (z, boundary, r, c) lexicographic tie-breaks
    if (a.z != b.z) return a.z > b.z;
    if (a.boundary != b.boundary) return a.boundary > b.boundary;
    if (a.r != b.r) return a.r > b.r;
    return a.c > b.c;
  }
};

// _us matrix of the d8 codec: value at (dr+1, dc+1) is the code a neighbor
// uses to point back to the center (codecs/d8.py)
static const uint8_t D8_US[3][3] = {{2, 4, 8}, {1, 0, 16}, {128, 64, 32}};

void priority_flood(double* elevtn, uint8_t* d8, int64_t nrow, int64_t ncol,
                    double nodata, double max_depth, int connectivity,
                    const int64_t* seeds, int64_t nseeds) {
  const int64_t n = nrow * ncol;
  const bool nodata_nan = std::isnan(nodata);
  std::vector<double> delv(n, 0.0);
  std::vector<uint8_t> done(n, 0);
  std::vector<uint8_t> queued(n, 0);
  for (int64_t i = 0; i < n; ++i) {
    const bool bad = nodata_nan ? std::isnan(elevtn[i]) : (elevtn[i] == nodata);
    done[i] = bad ? 1 : 0;
    d8[i] = bad ? 247 : 0;
  }

  // structuring element scan order: row-major (dr, dc) INCLUDING the
  // center — the reference iterates np.where(struct) (dem.py:110-111), so
  // a popped cell marks itself done with the pit code, which protects
  // outlet cells from being filled by later pops
  int drs[9], dcs[9];
  int nnb = 0;
  for (int dr = -1; dr <= 1; ++dr) {
    for (int dc = -1; dc <= 1; ++dc) {
      if (connectivity == 4 && dr != 0 && dc != 0) continue;
      drs[nnb] = dr;
      dcs[nnb] = dc;
      ++nnb;
    }
  }

  std::priority_queue<QItem, std::vector<QItem>, QCmp> q;
  for (int64_t s = 0; s < nseeds; ++s) {
    int64_t i = seeds[s];
    q.push(QItem{(float)elevtn[i], 1, (uint32_t)(i / ncol), (uint32_t)(i % ncol)});
    queued[i] = 1;
  }

  while (!q.empty()) {
    QItem top = q.top();
    q.pop();
    const double z0 = (double)top.z;
    const int64_t r0 = top.r, c0 = top.c;
    for (int k = 0; k < nnb; ++k) {
      const int64_t r = r0 + drs[k];
      const int64_t c = c0 + dcs[k];
      if (r < 0 || r == nrow || c < 0 || c == ncol) continue;
      const int64_t i = r * ncol + c;
      if (done[i]) continue;
      double z1 = elevtn[i];
      const double dz = z0 - z1;  // local depression if dz > 0
      if (max_depth >= 0.0) {
        if (dz >= max_depth) {  // keep as pit; revisit neighbors
          q.push(QItem{(float)z1, 0, (uint32_t)r, (uint32_t)c});
          queued[i] = 1;
          for (int k2 = 0; k2 < nnb; ++k2) {
            const int64_t rr = r + drs[k2];
            const int64_t cc = c + dcs[k2];
            // reference indexes without bounds check (dem.py:128); the
            // revisited neighbors of an interior cell are in bounds, but we
            // guard the raster border for safety
            if (rr < 0 || rr >= nrow || cc < 0 || cc >= ncol) continue;
            done[rr * ncol + cc] = 0;
          }
          continue;
        } else if (delv[i] > 0.0) {  // reset if previously filled & revisited
          queued[i] = 0;
          delv[i] = 0.0;
        }
      }
      if (dz > 0.0) {
        delv[i] = dz;
        z1 += dz;
      }
      if (!queued[i]) {
        q.push(QItem{(float)z1, 0, (uint32_t)r, (uint32_t)c});
        queued[i] = 1;
      }
      done[i] = 1;
      d8[i] = D8_US[drs[k] + 1][dcs[k] + 1];
    }
  }
  for (int64_t i = 0; i < n; ++i) elevtn[i] += delv[i];
}

// ---------------------------------------------------------------------------
// Dijkstra nearest-observation spread with friction (gis_utils.py:32-114).
// ---------------------------------------------------------------------------

struct SItem {
  float d;
  uint32_t r, c;
};

struct SCmp {
  bool operator()(const SItem& a, const SItem& b) const {
    if (a.d != b.d) return a.d > b.d;
    if (a.r != b.r) return a.r > b.r;
    return a.c > b.c;
  }
};

void spread2d(const double* obs, const uint8_t* msk, const double* frc,
              int64_t nrow, int64_t ncol, double nodata, int latlon,
              const double* dxs, const double* dys, double dx0, double dy0,
              double* out, int32_t* src, float* dst) {
  const int64_t n = nrow * ncol;
  for (int64_t i = 0; i < n; ++i) {
    out[i] = obs[i];
    src[i] = -1;
    dst[i] = 0.0f;
  }
  std::priority_queue<SItem, std::vector<SItem>, SCmp> q;
  for (int64_t r = 0; r < nrow; ++r) {
    for (int64_t c = 0; c < ncol; ++c) {
      const int64_t i = r * ncol + c;
      if (obs[i] != nodata) {
        if (msk == nullptr || msk[i]) {
          q.push(SItem{0.0f, (uint32_t)r, (uint32_t)c});
        }
        src[i] = (int32_t)i;
      }
    }
  }
  while (!q.empty()) {
    SItem top = q.top();
    q.pop();
    const int64_t r = top.r, c = top.c;
    const int64_t i0 = r * ncol + c;
    if (dst[i0] < top.d) continue;
    const double f0 = (frc == nullptr) ? 1.0 : frc[i0];
    const double dx = latlon ? dxs[r] : dx0;
    const double dy = latlon ? dys[r] : dy0;
    for (int dr = -1; dr <= 1; ++dr) {
      for (int dc = -1; dc <= 1; ++dc) {
        if (dr == 0 && dc == 0) continue;
        const int64_t r1 = r + dr, c1 = c + dc;
        if (r1 < 0 || r1 >= nrow || c1 < 0 || c1 >= ncol) continue;
        const int64_t i1 = r1 * ncol + c1;
        if (msk != nullptr && !msk[i1]) continue;
        const double d = top.d + std::hypot(dr * dy, dc * dx) * f0;
        if (src[i1] == -1 || d < dst[i1]) {
          src[i1] = src[i0];
          dst[i1] = (float)d;
          out[i1] = obs[src[i0]];
          q.push(SItem{(float)d, (uint32_t)r1, (uint32_t)c1});
        }
      }
    }
  }
}

}  // extern "C"

extern "C" {

// ---------------------------------------------------------------------------
// DFS preorder of the flow forest (plan builder for O(1)-depth device
// accumulation): subtree(i) occupies the contiguous preorder interval
// [pos[i], pos[i] + size[i]). Children are visited in ascending cell index.
// Cells not reaching a pit (missing or cycles) get pos = -1.
// Returns the number of tree cells.
// ---------------------------------------------------------------------------
int64_t dfs_preorder(const int64_t* idxs_ds, int64_t n, int64_t* preorder,
                     int64_t* pos, int64_t* size) {
  // children adjacency via counting sort by parent
  std::vector<int64_t> child_cnt(n, 0);
  for (int64_t i = 0; i < n; ++i) {
    int64_t ds = idxs_ds[i];
    if (ds >= 0 && ds != i) ++child_cnt[ds];
  }
  std::vector<int64_t> child_off(n + 1, 0);
  for (int64_t i = 0; i < n; ++i) child_off[i + 1] = child_off[i] + child_cnt[i];
  std::vector<int64_t> children(child_off[n]);
  std::vector<int64_t> fill(n, 0);
  for (int64_t i = 0; i < n; ++i) {  // ascending i -> children sorted
    int64_t ds = idxs_ds[i];
    if (ds >= 0 && ds != i) children[child_off[ds] + fill[ds]++] = i;
  }
  for (int64_t i = 0; i < n; ++i) {
    pos[i] = -1;
    size[i] = 0;
  }
  // iterative DFS from each pit; stack holds (node, next-child cursor)
  std::vector<int64_t> stack_node;
  std::vector<int64_t> stack_cur;
  stack_node.reserve(1024);
  stack_cur.reserve(1024);
  int64_t k = 0;
  for (int64_t p = 0; p < n; ++p) {
    if (idxs_ds[p] != p) continue;  // pits only
    stack_node.push_back(p);
    stack_cur.push_back(child_off[p]);
    pos[p] = k;
    preorder[k++] = p;
    while (!stack_node.empty()) {
      int64_t u = stack_node.back();
      int64_t& cur = stack_cur.back();
      if (cur < child_off[u] + child_cnt[u]) {
        int64_t v = children[cur++];
        pos[v] = k;
        preorder[k++] = v;
        stack_node.push_back(v);
        stack_cur.push_back(child_off[v]);
      } else {
        size[u] = (stack_node.size() > 1)
                      ? 0  // computed below via pos arithmetic
                      : 0;
        stack_node.pop_back();
        stack_cur.pop_back();
      }
    }
  }
  // subtree sizes from preorder intervals: size[u] = (index of next node
  // not in subtree) - pos[u]; compute by propagating up with a second pass
  // (children are contiguous after the parent in preorder). Simplest O(n):
  // accumulate sizes bottom-up by adding 1 along the parent chain is O(n h);
  // instead do: size = 1 and add child sizes in reverse preorder.
  for (int64_t i = 0; i < n; ++i) size[i] = (pos[i] >= 0) ? 1 : 0;
  for (int64_t j = k - 1; j >= 0; --j) {
    int64_t u = preorder[j];
    int64_t ds = idxs_ds[u];
    if (ds >= 0 && ds != u) size[ds] += size[u];
  }
  return k;
}

}  // extern "C"

extern "C" {

// ---------------------------------------------------------------------------
// Stream orders in O(n) over the reverse DFS preorder (up -> downstream
// topological order). Exact reference semantics (streams.py:192-269).
// ---------------------------------------------------------------------------
void strahler_order_host(const int64_t* idxs_ds, const int64_t* preorder,
                         int64_t n_tree, int64_t n, const uint8_t* mask,
                         uint8_t* strord) {
  std::vector<uint8_t> strmax(n, 0);
  for (int64_t i = 0; i < n; ++i) strord[i] = 0;
  for (int64_t j = n_tree - 1; j >= 0; --j) {  // up- to downstream
    int64_t i = preorder[j];
    if (mask != nullptr && !mask[i]) continue;
    uint8_t sto = strord[i] == 0 ? 1 : strord[i];
    strord[i] = sto;
    int64_t ds = idxs_ds[i];
    if (ds == i) continue;
    uint8_t sto_ds = strord[ds];
    uint8_t sto_up = strmax[ds];
    if (sto_ds < sto) {
      strord[ds] = sto;
    } else if (sto == sto_ds && sto_up == sto) {
      strord[ds] += 1;
    }
    if (sto_up < sto) strmax[ds] = sto;
  }
}

void classic_order_host(const int64_t* idxs_ds, const int64_t* preorder,
                        const int64_t* idxs_us_main, int64_t n_tree, int64_t n,
                        const uint8_t* mask, const int8_t* nup,
                        uint8_t* strord) {
  for (int64_t i = 0; i < n; ++i) strord[i] = 0;
  for (int64_t j = 0; j < n_tree; ++j) {  // down- to upstream
    int64_t i = preorder[j];
    if (mask != nullptr && !mask[i]) continue;
    int64_t ds = idxs_ds[i];
    if (ds == i) {
      strord[i] = 1;
    } else if (nup[ds] > 1 && idxs_us_main[ds] != i) {
      strord[i] = (uint8_t)(strord[ds] + 1);
    } else {
      strord[i] = strord[ds];
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Bipartite multigraph edge coloring by recursive Euler splitting.
//
// Input: a deg-regular bipartite multigraph (deg a power of two) given as
// E edges u[e] in [0,nL) -> v[e] in [0,nR). Writes color[e] in [0,deg)
// such that edges sharing a left OR right endpoint get distinct colors
// (a proper deg-edge-coloring; exists by Konig's theorem).
//
// Used by the TPU static-permutation router (ops/router.py): a Birkhoff/
// Hall 3-stage routing of an arbitrary permutation over a (rows, 128-lane)
// grid needs the (src_row -> dst_row) multigraph colored with 128 colors;
// the color becomes the intermediate lane assignment.
//
// Algorithm: level-by-level Euler splitting. At each level every group
// (color-prefix class) induces a subgraph where all vertex degrees are
// even; walking Eulerian circuits and orienting edges along the traversal
// splits each vertex's incident edges exactly in half (left->right
// oriented edges get bit 0, right->left bit 1). log2(deg) levels, O(E)
// work per level.
// ---------------------------------------------------------------------------
// int32 working set + fused incidence fill keep the (memory-latency-bound)
// Euler walks cache-friendly; E and nL+nR must stay below 2^31.
extern "C" void bipartite_color(const int64_t* u64, const int64_t* v64,
                                int64_t E, int64_t nL, int64_t nR,
                                int32_t deg, int32_t* color) {
  int levels = 0;
  while ((1 << levels) < deg) ++levels;
  const int32_t nE = (int32_t)E;
  // key(e) = vertex * ngrp + grp: precompute int32 vertex ids once
  std::vector<int32_t> uv(nE), vv(nE);
  for (int32_t e = 0; e < nE; ++e) {
    uv[e] = (int32_t)u64[e];
    vv[e] = (int32_t)(nL + v64[e]);
  }
  std::vector<int32_t> grp(nE, 0);
  std::vector<uint8_t> used(nE);
  const int64_t nV = nL + nR;
  std::vector<int64_t> cnt;
  std::vector<int64_t> cur;
  std::vector<int32_t> inc(2 * (size_t)nE);
  for (int lev = 0; lev < levels; ++lev) {
    const int64_t ngrp = 1LL << lev;
    const int64_t nkey = nV * ngrp;
    cnt.assign(nkey + 1, 0);
    for (int32_t e = 0; e < nE; ++e) {
      const int64_t g = grp[e];
      cnt[(int64_t)uv[e] * ngrp + g + 1]++;
      cnt[(int64_t)vv[e] * ngrp + g + 1]++;
    }
    for (int64_t k = 0; k < nkey; ++k) cnt[k + 1] += cnt[k];
    cur.assign(cnt.begin(), cnt.end() - 1);
    for (int32_t e = 0; e < nE; ++e) {
      const int64_t g = grp[e];
      inc[cur[(int64_t)uv[e] * ngrp + g]++] = e;
      inc[cur[(int64_t)vv[e] * ngrp + g]++] = e;
    }
    // reset cursors to bucket starts for the walks
    cur.assign(cnt.begin(), cnt.end() - 1);
    std::fill(used.begin(), used.end(), 0);
    for (int32_t e0 = 0; e0 < nE; ++e0) {
      if (used[e0]) continue;
      int64_t g = grp[e0];
      int32_t w = uv[e0];  // start each circuit at the left endpoint
      bool left = true;
      while (true) {
        const int64_t key = (int64_t)w * ngrp + g;
        int64_t& c = cur[key];
        const int64_t hi = cnt[key + 1];
        while (c < hi && used[inc[c]]) ++c;
        if (c >= hi) break;  // circuit closed (even degrees)
        const int32_t e = inc[c];
        used[e] = 1;
        if (left) {  // traversing left->right: bit 0
          grp[e] = grp[e] * 2;
          w = vv[e];
        } else {  // right->left: bit 1
          grp[e] = grp[e] * 2 + 1;
          w = uv[e];
        }
        left = !left;
      }
    }
  }
  for (int32_t e = 0; e < nE; ++e) color[e] = grp[e];
}
