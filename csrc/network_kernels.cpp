// Host-side network kernels: batched channel walks, stream segmentation,
// streamline DEM conditioning, and area-threshold basin partitioning.
//
// These cover the inherently order-dependent host sweeps of the framework
// (the TPU handles all dense per-cell math; see pyflwdir_tpu/ops/). Each
// kernel is an independent re-design against the behavioral spec of the
// reference library (citations in the python wrappers), built around a
// shared walk engine and two-pass CSR assembly instead of per-cell python
// lists.
//
// Conventions: flow pointers are int64 "next" arrays (nxt[i] == i marks a
// pit, nxt[i] < 0 missing); CSR outputs are (offsets, data) pairs filled in
// a count pass + a fill pass so the caller owns all allocations.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// end-of-walk classification for channel path walks
enum EndKind : int8_t { END_OTHER = 0, END_OUTLET = 1, END_PIT = 2 };

// One downstream channel walk shared by the ucat segment kernels.
// Starting at `seed`, count the pixels of the segment and report how and
// where it ended. `include_outlet` switches between the two reference
// policies: stats segments exclude the next outlet pixel, index segments
// include it.
struct WalkResult {
  int64_t count;    // pixels in the segment (seed included)
  int64_t end_pix;  // pixel that terminated the walk
  int8_t kind;
};

WalkResult channel_walk(const int64_t* nxt, const uint8_t* is_outlet,
                        const uint8_t* mask, int64_t max_len,
                        bool include_outlet, int64_t seed) {
  WalkResult res{1, seed, END_OTHER};
  int64_t at = seed;
  for (;;) {
    const int64_t to = nxt[at];
    if (to < 0) return res;
    if (to == at) {
      res.kind = END_PIT;
      res.end_pix = to;
      return res;
    }
    if (mask && !mask[to]) {
      res.end_pix = to;
      return res;
    }
    if (!include_outlet && is_outlet[to]) {
      res.kind = END_OUTLET;
      res.end_pix = to;
      return res;
    }
    if (max_len > 0 && res.count == max_len) {
      res.end_pix = to;
      return res;
    }
    ++res.count;
    at = to;
    res.end_pix = at;
    if (include_outlet && is_outlet[to]) {
      res.kind = END_OUTLET;
      return res;
    }
  }
}

std::vector<uint8_t> outlet_lookup(const int64_t* seeds, int64_t m, int64_t n) {
  std::vector<uint8_t> is_outlet(n, 0);
  for (int64_t i = 0; i < m; ++i) {
    if (seeds[i] >= 0 && seeds[i] < n) is_outlet[seeds[i]] = 1;
  }
  return is_outlet;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// ucat channel paths (subgrid river segments between outlet pixels).
//
// Pass 1 (`ucat_paths_count`): per seed, the segment pixel count, the
// terminating pixel and the end kind. Pass 2 (`ucat_paths_fill`): write the
// pixel indices into a caller-allocated CSR data buffer at the given
// offsets. Seeds < 0 yield count 0 / end -1.
// ---------------------------------------------------------------------------
void ucat_paths_count(const int64_t* nxt, int64_t n, const int64_t* seeds,
                      int64_t m, const uint8_t* mask, int64_t max_len,
                      int32_t include_outlet, int64_t* counts, int64_t* ends,
                      int8_t* kinds) {
  const auto is_outlet = outlet_lookup(seeds, m, n);
  for (int64_t i = 0; i < m; ++i) {
    if (seeds[i] < 0) {
      counts[i] = 0;
      ends[i] = -1;
      kinds[i] = END_OTHER;
      continue;
    }
    const WalkResult r = channel_walk(nxt, is_outlet.data(), mask, max_len,
                                      include_outlet != 0, seeds[i]);
    counts[i] = r.count;
    ends[i] = r.end_pix;
    kinds[i] = r.kind;
  }
}

void ucat_paths_fill(const int64_t* nxt, int64_t n, const int64_t* seeds,
                     int64_t m, const int64_t* offsets, int64_t* data) {
  (void)n;
  for (int64_t i = 0; i < m; ++i) {
    int64_t at = seeds[i];
    const int64_t len = offsets[i + 1] - offsets[i];
    int64_t* row = data + offsets[i];
    for (int64_t k = 0; k < len; ++k) {
      row[k] = at;
      at = nxt[at];
    }
  }
}

// ---------------------------------------------------------------------------
// Stream segmentation: confluence-to-confluence reaches.
//
// Cells are visited in the caller-supplied up-to-downstream `order`; each
// unvisited (and mask-selected) cell opens a reach that runs until the
// next confluence (nup > 1) or pit. Reaches longer than `max_len` are cut
// into near-equal chunks that share their joint pixels; a pit closes with
// a zero-length [pit, pit] stub. Round-half-even chunk arithmetic matches
// python's round().
//
// Pass 1 returns (#segments, #data) via out params; pass 2 fills CSR.
// ---------------------------------------------------------------------------

namespace {

struct SegSink {
  int64_t* seg_off;   // nseg+1 (fill pass) or nullptr (count pass)
  int64_t* data;      // data buffer or nullptr
  int64_t nseg = 0;
  int64_t ndata = 0;

  void open() {
    if (seg_off) seg_off[nseg] = ndata;
    ++nseg;
  }
  void put(int64_t v) {
    if (data) data[ndata] = v;
    ++ndata;
  }
  void close() {
    if (seg_off) seg_off[nseg] = ndata;
  }
};

// Emit one reach (held in `path`) through the sink, applying the chunking
// rule for over-long reaches.
void emit_reach(const std::vector<int64_t>& path, int64_t max_len,
                SegSink& sink) {
  const int64_t len = (int64_t)path.size();
  if (!(max_len > 0 && len > max_len)) {
    sink.open();
    for (int64_t v : path) sink.put(v);
    return;
  }
  int64_t nchunk = 1;
  int64_t step = len;
  if ((double)len / (double)max_len > 1.5) {
    // round-half-even, as python round()
    nchunk = (int64_t)std::nearbyint((double)len / (double)max_len);
    step = (int64_t)std::nearbyint((double)len / (double)nchunk);
  }
  for (int64_t c = 0; c < nchunk; ++c) {
    const int64_t lo = c * step;
    const int64_t hi = (c + 1 == nchunk) ? len : std::min(len, (c + 1) * step + 1);
    sink.open();
    for (int64_t k = lo; k < hi; ++k) sink.put(path[k]);
  }
}

void stream_segments_run(const int64_t* nxt, const int64_t* order,
                         int64_t nord, int64_t n, const uint8_t* mask,
                         const int32_t* nup, int64_t max_len, SegSink& sink) {
  std::vector<uint8_t> visited(n, 0);
  std::vector<int64_t> path;
  for (int64_t k = 0; k < nord; ++k) {
    const int64_t head = order[k];
    if (visited[head] || (mask && !mask[head])) continue;
    path.clear();
    path.push_back(head);
    int64_t at = head;
    bool pit;
    for (;;) {
      visited[at] = 1;
      const int64_t to = nxt[at];
      pit = (to == at);
      if (!pit) path.push_back(to);
      if (pit || nup[to] > 1) break;
      at = to;
    }
    emit_reach(path, max_len, sink);
    if (pit) {
      const int64_t p = path.back();
      sink.open();
      sink.put(p);
      sink.put(p);
    }
  }
  sink.close();
}

}  // namespace

void stream_segments_count(const int64_t* nxt, const int64_t* order,
                           int64_t nord, int64_t n, const uint8_t* mask,
                           const int32_t* nup, int64_t max_len,
                           int64_t* nseg_out, int64_t* ndata_out) {
  SegSink sink{nullptr, nullptr};
  stream_segments_run(nxt, order, nord, n, mask, nup, max_len, sink);
  *nseg_out = sink.nseg;
  *ndata_out = sink.ndata;
}

void stream_segments_fill(const int64_t* nxt, const int64_t* order,
                          int64_t nord, int64_t n, const uint8_t* mask,
                          const int32_t* nup, int64_t max_len,
                          int64_t* seg_off, int64_t* data) {
  SegSink sink{seg_off, data};
  stream_segments_run(nxt, order, nord, n, mask, nup, max_len, sink);
}

// ---------------------------------------------------------------------------
// Short-river smoothing over growing main-stem windows.
//
// Cells with rivlen below `min_rivlen` (visited in index order, mutations
// visible to later cells) probe symmetric ±i windows along the main stem
// (main-upstream / downstream pointers), i = 1 .. half-1, and adopt the
// best window mean that improves on their own value; all window members
// are set to that mean. Missing-value cells never join a window.
// ---------------------------------------------------------------------------
void smooth_rivlen_host(const int64_t* nxt, const int64_t* us_main, int64_t n,
                        double* rivlen, double min_rivlen, int64_t max_window,
                        double nodata) {
  const int64_t half = max_window / 2;
  if (half < 1) return;
  std::vector<int64_t> win(2 * half + 1);
  std::vector<int64_t> best_members;
  std::vector<int64_t> members;
  for (int64_t c = 0; c < n; ++c) {
    const double own = rivlen[c];
    if (own == nodata || own >= min_rivlen) continue;
    // lay out the main-stem window around c once: win[half] = c,
    // win[half+j] = j-th downstream, win[half-j] = j-th main-upstream;
    // -1 past a pit / missing link.
    win[half] = c;
    int64_t d = c;
    for (int64_t j = 1; j <= half; ++j) {
      if (d >= 0) {
        const int64_t to = nxt[d];
        d = (to == d || to < 0) ? -1 : to;
      }
      win[half + j] = d;
    }
    int64_t u = c;
    for (int64_t j = 1; j <= half; ++j) {
      if (u >= 0) u = us_main[u];
      win[half - j] = u;
    }
    double best = own;
    best_members.clear();
    for (int64_t i = 1; i < half; ++i) {
      members.clear();
      double total = 0.0;
      for (int64_t j = half - i; j <= half + i; ++j) {
        const int64_t idx = win[j];
        if (idx < 0 || rivlen[idx] == nodata) continue;
        members.push_back(idx);
        total += rivlen[idx];
      }
      if (members.empty()) continue;
      const double mean = total / (double)members.size();
      if (mean > best) {
        best = mean;
        best_members = members;
      }
      if (best > min_rivlen) break;
    }
    if (!best_members.empty() && best > own) {
      for (int64_t idx : best_members) rivlen[idx] = best;
    }
  }
}

// ---------------------------------------------------------------------------
// Area-threshold subbasin partition.
//
// One down-to-upstream sweep (caller supplies the topological order)
// carrying the unclaimed drainage area per cell: a cell opens a new
// subbasin outlet when both it and the remaining downstream budget exceed
// `area_min`, except on the main stem directly above a confluence that
// still has budget (reference basins.subbasins_area semantics). Returns
// the number of outlets; outlet cells are written to `outlets` (capacity
// n) and get 1-based labels in `labels` (propagation upstream is done on
// device by the caller).
// ---------------------------------------------------------------------------
int64_t subbasin_area_outlets(const int64_t* nxt, const int64_t* us_main,
                              const int64_t* order, int64_t nord, int64_t n,
                              const double* uparea, double area_min,
                              uint32_t* labels, int64_t* outlets) {
  std::vector<double> budget(uparea, uparea + n);
  int64_t nout = 0;
  auto open_outlet = [&](int64_t cell) {
    outlets[nout++] = cell;
    labels[cell] = (uint32_t)nout;
  };
  for (int64_t k = 0; k < nord; ++k) {
    const int64_t c = order[k];
    const int64_t to = nxt[c];
    if (to == c) {  // every pit roots its own subbasin
      open_outlet(c);
      continue;
    }
    const double my = uparea[c];
    const double left_below = budget[to] - my;
    if (left_below <= area_min || my <= area_min) {
      budget[c] = budget[to];
      continue;
    }
    const bool side_branch = us_main[to] != c;
    const bool conf_budget = (uparea[to] - my) > area_min;
    if (side_branch || !conf_budget) {
      open_outlet(c);
      budget[c] = my;
    }
    if (side_branch) {
      // a tributary outlet splits the downstream budget with the main stem
      budget[to] -= my;
      budget[us_main[to]] = budget[to];
    }
  }
  return nout;
}

// ---------------------------------------------------------------------------
// Streamline DEM conditioning (Yamazaki et al. 2012 semantics).
//
// Each headwater-to-fixed-cell streamline profile is repaired with the
// minimum-modification choice among: digging the passage after a local
// pit, filling the rise before it, or flattening at an intermediate
// level. The profile repair is re-derived from the published method; see
// repair_profile below.
// ---------------------------------------------------------------------------

namespace {

// cost of flattening z[lo:hi) down/up to exactly `level`
inline double flatten_cost(const double* z, int64_t lo, int64_t hi,
                           double level) {
  double cost = 0.0;
  for (int64_t k = lo; k < hi; ++k) cost += std::fabs(z[k] - level);
  return cost;
}

// Repair one up->downstream profile in place. Scans for interior pits
// (a strict local minimum at i-1, detected when the value rises again and
// the minimum was itself a strict drop) and repairs the span around each:
//   dig  — clamp the span from the pit to the rise down to the pit level
//   fill — raise everything before the running maximum up to that maximum
//   flat — level the crossing at any intermediate elevation
// choosing whichever modifies the profile least (L1).
void repair_profile(double* z, int64_t n) {
  if (n == 0) return;
  const double zend = z[n - 1];
  for (int64_t k = 0; k < n; ++k) {
    if (z[k] < zend) z[k] = zend;
  }
  int64_t hi_at = -1;     // index of the running maximum
  double hi = z[0];
  int64_t pit_at = -1;    // index of the last repaired-segment boundary
  double pit = z[0];
  double prev1 = z[0], prev2 = z[0];  // z[i-1], z[i-2]
  for (int64_t i = 0; i < n; ++i) {
    const double zi = z[i];
    if (zi >= hi) {
      hi = zi;
      hi_at = i;
    }
    const bool rise_after_drop = (zi > prev1) && (prev2 >= prev1);
    const bool profile_end = (pit_at >= 0) && (i + 1 == n);
    if (rise_after_drop || profile_end) {
      if (pit_at >= 0) {
        enum Mode { DIG, FILL, FLAT } mode = DIG;
        // option DIG: clamp the span from the pit to just before the rise
        // down to the pit level
        double best = 0.0;
        for (int64_t k = pit_at; k < i; ++k) {
          best += (z[k] > pit) ? z[k] - pit : 0.0;
        }
        int64_t mode_lo = pit_at, mode_hi = i;
        double mode_level = pit;
        // option FILL: raise everything before the running max up to it
        {
          double cost = 0.0;
          for (int64_t k = 0; k < hi_at; ++k) {
            cost += (z[k] < hi) ? hi - z[k] : 0.0;
          }
          if (cost < best) {
            best = cost;
            mode = FILL;
            mode_lo = 0;
            mode_hi = hi_at;
            mode_level = hi;
          }
        }
        // option FLAT: level the crossing at an intermediate elevation.
        // Candidate levels are the distinct profile values strictly inside
        // the pit span, descending, skipping the highest; the flattened
        // span grows as the level drops (first crossing on each side).
        {
          std::vector<double> lv(z + pit_at + 1, z + i);
          std::sort(lv.begin(), lv.end(), std::greater<double>());
          lv.erase(std::unique(lv.begin(), lv.end()), lv.end());
          int64_t lo = 0, rim = hi_at;
          for (size_t q = 1; q < lv.size(); ++q) {
            const double level = lv[q];
            while (lo < pit_at && z[lo] > level) ++lo;
            while (rim < i && z[rim] > level) ++rim;
            const int64_t span_hi = std::max(hi_at + 1, rim);
            const double cost = flatten_cost(z, lo, span_hi, level);
            if (cost < best) {
              best = cost;
              mode = FLAT;
              mode_lo = lo;
              mode_hi = span_hi;
              mode_level = level;
            }
          }
        }
        for (int64_t k = mode_lo; k < mode_hi; ++k) {
          if (mode == DIG) {
            if (z[k] > mode_level) z[k] = mode_level;
          } else if (mode == FILL) {
            if (z[k] < mode_level) z[k] = mode_level;
          } else {
            z[k] = mode_level;
          }
        }
      }
      hi_at = i;
      hi = z[i];
      pit_at = (i > 0) ? i - 1 : 0;
      pit = z[pit_at];
    }
    if (prev2 != prev1) prev2 = prev1;
    prev1 = zi;
  }
}

}  // namespace

void adjust_elevation_host(const int64_t* nxt, const int64_t* order,
                           int64_t nord, int64_t n, double* z) {
  std::vector<uint8_t> fixed(n, 0);
  std::vector<double> prof;
  std::vector<int64_t> cells;
  for (int64_t k = 0; k < nord; ++k) {
    const int64_t head = order[k];
    if (fixed[head]) continue;
    cells.clear();
    int64_t at = head;
    cells.push_back(at);
    while (!fixed[at]) {
      const int64_t to = nxt[at];
      if (to == at || to < 0) break;
      at = to;
      cells.push_back(at);
    }
    prof.resize(cells.size());
    for (size_t q = 0; q < cells.size(); ++q) prof[q] = z[cells[q]];
    repair_profile(prof.data(), (int64_t)prof.size());
    for (size_t q = 0; q < cells.size(); ++q) {
      z[cells[q]] = prof[q];
      fixed[cells[q]] = 1;
    }
  }
}

// single-profile entry point (unit tests / python _adjust_elevation_profile)
void repair_profile_host(double* z, int64_t n) { repair_profile(z, n); }

// ---------------------------------------------------------------------------
// D4 channel digging along diagonal D8 links.
//
// For every diagonal link a->b (visited up- to downstream), the cheaper of
// the two row/col-adjacent cells is lowered to make the channel
// 4-connected; interior pit cells get all their D4 neighbors (except the
// inflow cell) lowered to the pit level.
// ---------------------------------------------------------------------------
void dig_d4_host(const int64_t* nxt, const int64_t* order, int64_t nord,
                 int64_t n, int64_t nrow, int64_t ncol, const uint8_t* mask,
                 double* z, double nodata, double dz_min) {
  (void)n;
  for (int64_t k = 0; k < nord; ++k) {
    const int64_t a = order[k];
    if (mask && !mask[a]) continue;
    const int64_t b = nxt[a];
    const int64_t dr = b / ncol - a / ncol;
    const int64_t dc = b % ncol - a % ncol;
    if (dr != 0 && dc != 0) {
      // the two D4 cells bridging the diagonal step; on elevation ties the
      // counter-clockwise-first neighbor wins (vertical when dr == dc)
      const int64_t cv = a + dr * ncol;
      const int64_t ch = a + dc;
      const int64_t first = (dr == dc) ? cv : ch;
      const int64_t second = (dr == dc) ? ch : cv;
      const double z0 = z[a];
      int64_t pick = -1;
      double drop = 0.0;
      for (const int64_t c : {first, second}) {
        if (z[c] == nodata) continue;
        const double rel = z[c] - z0;
        if (pick < 0 || rel < drop) {
          pick = c;
          drop = rel;
        }
      }
      if (pick >= 0) z[pick] = std::min(z[pick] - dz_min, z0);
    }
    if (nxt[b] == b) {
      // keep a D4 exit open around an interior pit
      const int64_t r = b / ncol, c = b % ncol;
      if (r == 0 || r == nrow - 1 || c == 0 || c == ncol - 1) continue;
      const int64_t d4[4] = {b - 1, b + ncol, b + 1, b - ncol};
      bool any_nodata = false;
      for (const int64_t q : d4) any_nodata |= (z[q] == nodata);
      if (any_nodata) continue;
      for (const int64_t q : d4) {
        if (q != a && z[b] < z[q]) z[q] = z[b];
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Batched trace walks (reference core._trace / path / snap semantics).
//
// Per seed: walk along `nxt` until a pit / missing pointer, a True mask
// cell (checked at the *current* cell, including the seed), or until the
// accumulated metric distance would exceed `max_length` (< 0: no cap).
// Unit steps by default; with `dx`/`dy` per-row metric step lengths the
// distance is hypot-weighted (latlon grids pass per-row metres).
// Pass 1 counts per-seed path lengths and final distances; pass 2 fills
// the CSR path buffer.
// ---------------------------------------------------------------------------

namespace {

struct TraceCfg {
  const int64_t* nxt;
  const uint8_t* mask;   // nullable: stop where true
  const double* stepx;   // nullable: col-step length at half-lat k=r0+r1
  const double* stepy;   // nullable: row-step length at half-lat k=r0+r1
  int64_t ncol;
  double max_length;
};

inline double trace_step_len(const TraceCfg& c, int64_t a, int64_t b) {
  if (!c.stepx) return 1.0;
  const int64_t k = a / c.ncol + b / c.ncol;  // 2x the mean row
  const int64_t dr = b / c.ncol - a / c.ncol;
  const int64_t dc = b % c.ncol - a % c.ncol;
  const double dy = dr ? c.stepy[k] : 0.0;
  const double dx = dc ? c.stepx[k] : 0.0;
  return std::sqrt(dy * dy + dx * dx);
}

// walk one seed; writes the path into `out` when non-null
int64_t trace_one(const TraceCfg& c, int64_t seed, double* dist_out,
                  int64_t* out) {
  int64_t at = seed;
  int64_t n = 1;
  if (out) out[0] = at;
  double dist = 0.0;
  while (!(c.mask && c.mask[at])) {
    const int64_t to = c.nxt[at];
    if (to == at || to < 0) break;
    const double d = trace_step_len(c, at, to);
    if (c.max_length >= 0 && dist + d > c.max_length) break;
    dist += d;
    at = to;
    if (out) out[n] = at;
    ++n;
  }
  *dist_out = dist;
  return n;
}

}  // namespace

void trace_walks_count(const int64_t* nxt, int64_t n, const int64_t* seeds,
                       int64_t m, const uint8_t* mask, const double* stepx,
                       const double* stepy, int64_t ncol, double max_length,
                       int64_t* counts, double* dists) {
  (void)n;
  const TraceCfg c{nxt, mask, stepx, stepy, ncol, max_length};
  for (int64_t i = 0; i < m; ++i) {
    counts[i] = trace_one(c, seeds[i], &dists[i], nullptr);
  }
}

void trace_walks_fill(const int64_t* nxt, int64_t n, const int64_t* seeds,
                      int64_t m, const uint8_t* mask, const double* stepx,
                      const double* stepy, int64_t ncol, double max_length,
                      const int64_t* offsets, int64_t* data) {
  (void)n;
  const TraceCfg c{nxt, mask, stepx, stepy, ncol, max_length};
  double d;
  for (int64_t i = 0; i < m; ++i) {
    trace_one(c, seeds[i], &d, data + offsets[i]);
  }
}

// ---------------------------------------------------------------------------
// Fixed-length channel windows centred on outlet pixels.
//
// Per seed: slide downstream while the along-channel coordinate stays
// above (distnc[seed] - length/2), then collect the main-stem chain
// upstream from there while it stays below (distnc[seed] + length/2).
// Pass 1 records the window start and pixel count; pass 2 fills CSR.
// ---------------------------------------------------------------------------
void fixed_window_count(const int64_t* nxt, const int64_t* us_main,
                        const double* distnc, const uint8_t* mask,
                        const int64_t* seeds, int64_t m, double length,
                        int64_t* starts, int64_t* counts) {
  for (int64_t i = 0; i < m; ++i) {
    const int64_t seed = seeds[i];
    if (seed < 0) {
      starts[i] = -1;
      counts[i] = 0;
      continue;
    }
    const double x0 = distnc[seed] - length / 2;
    const double x1 = distnc[seed] + length / 2;
    int64_t at = seed;
    while (distnc[at] > x0) {
      const int64_t to = nxt[at];
      if (to == at || (mask && !mask[at])) break;
      at = to;
    }
    starts[i] = at;
    int64_t cnt = 1;
    while (distnc[at] < x1) {
      const int64_t up = us_main[at];
      if (up < 0 || (mask && !mask[up])) break;
      at = up;
      ++cnt;
    }
    counts[i] = cnt;
  }
}

void fixed_window_fill(const int64_t* us_main, const int64_t* starts,
                       int64_t m, const int64_t* offsets, int64_t* data) {
  for (int64_t i = 0; i < m; ++i) {
    int64_t at = starts[i];
    const int64_t len = offsets[i + 1] - offsets[i];
    int64_t* row = data + offsets[i];
    for (int64_t k = 0; k < len; ++k) {
      row[k] = at;
      at = (at >= 0) ? us_main[at] : at;
    }
  }
}

}  // extern "C"
