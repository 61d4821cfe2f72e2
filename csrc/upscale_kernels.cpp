// Native IHU repair passes (iterative hydrography upscaling).
//
// The IHU upscaling pipeline (Eilander et al. 2021) computes lowres flow
// directions from a highres network; after the vectorized outlet/nextidx
// passes (device side, pyflwdir_tpu/upscale.py) a small set of lowres
// cells is left disconnected and must be repaired by sequential,
// mutation-with-rollback passes over the highres pixel paths. These run
// here as native kernels built around an explicit transaction log
// (EditLog) instead of parallel undo lists.
//
// Data model
//   cell_ds   (nlow)  lowres next-cell pointers (cell_ds[c]==c pit, -1 mv)
//   cell_out  (nlow)  highres outlet pixel per lowres cell (-1 mv)
//   pix_ds    (nsub)  highres next-pixel pointers
//   pix_upa   (nsub)  highres upstream area
//   strm      (nsub)  stream map: -9 off-stream, -1 stream pixel,
//                     >= 0 the lowres cell whose outlet this pixel is
//
// Behavioral spec: reference pyflwdir upscale.py:499-1152 (relocate /
// optimize-rivlen / minimize-error and their helpers); the caller
// (pyflwdir_tpu/upscale.py) pre-sorts work lists so host/NumPy tie-break
// order is preserved.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct Ctx {
  int64_t* cell_ds;
  int64_t* cell_out;
  const int64_t* pix_ds;
  const double* pix_upa;
  int64_t nlow, nsub;
  int64_t nrow, ncol;        // lowres dims
  int64_t subncol, subnrow;  // highres dims
  int64_t cellsize;

  int64_t cell_of(int64_t pix) const {
    return (pix / subncol / cellsize) * ncol + (pix % subncol) / cellsize;
  }
  bool adjacent8(int64_t a, int64_t b) const {  // 3x3 neighborhood incl. self
    return std::llabs(a % ncol - b % ncol) <= 1 &&
           std::llabs(a / ncol - b / ncol) <= 1;
  }
  // D8 neighbors of a lowres cell, ascending linear index
  void neighbors8(int64_t c, std::vector<int64_t>& out) const {
    out.clear();
    const int64_t r0 = c / ncol, c0 = c % ncol;
    for (int64_t dr = -1; dr <= 1; ++dr) {
      for (int64_t dc = -1; dc <= 1; ++dc) {
        if (!dr && !dc) continue;
        const int64_t r = r0 + dr, cc = c0 + dc;
        if (r >= 0 && r < nrow && cc >= 0 && cc < ncol) out.push_back(r * ncol + cc);
      }
    }
  }
  // D8 neighbors draining into c, ascending
  void inflows8(int64_t c, std::vector<int64_t>& out) const {
    neighbors8(c, out);
    out.erase(
        std::remove_if(out.begin(), out.end(),
                       [&](int64_t q) { return cell_ds[q] != c; }),
        out.end());
  }
};

inline bool contains(const std::vector<int64_t>& v, int64_t x) {
  return std::find(v.begin(), v.end(), x) != v.end();
}

// Transaction log over cell_ds / cell_out edits: supports rollback of the
// value changes while keeping the membership sets (the reference's
// semantics: its undo restores values but the edit lists persist for the
// later loop test).
struct EditLog {
  Ctx& g;
  std::vector<int64_t> ds_cells, ds_old;     // cell_ds edits
  std::vector<int64_t> out_cells, out_old;   // cell_out edits
  explicit EditLog(Ctx& ctx) : g(ctx) {}

  void set_ds(int64_t c, int64_t to) {
    if (g.cell_ds[c] == to) return;
    ds_old.push_back(g.cell_ds[c]);
    ds_cells.push_back(c);
    g.cell_ds[c] = to;
  }
  void set_out(int64_t c, int64_t pix) {
    if (g.cell_out[c] == pix) return;
    out_old.push_back(g.cell_out[c]);
    out_cells.push_back(c);
    g.cell_out[c] = pix;
  }
  bool rewired(int64_t c) const { return contains(ds_cells, c); }
  bool outlet_moved(int64_t c) const { return contains(out_cells, c); }
  void rollback_values() {
    for (size_t i = ds_cells.size(); i-- > 0;) g.cell_ds[ds_cells[i]] = ds_old[i];
    for (size_t i = 0; i < out_cells.size(); ++i) g.cell_out[out_cells[i]] = out_old[i];
  }
  void reset() {
    ds_cells.clear();
    ds_old.clear();
    out_cells.clear();
    out_old.clear();
  }
};

// Walk from `pix` to the next outlet pixel (or pit). Returns the stopping
// pixel; *cell gets its lowres cell, *hit_outlet whether it is an outlet.
int64_t walk_to_outlet(const Ctx& g, int64_t pix, int64_t* cell,
                       bool* hit_outlet) {
  for (;;) {
    const int64_t nxt = g.pix_ds[pix];
    const int64_t c = g.cell_of(nxt);
    if (nxt == g.cell_out[c]) {
      *cell = c;
      *hit_outlet = true;
      return nxt;
    }
    if (nxt == pix) {
      *cell = c;
      *hit_outlet = false;
      return nxt;
    }
    pix = nxt;
  }
}

// --------------------------------------------------------------------------
// relocate pass
// --------------------------------------------------------------------------

// Step 1: trace the highres path downstream of the broken cell's outlet,
// collecting candidate (pixel, cell) pairs at every cell exit. Returns
// false if the cell turns out to be already fixed (trace ends at the
// current downstream cell's outlet with no detour).
bool trace_candidates(const Ctx& g, int64_t bad, std::vector<int64_t>& cand_pix,
                      std::vector<int64_t>& cand_cell) {
  cand_pix.clear();
  cand_cell.clear();
  int64_t ds_cell = g.cell_ds[bad];
  int64_t pix = g.pix_ds[g.cell_out[bad]];
  int64_t cur = g.cell_of(pix);
  bool stop = false;
  for (;;) {
    const int64_t nxt = g.pix_ds[pix];
    const int64_t nxt_cell = g.cell_of(nxt);
    const bool pit = nxt == pix;
    if (pit || cur != nxt_cell) {  // pix exits its cell here (or is a pit)
      if (pit) {
        stop = true;
      } else if (pix == g.cell_out[ds_cell] && !contains(cand_cell, ds_cell)) {
        stop = true;  // reached the tracked downstream cell's outlet
      }
      if (g.cell_ds[cur] >= 0) {
        cand_pix.push_back(pix);
        cand_cell.push_back(cur);
      }
      if (pix == g.cell_out[cur]) ds_cell = g.cell_ds[cur];
      cur = nxt_cell;
    }
    if (stop) break;
    pix = nxt;
  }
  // already fixed: the trace ended exactly at the downstream outlet
  return pix != g.cell_out[g.cell_ds[bad]];
}

// Step 3 helper: the window [j_first, j_last] of trace candidates that a
// tributary cell's stream connects to (limited lookahead).
void conn_window(const Ctx& g, int64_t trib, const std::vector<int64_t>& cand_pix,
                 int64_t* j_first, int64_t* j_last) {
  const int64_t nout = (int64_t)cand_pix.size();
  bool connected = false;
  int64_t j0 = 0, j1 = 0, probes = 0;
  int64_t pix = g.pix_ds[g.cell_out[trib]];
  int64_t cell = trib;
  while (probes <= 10) {
    const int64_t nxt = g.pix_ds[pix];
    const int64_t nxt_cell = g.cell_of(nxt);
    if (pix == nxt || cell != nxt_cell) {
      if (!connected) ++probes;
      for (int64_t j = j0; j < nout; ++j) {
        if (cand_pix[j] == pix) {
          if (!connected) {
            j0 = j1 = j;
            connected = true;
          } else if (g.adjacent8(trib, cell)) {
            j1 = j;
          }
          break;
        }
      }
      if (j1 + 1 == nout || pix == nxt) break;
    }
    pix = nxt;
    cell = nxt_cell;
  }
  if (connected) {
    *j_first = j0;
    *j_last = j1;
  } else {
    *j_first = *j_last = nout - 1;
  }
}

// Step 4 inner: re-route one tributary onto the (possibly moved) outlets
// along the trace. May flag a bottleneck (-> outer retry).
void rewire_tributary(Ctx& g, EditLog& log, int64_t trib, int64_t old_target_pix,
                      std::vector<int64_t>& bottleneck, bool* retry) {
  if (log.outlet_moved(trib)) return;
  std::vector<int64_t> seen;
  int64_t pix = g.cell_out[trib];
  int64_t prev_cell = trib;
  for (;;) {
    const int64_t nxt = g.pix_ds[pix];
    const int64_t nxt_cell = g.cell_of(nxt);
    const bool at_outlet = nxt == g.cell_out[nxt_cell];
    const bool at_pit = nxt == pix;
    if (at_outlet || at_pit) {
      const bool edited =
          log.rewired(trib) || log.outlet_moved(g.cell_ds[trib]);
      const bool ok8 = g.adjacent8(trib, nxt_cell);
      if ((!ok8 && edited) || (!at_outlet && at_pit)) {
        *retry = true;
        if (!contains(bottleneck, g.cell_ds[trib]))
          bottleneck.push_back(g.cell_ds[trib]);
      } else if (ok8) {
        log.set_ds(trib, nxt_cell);
      }
      return;
    }
    // detour repair: the walk passed the tributary's original target and
    // re-entered a candidate cell adjacent to the tributary — split the
    // connection through that cell
    if (prev_cell != nxt_cell && prev_cell != trib && contains(seen, old_target_pix) &&
        !log.outlet_moved(prev_cell) && g.adjacent8(trib, prev_cell)) {
      std::vector<int64_t> us;
      g.inflows8(prev_cell, us);
      int64_t after_cell;
      bool after_outlet;
      const int64_t after_pix = walk_to_outlet(g, pix, &after_cell, &after_outlet);
      (void)after_pix;
      if (us.empty() && after_outlet && !log.outlet_moved(after_cell) &&
          prev_cell != after_cell && g.adjacent8(prev_cell, after_cell)) {
        log.set_ds(trib, prev_cell);
        log.set_ds(prev_cell, after_cell);
        log.set_out(prev_cell, pix);
        return;
      }
    }
    seen.push_back(nxt);
    pix = nxt;
    prev_cell = nxt_cell;
  }
}

// One broken cell: trace, find tributaries, greedily connect the dots with
// rollback on bottlenecks/loops. Returns true if the cell stays broken.
bool relocate_one(Ctx& g, int64_t bad) {
  std::vector<int64_t> cand_pix, cand_cell;
  if (!trace_candidates(g, bad, cand_pix, cand_cell)) return false;
  const int64_t nout = (int64_t)cand_pix.size();

  // tributary cells draining into traced cells (excluding trace members)
  std::vector<int64_t> traced(cand_cell);
  std::sort(traced.begin(), traced.end());
  traced.erase(std::unique(traced.begin(), traced.end()), traced.end());
  std::vector<int64_t> tribs, nb;
  for (int64_t c : traced) {
    g.inflows8(c, nb);
    for (int64_t q : nb) {
      if (q == bad || contains(cand_pix, g.cell_out[q])) continue;
      tribs.push_back(q);
    }
  }

  // per-tributary connection windows, then stable-sort tributaries by the
  // window start
  const int64_t ntrib = (int64_t)tribs.size();
  std::vector<int64_t> jf(ntrib), jl(ntrib), order(ntrib);
  for (int64_t t = 0; t < ntrib; ++t) conn_window(g, tribs[t], cand_pix, &jf[t], &jl[t]);
  for (int64_t t = 0; t < ntrib; ++t) order[t] = t;
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return jf[a] < jf[b]; });
  std::vector<int64_t> trib_s(ntrib), jf_s(ntrib), jl_s(ntrib), old_tgt(ntrib);
  for (int64_t t = 0; t < ntrib; ++t) {
    trib_s[t] = tribs[order[t]];
    jf_s[t] = jf[order[t]];
    jl_s[t] = jl[order[t]];
    old_tgt[t] = g.cell_out[g.cell_ds[trib_s[t]]];
  }

  // greedy assignment with bottleneck retries
  std::vector<int64_t> bottleneck;
  EditLog log(g);
  bool retry = false;
  int64_t last_cand = -1;
  bool first_round = true;
  size_t known_bottlenecks = 0;
  while (first_round || bottleneck.size() > known_bottlenecks) {
    first_round = false;
    retry = false;
    known_bottlenecks = bottleneck.size();
    log.reset();
    int64_t from = bad;
    int64_t jlo = 0, klo = 0;
    for (int64_t j = 0; j < nout; ++j) {
      if (retry) continue;  // skip the tail, keep j advancing (spec quirk)
      const int64_t pix_j = cand_pix[j];
      const int64_t cell_j = cand_cell[j];
      last_cand = cell_j;
      const bool blocked =
          log.outlet_moved(cell_j) || contains(bottleneck, cell_j);
      const bool ok8 = !blocked && g.adjacent8(from, cell_j);
      // tributaries whose window [jf, jl] intersects [jlo, j]
      std::vector<int64_t> ks;
      for (int64_t k = klo; k < ntrib; ++k) {
        if (jf_s[k] >= jlo && jf_s[k] <= j) ks.push_back(k);
      }
      const bool lats = !ks.empty();
      bool later_lats = lats;
      for (int64_t k : ks) later_lats = later_lats && (jl_s[k] > j);
      // is a later candidate both reachable and a real outlet?
      bool later8 = false;
      if (g.cell_out[cell_j] != pix_j) {
        for (int64_t jj = j + 1; jj < nout; ++jj) {
          const int64_t c = cand_cell[jj];
          if (log.outlet_moved(c) || contains(bottleneck, c)) continue;
          if (g.adjacent8(from, c)) later8 = true;
          if (g.cell_out[c] == cand_pix[jj]) break;
        }
        // (later8 is only meaningful while cell_j's outlet is elsewhere)
      } else {
        later8 = false;
      }
      if (!ok8 && !later8) {
        retry = true;
      } else if ((!lats && later8) || (later_lats && later8)) {
        continue;  // defer to the later candidate
      }
      if ((ok8 && lats) || (ok8 && !later8)) {
        log.set_ds(from, cell_j);
        log.set_out(cell_j, pix_j);
        for (int64_t k : ks) {
          rewire_tributary(g, log, trib_s[k], old_tgt[k], bottleneck, &retry);
        }
        from = cell_j;
        jlo = j + 1;
      } else if (!retry && lats) {
        // advance the tributary cursor past already-satisfied windows
        for (int64_t k : ks) {
          const int64_t tgt = g.cell_ds[trib_s[k]];
          const bool on_tail =
              std::find(cand_cell.begin() + j, cand_cell.end(), tgt) !=
              cand_cell.end();
          if (!on_tail && !log.outlet_moved(tgt)) {
            klo = k;
          } else {
            break;
          }
        }
      }
      if (retry) log.rollback_values();
    }
  }
  // closing the chain onto an edited outlet would create a loop (checked
  // once, after the retries, against the persisted edit sets)
  const bool loop = nout > 0 && log.outlet_moved(g.cell_ds[last_cand]);
  if (loop) log.rollback_values();
  return retry || loop;
}

// --------------------------------------------------------------------------
// new-outlet search (shared by optimize-rivlen and minimize-error)
// --------------------------------------------------------------------------

// Candidate outlet pixels of a lowres cell: pit pixels anywhere in the
// cell, plus edge pixels whose downstream pixel leaves the cell. Column-
// major candidate order (matters for equal-uparea tie-breaks downstream).
void candidate_pixels(const Ctx& g, int64_t cell, std::vector<int64_t>& out) {
  out.clear();
  const int64_t c_ul = (cell % g.ncol) * g.cellsize;
  const int64_t r_ul = (cell / g.ncol) * g.cellsize;
  for (int64_t ci = 0; ci < g.cellsize; ++ci) {
    if (c_ul + ci >= g.subncol) continue;
    const bool we = ci == 0 || ci + 1 == g.cellsize;
    for (int64_t ri = 0; ri < g.cellsize; ++ri) {
      if (r_ul + ri >= g.subnrow) continue;
      const bool edge = we || ri == 0 || ri + 1 == g.cellsize;
      const int64_t pix = (r_ul + ri) * g.subncol + c_ul + ci;
      const int64_t nxt = g.pix_ds[pix];
      if (nxt == pix) {
        out.push_back(pix);
      } else if (edge && g.cell_of(nxt) != cell) {
        out.push_back(pix);
      }
    }
  }
}

// Try to move a cell's outlet to an off-stream candidate pixel with a
// long-enough, large-enough channel reaching the stream network; updates
// the stream map on success. `forced_end` (or -1) restricts acceptable
// stream-entry pixels.
bool new_outlet(Ctx& g, int32_t* strm, int64_t cell, int64_t old_out,
                double minlen, double minupa, int64_t forced_end) {
  strm[old_out] = -1;
  std::vector<int64_t> cands, path, best_path;
  candidate_pixels(g, cell, cands);
  double best_upa = minupa;
  int64_t best_pix = -1, best_ds = -1;
  for (int64_t pix : cands) {
    if (strm[pix] != -9 || g.pix_upa[pix] <= best_upa) continue;
    path.clear();
    int64_t at = pix, end;
    for (;;) {
      end = g.pix_ds[at];
      path.push_back(end);
      if (strm[end] >= 0 || end == at) break;
      at = end;
    }
    const int64_t n = (int64_t)path.size();
    const int64_t end_cell = g.cell_of(end);
    const bool end_ok = forced_end < 0 || forced_end == end;
    const bool outlet = (double)n > minlen && g.adjacent8(cell, end_cell) &&
                        cell != end_cell;
    const bool pit = n == 1 && at == path[0] && cell == end_cell;
    if (end_ok && (outlet || pit)) {
      best_upa = g.pix_upa[pix];
      best_pix = pix;
      best_ds = end_cell;
      best_path = path;
    }
  }
  if (best_ds < 0) {
    strm[old_out] = (int32_t)cell;  // restore
    return false;
  }
  g.cell_ds[cell] = best_ds;
  g.cell_out[cell] = best_pix;
  strm[best_pix] = (int32_t)cell;
  for (int64_t p : best_path) strm[p] = std::max(strm[p], (int32_t)-1);
  return true;
}

}  // namespace

extern "C" {

// Relocate outlets of the (pre-sorted) broken cells; returns the number of
// cells still broken, written to `still_broken`.
int64_t ihu_relocate(int64_t* cell_ds, int64_t* cell_out, const int64_t* pix_ds,
                     const double* pix_upa, int64_t nlow, int64_t nsub,
                     int64_t nrow, int64_t ncol, int64_t subncol,
                     int64_t cellsize, const int64_t* broken, int64_t nbroken,
                     int64_t* still_broken) {
  Ctx g{cell_ds, cell_out, pix_ds, pix_upa, nlow,
        nsub,    nrow,     ncol,   subncol, nsub / subncol,
        cellsize};
  int64_t nout = 0;
  for (int64_t i = 0; i < nbroken; ++i) {
    if (relocate_one(g, broken[i])) still_broken[nout++] = broken[i];
  }
  return nout;
}

// Optimize away too-short downstream reaches (pre-sorted short list).
void ihu_opt_rivlen(int64_t* cell_ds, int64_t* cell_out, int32_t* strm,
                    const uint8_t* valid, const int64_t* pix_ds,
                    const double* pix_upa, int64_t nlow, int64_t nsub,
                    int64_t nrow, int64_t ncol, int64_t subncol,
                    int64_t cellsize, const int64_t* shorts, int64_t nshort,
                    double minlen, double minupa) {
  Ctx g{cell_ds, cell_out, pix_ds, pix_upa, nlow,
        nsub,    nrow,     ncol,   subncol, nsub / subncol,
        cellsize};
  std::vector<int64_t> us;
  for (int64_t i = 0; i < nshort; ++i) {
    const int64_t pair[2] = {shorts[i], cell_ds[shorts[i]]};
    for (const int64_t cell : pair) {
      const int64_t old_out = cell_out[cell];
      const int64_t below = cell_ds[cell];
      if (below == cell || !valid[below] || !valid[cell]) continue;
      g.inflows8(cell, us);
      bool all_reach_below = true;
      for (int64_t q : us) {
        if (valid[q] && !g.adjacent8(q, below)) all_reach_below = false;
      }
      if (!us.empty() && !all_reach_below) continue;
      if (!new_outlet(g, strm, cell, old_out, minlen, minupa, -1)) continue;
      // short cell removed: its upstream neighbors bypass it
      for (int64_t q : us) {
        if (valid[q]) {
          cell_ds[q] = below;
        } else if (cell_ds[cell] == q) {  // created a loop: undo
          strm[cell_out[cell]] = -1;
          strm[old_out] = (int32_t)cell;
          cell_out[cell] = old_out;
          cell_ds[cell] = below;
        }
      }
      break;
    }
  }
}

// Minimize upstream-area errors of the (pre-sorted, descending-uparea)
// broken cells by re-routing onto nearby stream cells or new outlets.
void ihu_min_error(int64_t* cell_ds, int64_t* cell_out, int32_t* strm,
                   const uint8_t* valid, const int64_t* pix_ds,
                   const double* pix_upa, int64_t nlow, int64_t nsub,
                   int64_t nrow, int64_t ncol, int64_t subncol,
                   int64_t cellsize, const int64_t* broken, int64_t nbroken,
                   double minlen, double minupa, int64_t pit_out_of_cell) {
  (void)valid;
  Ctx g{cell_ds, cell_out, pix_ds, pix_upa, nlow,
        nsub,    nrow,     ncol,   subncol, nsub / subncol,
        cellsize};
  std::vector<int64_t> nb, us, hw;
  for (int64_t i = 0; i < nbroken; ++i) {
    const int64_t cell = broken[i];
    const int64_t out0 = cell_out[cell];
    bool fixed = false;

    // downstream stream-cells met by the outlet's highres path
    std::vector<int64_t> hits;
    int64_t pix = out0, nxt = out0;
    for (;;) {
      nxt = g.pix_ds[pix];
      if (nxt == pix) break;
      if (strm[nxt] >= 0) {
        const int64_t c = strm[nxt];
        hits.push_back(c);
        if ((int64_t)hits.size() == 100 ||
            (hits.size() == 1 && g.adjacent8(cell, c)))
          break;
      }
      pix = nxt;
    }

    // a pit just outside the cell may simply become this cell's outlet
    bool pit_ok = pit_out_of_cell > 0 && nxt == pix;
    if (pit_ok) {
      const int64_t pc = g.cell_of(nxt);
      const int64_t dcol = pc % ncol - cell % ncol;
      const int64_t drow = pc / ncol - cell / ncol;
      pit_ok = std::llabs(dcol) <= pit_out_of_cell &&
               std::llabs(drow) <= pit_out_of_cell;
    }
    if (pit_ok && (nxt == out0 || hits.empty())) {
      strm[cell_out[cell]] = -1;
      strm[nxt] = (int32_t)cell;
      cell_ds[cell] = cell;
      cell_out[cell] = nxt;
      continue;
    }

    g.neighbors8(cell, nb);
    bool headwater = true;
    for (int64_t q : nb) headwater &= (cell_ds[q] != cell);
    if (headwater) {
      fixed = new_outlet(g, strm, cell, out0, minlen, minupa, -1);
    }
    for (int round = 0; round < 2; ++round) {
      int64_t best_d = 999999;
      double best_upa = 0;
      hw.clear();
      if (!fixed) {
        for (const int64_t n1 : nb) {
          // NumPy-style negative indexing kept for exact parity on cells
          // without an outlet (reads wrap to the array tail)
          const int64_t opix = cell_out[n1];
          const double upa = g.pix_upa[opix < 0 ? nsub + opix : opix];
          const bool hor = std::llabs(n1 - cell) == 1;
          const bool ver = std::llabs(n1 - cell) == ncol;
          int64_t at = n1;
          for (int64_t step = 0; step <= best_d; ++step) {
            const auto it = std::find(hits.begin(), hits.end(), at);
            if (it != hits.end()) {
              const int64_t d = (it - hits.begin()) + step;
              if (d < best_d || (d == best_d && upa > best_upa)) {
                bool crossing = false;
                if (!hor && !ver) {
                  // diagonal: reject if it would cross an existing link
                  const int64_t dcol = n1 % ncol - cell % ncol;
                  const int64_t drow = n1 / ncol - cell / ncol;
                  const int64_t ch = cell + dcol;
                  const int64_t cv = cell + drow * ncol;
                  crossing = cell_ds[ch] == cv || cell_ds[cv] == ch;
                }
                if (!crossing) {
                  cell_ds[cell] = n1;
                  best_d = d;
                  best_upa = upa;
                  fixed = true;
                }
              }
              break;
            }
            const int64_t to = cell_ds[at < 0 ? nlow + at : at];
            if (to == at || to == cell) {
              if (to == cell) {
                g.inflows8(n1, us);
                if (us.empty()) hw.push_back(n1);
              }
              break;
            }
            at = to;
          }
        }
      }
      if (!fixed && !hw.empty() && !hits.empty()) {
        const int64_t forced = cell_out[hits[0]];
        for (int64_t h : hw) {
          if (new_outlet(g, strm, h, cell_out[h], minlen, minupa, forced))
            break;
        }
      } else {
        break;
      }
    }
  }
}

}  // extern "C"
