// ---------------------------------------------------------------------------
// Native construction of the hierarchical tile accumulation plan
// (pyflwdir_tpu/ops/tile_plan.py).
//
// The plan's per-tile tables (DFS preorder slots, subtree intervals,
// near/far gather tables, router bijections and their Hall colorings) are
// independent across raster tiles, so the whole build is embarrassingly
// tile-parallel and cache-resident: every per-tile working set is a few
// hundred KB. This file replaces the multi-pass whole-grid numpy pipeline
// (which streamed dozens of O(n) passes through HBM-sized host arrays)
// with one threaded pass per phase:
//
//   tp_phase1       per-tile forest DFS -> sig / slot / tid / near tables
//   tp_pad_bijection  pad partial per-tile bijections (free dst x free src)
//   tp_fwd_tables   5-stage router tables incl. per-tile Euler colorings
//   tp_inv_rows     row-wise permutation-table inversion
//
// The reference (Deltares/pyflwdir) has no analogue of any of this: it
// keeps one global cached topological order (pyflwdir/flwdir.py:164-168)
// and sweeps sequentially. The tile decomposition exists purely for the
// TPU kernels.
// ---------------------------------------------------------------------------
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int32_t S = 128;  // lanes

inline int n_threads() {
  unsigned hc = std::thread::hardware_concurrency();
  return hc == 0 ? 1 : (int)hc;
}

// run fn(t) for t in [0, NT) on a pool, dynamic schedule
template <class F>
void parallel_tiles(int64_t NT, F&& fn) {
  int nw = n_threads();
  if (nw <= 1 || NT <= 1) {
    for (int64_t t = 0; t < NT; ++t) fn(t, 0);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> ths;
  ths.reserve(nw);
  for (int w = 0; w < nw; ++w) {
    ths.emplace_back([&, w]() {
      for (;;) {
        int64_t t = next.fetch_add(1);
        if (t >= NT) return;
        fn(t, w);
      }
    });
  }
  for (auto& th : ths) th.join();
}

// ---------------------------------------------------------------------------
// bipartite multigraph edge coloring by recursive Euler splitting; the
// per-tile twin of csrc/host_kernels.cpp::bipartite_color (same algorithm,
// int32 in/out, reusable scratch so the NT invocations stay allocation-free)
// ---------------------------------------------------------------------------
struct ColorScratch {
  std::vector<int64_t> cnt, cur;
  std::vector<int32_t> inc;
  std::vector<uint8_t> used;
};

// u[e] in [0,nL), v[e] in [0,nR), deg a power of two; writes color[e]
static void color_graph(const int32_t* u, const int32_t* v, int32_t E,
                        int32_t nL, int32_t nR, int32_t deg, int32_t* grp,
                        ColorScratch& sc) {
  int levels = 0;
  while ((1 << levels) < deg) ++levels;
  const int64_t nV = nL + nR;
  for (int32_t e = 0; e < E; ++e) grp[e] = 0;
  if ((size_t)(2 * E) > sc.inc.size()) sc.inc.resize(2 * (size_t)E);
  if ((size_t)E > sc.used.size()) sc.used.resize(E);
  for (int lev = 0; lev < levels; ++lev) {
    const int64_t ngrp = 1LL << lev;
    const int64_t nkey = nV * ngrp;
    if ((size_t)(nkey + 1) > sc.cnt.size()) {
      sc.cnt.resize(nkey + 1);
      sc.cur.resize(nkey + 1);
    }
    std::fill(sc.cnt.begin(), sc.cnt.begin() + nkey + 1, 0);
    for (int32_t e = 0; e < E; ++e) {
      const int64_t g = grp[e];
      sc.cnt[(int64_t)u[e] * ngrp + g + 1]++;
      sc.cnt[((int64_t)nL + v[e]) * ngrp + g + 1]++;
    }
    for (int64_t k = 0; k < nkey; ++k) sc.cnt[k + 1] += sc.cnt[k];
    std::copy(sc.cnt.begin(), sc.cnt.begin() + nkey, sc.cur.begin());
    for (int32_t e = 0; e < E; ++e) {
      const int64_t g = grp[e];
      sc.inc[sc.cur[(int64_t)u[e] * ngrp + g]++] = e;
      sc.inc[sc.cur[((int64_t)nL + v[e]) * ngrp + g]++] = e;
    }
    std::copy(sc.cnt.begin(), sc.cnt.begin() + nkey, sc.cur.begin());
    std::fill(sc.used.begin(), sc.used.begin() + E, 0);
    for (int32_t e0 = 0; e0 < E; ++e0) {
      if (sc.used[e0]) continue;
      int64_t g = grp[e0];
      int64_t w = u[e0];
      bool left = true;
      for (;;) {
        const int64_t key = w * ngrp + g;
        int64_t& c = sc.cur[key];
        const int64_t hi = sc.cnt[key + 1];
        while (c < hi && sc.used[sc.inc[c]]) ++c;
        if (c >= hi) break;  // circuit closed (all degrees even)
        const int32_t e = sc.inc[c];
        sc.used[e] = 1;
        if (left) {
          grp[e] = grp[e] * 2;
          w = (int64_t)nL + v[e];
        } else {
          grp[e] = grp[e] * 2 + 1;
          w = u[e];
        }
        left = !left;
      }
    }
  }
}

struct TileLists {
  std::vector<int64_t> root_cell;
  std::vector<int32_t> root_end;
  std::vector<int32_t> far_slot;
  std::vector<int32_t> far_end;
};

struct Phase1Handle {
  std::vector<TileLists> tiles;
  std::vector<int64_t> cnt_r, cnt_far;
};

}  // namespace

extern "C" {

// Per-tile forest DFS over the padded grid (Hp x Wp, tiles th x 128).
//
// ids: (Hp*Wp,) int64 downstream cell ids (-1 missing, self = pit).
// Outputs (caller-allocated): sig (NT*T) int32 cell->preorder bijection
// (on-tree cells at their preorder slot, off-tree cells packed after in
// raster order); near_sel/idx_near/sel_next (NT*T int8, preorder layout);
// tree_mask (NT*T int8, raster layout); slot (n int32, -1 off-tree);
// root_node (n int32, global root rank of the cell's tree, -1 off-tree);
// cnt_on/cnt_r/cnt_far (NT int64). Root and far lists are kept in the
// returned handle (sizes unknown upfront); fetch with tp_phase1_export.
void* tp_phase1(const int64_t* ids, int64_t Hp, int64_t Wp, int64_t th,
                int32_t* sig, int8_t* near_sel, int8_t* idx_near,
                int8_t* sel_next, int8_t* tree_mask, int32_t* slot_out,
                int32_t* root_node, int64_t* cnt_on, int64_t* cnt_r,
                int64_t* cnt_far, int64_t* m_out, int64_t* nf_out) {
  const int64_t nty = Hp / th, ntx = Wp / S;
  const int64_t NT = nty * ntx;
  const int32_t T = (int32_t)(th * S);

  auto* h = new Phase1Handle();
  h->tiles.resize(NT);
  h->cnt_r.assign(NT, 0);
  h->cnt_far.assign(NT, 0);

  struct Scratch {
    std::vector<int32_t> lds, ccnt, child, slot, size, tid, stk_node, stk_cur,
        preord;
  };
  std::vector<Scratch> scratch(n_threads());

  parallel_tiles(NT, [&](int64_t t, int w) {
    Scratch& sc = scratch[w];
    if ((size_t)T > sc.lds.size()) {
      sc.lds.resize(T);
      sc.ccnt.resize(T + 1);
      sc.child.resize(T);
      sc.slot.resize(T);
      sc.size.resize(T);
      sc.tid.resize(T);
      sc.stk_node.resize(T);
      sc.stk_cur.resize(T);
      sc.preord.resize(T);
    }
    const int64_t ty = t / ntx, tx = t % ntx;
    const int64_t r0 = ty * th, c0 = tx * S;
    // classify: lds[l] = local downstream (-1 missing; l itself = root,
    // i.e. pit or tile-exit)
    for (int64_t lr = 0; lr < th; ++lr) {
      const int64_t* row = ids + (r0 + lr) * Wp + c0;
      int32_t* lrow = sc.lds.data() + lr * S;
      for (int64_t lc = 0; lc < S; ++lc) {
        const int64_t d = row[lc];
        if (d < 0) {
          lrow[lc] = -1;
          continue;
        }
        const int64_t g = (r0 + lr) * Wp + (c0 + lc);
        if (d == g) {
          lrow[lc] = (int32_t)(lr * S + lc);
          continue;
        }
        const int64_t dr = d / Wp, dc = d % Wp;
        if (dr / th == ty && dc / S == tx) {
          lrow[lc] = (int32_t)((dr - r0) * S + (dc - c0));
        } else {
          lrow[lc] = (int32_t)(lr * S + lc);  // exits root their own tree
        }
      }
    }
    // children CSR (counting sort by parent; child order = raster order)
    std::fill(sc.ccnt.begin(), sc.ccnt.begin() + T + 1, 0);
    for (int32_t l = 0; l < T; ++l) {
      const int32_t d = sc.lds[l];
      if (d >= 0 && d != l) sc.ccnt[d + 1]++;
    }
    for (int32_t k = 0; k < T; ++k) sc.ccnt[k + 1] += sc.ccnt[k];
    {
      std::vector<int32_t>& cur = sc.size;  // reuse as cursor
      std::copy(sc.ccnt.begin(), sc.ccnt.begin() + T, cur.begin());
      for (int32_t l = 0; l < T; ++l) {
        const int32_t d = sc.lds[l];
        if (d >= 0 && d != l) sc.child[cur[d]++] = l;
      }
    }
    // iterative DFS from roots in raster order
    std::fill(sc.slot.begin(), sc.slot.begin() + T, -1);
    int32_t k = 0;
    int32_t ntree = 0;
    TileLists& tl = h->tiles[t];
    for (int32_t rt = 0; rt < T; ++rt) {
      if (sc.lds[rt] != rt) continue;
      const int32_t my_tid = ntree++;
      tl.root_cell.push_back((r0 + rt / S) * Wp + (c0 + rt % S));
      int sp = 0;
      sc.slot[rt] = k;
      sc.tid[rt] = my_tid;
      sc.preord[k++] = rt;
      sc.stk_node[0] = rt;
      sc.stk_cur[0] = sc.ccnt[rt];
      while (sp >= 0) {
        const int32_t u = sc.stk_node[sp];
        int32_t& cur = sc.stk_cur[sp];
        if (cur < sc.ccnt[u + 1]) {
          const int32_t v = sc.child[cur++];
          sc.slot[v] = k;
          sc.tid[v] = my_tid;
          sc.preord[k++] = v;
          ++sp;
          sc.stk_node[sp] = v;
          sc.stk_cur[sp] = sc.ccnt[v];
        } else {
          --sp;
        }
      }
    }
    cnt_on[t] = k;
    h->cnt_r[t] = ntree;
    // subtree sizes: reverse preorder push to parent
    for (int32_t j = 0; j < k; ++j) sc.size[sc.preord[j]] = 1;
    for (int32_t j = k - 1; j >= 0; --j) {
      const int32_t u = sc.preord[j];
      const int32_t d = sc.lds[u];
      if (d != u) sc.size[d] += sc.size[u];
    }
    // root interval ends (roots were pushed in slot order)
    for (int32_t rt = 0; rt < T; ++rt) {
      if (sc.lds[rt] == rt && sc.slot[rt] >= 0)
        tl.root_end.push_back(sc.slot[rt] + sc.size[rt] - 1);
    }
    // sig + per-cell outputs + masks
    int32_t off = k;
    int32_t* sig_t = sig + (int64_t)t * T;
    int8_t* tm_t = tree_mask + (int64_t)t * T;
    for (int32_t l = 0; l < T; ++l) {
      const int64_t g = (r0 + l / S) * Wp + (c0 + l % S);
      if (sc.slot[l] >= 0) {
        sig_t[sc.slot[l]] = l;
        slot_out[g] = sc.slot[l];
        root_node[g] = sc.tid[l];  // local tid; globalized in export
        tm_t[l] = 1;
      } else {
        sig_t[off++] = l;
        slot_out[g] = -1;
        root_node[g] = -1;
        tm_t[l] = 0;
      }
    }
    // near / far tables in preorder layout
    int8_t* ns_t = near_sel + (int64_t)t * T;
    int8_t* in_t = idx_near + (int64_t)t * T;
    int8_t* sn_t = sel_next + (int64_t)t * T;
    for (int32_t s = 0; s < k; ++s) {
      const int32_t l = sc.preord[s];
      const int32_t d = sc.size[l] - 1;
      if (d < S) {
        const int32_t ln = s % S + d;
        ns_t[s] = 1;
        in_t[s] = (int8_t)(ln % S);
        sn_t[s] = (int8_t)(ln >= S);
      } else {
        tl.far_slot.push_back(s);
        tl.far_end.push_back(s + d);
      }
    }
    h->cnt_far[t] = (int64_t)tl.far_slot.size();
  });

  int64_t m = 0, nf = 0;
  for (int64_t t = 0; t < NT; ++t) {
    cnt_r[t] = h->cnt_r[t];
    cnt_far[t] = h->cnt_far[t];
    m += h->cnt_r[t];
    nf += h->cnt_far[t];
  }
  *m_out = m;
  *nf_out = nf;

  // globalize root_node ranks: rank = sum of cnt_r over earlier tiles + tid
  std::vector<int64_t> roff(NT + 1, 0);
  for (int64_t t = 0; t < NT; ++t) roff[t + 1] = roff[t] + h->cnt_r[t];
  parallel_tiles(NT, [&](int64_t t, int) {
    const int64_t ty = t / ntx, tx = t % ntx;
    const int32_t base = (int32_t)roff[t];
    if (base == 0) return;
    for (int64_t lr = 0; lr < th; ++lr) {
      int32_t* row = root_node + (ty * th + lr) * Wp + tx * S;
      for (int64_t lc = 0; lc < S; ++lc)
        if (row[lc] >= 0) row[lc] += base;
    }
  });
  return h;
}

// Copy the phase-1 root/far lists (tile-major, slot order within tile)
// into caller arrays of length m / nf, then free the handle.
void tp_phase1_export(void* handle, int64_t* root_cell, int32_t* root_end,
                      int32_t* far_slot, int32_t* far_end) {
  auto* h = static_cast<Phase1Handle*>(handle);
  int64_t mo = 0, fo = 0;
  for (auto& tl : h->tiles) {
    std::memcpy(root_cell + mo, tl.root_cell.data(),
                tl.root_cell.size() * sizeof(int64_t));
    std::memcpy(root_end + mo, tl.root_end.data(),
                tl.root_end.size() * sizeof(int32_t));
    mo += (int64_t)tl.root_cell.size();
    std::memcpy(far_slot + fo, tl.far_slot.data(),
                tl.far_slot.size() * sizeof(int32_t));
    std::memcpy(far_end + fo, tl.far_end.data(),
                tl.far_end.size() * sizeof(int32_t));
    fo += (int64_t)tl.far_slot.size();
  }
  delete h;
}

// Pad partial per-tile bijections: sigma[t, dk] = sk for the nk given
// (tile, dst, src) triples (tk ascending), remaining dsts paired with
// remaining srcs in index order. sigma is (NT, T) int32.
void tp_pad_bijection(const int64_t* tk, const int64_t* dk, const int64_t* sk,
                      int64_t nk, int64_t NT, int64_t T, int32_t* sigma) {
  // per-tile ranges of the sorted triples
  std::vector<int64_t> start(NT + 1, 0);
  for (int64_t i = 0; i < nk; ++i) start[tk[i] + 1]++;
  for (int64_t t = 0; t < NT; ++t) start[t + 1] += start[t];

  struct Scratch {
    std::vector<uint8_t> ksrc;
  };
  std::vector<Scratch> scratch(n_threads());
  parallel_tiles(NT, [&](int64_t t, int w) {
    Scratch& sc = scratch[w];
    if ((size_t)T > sc.ksrc.size()) sc.ksrc.resize(T);
    int32_t* sg = sigma + t * T;
    std::fill(sc.ksrc.begin(), sc.ksrc.begin() + T, 0);
    for (int64_t l = 0; l < T; ++l) sg[l] = -1;
    for (int64_t i = start[t]; i < start[t + 1]; ++i) {
      sg[dk[i]] = (int32_t)sk[i];
      sc.ksrc[sk[i]] = 1;
    }
    int64_t s = 0;
    for (int64_t l = 0; l < T; ++l) {
      if (sg[l] >= 0) continue;
      while (sc.ksrc[s]) ++s;
      sg[l] = (int32_t)s++;
    }
  });
}

// 5-stage router tables of stacked bijections sig (NT, T), T = Y*128.
// i1/is1/is2/i3 are (NT, Y, 128) int8; ig (NT, 128*128, G) int8, written
// only when G = Y/128 > 1 (pass NULL for G == 1).
void tp_fwd_tables(const int32_t* sig, int64_t NT, int64_t Y, int64_t G,
                   int8_t* i1, int8_t* is1, int8_t* is2, int8_t* i3,
                   int8_t* ig) {
  const int64_t T = Y * S;
  struct Scratch {
    ColorScratch cs;
    std::vector<int32_t> ys, yd, c, c2, u2, v2;
  };
  std::vector<Scratch> scratch(n_threads());
  parallel_tiles(NT, [&](int64_t t, int w) {
    Scratch& sc = scratch[w];
    if ((size_t)T > sc.ys.size()) {
      sc.ys.resize(T);
      sc.yd.resize(T);
      sc.c.resize(T);
      sc.c2.resize(T);
      sc.u2.resize(T);
      sc.v2.resize(T);
    }
    const int32_t* sg = sig + t * T;
    for (int64_t e = 0; e < T; ++e) {
      sc.ys[e] = sg[e] >> 7;
      sc.yd[e] = (int32_t)(e >> 7);
    }
    // level 1: rows -> rows, color = intermediate lane
    color_graph(sc.ys.data(), sc.yd.data(), (int32_t)T, (int32_t)Y,
                (int32_t)Y, S, sc.c.data(), sc.cs);
    int8_t* i1t = i1 + t * Y * S;
    int8_t* i3t = i3 + t * Y * S;
    for (int64_t e = 0; e < T; ++e) {
      i1t[(int64_t)sc.ys[e] * S + sc.c[e]] = (int8_t)(sg[e] & (S - 1));
      i3t[(int64_t)sc.yd[e] * S + (e & (S - 1))] = (int8_t)sc.c[e];
    }
    // level 2: within each lane column, route rows (g, s)
    if (G == 1) {
      // each color class is a perfect row matching: c2 = ys is valid
      std::copy(sc.ys.begin(), sc.ys.begin() + T, sc.c2.begin());
    } else {
      for (int64_t e = 0; e < T; ++e) {
        sc.u2[e] = sc.c[e] * (int32_t)G + (sc.ys[e] >> 7);
        sc.v2[e] = sc.c[e] * (int32_t)G + (sc.yd[e] >> 7);
      }
      color_graph(sc.u2.data(), sc.v2.data(), (int32_t)T, (int32_t)(S * G),
                  (int32_t)(S * G), S, sc.c2.data(), sc.cs);
    }
    int8_t* is1t = is1 + t * Y * S;
    int8_t* is2t = is2 + t * Y * S;
    for (int64_t e = 0; e < T; ++e) {
      const int32_t gs = sc.ys[e] >> 7, ss = sc.ys[e] & (S - 1);
      const int32_t gd = sc.yd[e] >> 7, sd = sc.yd[e] & (S - 1);
      is1t[(int64_t)(gs * S + sc.c[e]) * S + sc.c2[e]] = (int8_t)ss;
      is2t[(int64_t)(gd * S + sc.c[e]) * S + sd] = (int8_t)sc.c2[e];
      if (ig != nullptr)
        ig[(t * S * S + (int64_t)sc.c2[e] * S + sc.c[e]) * G + gd] =
            (int8_t)gs;
    }
  });
}

// Per-tile construction of the downward (transpose) plan's sort/boundary
// structures (ops/tile_plan.py::_ensure_down): interval ends per preorder
// slot, the stable (end, slot) counting sort -> sig_es, and the per-group
// boundary bijections sig_dea / sig_deb (+ de_sel / de_b0 masks). Replaces
// a whole-grid int64 argsort + ~8 O(NT*T) numpy passes with one threaded
// cache-resident pass; padding of the partial bijections matches
// tp_pad_bijection (free dsts paired with free srcs in index order).
void tp_down_phase(const int8_t* near_sel, const int8_t* idx_near,
                   const int8_t* sel_next, const int32_t* sig,
                   const int64_t* cnt_far, const int32_t* far_slot,
                   const int32_t* far_end, int64_t NT, int64_t T,
                   int32_t* sig_es, int32_t* sig_dea, int32_t* sig_deb,
                   int8_t* de_sel, int8_t* de_b0) {
  std::vector<int64_t> foff(NT + 1, 0);
  for (int64_t t = 0; t < NT; ++t) foff[t + 1] = foff[t] + cnt_far[t];

  struct Scratch {
    std::vector<int32_t> ends, order, cnt;
    std::vector<uint8_t> ksrc;
  };
  std::vector<Scratch> scratch(n_threads());
  parallel_tiles(NT, [&](int64_t t, int w) {
    Scratch& sc = scratch[w];
    if ((size_t)T > sc.ends.size()) {
      sc.ends.resize(T);
      sc.order.resize(T);
      sc.cnt.resize(T + 2);
      sc.ksrc.resize(T);
    }
    const int8_t* ns = near_sel + t * T;
    const int8_t* in = idx_near + t * T;
    const int8_t* sn = sel_next + t * T;
    // interval end per slot (T = off-tree sentinel, sorts to the tail)
    for (int64_t s = 0; s < T; ++s) {
      if (ns[s]) {
        const int32_t d =
            (int32_t)(uint8_t)in[s] + (sn[s] ? S : 0) - (int32_t)(s & (S - 1));
        sc.ends[s] = (int32_t)s + d;
      } else {
        sc.ends[s] = (int32_t)T;
      }
    }
    for (int64_t i = foff[t]; i < foff[t + 1]; ++i)
      sc.ends[far_slot[i]] = far_end[i];
    // stable counting sort by (end, slot)
    std::fill(sc.cnt.begin(), sc.cnt.begin() + T + 2, 0);
    for (int64_t s = 0; s < T; ++s) sc.cnt[sc.ends[s] + 1]++;
    for (int64_t k = 0; k <= T; ++k) sc.cnt[k + 1] += sc.cnt[k];
    for (int64_t s = 0; s < T; ++s) sc.order[sc.cnt[sc.ends[s]]++] = (int32_t)s;
    const int32_t* sg = sig + t * T;
    int32_t* es = sig_es + t * T;
    for (int64_t q = 0; q < T; ++q) es[q] = sg[sc.order[q]];
    // group boundaries among on slots (runs of equal end) -> partial
    // bijections dea (end <- group-last sorted pos) and deb (end <-
    // pos before group start), plus the end-slot masks
    int32_t* da = sig_dea + t * T;
    int32_t* db = sig_deb + t * T;
    int8_t* dsel = de_sel + t * T;
    int8_t* db0 = de_b0 + t * T;
    for (int64_t l = 0; l < T; ++l) {
      da[l] = -1;
      db[l] = -1;
      dsel[l] = 0;
      db0[l] = 0;
    }
    int64_t q = 0;
    while (q < T) {
      const int32_t e = sc.ends[sc.order[q]];
      if (e >= (int32_t)T) break;  // off-tree tail
      int64_t q1 = q;
      while (q1 + 1 < T && sc.ends[sc.order[q1 + 1]] == e) ++q1;
      da[e] = (int32_t)q1;
      dsel[e] = 1;
      if (q == 0) {
        db0[e] = 1;
      } else {
        db[e] = (int32_t)(q - 1);
      }
      q = q1 + 1;
    }
    // pad both to full bijections (tp_pad_bijection's pairing rule)
    for (int pass = 0; pass < 2; ++pass) {
      int32_t* sgm = pass == 0 ? da : db;
      std::fill(sc.ksrc.begin(), sc.ksrc.begin() + T, 0);
      for (int64_t l = 0; l < T; ++l)
        if (sgm[l] >= 0) sc.ksrc[sgm[l]] = 1;
      int64_t s = 0;
      for (int64_t l = 0; l < T; ++l) {
        if (sgm[l] >= 0) continue;
        while (sc.ksrc[s]) ++s;
        sgm[l] = (int32_t)s++;
      }
    }
  });
}

// Row-wise inverse of stacked permutation tables (rows, S): out[r, t[r,j]] = j
void tp_inv_rows(const int8_t* t, int64_t rows, int64_t s, int8_t* out) {
  const int64_t blk = 1024;  // rows per work item (row work is tiny)
  parallel_tiles((rows + blk - 1) / blk, [&](int64_t b, int) {
    const int64_t hi = std::min(rows, (b + 1) * blk);
    for (int64_t r = b * blk; r < hi; ++r) {
      const int8_t* tr = t + r * s;
      int8_t* orow = out + r * s;
      for (int64_t j = 0; j < s; ++j) orow[(uint8_t)tr[j]] = (int8_t)j;
    }
  });
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Native flow-direction raster parsing (codecs/{d8,ldd}.py from_array):
// LUT-decode each cell's (dr, dc), resolve the downstream flat index with
// edge/nodata-to-pit semantics (reference core_d8.py:43-67), and collect
// pit indices — one threaded pass + a pit-fill pass, replacing ~10
// whole-grid numpy temporaries. Generic over the codec via the two LUTs.
// ---------------------------------------------------------------------------
extern "C" void flw_from_array_lut(const uint8_t* flw, const int8_t* drlut,
                                   const int8_t* dclut, uint8_t mv,
                                   int64_t nrow, int64_t ncol,
                                   int32_t* idxs_ds, int64_t* pit_count,
                                   int64_t* valid_count) {
  const int64_t blk = 64;  // rows per work item
  const int64_t nb = (nrow + blk - 1) / blk;
  std::vector<int64_t> pits_b(nb, 0), valid_b(nb, 0);
  parallel_tiles(nb, [&](int64_t bi, int) {
    const int64_t r1 = std::min(nrow, (bi + 1) * blk);
    int64_t np_ = 0, nv = 0;
    for (int64_t r = bi * blk; r < r1; ++r) {
      const uint8_t* row = flw + r * ncol;
      int32_t* orow = idxs_ds + r * ncol;
      for (int64_t c = 0; c < ncol; ++c) {
        const uint8_t d = row[c];
        if (d == mv) {
          orow[c] = -1;
          continue;
        }
        ++nv;
        const int64_t rd = r + drlut[d], cd = c + dclut[d];
        const bool pit = drlut[d] == 0 && dclut[d] == 0;
        const bool outside = rd < 0 || rd >= nrow || cd < 0 || cd >= ncol;
        if (pit || outside || flw[rd * ncol + cd] == mv) {
          orow[c] = (int32_t)(r * ncol + c);
          ++np_;
        } else {
          orow[c] = (int32_t)(rd * ncol + cd);
        }
      }
    }
    pits_b[bi] = np_;
    valid_b[bi] = nv;
  });
  int64_t tp = 0, tv = 0;
  for (int64_t b = 0; b < nb; ++b) {
    const int64_t p = pits_b[b], v = valid_b[b];
    pits_b[b] = tp;
    tp += p;
    tv += v;
  }
  *pit_count = tp;
  *valid_count = tv;
}

// second pass: fill the ascending pit index list (idxs_ds[i] == i)
extern "C" void flw_collect_pits(const int32_t* idxs_ds, int64_t n,
                                 int32_t* pits) {
  int64_t k = 0;
  for (int64_t i = 0; i < n; ++i)
    if (idxs_ds[i] == (int32_t)i) pits[k++] = (int32_t)i;
}

// sequential downward path-sum sweep over the cached preorder (parents
// first): out[i] = w[i] + out[ds(i)] — the reference-style numba loop
// (streams.py:272-315 etc.) as a native -O3 CPU baseline for the bench.
extern "C" void downward_sweep(const int64_t* ids, const int64_t* seq,
                               int64_t k, const double* w, double* out) {
  for (int64_t j = 0; j < k; ++j) {
    const int64_t i = seq[j];
    const int64_t d = ids[i];
    out[i] = w[i] + (d == i ? 0.0 : out[d]);
  }
}
