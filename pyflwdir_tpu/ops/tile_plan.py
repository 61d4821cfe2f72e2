"""Hierarchical tile-local accumulation plan (the north-star kernel).

The global router plans (:mod:`ops.accel` / :mod:`ops.accel_big`) move the
whole array through 2-3 full static permutations per accumulation (~150
bytes/cell of HBM traffic).  This module replaces them with a two-level
decomposition whose global data movement is two streaming passes:

* the raster is cut into ``(tile_rows, 128)`` raster tiles; the flow graph
  restricted to a tile is a forest whose roots are pits and tile-exit
  cells.  Each tile gets its own DFS-interval plan (``ops/plan.py``
  identity) that resolves **entirely in VMEM**: a 5-stage local router
  (``ops/router.py``) permutes the tile to local preorder, a register
  cumsum + lane gathers produce every subtree sum, and the inverse router
  (no extra coloring: :meth:`RouterPlan.inverse`) restores raster order.
* flow crossing tile edges is exact: **pass A** computes each tile's
  local-root subtree sums; a small **coarse accumulation** over the
  root->entry graph (~n/80 nodes; :class:`ops.accel_big.BigAccelPlan` in
  slot mode, or plain gathers when tiny) yields the total flow entering
  every tile; **pass C** re-runs the local plan with those entry values
  injected as source terms, since ``accu[i] = sum over local subtree of
  (data + injected)``.

Per-cell HBM traffic is ~2 reads + 1 write of data plus ~15 bytes of int8
plan tables — an order of magnitude below the global routers — and both
passes are single fused Pallas kernels on TPU (grid over power-of-two
tile blocks, all routing/gather work in VMEM).  Off TPU the same bodies
run vmapped over tiles through XLA.

All value movement is bijective routing, prefix sums and lane gathers on
the VPU: exits, entries and far-interval deliveries each ride dedicated
5-stage routers (the coarse level pre-sums duplicate entry inflows at
per-cell entry nodes so entry slots stay unique), and the rare
duplicate-depth overflow falls back to a dense group expansion (packed
distinct ends + a static row-pair one-hot, the only MXU use — on exact
signed-16-bit planes with HIGHEST precision). Integer inputs accumulate
exactly in int32; float inputs run in float32 with per-tile
O(eps * tile_total) error plus a compensated coarse level — tighter than
a single global float32 prefix sum.

:meth:`TilePlan.accumulate_down` is the exact transpose of
:meth:`TilePlan.accumulate` (same routers, transposed selection stages,
suffix sums): one primitive for downstream-path sums, root broadcasts
(basins, HAND, fillnodata-up) and stream distances at the same
two-streaming-pass cost; both operators also run sharded under
``shard_map`` with a single ``all_gather`` per sweep.

Semantics match :func:`ops.plan.accumulate_planned` (reference sweep
``accu[ds[i]] += accu[i]`` over the topological order, streams.py:37-41)
for valid loop-free graphs; cells on a cycle or draining into a missing
cell differ (global plan passes them through, the tile plan accumulates
their tile-local part) — both are invalid inputs in the reference too.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .accel_big import BigAccelPlan
from .plan import DfsPlan, accumulate_planned, build_plan
from .router import RouterPlan, _S, bipartite_color


def _color_tiles(u, v, nside, deg, chunk=256):
    """Per-tile bipartite Hall colorings via chunked disjoint unions.

    ``u``/``v`` are (NT, E) per-tile endpoints in [0, nside); each chunk
    of tiles becomes one deg-regular union multigraph (per-tile vertex
    offsets keep components disjoint) colored by a single native
    Euler-split call — O(E log deg) total, ~256x fewer calls.
    """
    import os
    from concurrent.futures import ThreadPoolExecutor

    NT, E = u.shape
    out = np.empty((NT, E), np.int32)

    def one(t0):
        cn = min(chunk, NT - t0)
        off = np.arange(cn, dtype=np.int64)[:, None] * nside
        cu = (u[t0 : t0 + cn] + off).ravel()
        cv = (v[t0 : t0 + cn] + off).ravel()
        col = bipartite_color(cu, cv, cn * nside, cn * nside, deg)
        out[t0 : t0 + cn] = col.reshape(cn, E)

    starts = range(0, NT, chunk)
    nw = min(os.cpu_count() or 1, len(starts))
    if nw <= 1:
        for t0 in starts:
            one(t0)
    else:  # the native colorer releases the GIL for the chunk duration
        with ThreadPoolExecutor(nw) as ex:
            list(ex.map(one, starts))
    return out


def _native(name):
    """Fetch a native tile-plan builder from the runtime, or None."""
    try:
        from .. import runtime

        return getattr(runtime, name, None)
    except ImportError:
        return None


def _inv_rows(t):
    """Row-wise inverse of stacked permutation tables (..., S)."""
    nat = _native("tile_inv_rows")
    if nat is not None and t.dtype == np.int8:
        return nat(t)
    out = np.zeros_like(t)
    np.put_along_axis(
        out,
        t.astype(np.int64),
        np.broadcast_to(np.arange(t.shape[-1], dtype=t.dtype), t.shape),
        -1,
    )
    return out


def _pad_bij(tk, dk, sk, NT, T):
    """Dispatch :func:`_pad_bijection_stacked` to the native builder when
    available (``tk`` must be ascending, as all call sites guarantee)."""
    nat = _native("tile_pad_bijection")
    if nat is not None:
        return nat(tk, dk, sk, NT, T)
    return _pad_bijection_stacked(
        np.asarray(tk), np.asarray(dk), np.asarray(sk), NT, T
    )


def _pad_bijection_stacked(tk, dk, sk, NT, T):
    """Per-tile bijections sigma (NT, T) with ``sigma[tk, dk] = sk``.

    ``tk``/``dk``/``sk`` are flat arrays of (tile, dest, src) triples with
    per-tile-unique dests and srcs; free dests pair with free srcs in
    index order (vectorized: rank free slots by a row cumsum, meet by
    rank). Stacked analogue of :func:`ops.accel._pad_bijection`.
    """
    sigma = np.full((NT, T), -1, np.int32)
    sigma[tk, dk] = sk.astype(np.int32)
    known_src = np.zeros((NT, T), bool)
    known_src[tk, sk] = True
    free_dst = sigma < 0
    rank_d = np.cumsum(free_dst, axis=1, dtype=np.int32)  # T <= 2^16
    rank_s = np.cumsum(~known_src, axis=1, dtype=np.int32)
    rows, cols = np.nonzero(free_dst)
    dst_list = np.empty((NT, T), np.int32)
    dst_list[rows, rank_d[rows, cols] - 1] = cols
    rows, cols = np.nonzero(~known_src)
    src_list = np.empty((NT, T), np.int32)
    src_list[rows, rank_s[rows, cols] - 1] = cols
    nfree = rank_d[:, -1]
    fr, fc = np.nonzero(np.arange(T) < nfree[:, None])
    sigma[fr, dst_list[fr, fc]] = src_list[fr, fc]
    return sigma

__all__ = ["TilePlan", "build_tile_plan"]

_HIGH = lax.Precision.HIGHEST
# below this many coarse nodes a plain XLA-gather coarse level is cheaper
# than building 2^21-padded routers
_COARSE_ROUTER_MIN = 200_000
# up to this many padded coarse slots the single-chunk 5-stage VMEM
# router (one fused Pallas kernel per permutation) solves the coarse
# level ~6x faster than the chunked 7-stage BigAccelPlan machinery.
# Bound: the fused kernel holds in+out int32 planes plus 5 int8 stage
# tables (~8.3 B/slot) against the ~16 MB scoped-vmem limit on v5e.
_COARSE_SMALL_MAX = 1_870_000


def _r128(x):
    return max(((int(x) + 127) // 128) * 128, 128)


def _on_tpu():
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# small coarse level: plain gathers (CPU tests / small grids)
# ---------------------------------------------------------------------------
class _CoarseGather:
    """Coarse accumulation via the DFS plan + XLA gathers (small m)."""

    def __init__(self, dfs: DfsPlan, in_slot, out_slot, n_in, n_out):
        self.dfs = dfs
        self.n_in = int(n_in)
        self.n_out = int(n_out)
        self.in_slot = np.asarray(in_slot, np.int64)
        # zero padding for slots past the real input (entry nodes)
        self._in_pad = max(
            0, int(self.in_slot.max(initial=-1)) + 1 - self.n_in
        )
        osel = np.asarray(out_slot, np.int64) >= 0
        self.src_nodes = np.nonzero(osel)[0].astype(np.int32)
        self.dst_slots = np.asarray(out_slot, np.int64)[osel].astype(np.int32)

    def arrays(self):
        return {
            "in_slot": jnp.asarray(self.in_slot.astype(np.int32)),
            "src": jnp.asarray(self.src_nodes),
            "dst": jnp.asarray(self.dst_slots),
        }

    def accumulate(self, x_flat, arrs=None):
        if arrs is None:
            arrs = self.arrays()
        if self._in_pad:  # guaranteed-zero slots for no-input entry nodes
            x_flat = jnp.concatenate(
                [x_flat, jnp.zeros(self._in_pad, x_flat.dtype)]
            )
        xn = jnp.take(x_flat, arrs["in_slot"])
        acc = accumulate_planned(self.dfs, xn)
        out = jnp.zeros(self.n_out, acc.dtype)
        return out.at[arrs["dst"]].set(jnp.take(acc, arrs["src"]), mode="drop")


# ---------------------------------------------------------------------------
# mid-size coarse level: slot-mode single-chunk 5-stage VMEM routers
# ---------------------------------------------------------------------------
class _CoarseRouterSmall:
    """Slot-mode coarse accumulation on the single-chunk 5-stage router.

    Same DFS-interval identity and slot semantics as
    :class:`ops.accel_big.BigAccelPlan` in slot mode, but each of the 2-3
    permutations is one :class:`ops.router.RouterPlan` — a single fused
    VMEM Pallas kernel on TPU instead of the chunked 7-stage chain (five
    kernels + gather + transposes each). At the tile plan's typical coarse
    size (~1-2M padded slots) this cuts the coarse solve from ~6.6 ms to
    ~1 ms; capacity is 2^21 padded slots (above that the chunked plan
    takes over). Integer inputs are exact in int32; float inputs run
    compensated (double-single prefix sums, as the big plan).
    """

    def __init__(self, dfs, in_slot, out_slot, n_in=None, routers=None):
        from .accel import _pad_bijection
        from .router import RouterPlan

        pre = dfs.preorder_np.astype(np.int64)
        pos = dfs.pos_np.astype(np.int64)
        size = dfs.size_np.astype(np.int64)
        n_cells = pos.size
        n_tree = pre.size
        in_slot = np.asarray(in_slot, dtype=np.int64)
        out_slot = np.asarray(out_slot, dtype=np.int64)
        # nodes whose in_slot lies past n_in (the tile plan's entry nodes,
        # which read guaranteed-zero slots) are masked to zero after the
        # input routing instead of widening the padded layout — this keeps
        # n_pad (and the fused kernel's VMEM footprint) at the exit-slot
        # count rather than exits + entries
        self.n_in = (
            int(n_in)
            if n_in is not None
            else (int(in_slot.max() + 1) if in_slot.size else 1)
        )
        self.n_out = int(out_slot.max() + 1) if out_slot.size else 1
        n_pad = max(n_cells, n_tree, self.n_in, self.n_out, 1)
        n_pad = -(-n_pad // (_S * _S)) * (_S * _S)
        self.ok = n_pad <= _S * _S * _S
        if not self.ok:
            return
        self.n_pad = n_pad
        Y = n_pad // _S

        k = np.arange(n_tree, dtype=np.int64)
        d = size[pre] - 1
        far = d >= _S
        # stashes for the lazy downward machinery (build_down)
        self._in_slot_pre = in_slot[pre]
        self._out_slot_pre = out_slot[pre]
        self._down_np = None
        has_in = in_slot[pre] < self.n_in
        sig_in = _pad_bijection(k[has_in], in_slot[pre[has_in]], n_pad)
        in_sel = np.zeros(n_pad, dtype=bool)
        in_sel[k[has_in]] = True
        osel = (pos >= 0) & (out_slot >= 0)
        cells_o = np.nonzero(osel)[0]
        sig_out = _pad_bijection(out_slot[cells_o], pos[cells_o], n_pad)

        lane = k % _S
        near_sel = np.zeros(n_pad, dtype=bool)
        near_sel[k[~far]] = True
        idx_near = np.zeros(n_pad, dtype=np.int8)
        ln = lane + np.where(far, 0, d)
        idx_near[:n_tree] = (ln % _S).astype(np.int8)
        sel_next = np.zeros(n_pad, dtype=bool)
        sel_next[:n_tree] = ln >= _S
        tree_mask = np.zeros(n_pad, dtype=bool)
        tree_mask[out_slot[cells_o]] = True
        self._np = {
            "near_sel": near_sel.reshape(Y, _S),
            "idx_near": idx_near.reshape(Y, _S),
            "sel_next": sel_next.reshape(Y, _S),
            "tree_mask": tree_mask.reshape(Y, _S),
            "in_sel": in_sel.reshape(Y, _S),
        }

        # far intervals: dense group expansion (BigAccelPlan's scheme)
        far = far & (out_slot[pre] >= 0)
        k_far = k[far]
        self.has_far = k_far.size > 0
        sig_far = None
        if self.has_far:
            e_far = k_far + d[far]
            order = np.lexsort((k_far, e_far))
            k_sorted = k_far[order]
            e_sorted = e_far[order]
            uniq_e, inv = np.unique(e_sorted, return_inverse=True)
            D = uniq_e.size
            F = k_far.size
            d_rows = -(-D // _S)
            uniq_pad = np.zeros(d_rows * _S, dtype=np.int64)
            uniq_pad[:D] = uniq_e
            self.d_rows = d_rows
            # distinct interval-end prefix values are *routed* into the
            # packed group array (ends are distinct -> bijection): XLA 1-D
            # gathers over the padded layout cost ms on TPU
            sig_exp = _pad_bijection(
                np.arange(D, dtype=np.int64), uniq_e, n_pad
            )
            f_rows = -(-F // _S)
            g_of_slot = np.zeros(f_rows * _S, dtype=np.int64)
            g_of_slot[:F] = inv
            g_of_slot[F:] = inv[-1] if F else 0
            g2 = g_of_slot.reshape(f_rows, _S)
            rlo = g2.min(axis=1) // _S
            bidx = g2 - (rlo * _S)[:, None]
            if bidx.max() >= 2 * _S:
                raise AssertionError("far group rows span more than a row pair")
            self.f_rows = f_rows
            dst_far = out_slot[pre[k_sorted]]
            sig_far = _pad_bijection(
                dst_far, np.arange(F, dtype=np.int64), n_pad
            )
            far_cell = np.zeros(n_pad, dtype=bool)
            far_cell[dst_far] = True
            self._np.update(
                {
                    "uniq_e": uniq_pad.astype(np.int32),
                    "rlo": rlo.astype(np.int32),
                    "bidx_hi": bidx >= _S,
                    "bidx": (bidx % _S).astype(np.int8),
                    "far_cell": far_cell.reshape(Y, _S),
                }
            )

        if routers is not None:
            self.r_in = RouterPlan(routers["G"], *routers["r_in"])
            self.r_out = RouterPlan(routers["G"], *routers["r_out"])
            self.r_far = (
                RouterPlan(routers["G"], *routers["r_far"])
                if self.has_far
                else None
            )
            self.r_exp = (
                RouterPlan(routers["G"], *routers["r_exp"])
                if self.has_far
                else None
            )
        else:
            from concurrent.futures import ThreadPoolExecutor

            jobs = {"r_in": sig_in, "r_out": sig_out}
            if sig_far is not None:
                jobs["r_far"] = sig_far
                jobs["r_exp"] = sig_exp
            with ThreadPoolExecutor(len(jobs)) as ex:
                futs = {
                    name: ex.submit(RouterPlan.build, sig)
                    for name, sig in jobs.items()
                }
                built = {name: f.result() for name, f in futs.items()}
            self.r_in = built["r_in"]
            self.r_out = built["r_out"]
            self.r_far = built.get("r_far")
            self.r_exp = built.get("r_exp")
        self._dev = None

    def router_tables(self):
        """Stage tables for external disk caching (ops/plan_io.py)."""
        tabs = lambda r: (r.i1_np, r.iS1_np, r.iGp_np, r.iS2_np, r.i3_np)
        out = {
            "G": np.int64(self.r_in.G),
            "r_in": tabs(self.r_in),
            "r_out": tabs(self.r_out),
        }
        if self.has_far:
            out["r_far"] = tabs(self.r_far)
            out["r_exp"] = tabs(self.r_exp)
        return out

    # -- downward (transpose) coarse solve ------------------------------
    def build_down(self, dfs, routers=None):
        """Build the downward-solve machinery: the coarse forest's
        inclusive downstream-path sum as pure router passes + flat
        prefix/suffix sums (the per-tile pass-D1 identity lifted to the
        coarse graph). Replaces the XLA 1-D gather/scatter delta solve
        (~40 ms at 1.3M coarse nodes on TPU — 1-D gathers do not tile)
        with ~6 VMEM router kernels (~1.5 ms).

        Needs 3 new colorings (es / dea / deb); the in/out routings reuse
        the upward routers' inverses for free (palindromic schedule).
        """
        from .accel import _pad_bijection
        from .router import RouterPlan

        if getattr(self, "_down_np", None) is not None:
            return
        pre = dfs.preorder_np.astype(np.int64)
        size = dfs.size_np.astype(np.int64)
        n_tree = pre.size
        n_pad = self.n_pad
        k = np.arange(n_tree, dtype=np.int64)
        ends = k + size[pre] - 1

        if routers is None:
            order = np.argsort(ends, kind="stable")  # (end, k) sort
            sig_es = _pad_bijection(k, order, n_pad)
            e_sorted = ends[order]
            bnd = np.empty(n_tree, dtype=bool)
            if n_tree:
                bnd[0] = True
                np.not_equal(e_sorted[1:], e_sorted[:-1], out=bnd[1:])
            gstart = np.flatnonzero(bnd)
            glast = np.append(gstart[1:] - 1, n_tree - 1) if n_tree else gstart
            gend = e_sorted[gstart] if n_tree else gstart
            sig_dea = _pad_bijection(gend, glast, n_pad)
            b0 = gstart == 0
            sig_deb = _pad_bijection(gend[~b0], gstart[~b0] - 1, n_pad)
        de_sel = np.zeros(n_pad, dtype=bool)
        de_b0 = np.zeros(n_pad, dtype=bool)
        if n_tree:
            de_sel[np.unique(ends)] = True
            de_b0[ends[np.argmin(ends)]] = True  # the first sorted group

        # masks: which preorder slots carry an input (nodes with an
        # out_slot — entry nodes) and which in_slot positions receive a
        # result (all on-tree nodes; entry nodes' in_slots sit past the
        # exit region and are sliced away by the caller)
        w_sel = np.zeros(n_pad, dtype=bool)
        w_sel[k[self._out_slot_pre >= 0]] = True
        a_sel = np.zeros(n_pad, dtype=bool)
        isp = self._in_slot_pre
        a_sel[isp[isp < self.n_in]] = True

        Y = n_pad // _S
        self._down_np = {
            "de_sel": de_sel.reshape(Y, _S),
            "de_b0": de_b0.reshape(Y, _S),
            "w_sel": w_sel.reshape(Y, _S),
            "a_sel": a_sel.reshape(Y, _S),
        }
        if routers is not None:
            self.r_es = RouterPlan(routers["G"], *routers["r_es"])
            self.r_dea = RouterPlan(routers["G"], *routers["r_dea"])
            self.r_deb = RouterPlan(routers["G"], *routers["r_deb"])
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(3) as ex:
                futs = {
                    "r_es": ex.submit(RouterPlan.build, sig_es),
                    "r_dea": ex.submit(RouterPlan.build, sig_dea),
                    "r_deb": ex.submit(RouterPlan.build, sig_deb),
                }
                built = {n: f.result() for n, f in futs.items()}
            self.r_es = built["r_es"]
            self.r_dea = built["r_dea"]
            self.r_deb = built["r_deb"]
        # free inverses: pkf(out_slot layout) -> preorder; preorder ->
        # in_slot (exit) layout
        self.r_win = self.r_out.inverse()
        self.r_aout = self.r_in.inverse()
        self._down_dev = None

    def down_router_tables(self):
        tabs = lambda r: (r.i1_np, r.iS1_np, r.iGp_np, r.iS2_np, r.i3_np)
        return {
            "G": np.int64(self.r_es.G),
            "r_es": tabs(self.r_es),
            "r_dea": tabs(self.r_dea),
            "r_deb": tabs(self.r_deb),
        }

    def down_arrays(self):
        if self._down_dev is None:
            dev = {k: jnp.asarray(v) for k, v in self._down_np.items()}
            tabs = lambda r: tuple(
                jnp.asarray(a)
                for a in (r.i1_np, r.iS1_np, r.iGp_np, r.iS2_np, r.i3_np)
            )
            for name in ("r_es", "r_dea", "r_deb", "r_win", "r_aout"):
                dev[name] = tabs(getattr(self, name))
            if any(
                isinstance(x, jax.core.Tracer)
                for x in jax.tree_util.tree_leaves(dev)
            ):
                return dev
            self._down_dev = dev
        return self._down_dev

    @staticmethod
    def _flat_cumsum(xp):
        c_row = jnp.cumsum(xp, axis=1)
        t = c_row[:, -1]
        off = jnp.concatenate([jnp.zeros(1, t.dtype), jnp.cumsum(t)[:-1]])
        return c_row + off[:, None]

    @staticmethod
    def _flat_suffix(xp):
        c_row = jnp.cumsum(xp[:, ::-1], axis=1)[:, ::-1]
        t = xp.sum(axis=1)
        off = jnp.concatenate(
            [jnp.cumsum(t[::-1])[::-1][1:], jnp.zeros(1, t.dtype)]
        )
        return c_row + off[:, None]

    @staticmethod
    def _flat_shift_left(xp):
        v = xp.reshape(-1)
        return jnp.concatenate([v[1:], jnp.zeros(1, v.dtype)]).reshape(
            xp.shape
        )

    def accumulate_down(self, pkf, arrs=None):
        """Downward coarse solve: ``pkf`` in the packed-entry (out_slot)
        layout -> inclusive path-sum A delivered at the exit (in_slot)
        layout, zero at non-root slots. Transpose of :meth:`accumulate`.
        """
        if arrs is None:
            arrs = self.down_arrays()
        a = arrs
        Y = self.n_pad // _S
        dtype = pkf.dtype
        is_int = jnp.issubdtype(dtype, jnp.integer) or dtype == jnp.bool_
        acc = jnp.int32 if is_int else jnp.float32
        x = jnp.asarray(pkf).astype(acc)
        x2 = jnp.concatenate(
            [x, jnp.zeros(self.n_pad - x.shape[0], acc)]
        ).reshape(Y, _S)
        zero = jnp.zeros((), acc)
        u = jnp.where(a["w_sel"], self._route("r_win", x2, arrs), zero)
        ues = self._route("r_es", u, arrs)
        cs = self._flat_cumsum(ues)
        gA = self._route("r_dea", cs, arrs)
        gB = self._route("r_deb", cs, arrs)
        ge = jnp.where(
            a["de_sel"], gA - jnp.where(a["de_b0"], zero, gB), zero
        )
        inner = ge - self._flat_shift_left(u)
        z = self._flat_suffix(inner)
        out = jnp.where(a["a_sel"], self._route("r_aout", z, arrs), zero)
        return out.reshape(-1)[: self.n_in].astype(dtype)

    def arrays(self):
        """Device pytree for :meth:`accumulate` (pass as a jit argument)."""
        if self._dev is None:
            dev = {k: jnp.asarray(v) for k, v in self._np.items()}
            tabs = lambda r: tuple(
                jnp.asarray(a)
                for a in (r.i1_np, r.iS1_np, r.iGp_np, r.iS2_np, r.i3_np)
            )
            dev["r_in"] = tabs(self.r_in)
            dev["r_out"] = tabs(self.r_out)
            if self.has_far:
                dev["r_far"] = tabs(self.r_far)
                dev["r_exp"] = tabs(self.r_exp)
            if any(
                isinstance(x, jax.core.Tracer)
                for x in jax.tree_util.tree_leaves(dev)
            ):
                return dev
            self._dev = dev
        return self._dev

    # above this many padded slots the whole-array single-kernel chain
    # (in + out + 5 stage tables + scratch, ~12.7 B/slot) exceeds the
    # ~16 MB scoped VMEM and Mosaic spills catastrophically; switch to
    # the gridded 3-kernel chain (still ~5 HBM round trips total)
    _SINGLE_KERNEL_MAX = 1_150_000

    def _route(self, name, x2, arrs):
        from .router import RouterPlan

        i1, iS1, iG, iS2, i3 = arrs[name]
        G = self.n_pad // (_S * _S)
        if not _on_tpu():
            ta = lambda v, idx: jnp.take_along_axis(
                v, idx.astype(jnp.int32), axis=1
            )
            return RouterPlan._chain(x2, G, i1, iS1, iG, iS2, i3, ta)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        ta = lambda v, idx: jnp.take_along_axis(
            v, idx.astype(jnp.int32), axis=1
        )
        if self.n_pad <= self._SINGLE_KERNEL_MAX:

            def kernel(x_ref, i1r, iS1r, iGr, iS2r, i3r, o_ref):
                o_ref[:] = RouterPlan._chain(
                    x_ref[:], G, i1r[:], iS1r[:], iGr[:], iS2r[:], i3r[:], ta
                )

            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x2, i1, iS1, iG, iS2, i3)

        # gridded chain: stages 1-2 and 4-5 are independent across the
        # g axis (their (128,128) rotations run in VMEM per g-block);
        # only the middle g-axis gather needs a cross-block layout, via
        # two XLA transposes. 3 Pallas kernels + 2 transposes total.
        vm = pltpu.VMEM
        GB = 1
        while GB * 2 <= 16 and G % (GB * 2) == 0:
            GB *= 2

        def k12(x_ref, i1r, iS1r, o_ref):
            v = ta(x_ref[:], i1r[:])
            v = v.reshape(GB, _S, _S).transpose(0, 2, 1)
            o_ref[:] = ta(v.reshape(GB * _S, _S), iS1r[:])

        rows = pl.BlockSpec((GB * _S, _S), lambda k: (k, 0), memory_space=vm)
        v = pl.pallas_call(
            k12,
            grid=(G // GB,),
            in_specs=[rows] * 3,
            out_specs=rows,
            out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        )(x2, i1, iS1)  # -> (g, l, s) layout
        v = v.reshape(G, _S, _S).transpose(2, 1, 0).reshape(_S * _S, G)

        RB = 2048

        def kg(v_ref, iGr, o_ref):
            o_ref[:] = ta(v_ref[:], iGr[:])

        rowsg = pl.BlockSpec((RB, G), lambda k: (k, 0), memory_space=vm)
        v = pl.pallas_call(
            kg,
            grid=(_S * _S // RB,),
            in_specs=[rowsg] * 2,
            out_specs=rowsg,
            out_shape=jax.ShapeDtypeStruct((_S * _S, G), x2.dtype),
        )(v, iG)
        v = v.reshape(_S, _S, G).transpose(2, 1, 0).reshape(G * _S, _S)

        def k45(v_ref, iS2r, i3r, o_ref):
            w = ta(v_ref[:], iS2r[:])
            w = w.reshape(GB, _S, _S).transpose(0, 2, 1)
            o_ref[:] = ta(w.reshape(GB * _S, _S), i3r[:])

        return pl.pallas_call(
            k45,
            grid=(G // GB,),
            in_specs=[rows] * 3,
            out_specs=rows,
            out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        )(v, iS2, i3)

    def _gather_pair(self, c, a):
        """Near-interval end / start values of the prefix plane ``c``.

        The end gather is a genuine per-slot lane gather — run it as the
        row-blocked Pallas kernel (XLA's take_along_axis gather lowers to
        ~13 ms per call at this size on TPU); the start value is just the
        flat predecessor, a 1-D shift."""
        from .router_big import lane_gather_tiled

        zrow = jnp.zeros((1, _S), c.dtype)
        c_next = jnp.concatenate([c[1:], zrow], axis=0)
        g_near = jnp.where(
            a["sel_next"],
            lane_gather_tiled(c_next, a["idx_near"]),
            lane_gather_tiled(c, a["idx_near"]),
        )
        v = c.reshape(-1)
        g_prev = jnp.concatenate([jnp.zeros(1, c.dtype), v[:-1]]).reshape(
            c.shape
        )
        return g_near, g_prev

    def _far_values(self, c, a, arrs):
        """Interval-end prefix values delivered to far slots: the packed
        distinct-end values come from the r_exp *router* (not a 1-D XLA
        gather), the duplicate broadcast is a static row-pair + Pallas
        lane gather, and r_far delivers the copies."""
        from .router_big import lane_gather_tiled

        Y = self.n_pad // _S
        g = self._route("r_exp", c, arrs)[: self.d_rows]
        g_lo = jnp.take(g, a["rlo"], axis=0)
        g_hi = jnp.take(
            g, jnp.minimum(a["rlo"] + 1, self.d_rows - 1), axis=0
        )
        w = jnp.where(
            a["bidx_hi"],
            lane_gather_tiled(g_hi, a["bidx"]),
            lane_gather_tiled(g_lo, a["bidx"]),
        )
        w_full = jnp.zeros((Y, _S), c.dtype).at[: self.f_rows].set(w)
        return self._route("r_far", w_full, arrs)

    def accumulate(self, data, arrs=None):
        """Slot-mode accumulation: input at ``in_slot`` layout, output at
        ``out_slot`` layout (slots without a value return 0)."""
        from .accel_big import BigAccelPlan

        if arrs is None:
            arrs = self.arrays()
        a = arrs
        Y = self.n_pad // _S
        dtype = data.dtype
        is_int = jnp.issubdtype(dtype, jnp.integer) or dtype == jnp.bool_
        acc = jnp.int32 if is_int else jnp.float32
        x = jnp.asarray(data).astype(acc)
        x2 = jnp.concatenate(
            [x, jnp.zeros(self.n_pad - x.shape[0], acc)]
        ).reshape(Y, _S)

        xp = jnp.where(
            a["in_sel"],
            self._route("r_in", x2, arrs),
            jnp.zeros((), acc),
        )
        if is_int:
            c_row = jnp.cumsum(xp, axis=1)
            t = c_row[:, -1]
            off = jnp.concatenate(
                [jnp.zeros(1, t.dtype), jnp.cumsum(t)[:-1]]
            )
            c = c_row + off[:, None]
            g_near, g_prev = self._gather_pair(c, a)
            outp = jnp.where(a["near_sel"], g_near, 0) - g_prev
            out = self._route("r_out", outp, arrs)
            if self.has_far:
                out = out + jnp.where(
                    a["far_cell"], self._far_values(c, a, arrs), 0
                )
        else:
            zero = jnp.zeros_like(xp)
            hi, lo = lax.associative_scan(
                BigAccelPlan._ds_add, (xp, zero), axis=1
            )
            th_, tl = hi[:, -1], lo[:, -1]
            oh, ol = lax.associative_scan(BigAccelPlan._ds_add, (th_, tl), axis=0)
            oh = jnp.concatenate([jnp.zeros(1, oh.dtype), oh[:-1]])
            ol = jnp.concatenate([jnp.zeros(1, ol.dtype), ol[:-1]])
            chi, clo = BigAccelPlan._ds_add(
                (hi, lo), (oh[:, None], ol[:, None])
            )
            gn_hi, gp_hi = self._gather_pair(chi, a)
            gn_lo, gp_lo = self._gather_pair(clo, a)
            out_hi = self._route(
                "r_out", jnp.where(a["near_sel"], gn_hi - gp_hi, -gp_hi), arrs
            )
            out_lo = self._route(
                "r_out", jnp.where(a["near_sel"], gn_lo - gp_lo, -gp_lo), arrs
            )
            out = out_hi + out_lo
            if self.has_far:
                far = (out_hi + self._far_values(chi, a, arrs)) + (
                    out_lo + self._far_values(clo, a, arrs)
                )
                out = jnp.where(a["far_cell"], far, out)

        res = jnp.where(a["tree_mask"], out, jnp.zeros((), out.dtype))
        return res.reshape(-1)[: self.n_out].astype(dtype)


# ---------------------------------------------------------------------------
# device bodies (shared between the Pallas kernels and the XLA fallback)
# ---------------------------------------------------------------------------
def _taa(v, idx):
    """Lane take_along_axis on 2-D arrays (Mosaic-native on TPU)."""
    return jnp.take_along_axis(v, idx.astype(jnp.int32), axis=-1)


def _mask(t):
    """int8 mask table -> bool (via int32: Mosaic has no int8 lane
    broadcast for the scalar compare)."""
    return t.astype(jnp.int32) != 0


def _split_planes(c):
    """int32 -> exact (hi, lo) float32 planes: c == hi * 2^16 + lo with
    |hi| <= 2^15, |lo| <= 2^15 (both exactly representable in f32)."""
    lo0 = jnp.bitwise_and(c, 0xFFFF)
    wrap = lo0 >= 32768
    lo = jnp.where(wrap, lo0 - 65536, lo0)
    hi = jnp.right_shift(c, 16) + wrap.astype(jnp.int32)
    return (hi.astype(jnp.float32), lo.astype(jnp.float32))


def _to_planes(c, cfg):
    """Selection-matmul planes of ``c``: exact signed-16-bit f32 pair for
    int32 (TPU), a single f32/f64 plane otherwise (f64 is exact for int64
    magnitudes < 2^53)."""
    if cfg["split"]:
        return _split_planes(c)
    return (c.astype(cfg["fdt"]),)


def _combine_planes(planes, cfg):
    if not cfg["split"]:
        return planes[0].astype(cfg["acc"])
    hi, lo = planes
    return hi.astype(jnp.int32) * 65536 + lo.astype(jnp.int32)


def _local_chain(v, i1, is1, ig, is2, i3, G):
    """RouterPlan._chain inlined on a (Y, 128) VMEM value; the G stage is
    skipped when G == 1 (identity)."""
    S = _S
    v = _taa(v, i1)
    v = v.reshape(G, S, S).transpose(0, 2, 1)
    v = _taa(v.reshape(G * S, S), is1)
    if G > 1:
        v = v.reshape(G, S, S).transpose(2, 1, 0)
        v = _taa(v.reshape(S * S, G), ig)
        v = v.reshape(S, S, G).transpose(2, 1, 0)
    v = _taa(v.reshape(G * S, S), is2)
    v = v.reshape(G, S, S).transpose(0, 2, 1)
    return _taa(v.reshape(G * S, S), i3)


def _shift_right(v, s, axis):
    pad = jnp.zeros_like(lax.slice_in_dim(v, 0, s, axis=axis))
    body = lax.slice_in_dim(v, 0, v.shape[axis] - s, axis=axis)
    return jnp.concatenate([pad, body], axis=axis)


def _cumsum_axis(v, axis):
    """Inclusive Hillis-Steele prefix sum (Pallas-lowerable: slices,
    concats and adds only; exact for integers)."""
    n, s = v.shape[axis], 1
    while s < n:
        v = v + _shift_right(v, s, axis)
        s *= 2
    return v


def _cumsum_tile(w):
    """Flat (row-major) inclusive prefix sum of a (Y, 128) VMEM value.

    All intermediates stay (Y, 128): the per-row totals are broadcast
    across lanes with a constant lane gather (Mosaic ICEs on (Y, 1)
    column shapes), then prefix-summed along rows.
    """
    crow = _cumsum_axis(w, 1)
    idx_last = jnp.full(crow.shape, _S - 1, jnp.int32)
    rt = _taa(crow, idx_last)          # row totals, broadcast to all lanes
    rts = _cumsum_axis(rt, 0)          # inclusive prefix over rows
    return crow + rts - rt


def _row_gather(planes, rtab, Y):
    """Static per-row row gather ``out[r, :] = p[rtab[r], :]`` from (Y, 128)
    source planes; ``rtab`` is an (F, 128) row-broadcast int16 table. One
    (F, Y) one-hot and one MXU matmul per plane — exact (pure selection)."""
    fdt = planes[0].dtype
    r1 = lax.slice_in_dim(rtab, 0, 1, axis=1).astype(jnp.int32)  # (F, 1)
    io = lax.broadcasted_iota(jnp.int32, (rtab.shape[0], Y), 1)
    oh = (r1 == io).astype(fdt)
    return [jnp.dot(oh, p, precision=_HIGH) for p in planes]


def _flat_prev(v):
    """``prev[j] = v[j-1]`` over the flat row-major view of (R, 128),
    with prev[0] = 0."""
    lane = lax.broadcasted_iota(jnp.int32, v.shape, 1)
    idx_prev = jnp.mod(lane - 1, _S)
    zrow = jnp.zeros((1, v.shape[1]), v.dtype)
    if v.shape[0] == 1:  # Mosaic rejects (0, 128) slices
        v_prevrow = zrow
    else:
        v_prevrow = jnp.concatenate([zrow, v[:-1]], axis=0)
    return jnp.where(lane == 0, _taa(v_prevrow, idx_prev), _taa(v, idx_prev))


def _ptabs(tb, p):
    """The 5 stage tables of router family ``p`` (ig absent when G=1)."""
    return (
        tb[f"{p}_i1"],
        tb[f"{p}_is1"],
        tb.get(f"{p}_ig"),
        tb[f"{p}_is2"],
        tb[f"{p}_i3"],
    )


def _body_a(x, tb, cfg):
    """Pass A on one (Y, 128) tile: local-root subtree sums (R_rows, 128).

    Exit values route through a dedicated 5-stage router (exit slot j <-
    preorder end of root j — roots have distinct ends, so it is a plain
    bijection: pure VPU lane gathers, dtype-direct and ~10x cheaper per
    sweep than exact-plane one-hot MXU selections, which need 3-pass
    f32 matmuls)."""
    v = _local_chain(x, *_ptabs(tb, "rin"), cfg["G"])
    c = _cumsum_tile(v)
    R = cfg["R_rows"]
    # Mosaic's dynamic lane gather rejects sub-8-sublane operands: keep at
    # least 8 rows through the prev-difference, then slice the real rows
    Rp = max(R, min(8, cfg["Y"]))
    ce = _local_chain(c, *_ptabs(tb, "ex"), cfg["G"])[:Rp]
    return (ce - _flat_prev(ce))[:R]


def _body_a_fused(x, tb, cfg):
    """Pass A that also emits the tile's raw slot prefix sums ``c`` —
    pass C's shared prologue (rin chain + cumsum) computed once per
    sweep instead of twice; :func:`_body_c_core` resumes from ``c``.
    Trades ~8 B/cell of extra HBM traffic (write + re-read of ``c``)
    for the VPU-latency-bound chain/cumsum, which the round-5 profile
    shows dominates both passes."""
    v = _local_chain(x, *_ptabs(tb, "rin"), cfg["G"])
    c = _cumsum_tile(v)
    R = cfg["R_rows"]
    Rp = max(R, min(8, cfg["Y"]))
    ce = _local_chain(c, *_ptabs(tb, "ex"), cfg["G"])[:Rp]
    return (ce - _flat_prev(ce))[:R], c


def _body_c(x, entA, tb, cfg):
    """Pass C on one (Y, 128) tile: final accumulation in raster order.

    Entry inflows are injected *after* the prefix sum as a cumulative
    step function: entries are packed in slot order, so with ``pc`` the
    flat prefix of the packed entries, ``c[s] += pc[#entries at slots
    <= s - 1]`` — one small cumsum plus one row-broadcast lane gather
    per entry row (~3x cheaper than routing the entries through a full
    5-stage chain; linearity of the prefix sum makes it exact)."""
    v = _local_chain(x, *_ptabs(tb, "rin"), cfg["G"])
    c = _cumsum_tile(v)
    return _body_c_core(x, c, entA, tb, cfg)


def _body_c_core(x, c, entA, tb, cfg):
    """Pass-C tail from the tile's raw slot prefix sums ``c``: entry
    step-injection, interval differences (near + far), outward routing
    and the non-tree passthrough. Shared by the standalone pass C and
    the fused A→C path (:func:`_body_a_fused`)."""
    Y, G = cfg["Y"], cfg["G"]
    if cfg["has_entries"]:
        E_rows = entA.shape[0]
        pad_rows = max(8 - E_rows, 0)  # Mosaic: no sub-8-sublane gathers
        ev = entA
        if pad_rows > 0:
            ev = jnp.concatenate(
                [ev, jnp.zeros((pad_rows, _S), ev.dtype)], axis=0
            )
        pc = _cumsum_tile(ev)
        step = None
        for r in range(E_rows):
            rowv = jnp.broadcast_to(
                lax.slice_in_dim(pc, r, r + 1, axis=0), (Y, _S)
            )
            g = _taa(rowv, tb["ent_lane"])
            if step is None:
                step = g
            else:
                step = jnp.where(
                    tb["ent_row"].astype(jnp.int32) == r, g, step
                )
        c = c + jnp.where(
            _mask(tb["ent_sel"]), step, jnp.zeros((), c.dtype)
        )

    zrow = jnp.zeros((1, _S), c.dtype)
    c_next = jnp.concatenate([c[1:], zrow], axis=0)
    g_near = jnp.where(
        _mask(tb["sel_next"]),
        _taa(c_next, tb["idx_near"]),
        _taa(c, tb["idx_near"]),
    )
    g_prev = _flat_prev(c)

    zero = jnp.zeros((), c.dtype)
    outp = jnp.where(_mask(tb["near_sel"]), g_near, zero) - g_prev
    if cfg["far_mode"] == "router":
        # far interval-end values via two bijective routings (AccelPlan's
        # b-block trick for duplicated ends): c -> distinct ends at slots
        # b*j -> lane-broadcast within b-blocks -> each far cell's dense
        # preorder slot. Pure lane gathers, dtype-direct (no planes).
        w = _local_chain(c, *_ptabs(tb, "fexp"), G)
        b = cfg["b"]
        if b > 1:
            lane = lax.broadcasted_iota(jnp.int32, w.shape, 1)
            w = _taa(w, (lane // b) * b)
        fv = _local_chain(w, *_ptabs(tb, "ffar"), G)
        outp = outp + jnp.where(_mask(tb["far_sel"]), fv, zero)
    elif cfg["far_mode"] == "packed":
        # dense group expansion for pathological duplicate depth (see
        # __init__): pack distinct-end prefix values via the fexp router,
        # broadcast each to its duplicates through a static row-pair
        # one-hot + lane gather (exact per plane), deliver via ffar
        w = _local_chain(c, *_ptabs(tb, "fexp"), G)
        planes = _to_planes(w, cfg)
        lo = _row_gather(planes, tb["far_rlo"], Y)
        hi = _row_gather(planes, tb["far_rhi"], Y)
        bhi = _mask(tb["far_bhi"])
        vals = [
            jnp.where(bhi, _taa(h, tb["far_bidx"]), _taa(l, tb["far_bidx"]))
            for l, h in zip(lo, hi)
        ]
        wv = _combine_planes(vals, cfg)
        pad_rows = Y - wv.shape[0]
        if pad_rows > 0:
            wv = jnp.concatenate(
                [wv, jnp.zeros((pad_rows, _S), wv.dtype)], axis=0
            )
        fv = _local_chain(wv, *_ptabs(tb, "ffar"), G)
        outp = outp + jnp.where(_mask(tb["far_sel"]), fv, zero)

    out = _local_chain(outp, *_ptabs(tb, "rout"), G)
    return jnp.where(_mask(tb["tree_mask"]), out, x)


def _flat_next(v):
    """``next[j] = v[j+1]`` over the flat row-major view of (R, 128),
    with next[last] = 0."""
    lane = lax.broadcasted_iota(jnp.int32, v.shape, 1)
    idx_next = jnp.mod(lane + 1, _S)
    zrow = jnp.zeros((1, v.shape[1]), v.dtype)
    if v.shape[0] == 1:  # Mosaic rejects (0, 128) slices
        v_nextrow = zrow
    else:
        v_nextrow = jnp.concatenate([v[1:], zrow], axis=0)
    return jnp.where(
        lane == _S - 1, _taa(v_nextrow, idx_next), _taa(v, idx_next)
    )


def _shift_left(v, s, axis):
    pad = jnp.zeros_like(lax.slice_in_dim(v, 0, s, axis=axis))
    body = lax.slice_in_dim(v, s, v.shape[axis], axis=axis)
    return jnp.concatenate([body, pad], axis=axis)


def _suffix_axis(v, axis):
    """Inclusive Hillis-Steele suffix sum (mirror of :func:`_cumsum_axis`)."""
    n, s = v.shape[axis], 1
    while s < n:
        v = v + _shift_left(v, s, axis)
        s *= 2
    return v


def _suffix_tile(w):
    """Flat (row-major) inclusive *suffix* sum of a (Y, 128) VMEM value
    (mirror of :func:`_cumsum_tile`; exact for integers)."""
    crow = _suffix_axis(w, 1)
    idx_first = jnp.zeros(crow.shape, jnp.int32)
    rt = _taa(crow, idx_first)  # row totals, broadcast to all lanes
    rts = _suffix_axis(rt, 0)   # inclusive suffix over rows
    return crow + rts - rt


def _body_down(x, tb, cfg):
    """Downward pass D1 on one (Y, 128) tile: the *transpose* of the
    subtree-sum operator, i.e. the inclusive ancestor (downstream-path)
    sum ``a[i] = sum of w over the path i -> local root``.

    Identity: with S = R_out (E_end - E_start) L R_in (the accumulate
    pipeline: route to preorder, prefix-sum, interval-difference, route
    back), the transpose is S^T = R_in^-1 L^T (E_end^T - E_start^T)
    R_out^-1 — the same routers run in the same direction with
    *transposed* selection stages: E_end^T is a per-interval-end group
    sum (cells sorted by end via the ``es`` router, one prefix sum, and
    two bijective deliveries of adjacent group-boundary prefix values),
    E_start^T is a flat shift, and L^T is a suffix sum. Everything stays
    pure VPU lane-gather/cumsum work — no MXU, exact for integers.

    Returns ``(a_local raster-layout, packed entry-cell values)``; the
    coarse continuation is injected by :func:`_body_down_lite`.
    """
    Y, G = cfg["Y"], cfg["G"]
    zero = jnp.zeros((), x.dtype)
    w0 = jnp.where(_mask(tb["tree_mask"]), x, zero)
    u = _local_chain(w0, *_ptabs(tb, "rin"), G)  # preorder layout
    ues = _local_chain(w0, *_ptabs(tb, "es"), G)  # (end, slot)-sorted
    cs = _cumsum_tile(ues)
    gA = _local_chain(cs, *_ptabs(tb, "dea"), G)  # group-last prefix
    gB = _local_chain(cs, *_ptabs(tb, "deb"), G)  # prev-group-last prefix
    ge = jnp.where(
        _mask(tb["de_sel"]),
        gA - jnp.where(_mask(tb["de_b0"]), zero, gB),
        zero,
    )
    inner = ge - _flat_next(u)
    z = _suffix_tile(inner)
    out = _local_chain(z, *_ptabs(tb, "rout"), G)
    out = jnp.where(_mask(tb["tree_mask"]), out, x)
    if cfg["has_entries"]:
        pk = _local_chain(z, *_ptabs(tb, "enti"), G)[: cfg["E_rows"]]
    else:
        pk = jnp.zeros((cfg["E_rows"], _S), x.dtype)
    return out, pk


def _body_down_raw(x, tb, cfg):
    """Pass D1 emitting the tile's raw preorder suffix sums ``z`` (plus
    the packed coarse operands): the outward routing and non-tree
    passthrough move to :func:`_body_down_fin`, which routes the local
    and coarse contributions in ONE chain — routing is a permutation,
    so ``chain(z1) + chain(z2) == chain(z1 + z2)`` bitwise. Used only
    when a coarse continuation follows (``has_entries and k > 0``)."""
    Y, G = cfg["Y"], cfg["G"]
    zero = jnp.zeros((), x.dtype)
    w0 = jnp.where(_mask(tb["tree_mask"]), x, zero)
    u = _local_chain(w0, *_ptabs(tb, "rin"), G)
    ues = _local_chain(w0, *_ptabs(tb, "es"), G)
    cs = _cumsum_tile(ues)
    gA = _local_chain(cs, *_ptabs(tb, "dea"), G)
    gB = _local_chain(cs, *_ptabs(tb, "deb"), G)
    ge = jnp.where(
        _mask(tb["de_sel"]),
        gA - jnp.where(_mask(tb["de_b0"]), zero, gB),
        zero,
    )
    z = _suffix_tile(ge - _flat_next(u))
    pk = _local_chain(z, *_ptabs(tb, "enti"), G)[: cfg["E_rows"]]
    return z, pk


def _body_down_fin(z1, x, xd, tb, cfg):
    """Pass D2 finishing a raw D1: suffix-broadcast the diff-encoded
    coarse continuations, add to the local suffix sums, route outward
    once and apply the non-tree passthrough (see _body_down_raw)."""
    Y, G = cfg["Y"], cfg["G"]
    zero = jnp.zeros((), z1.dtype)
    pad_rows = Y - xd.shape[0]
    ev = xd
    if pad_rows > 0:
        ev = jnp.concatenate([ev, jnp.zeros((pad_rows, _S), ev.dtype)], axis=0)
    de = _local_chain(ev, *_ptabs(tb, "exi"), G)
    z2 = _suffix_tile(jnp.where(_mask(tb["re_sel"]), de, zero))
    out = _local_chain(z1 + z2, *_ptabs(tb, "rout"), G)
    return jnp.where(_mask(tb["tree_mask"]), out, x)


def _body_down_lite(abar, xd, tb, cfg):
    """Downward pass D2 on one tile: add each tree's coarse continuation
    ``A[root]`` to all its members. ``xd`` carries the per-root values
    diff-encoded over consecutive exit slots (X_j = A_j - A_{j+1}), so a
    single delivery to the interval *ends* (the inverse exit router) and
    one suffix sum broadcast exactly A_j over tree j."""
    Y, G = cfg["Y"], cfg["G"]
    zero = jnp.zeros((), abar.dtype)
    pad_rows = Y - xd.shape[0]
    ev = xd
    if pad_rows > 0:
        ev = jnp.concatenate([ev, jnp.zeros((pad_rows, _S), ev.dtype)], axis=0)
    de = _local_chain(ev, *_ptabs(tb, "exi"), G)
    inner = jnp.where(_mask(tb["re_sel"]), de, zero)
    z = _suffix_tile(inner)
    add = _local_chain(z, *_ptabs(tb, "rout"), G)
    return jnp.where(_mask(tb["tree_mask"]), abar + add, abar)


# ---------------------------------------------------------------------------
# the plan
# ---------------------------------------------------------------------------
class TilePlan:
    """Per-graph hierarchical accumulation plan over raster tiles."""

    # table names by pass; shapes are per tile and stacked over NT
    _A_KEYS = (
        "rin_i1",
        "rin_is1",
        "rin_is2",
        "rin_i3",
        "ex_i1",
        "ex_is1",
        "ex_is2",
        "ex_i3",
    )
    _C_KEYS = (
        "rin_i1",
        "rin_is1",
        "rin_is2",
        "rin_i3",
        "rout_i1",
        "rout_is1",
        "rout_is2",
        "rout_i3",
        "idx_near",
        "sel_next",
        "near_sel",
        "tree_mask",
    )
    _C_FAR_R = (
        "fexp_i1",
        "fexp_is1",
        "fexp_is2",
        "fexp_i3",
        "ffar_i1",
        "ffar_is1",
        "ffar_is2",
        "ffar_i3",
        "far_sel",
    )
    _C_FAR_P = (
        "fexp_i1",
        "fexp_is1",
        "fexp_is2",
        "fexp_i3",
        "ffar_i1",
        "ffar_is1",
        "ffar_is2",
        "ffar_i3",
        "far_sel",
        "far_rlo",
        "far_rhi",
        "far_bhi",
        "far_bidx",
    )
    _C_ENT = ("ent_sel", "ent_row", "ent_lane")  # step-injection tables

    def __init__(self, idxs_ds_np, shape, tile_rows=128):
        import os
        import time as _time

        _dbg = bool(os.environ.get("PYFLWDIR_TILE_PLAN_DEBUG"))
        _tk = [_time.time()]

        def _ck(label):
            if _dbg:
                t = _time.time()
                print(f"[tile_plan] {label}: {t - _tk[0]:.1f}s", flush=True)
                _tk[0] = t

        H, W = map(int, shape)
        th = int(tile_rows)
        if th % _S or th > 512:
            raise ValueError("tile_rows must be a multiple of 128, <= 512")
        self.shape = (H, W)
        Hp = -(-H // th) * th
        Wp = -(-W // _S) * _S
        self.pshape = (Hp, Wp)
        self.Y = th
        self.G = th // _S
        T = th * _S
        nty, ntx = Hp // th, Wp // _S
        NT = nty * ntx
        self.grid = (nty, ntx)
        self.NT = NT

        ids0 = np.asarray(idxs_ds_np, dtype=np.int64).ravel()
        n0 = ids0.size
        if n0 != H * W:
            raise ValueError("idxs_ds size does not match shape")
        n = Hp * Wp
        if (Hp, Wp) != (H, W):
            v0 = ids0 >= 0
            src = np.arange(n0, dtype=np.int64)
            new_of = (src // W) * Wp + src % W
            ids_p = np.full(n, -1, dtype=np.int64)
            tgt = np.full(n0, -1, dtype=np.int64)
            tgt[v0] = (ids0[v0] // W) * Wp + ids0[v0] % W
            ids_p[new_of] = tgt
        else:
            ids_p = ids0

        _ck("pad/remap")
        # ---- phase 1: per-tile forest DFS + local tables ---------------
        # native (csrc/tile_plan_build.cpp, threaded over tiles) when the
        # library is built, whole-grid numpy otherwise; both produce the
        # same intermediates (see _phase1_numpy docstring)
        ph = (
            self._phase1_native(ids_p)
            if _native("tile_plan_phase1") is not None
            else self._phase1_numpy(ids_p)
        )
        self._tabs_np = tabs = {}
        tabs["near_sel"] = ph["near_sel"].reshape(NT, th, _S)
        tabs["idx_near"] = ph["idx_near"].reshape(NT, th, _S)
        tabs["sel_next"] = ph["sel_next"].reshape(NT, th, _S)
        tabs["tree_mask"] = ph["tree_mask"].reshape(NT, th, _S)
        slot = ph["slot"]
        root_node = ph["root_node"]
        cnt_on, cnt_r, cnt_far = ph["cnt_on"], ph["cnt_r"], ph["cnt_far"]
        root_cell, root_end = ph["root_cell"], ph["root_end"]
        far_slot, far_end = ph["far_slot"], ph["far_end"]

        _ck("phase 1 (per-tile DFS + local tables)")
        self._build_routers(ph["sig"])
        _ck("routers")
        # stashes for the lazily-built downward (transpose) plan
        self._sig_np = ph["sig"]
        self._far_np = (cnt_far, far_slot, far_end)
        self._down = None

        # far cells (interval end >= 128 positions ahead); phase-1 lists
        # them per tile in preorder-slot order
        nf = far_slot.size
        self.has_far = nf > 0
        self.far_mode = None
        self.b = 1
        F_pad = _r128(cnt_far.max()) if self.has_far else 0
        self.F_rows = F_pad // _S
        if self.has_far:
            ft = np.repeat(np.arange(NT, dtype=np.int64), cnt_far)
            e = far_end.astype(np.int64)
            fslot = far_slot.astype(np.int64)
            # group far cells by (tile, end): nested intervals share ends
            key = ft * np.int64(T) + e
            uq, inv, dup = np.unique(key, return_inverse=True, return_counts=True)
            b = 1 << int(int(dup.max() - 1).bit_length())
            ut = (uq // T).astype(np.int64)
            ue = uq % T
            D_t = np.bincount(ut, minlength=NT)
            if int(D_t.max()) * b <= T and b <= _S:
                # router scheme: distinct ends land at slots b*j, a
                # lane-broadcast replicates within b-blocks, a second
                # router delivers each copy to its far cell's dense slot
                self.far_mode = "router"
                self.b = b
                joff = np.concatenate([[0], np.cumsum(D_t)])
                j = np.arange(uq.size) - joff[ut]
                sig_exp = _pad_bij(ut, b * j, ue, NT, T)
                tabs.update(self._stacked_fwd_tables(sig_exp, th, self.G, "fexp"))
                order_q = np.argsort(inv, kind="stable")
                gstart = np.concatenate([[0], np.cumsum(dup)[:-1]])
                rank = np.empty(nf, dtype=np.int64)
                rank[order_q] = np.arange(nf) - np.repeat(gstart, dup)
                sig_far = _pad_bij(ft, fslot, b * j[inv] + rank, NT, T)
                tabs.update(self._stacked_fwd_tables(sig_far, th, self.G, "ffar"))
                far_sel = np.zeros(NT * T, dtype=np.int8)
                far_sel[ft * T + fslot] = 1
                tabs["far_sel"] = far_sel.reshape(NT, th, _S)
            else:
                # pathological duplicate depth (e.g. one serpentine chain
                # spanning the tile, dup > 64): dense group expansion, the
                # per-tile twin of BigAccelPlan's far path. The fexp
                # router packs the D_t distinct interval-end prefix values
                # densely; far cells sorted by end have non-decreasing
                # group ids spanning < 128 per 128-slot row, so a static
                # row-pair one-hot + lane gather broadcasts each value to
                # its duplicates; the ffar router delivers the copies to
                # their dense preorder slots. No duplicate-count cap.
                self.far_mode = "packed"
                joff = np.concatenate([[0], np.cumsum(D_t)])
                j = np.arange(uq.size) - joff[ut]
                sig_exp = _pad_bij(ut, j, ue, NT, T)
                tabs.update(self._stacked_fwd_tables(sig_exp, th, self.G, "fexp"))
                # far cells re-sorted by (tile, end, slot)
                order_s = np.lexsort((fslot, e, ft))
                fts = ft[order_s]
                fss = fslot[order_s]
                foff = np.concatenate([[0], np.cumsum(cnt_far)])
                q = np.arange(nf) - np.repeat(foff[:-1], cnt_far)
                sig_far = _pad_bij(fts, fss, q, NT, T)
                tabs.update(self._stacked_fwd_tables(sig_far, th, self.G, "ffar"))
                far_sel = np.zeros(NT * T, dtype=np.int8)
                far_sel[ft * T + fslot] = 1
                tabs["far_sel"] = far_sel.reshape(NT, th, _S)
                # packed group id per far slot, forward-filled so padding
                # keeps the non-decreasing <128-span row property
                g = j[inv][order_s]
                g_pad = np.zeros((NT, F_pad), dtype=np.int64)
                g_pad[fts, q] = g + 1
                np.maximum.accumulate(g_pad, axis=1, out=g_pad)
                g_pad = np.maximum(g_pad - 1, 0).reshape(NT, self.F_rows, _S)
                rlo = g_pad.min(axis=2) >> 7
                bidx = g_pad - (rlo << 7)[:, :, None]
                if int(bidx.max(initial=0)) >= 2 * _S:
                    raise AssertionError(
                        "far group rows span more than a row pair"
                    )
                tabs["far_rlo"] = np.broadcast_to(
                    rlo[:, :, None].astype(np.int16), g_pad.shape
                ).copy()
                tabs["far_rhi"] = np.broadcast_to(
                    np.minimum(rlo + 1, th - 1)[:, :, None].astype(np.int16),
                    g_pad.shape,
                ).copy()
                tabs["far_bhi"] = (bidx >= _S).astype(np.int8)
                tabs["far_bidx"] = (bidx % _S).astype(np.int8)

        _ck("far tables")
        # exits: local roots in (tile, slot) order with consecutive
        # preorder intervals; phase-1 already computed each root's end
        m = root_cell.size
        rt = np.repeat(np.arange(NT, dtype=np.int64), cnt_r)
        R_pad = _r128(cnt_r.max() if m else 0)
        self.R_rows = R_pad // _S
        roff = np.concatenate([[0], np.cumsum(cnt_r)])
        j = np.arange(m) - np.repeat(roff[:-1], cnt_r)
        # exit router: exit slot j <- preorder end of root j (roots have
        # distinct ends — a plain bijection, dtype-direct in pass A)
        sig_exit = _pad_bij(rt, j, root_end.astype(np.int64), NT, T)
        tabs.update(self._stacked_fwd_tables(sig_exit, th, self.G, "ex"))
        self._root_np = (cnt_r, root_end)
        self.R_pad = R_pad

        _ck("exit tables")
        # ---- coarse graph over roots + entry nodes ---------------------
        # one extra coarse node per *distinct* entry cell: live roots
        # drain into their cell's entry node, whose subtree sum is the
        # total flow entering that cell. Duplicate inflows (several tiles'
        # roots draining to one cell) are therefore pre-summed by the
        # coarse solve itself, which keeps every entry slot unique — so
        # pass C can deliver entries through a cheap bijective router
        # instead of one-hot MXU scatters. Entry nodes have no input of
        # their own: they read the guaranteed-zero slot at n_exit_flat.
        self.n_exit_flat = NT * R_pad
        is_pit = ids_p[root_cell] == root_cell
        ecell = np.where(is_pit, root_cell, ids_p[root_cell])
        e_on = slot[ecell] >= 0
        live = (~is_pit) & e_on
        uq_cell = np.unique(ecell[live])
        D = uq_cell.size
        einv = np.searchsorted(uq_cell, ecell[live])
        coarse_ds = np.full(m + D, -1, dtype=np.int64)
        coarse_ds[np.nonzero(is_pit)[0]] = np.nonzero(is_pit)[0]
        coarse_ds[np.nonzero(live)[0]] = m + einv
        coarse_ds[m:] = root_node[uq_cell]
        # entry nodes read distinct guaranteed-zero slots past the real
        # exits (the input routing is a bijection — slots must be unique;
        # both coarse backends zero-pad the input out to these slots)
        in_slot = np.concatenate(
            [rt * R_pad + j, self.n_exit_flat + np.arange(D, dtype=np.int64)]
        )

        # entry nodes grouped by destination tile, ordered by entry slot
        t2 = self._tile_of(uq_cell)
        es = slot[uq_cell].astype(np.int64)
        od = np.lexsort((es, t2))
        t2o, eso = t2[od], es[od]
        cnt_e = np.bincount(t2o, minlength=NT).astype(np.int64)
        self.has_entries = D > 0
        E_pad = _r128(cnt_e.max()) if self.has_entries else 0
        self.E_pad = E_pad
        out_slot = np.full(m + D, -1, dtype=np.int64)
        self.E_rows = 1
        if self.has_entries:
            eoff = np.concatenate([[0], np.cumsum(cnt_e)])
            j2 = np.arange(D) - np.repeat(eoff[:-1], cnt_e)
            out_slot[m + od] = t2o * E_pad + j2
            self.E_rows = E_pad // _S
            if self.E_rows > 127:
                raise ValueError("entry rows exceed the int8 row table")
            # ent router: preorder slot of entry cell <- packed entry slot
            # (a plain bijection; pass C injects entries via the cheaper
            # step tables below — the router family is kept because the
            # downward pass D1 extracts packed entries via its inverse)
            sig_ent = _pad_bij(t2o, eso, j2, NT, T)
            tabs.update(self._stacked_fwd_tables(sig_ent, th, self.G, "ent"))
            # step-injection tables (see _body_c): for each preorder slot
            # s, the packed rank of the last entry at a slot <= s
            ind = np.zeros(NT * T, dtype=np.int16)
            ind[t2o * T + eso] = 1
            cnt_le = np.cumsum(ind.reshape(NT, T), axis=1, dtype=np.int16)
            idx = np.maximum(cnt_le - 1, 0)
            tabs["ent_sel"] = (
                (cnt_le > 0).astype(np.int8).reshape(NT, th, _S)
            )
            tabs["ent_row"] = (idx >> 7).astype(np.int8).reshape(NT, th, _S)
            tabs["ent_lane"] = (idx & 127).astype(np.int8).reshape(NT, th, _S)

        _ck("coarse graph")
        self._coarse_meta = {"in_slot": in_slot, "out_slot": out_slot,
                             "m": int(m), "D": int(D)}
        self._coarse_ds_np = coarse_ds
        dfs_c = build_plan(coarse_ds, fast=False)
        self._coarse_dfs = dfs_c
        if max(self.n_exit_flat, NT * max(E_pad, 1)) < _COARSE_ROUTER_MIN:
            self.coarse = _CoarseGather(
                dfs_c, in_slot, out_slot, self.n_exit_flat, NT * max(E_pad, 1)
            )
        else:
            self.coarse = None
            n_small = max(self.n_exit_flat, NT * max(E_pad, 1), m + D)
            if n_small <= _COARSE_SMALL_MAX:
                small = _CoarseRouterSmall(
                    dfs_c, in_slot, out_slot, n_in=self.n_exit_flat
                )
                if small.ok:
                    self.coarse = small
            if self.coarse is None:
                self.coarse = BigAccelPlan(
                    dfs_c, coarse_ds, in_slot=in_slot, out_slot=out_slot
                )
                if not self.coarse.ok:
                    raise ValueError("coarse graph exceeds router capacity")

        _ck("coarse plan")
        self._dev = None

    # -- phase 1: per-tile DFS + local tables ---------------------------
    def _tile_of(self, cells):
        """Tile index of padded-grid cell ids (m-sized arithmetic)."""
        Wp = self.pshape[1]
        ntx = self.grid[1]
        cells = np.asarray(cells, dtype=np.int64)
        return (cells // Wp // self.Y) * ntx + (cells % Wp) // _S

    def _phase1_native(self, ids_p):
        from ..runtime import tile_plan_phase1

        Hp, Wp = self.pshape
        return tile_plan_phase1(ids_p, Hp, Wp, self.Y)

    def _phase1_numpy(self, ids_p):
        """Whole-grid numpy fallback of the native per-tile DFS phase.

        Returns the phase-1 intermediates: ``sig`` (NT, T) cell->preorder
        bijections; flat near/sel/tree-mask int8 tables; per-cell ``slot``
        (-1 off-tree) and ``root_node`` (global root rank of the cell's
        tree); per-tile counts; root cells/interval-ends in (tile, slot)
        order; far-cell slots/ends per tile in slot order.
        """
        th = self.Y
        T = th * _S
        NT = self.NT
        nty, ntx = self.grid
        Hp, Wp = self.pshape
        n = Hp * Wp

        # tile/local addresses via int32 broadcast outer adds — no int64
        # div/mod passes over the padded grid; the downstream cell's tile
        # is a gather from the same table
        rows = np.arange(Hp, dtype=np.int32)
        cols = np.arange(Wp, dtype=np.int32)
        tile = np.add.outer((rows // th) * np.int32(ntx), cols // _S).ravel()
        loc = np.add.outer((rows % th) * np.int32(_S), cols % _S).ravel()
        cell = np.arange(n, dtype=np.int64)
        valid = ids_p >= 0
        tds = np.where(valid, tile[np.where(valid, ids_p, 0)], -1)
        same = valid & (tds == tile) & (ids_p != cell)
        local_union = np.where(same, ids_p, np.where(valid, cell, -1))

        # one DFS over the union-of-tile-forests graph: pos/size are
        # per-tile-valid; per-tile preorder = global preorder restricted to
        # the tile (trees stay contiguous, intervals map to intervals)
        dfs = build_plan(local_union, fast=False)
        pos = dfs.pos_np  # int32; -1 off-tree
        size = dfs.size_np
        on = pos >= 0
        n_on = int(dfs.preorder_np.size)

        # within-tile preorder slots in O(n): the union preorder lists
        # whole trees contiguously, so each maximal run of equal tile in
        # preorder order is one-or-more whole trees — a stable sort of
        # the ~m runs (not the n cells) by tile yields every cell's
        # within-tile rank
        pre = dfs.preorder_np.astype(np.int64)
        kt = tile[pre]
        cnt_on = np.zeros(NT, dtype=np.int64)
        slot = np.full(n, -1, dtype=np.int64)
        if n_on:
            bnd = np.empty(n_on, dtype=bool)
            bnd[0] = True
            np.not_equal(kt[1:], kt[:-1], out=bnd[1:])
            run_start = np.flatnonzero(bnd)
            run_tile = kt[run_start]
            run_len = np.diff(np.append(run_start, n_on))
            order_r = np.argsort(run_tile, kind="stable")
            np.add.at(cnt_on, run_tile, run_len)
            off_on = np.concatenate([[0], np.cumsum(cnt_on)])
            base_sorted = np.concatenate([[0], np.cumsum(run_len[order_r])[:-1]])
            run_base = np.empty(run_start.size, dtype=np.int64)
            run_base[order_r] = base_sorted - off_on[run_tile[order_r]]
            run_id = np.cumsum(bnd) - 1
            slot_pre = run_base[run_id] + (
                np.arange(n_on, dtype=np.int64) - run_start[run_id]
            )
            slot[pre] = slot_pre
        else:
            slot_pre = np.zeros(0, dtype=np.int64)

        # local cell -> preorder permutations, one bijection per tile
        sig = np.full((NT, T), -1, dtype=np.int32)
        sig[kt, slot_pre] = loc[pre]
        off_cells = np.nonzero(~on)[0]
        order_off = np.lexsort((loc[off_cells], tile[off_cells]))
        off_cells = off_cells[order_off]
        cnt_off = np.bincount(tile[off_cells], minlength=NT).astype(np.int64)
        coff = np.concatenate([[0], np.cumsum(cnt_off)])
        rank_off = np.arange(off_cells.size) - np.repeat(coff[:-1], cnt_off)
        sig[tile[off_cells], cnt_on[tile[off_cells]] + rank_off] = loc[off_cells]

        # near tables (preorder layout) + raster-layout tree mask
        d = np.zeros(n, dtype=np.int32)
        d[on] = size[on] - 1
        fkey = tile * np.int64(T) + slot
        near_sel = np.zeros(NT * T, dtype=np.int8)
        idx_near = np.zeros(NT * T, dtype=np.int8)
        sel_next = np.zeros(NT * T, dtype=np.int8)
        near_c = on & (d < _S)
        ln = (slot[near_c] % _S) + d[near_c]
        near_key = fkey[near_c]
        near_sel[near_key] = 1
        idx_near[near_key] = (ln % _S).astype(np.int8)
        sel_next[near_key] = (ln >= _S).astype(np.int8)
        tree_mask = np.zeros(NT * T, dtype=np.int8)
        tree_mask[kt.astype(np.int64) * T + loc[pre]] = 1

        # far cells sorted by (tile, preorder slot)
        far_c = np.nonzero(on & (d >= _S))[0]
        far_c = far_c[np.lexsort((slot[far_c], tile[far_c]))]
        cnt_far = np.bincount(tile[far_c], minlength=NT).astype(np.int64)
        far_slot = slot[far_c].astype(np.int32)
        far_end = (slot[far_c] + d[far_c]).astype(np.int32)

        # roots (tree starts of the union preorder) in (tile, slot) order
        tree_start = local_union[pre] == pre
        tree_id_pre = np.cumsum(tree_start) - 1
        roots_pre = pre[tree_start]
        rk = np.lexsort((slot[roots_pre], tile[roots_pre]))
        root_c = roots_pre[rk]
        cnt_r = np.bincount(tile[root_c], minlength=NT).astype(np.int64)
        m = root_c.size
        roff = np.concatenate([[0], np.cumsum(cnt_r)])
        starts = slot[root_c]
        ends = np.empty_like(starts)
        ends[:-1] = starts[1:] - 1
        if m:
            ends[-1] = 0
            last = roff[1:] - 1  # last root of each non-empty tile
            last = last[cnt_r > 0]
            ends[last] = cnt_on[tile[root_c[last]]] - 1
        # global root rank of each on-tree cell's tree
        root_node = np.full(n, -1, dtype=np.int64)
        if m:
            root_rank = np.empty(m, dtype=np.int64)
            root_rank[rk] = np.arange(m)
            root_node[pre] = root_rank[tree_id_pre]

        return {
            "sig": sig,
            "near_sel": near_sel,
            "idx_near": idx_near,
            "sel_next": sel_next,
            "tree_mask": tree_mask,
            "slot": slot,
            "root_node": root_node,
            "cnt_on": cnt_on,
            "cnt_r": cnt_r,
            "cnt_far": cnt_far,
            "root_cell": root_c.astype(np.int64),
            "root_end": ends.astype(np.int32),
            "far_slot": far_slot,
            "far_end": far_end,
        }

    # -- router construction -------------------------------------------
    @staticmethod
    def _stacked_fwd_tables(sig, Y, G, prefix):
        """Stage tables of one stacked router family ``sig`` (NT, T),
        vectorized across tiles (plan-build scaling). Preferred path: the
        fully native per-tile builder (csrc/tile_plan_build.cpp — DFS-free
        per-tile Euler colorings + direct table scatters, threaded over
        tiles, everything cache-resident). Numpy fallback: chunked
        *disjoint-union* calls into the native Euler-split colorer — one
        call per ~256 tiles — and whole-stack numpy scatters. Same tables
        as per-tile ``RouterPlan.build``.
        """
        NT, T = sig.shape
        S = _S
        nat = _native("tile_fwd_tables")
        if nat is not None:
            i1, is1, is2, i3, ig = nat(sig, Y, G)
            tabs = {
                f"{prefix}_i1": i1,
                f"{prefix}_is1": is1,
                f"{prefix}_is2": is2,
                f"{prefix}_i3": i3,
            }
            if G > 1:
                tabs[f"{prefix}_ig"] = ig
            return tabs

        dest = np.arange(T, dtype=np.int32)
        sig32 = sig.astype(np.int32, copy=False)
        ls, ys = sig32 & (S - 1), sig32 >> 7  # (NT, T) source decomposition
        yd = np.broadcast_to(dest >> 7, sig.shape)
        ld = np.broadcast_to(dest & (S - 1), sig.shape)

        # level 1: rows -> rows; color = intermediate lane
        c = _color_tiles(ys, yd, Y, S)
        ti = np.arange(NT, dtype=np.int64)[:, None]
        i1 = np.zeros((NT, Y, S), np.int8)
        i1[ti, ys, c] = ls.astype(np.int8)
        i3 = np.zeros((NT, Y, S), np.int8)
        i3[ti, yd, ld] = c.astype(np.int8)

        # level 2: within each lane column c, route rows (g, s)
        gs, ss = ys >> 7, ys & (S - 1)
        gd, sd = yd >> 7, yd & (S - 1)
        if G == 1:
            # each color class is a perfect row matching (one edge per
            # source row, one per dest row), so any per-color bijection
            # of its 128 edges is a valid second-level routing: c2 = ys
            # (distinct per color on both sides) — no coloring needed
            c2 = ys
        else:
            c2 = _color_tiles(c * np.int32(G) + gs, c * np.int32(G) + gd, S * G, S)
        iS1 = np.zeros((NT, Y, S), np.int8)
        iS1[ti, gs * S + c, c2] = ss.astype(np.int8)
        iS2 = np.zeros((NT, Y, S), np.int8)
        iS2[ti, gd * S + c, sd] = c2.astype(np.int8)

        tabs = {
            f"{prefix}_i1": i1,
            f"{prefix}_is1": iS1,
            f"{prefix}_is2": iS2,
            f"{prefix}_i3": i3,
        }
        if G > 1:
            fib = c2 * S + c
            iG = np.zeros((NT, S * S, G), np.int8)
            iG[ti, fib, gd] = gs.astype(np.int8)
            tabs[f"{prefix}_ig"] = iG
        return tabs

    def _build_routers(self, sig):
        """Raster <-> preorder routers: forward tables plus the algebraic
        inverse (palindromic schedule: per-row table inversion, no second
        coloring)."""
        f = self._stacked_fwd_tables(sig, self.Y, self.G, "rin")
        tabs = self._tabs_np
        tabs.update(f)
        tabs["rout_i1"] = _inv_rows(f["rin_i3"])
        tabs["rout_is1"] = _inv_rows(f["rin_is2"])
        tabs["rout_is2"] = _inv_rows(f["rin_is1"])
        tabs["rout_i3"] = _inv_rows(f["rin_i1"])
        if self.G > 1:
            tabs["rout_ig"] = _inv_rows(f["rin_ig"])

    # -- device arrays --------------------------------------------------
    def arrays(self):
        """Device pytree for :meth:`accumulate`'s ``arrs`` argument (pass
        as a jit argument to keep plan tensors out of the executable)."""
        if self._dev is None:
            need = set(self._keys("a") + self._keys("c"))
            dev = {k: jnp.asarray(self._tabs_np[k]) for k in need}
            dev["coarse"] = self.coarse.arrays()
            if any(
                isinstance(x, jax.core.Tracer) for x in jax.tree_util.tree_leaves(dev)
            ):
                return dev
            self._dev = dev
        return self._dev

    def _cfg(self, acc, split, fdt):
        return {
            "Y": self.Y,
            "G": self.G,
            "acc": acc,
            "split": split,
            "fdt": fdt,
            "far_mode": self.far_mode,
            "b": self.b,
            "R_rows": self.R_rows,
            "E_rows": self.E_rows,
            "has_entries": self.has_entries,
        }

    def _keys(self, which):
        def igs(prefixes):
            return [f"{p}_ig" for p in prefixes] if self.G > 1 else []

        if which == "a":
            return list(self._A_KEYS) + igs(["rin", "ex"])
        keys = list(self._C_KEYS)
        routers = ["rin", "rout"]
        if which == "cf":  # fused pass C: prologue done by pass A
            keys = [k for k in keys if not k.startswith("rin_")]
            routers.remove("rin")
        if self.far_mode == "router":
            keys += list(self._C_FAR_R)
            routers += ["fexp", "ffar"]
        elif self.far_mode == "packed":
            keys += list(self._C_FAR_P)
            routers += ["fexp", "ffar"]
        if self.has_entries:
            keys += list(self._C_ENT)
            routers += ["ent"]
        return keys + igs(routers)

    def _tab_spec(self, pl, vm, name, tb=1):
        """BlockSpec selecting block ``i``'s ``tb``-tile slab of a stacked
        table."""
        shape = self._tabs_np[name].shape
        zeros = (0,) * (len(shape) - 1)
        return pl.BlockSpec(
            (tb,) + shape[1:], lambda i, z=zeros: (i,) + z, memory_space=vm
        )

    # -- execution -------------------------------------------------------
    def _tiles_cpu(self, xg):
        nty, ntx = self.grid
        return (
            xg.reshape(nty, self.Y, ntx, _S)
            .transpose(0, 2, 1, 3)
            .reshape(self.NT, self.Y, _S)
        )

    def _untile_cpu(self, tz):
        nty, ntx = self.grid
        return (
            tz.reshape(nty, ntx, self.Y, _S)
            .transpose(0, 2, 1, 3)
            .reshape(self.pshape)
        )

    def _block_tiles(self, keys, div, itemsize, nbuf=2):
        """Tiles per Pallas kernel instance: one-tile DMAs leave the HBM
        pipeline latency-bound (~240 GB/s measured vs ~510 GB/s at 16-tile
        blocks on v5e), so batch as many tiles as divide ``div`` under a
        VMEM budget (~3 MB per buffer set, double-buffered by pallas)."""
        per_tile = sum(
            self._tabs_np[k].nbytes // self.NT for k in keys
        ) + nbuf * self.Y * _S * itemsize
        tb = 1
        while (
            tb * 2 <= 16
            and div % (tb * 2) == 0
            and (tb * 2) * per_tile <= 3_000_000
        ):
            tb *= 2
        return tb

    def _pass_a(self, xg, arrs, cfg):
        keys = self._keys("a")
        if not _on_tpu():
            xt = self._tiles_cpu(xg)
            body = lambda x, *tt: _body_a(x, dict(zip(keys, tt)), cfg)
            return jax.vmap(body)(xt, *[arrs[k] for k in keys])
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        nty, ntx = self.grid
        Y = self.Y
        TB = self._block_tiles(keys, ntx, xg.dtype.itemsize)
        nbx = ntx // TB

        def kern(x_ref, *refs):
            o_ref = refs[-1]
            for b in range(TB):
                tb = {k: r[b] for k, r in zip(keys, refs[:-1])}
                o_ref[b] = _body_a(
                    x_ref[:, b * _S : (b + 1) * _S], tb, cfg
                )

        vm = pltpu.VMEM
        in_specs = [
            pl.BlockSpec(
                (Y, TB * _S), lambda k: (k // nbx, k % nbx), memory_space=vm
            )
        ] + [self._tab_spec(pl, vm, k, TB) for k in keys]
        return pl.pallas_call(
            kern,
            grid=(self.NT // TB,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (TB, self.R_rows, _S), lambda k: (k, 0, 0), memory_space=vm
            ),
            out_shape=jax.ShapeDtypeStruct((self.NT, self.R_rows, _S), xg.dtype),
        )(xg, *[arrs[k] for k in keys])

    def _pass_c(self, xg, entv, arrs, cfg):
        keys = self._keys("c")
        if not _on_tpu():
            xt = self._tiles_cpu(xg)
            body = lambda x, ea, *tt: _body_c(x, ea, dict(zip(keys, tt)), cfg)
            out = jax.vmap(body)(xt, entv, *[arrs[k] for k in keys])
            return self._untile_cpu(out)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        nty, ntx = self.grid
        Y = self.Y
        TB = self._block_tiles(keys, ntx, xg.dtype.itemsize)
        nbx = ntx // TB

        def kern(x_ref, e_ref, *refs):
            o_ref = refs[-1]
            for b in range(TB):
                tb = {k: r[b] for k, r in zip(keys, refs[:-1])}
                o_ref[:, b * _S : (b + 1) * _S] = _body_c(
                    x_ref[:, b * _S : (b + 1) * _S], e_ref[b], tb, cfg
                )

        vm = pltpu.VMEM
        in_specs = [
            pl.BlockSpec(
                (Y, TB * _S), lambda k: (k // nbx, k % nbx), memory_space=vm
            ),
            pl.BlockSpec(
                (TB, self.E_rows, _S), lambda k: (k, 0, 0), memory_space=vm
            ),
        ] + [self._tab_spec(pl, vm, k, TB) for k in keys]
        return pl.pallas_call(
            kern,
            grid=(self.NT // TB,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (Y, TB * _S), lambda k: (k // nbx, k % nbx), memory_space=vm
            ),
            out_shape=jax.ShapeDtypeStruct(self.pshape, xg.dtype),
        )(xg, entv, *[arrs[k] for k in keys])

    def _pass_a_fused(self, xg, arrs, cfg):
        """Pass A emitting (exits, c-grid): the rin chain + tile cumsum
        run once here and pass C resumes from ``c`` (_body_a_fused)."""
        keys = self._keys("a")
        if not _on_tpu():
            xt = self._tiles_cpu(xg)
            body = lambda x, *tt: _body_a_fused(x, dict(zip(keys, tt)), cfg)
            ex, ct = jax.vmap(body)(xt, *[arrs[k] for k in keys])
            return ex, self._untile_cpu(ct)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        nty, ntx = self.grid
        Y = self.Y
        TB = self._block_tiles(keys, ntx, xg.dtype.itemsize, nbuf=3)
        nbx = ntx // TB

        def kern(x_ref, *refs):
            e_ref, c_ref = refs[-2], refs[-1]
            for b in range(TB):
                tb = {k: r[b] for k, r in zip(keys, refs[:-2])}
                ex, c = _body_a_fused(
                    x_ref[:, b * _S : (b + 1) * _S], tb, cfg
                )
                e_ref[b] = ex
                c_ref[:, b * _S : (b + 1) * _S] = c

        vm = pltpu.VMEM
        in_specs = [
            pl.BlockSpec(
                (Y, TB * _S), lambda k: (k // nbx, k % nbx), memory_space=vm
            )
        ] + [self._tab_spec(pl, vm, k, TB) for k in keys]
        return pl.pallas_call(
            kern,
            grid=(self.NT // TB,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec(
                    (TB, self.R_rows, _S),
                    lambda k: (k, 0, 0),
                    memory_space=vm,
                ),
                pl.BlockSpec(
                    (Y, TB * _S),
                    lambda k: (k // nbx, k % nbx),
                    memory_space=vm,
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((self.NT, self.R_rows, _S), xg.dtype),
                jax.ShapeDtypeStruct(self.pshape, xg.dtype),
            ),
        )(xg, *[arrs[k] for k in keys])

    def _pass_c_fused(self, xg, cg, entv, arrs, cfg):
        """Pass C resuming from the precomputed ``c`` grid (_body_c_core);
        drops the rin tables and the chain/cumsum prologue."""
        keys = self._keys("cf")
        if not _on_tpu():
            xt = self._tiles_cpu(xg)
            ct = self._tiles_cpu(cg)
            body = lambda x, c, ea, *tt: _body_c_core(
                x, c, ea, dict(zip(keys, tt)), cfg
            )
            out = jax.vmap(body)(xt, ct, entv, *[arrs[k] for k in keys])
            return self._untile_cpu(out)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        nty, ntx = self.grid
        Y = self.Y
        TB = self._block_tiles(keys, ntx, xg.dtype.itemsize, nbuf=3)
        nbx = ntx // TB

        def kern(x_ref, c_ref, e_ref, *refs):
            o_ref = refs[-1]
            for b in range(TB):
                tb = {k: r[b] for k, r in zip(keys, refs[:-1])}
                sl = slice(b * _S, (b + 1) * _S)
                o_ref[:, sl] = _body_c_core(
                    x_ref[:, sl], c_ref[:, sl], e_ref[b], tb, cfg
                )

        vm = pltpu.VMEM
        grid_spec = pl.BlockSpec(
            (Y, TB * _S), lambda k: (k // nbx, k % nbx), memory_space=vm
        )
        in_specs = [
            grid_spec,
            grid_spec,
            pl.BlockSpec(
                (TB, self.E_rows, _S), lambda k: (k, 0, 0), memory_space=vm
            ),
        ] + [self._tab_spec(pl, vm, k, TB) for k in keys]
        return pl.pallas_call(
            kern,
            grid=(self.NT // TB,),
            in_specs=in_specs,
            out_specs=grid_spec,
            out_shape=jax.ShapeDtypeStruct(self.pshape, xg.dtype),
        )(xg, cg, entv, *[arrs[k] for k in keys])

    def _pass_a_tiles(self, xt, arrs, cfg):
        """Pass A on a (NT', Y, 128) tile stack (shard-local layout)."""
        keys = self._keys("a")
        if not _on_tpu():
            body = lambda x, *tt: _body_a(x, dict(zip(keys, tt)), cfg)
            return jax.vmap(body)(xt, *[arrs[k] for k in keys])
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        Y = self.Y
        NTl = xt.shape[0]
        TB = self._block_tiles(keys, NTl, xt.dtype.itemsize)

        def kern(x_ref, *refs):
            o_ref = refs[-1]
            for b in range(TB):
                tb = {k: r[b] for k, r in zip(keys, refs[:-1])}
                o_ref[b] = _body_a(x_ref[b], tb, cfg)

        vm = pltpu.VMEM
        in_specs = [
            pl.BlockSpec((TB, Y, _S), lambda k: (k, 0, 0), memory_space=vm)
        ] + [self._tab_spec(pl, vm, k, TB) for k in keys]
        return pl.pallas_call(
            kern,
            grid=(NTl // TB,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (TB, self.R_rows, _S), lambda k: (k, 0, 0), memory_space=vm
            ),
            out_shape=jax.ShapeDtypeStruct((NTl, self.R_rows, _S), xt.dtype),
        )(xt, *[arrs[k] for k in keys])

    def _pass_c_tiles(self, xt, entv, arrs, cfg):
        """Pass C on a (NT', Y, 128) tile stack, returning the same layout."""
        keys = self._keys("c")
        if not _on_tpu():
            body = lambda x, ea, *tt: _body_c(x, ea, dict(zip(keys, tt)), cfg)
            return jax.vmap(body)(xt, entv, *[arrs[k] for k in keys])
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        Y = self.Y
        NTl = xt.shape[0]
        TB = self._block_tiles(keys, NTl, xt.dtype.itemsize)

        def kern(x_ref, e_ref, *refs):
            o_ref = refs[-1]
            for b in range(TB):
                tb = {k: r[b] for k, r in zip(keys, refs[:-1])}
                o_ref[b] = _body_c(x_ref[b], e_ref[b], tb, cfg)

        vm = pltpu.VMEM
        in_specs = [
            pl.BlockSpec((TB, Y, _S), lambda k: (k, 0, 0), memory_space=vm),
            pl.BlockSpec(
                (TB, self.E_rows, _S), lambda k: (k, 0, 0), memory_space=vm
            ),
        ] + [self._tab_spec(pl, vm, k, TB) for k in keys]
        return pl.pallas_call(
            kern,
            grid=(NTl // TB,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (TB, Y, _S), lambda k: (k, 0, 0), memory_space=vm
            ),
            out_shape=jax.ShapeDtypeStruct((NTl, Y, _S), xt.dtype),
        )(xt, entv, *[arrs[k] for k in keys])

    def _pass_a_tiles_fused(self, xt, arrs, cfg):
        """Fused pass A on a (NT', Y, 128) tile stack: returns (exits,
        c-stack) so pass C can resume from the slot prefix sums."""
        keys = self._keys("a")
        if not _on_tpu():
            body = lambda x, *tt: _body_a_fused(x, dict(zip(keys, tt)), cfg)
            return jax.vmap(body)(xt, *[arrs[k] for k in keys])
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        Y = self.Y
        NTl = xt.shape[0]
        TB = self._block_tiles(keys, NTl, xt.dtype.itemsize, nbuf=3)

        def kern(x_ref, *refs):
            e_ref, c_ref = refs[-2], refs[-1]
            for b in range(TB):
                tb = {k: r[b] for k, r in zip(keys, refs[:-2])}
                ex, c = _body_a_fused(x_ref[b], tb, cfg)
                e_ref[b] = ex
                c_ref[b] = c

        vm = pltpu.VMEM
        in_specs = [
            pl.BlockSpec((TB, Y, _S), lambda k: (k, 0, 0), memory_space=vm)
        ] + [self._tab_spec(pl, vm, k, TB) for k in keys]
        return pl.pallas_call(
            kern,
            grid=(NTl // TB,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec(
                    (TB, self.R_rows, _S),
                    lambda k: (k, 0, 0),
                    memory_space=vm,
                ),
                pl.BlockSpec(
                    (TB, Y, _S), lambda k: (k, 0, 0), memory_space=vm
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((NTl, self.R_rows, _S), xt.dtype),
                jax.ShapeDtypeStruct((NTl, Y, _S), xt.dtype),
            ),
        )(xt, *[arrs[k] for k in keys])

    def _pass_c_tiles_fused(self, xt, ct, entv, arrs, cfg):
        """Fused pass C on a (NT', Y, 128) tile stack resuming from the
        c-stack of :meth:`_pass_a_tiles_fused`."""
        keys = self._keys("cf")
        if not _on_tpu():
            body = lambda x, c, ea, *tt: _body_c_core(
                x, c, ea, dict(zip(keys, tt)), cfg
            )
            return jax.vmap(body)(xt, ct, entv, *[arrs[k] for k in keys])
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        Y = self.Y
        NTl = xt.shape[0]
        TB = self._block_tiles(keys, NTl, xt.dtype.itemsize, nbuf=3)

        def kern(x_ref, c_ref, e_ref, *refs):
            o_ref = refs[-1]
            for b in range(TB):
                tb = {k: r[b] for k, r in zip(keys, refs[:-1])}
                o_ref[b] = _body_c_core(
                    x_ref[b], c_ref[b], e_ref[b], tb, cfg
                )

        vm = pltpu.VMEM
        stack_spec = pl.BlockSpec(
            (TB, Y, _S), lambda k: (k, 0, 0), memory_space=vm
        )
        in_specs = [
            stack_spec,
            stack_spec,
            pl.BlockSpec(
                (TB, self.E_rows, _S), lambda k: (k, 0, 0), memory_space=vm
            ),
        ] + [self._tab_spec(pl, vm, k, TB) for k in keys]
        return pl.pallas_call(
            kern,
            grid=(NTl // TB,),
            in_specs=in_specs,
            out_specs=stack_spec,
            out_shape=jax.ShapeDtypeStruct((NTl, Y, _S), xt.dtype),
        )(xt, ct, entv, *[arrs[k] for k in keys])

    def _acc_cfg(self, dtype):
        is_int = jnp.issubdtype(dtype, jnp.integer) or dtype == jnp.bool_
        x64 = jax.dtypes.canonicalize_dtype(jnp.float64) == jnp.float64
        if is_int:
            acc = jnp.int64 if x64 else jnp.int32
        else:
            acc = jnp.float64 if x64 else jnp.float32
        fdt = jnp.float64 if x64 else jnp.float32
        return self._cfg(acc, is_int and not x64, fdt)

    def accumulate_sharded(self, data, mesh, overlap_chunks=2):
        """Multi-device flow accumulation under ``shard_map`` (SPMD).

        The plan's tile axis is sharded over every mesh axis (flattened
        row-major); each device runs the same VMEM pass-A / pass-C
        kernels on its contiguous tile slab, with **one collective** in
        between: an ``all_gather`` of the per-tile exit records (the
        hierarchical contraction of SURVEY hard-part 4 — two streaming
        passes and one gather regardless of flow-path length). Every
        device then solves the small coarse graph redundantly (cheaper
        than scattering a ~n/80-node solve) and slices its own entry
        values. Bitwise-matches :meth:`accumulate` for integer inputs.

        ``overlap_chunks > 1`` splits pass A into that many tile chunks
        and gathers each chunk's exits as soon as they are computed, so
        XLA's async collectives can hide the gather latency under the
        remaining chunks' compute (the SCALING.json overlap column).
        """
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        axes = tuple(mesh.axis_names)
        ndev = int(mesh.devices.size)
        if self.NT % ndev:
            raise ValueError(
                f"NT={self.NT} tiles must divide over {ndev} devices; pad the"
                " grid or choose tile_rows so the tile grid splits evenly"
            )
        NTl = self.NT // ndev
        H, W = self.shape
        Hp, Wp = self.pshape
        dtype = data.dtype
        cfg = self._acc_cfg(dtype)
        C = max(int(overlap_chunks), 1)
        while NTl % C:
            C -= 1

        xg = jnp.asarray(data).reshape(H, W).astype(cfg["acc"])
        if (Hp, Wp) != (H, W):
            xg = jnp.pad(xg, ((0, Hp - H), (0, Wp - W)))
        xt = self._tiles_cpu(xg)

        arrs = self.arrays()
        tile_keys = sorted(set(self._keys("a") + self._keys("c")))
        tabs = {k: arrs[k] for k in tile_keys}
        ts = P(axes)

        def body(xt_l, tabs_l, coarse_l):
            NTc = NTl // C
            gathered = []
            c_chunks = []
            for c in range(C):
                xt_c = lax.slice_in_dim(xt_l, c * NTc, (c + 1) * NTc, axis=0)
                tabs_c = {
                    k: lax.slice_in_dim(v, c * NTc, (c + 1) * NTc, axis=0)
                    for k, v in tabs_l.items()
                }
                ex_c, ct_c = self._pass_a_tiles_fused(xt_c, tabs_c, cfg)
                c_chunks.append(ct_c)  # stays shard-local (no gather)
                for ax in reversed(axes):  # minor axis first: row-major
                    ex_c = lax.all_gather(ex_c, ax, axis=0, tiled=True)
                gathered.append(ex_c)
            ct_l = (
                c_chunks[0]
                if C == 1
                else jnp.concatenate(c_chunks, axis=0)
            )
            if C == 1:
                ex_g = gathered[0]
            else:
                # chunk-gathered layout is (dev, chunk)-major per piece;
                # reassemble the (dev, chunk, tile) order of the full
                # exit array with pure reshapes
                st = jnp.stack(
                    [g.reshape(ndev, NTc, self.R_rows, _S) for g in gathered],
                    axis=1,
                )  # (C, ...) stacked on axis 1 -> (ndev, C, NTc, R, S)
                ex_g = st.reshape(self.NT, self.R_rows, _S)
            entv = self.coarse.accumulate(ex_g.reshape(-1), coarse_l)
            pad = self.NT * self.E_rows * _S - entv.shape[0]
            if pad > 0:
                entv = jnp.concatenate([entv, jnp.zeros(pad, entv.dtype)])
            entv = entv.reshape(self.NT, self.E_rows, _S)
            idx = lax.axis_index(axes[0])
            for ax in axes[1:]:
                idx = idx * lax.axis_size(ax) + lax.axis_index(ax)
            ent_l = lax.dynamic_slice_in_dim(entv, idx * NTl, NTl, 0)
            return self._pass_c_tiles_fused(xt_l, ct_l, ent_l, tabs_l, cfg)

        out_t = shard_map(
            body,
            mesh=mesh,
            in_specs=(ts, {k: ts for k in tabs}, P()),
            out_specs=ts,
            check_rep=False,
        )(xt, tabs, arrs["coarse"])
        out = self._untile_cpu(out_t)
        if (Hp, Wp) != (H, W):
            out = out[:H, :W]
        return out.reshape(-1).astype(dtype)

    def accumulate(self, data, arrs=None):
        """Flow accumulation of ``data`` ((n,) array, raster order).

        Tree cells get their subtree sum, missing cells pass through.
        Integer inputs are exact (int32 internal; totals below 2^31);
        float inputs run float32 with per-tile error bounds (see module
        docstring).  Pass ``arrs=plan.arrays()`` as a jit argument.
        """
        if arrs is None:
            arrs = self.arrays()
        H, W = self.shape
        Hp, Wp = self.pshape
        dtype = data.dtype
        cfg = self._acc_cfg(dtype)

        xg = jnp.asarray(data).reshape(H, W).astype(cfg["acc"])
        if (Hp, Wp) != (H, W):
            xg = jnp.pad(xg, ((0, Hp - H), (0, Wp - W)))

        exits, cg = self._pass_a_fused(xg, arrs, cfg)
        entv = self.coarse.accumulate(exits.reshape(-1), arrs["coarse"])
        pad = self.NT * self.E_rows * _S - entv.shape[0]
        if pad > 0:
            entv = jnp.concatenate([entv, jnp.zeros(pad, entv.dtype)])
        entv = entv.reshape(self.NT, self.E_rows, _S)

        out = self._pass_c_fused(xg, cg, entv, arrs, cfg)
        if (Hp, Wp) != (H, W):
            out = out[:H, :W]
        return out.reshape(-1).astype(dtype)


    def accumulate_banded(self, data2d, band_tile_rows=None, out_cb=None):
        """Exact accumulation streamed over horizontal bands of tile-rows
        for plans whose device tables exceed HBM (≥1G-cell grids on one
        chip): pass A runs per band with only that band's table slabs
        resident, the (small) coarse graph solves once, pass C streams
        again; each band's result is fetched *after* the next band's
        compute is dispatched, so the host write-back (``out_cb(band,
        rows0, array)``) overlaps device work.

        ``data2d``: (H, W) array-like (np/memmap) or None for unit
        weights (generated on device — nothing uploaded). Returns the
        total of the fetched results' pit rows only when ``out_cb`` is
        None, in which case the full (H, W) result is assembled in host
        memory and returned.
        """
        import gc

        H, W = self.shape
        Hp, Wp = self.pshape
        nty, ntx = self.grid
        if band_tile_rows is None:
            band_tile_rows = nty
        nb = -(-nty // band_tile_rows)
        dtype = jnp.int32 if data2d is None else jnp.asarray(
            np.asarray(data2d[:1, :1])
        ).dtype
        cfg = self._acc_cfg(jnp.dtype(dtype))
        a_keys = self._keys("a")
        c_keys = self._keys("c")

        def band_tiles(b):
            ty0 = b * band_tile_rows
            ty1 = min(ty0 + band_tile_rows, nty)
            t0, t1 = ty0 * ntx, ty1 * ntx
            r0, r1 = ty0 * self.Y, ty1 * self.Y
            if data2d is None:
                xt = jnp.ones((t1 - t0, self.Y, _S), cfg["acc"])
            else:
                blk = np.zeros((r1 - r0, Wp), np.asarray(data2d[:1, :1]).dtype)
                rr1 = min(r1, H)
                if rr1 > r0:
                    blk[: rr1 - r0, :W] = data2d[r0:rr1]
                xg = jnp.asarray(blk).astype(cfg["acc"])
                xt = (
                    xg.reshape(ty1 - ty0, self.Y, ntx, _S)
                    .transpose(0, 2, 1, 3)
                    .reshape(t1 - t0, self.Y, _S)
                )
            return t0, t1, r0, r1, xt

        exits = []
        for b in range(nb):
            t0, t1, _, _, xt = band_tiles(b)
            tabs_b = {
                k: jnp.asarray(np.ascontiguousarray(self._tabs_np[k][t0:t1]))
                for k in a_keys
            }
            exits.append(self._pass_a_tiles(xt, tabs_b, cfg))
            exits[-1].block_until_ready()
            del tabs_b, xt
            gc.collect()
        exf = jnp.concatenate(exits).reshape(-1)
        del exits
        entv = self.coarse.accumulate(exf, self.coarse.arrays())
        del exf
        pad = self.NT * self.E_rows * _S - entv.shape[0]
        if pad > 0:
            entv = jnp.concatenate([entv, jnp.zeros(pad, entv.dtype)])
        entv = entv.reshape(self.NT, self.E_rows, _S)

        assemble = (
            None
            if out_cb is not None
            else np.zeros((H, W), jnp.dtype(cfg["acc"]))
        )
        pending = None  # (band, rows0, device array) fetched one band late

        def flush(p):
            b, r0, dev, t0, t1, ty0, ty1 = p
            band_np = np.asarray(dev)  # blocks; next band already queued
            band_2d = (
                band_np.reshape(ty1 - ty0, ntx, self.Y, _S)
                .transpose(0, 2, 1, 3)
                .reshape((ty1 - ty0) * self.Y, Wp)
            )
            rr1 = min(r0 + band_2d.shape[0], H)
            if out_cb is not None:
                out_cb(b, r0, band_2d[: rr1 - r0, :W])
            else:
                assemble[r0:rr1] = band_2d[: rr1 - r0, :W]

        for b in range(nb):
            t0, t1, r0, r1, xt = band_tiles(b)
            tabs_b = {
                k: jnp.asarray(np.ascontiguousarray(self._tabs_np[k][t0:t1]))
                for k in c_keys
            }
            out_t = self._pass_c_tiles(
                xt, lax.slice_in_dim(entv, t0, t1, axis=0), tabs_b, cfg
            )
            prev = pending
            pending = (
                b, r0, out_t, t0, t1,
                b * band_tile_rows,
                min((b + 1) * band_tile_rows, nty),
            )
            if prev is not None:
                flush(prev)
            del tabs_b, xt
            gc.collect()
        if pending is not None:
            flush(pending)
        return assemble

    # ------------------------------------------------------------------
    # downward (transpose) plan: inclusive downstream-path sums
    # ------------------------------------------------------------------
    def _ensure_down(self):
        """Lazily build the downward-plan tables (see :func:`_body_down`):
        the ``es`` (end, slot)-sort router, the two group-boundary
        delivery routers, their masks, the inverses of the exit/entry
        routers, and the static coarse-downward index arrays."""
        if self._down is not None:
            return
        if self._sig_np is None:
            raise RuntimeError(
                "plan was loaded without downward tables (save_tile_plan"
                " down=False) and the build intermediates are not kept;"
                " re-save with down=True or rebuild from idxs_ds"
            )
        import os
        import time as _time

        _dbg = bool(os.environ.get("PYFLWDIR_TILE_PLAN_DEBUG"))
        _tk = [_time.time()]

        def _ck(label):
            if _dbg:
                t = _time.time()
                print(f"[tile_plan.down] {label}: {t - _tk[0]:.1f}s", flush=True)
                _tk[0] = t

        NT, th = self.NT, self.Y
        T = th * _S
        tabs = self._tabs_np
        cnt_far, far_slot, far_end = self._far_np

        nat = _native("tile_down_phase")
        if nat is not None:
            # one threaded cache-resident pass per tile (ends, stable
            # counting sort by (end, slot), group boundaries, padded
            # boundary bijections) — csrc/tile_plan_build.cpp
            sig_es, sig_dea, sig_deb, de_sel, de_b0 = nat(
                tabs["near_sel"], tabs["idx_near"], tabs["sel_next"],
                self._sig_np, cnt_far, far_slot, far_end, NT, T,
            )
            _ck("native down phase")
        else:
            # per-slot interval ends from the near tables + far lists
            s = np.arange(T, dtype=np.int64)
            lane = s % _S
            ns = tabs["near_sel"].reshape(NT, T).astype(bool)
            idxn = tabs["idx_near"].reshape(NT, T).astype(np.int64)
            seln = tabs["sel_next"].reshape(NT, T).astype(np.int64)
            ends = np.full((NT, T), -1, dtype=np.int64)
            d_near = idxn + _S * seln - lane[None, :]
            ends[ns] = (s[None, :] + d_near)[ns]
            if far_slot.size:
                ft = np.repeat(np.arange(NT, dtype=np.int64), cnt_far)
                ends[ft, far_slot.astype(np.int64)] = far_end.astype(np.int64)
            on = ends >= 0
            _ck("ends")

            # stable (tile, end, slot) order; off slots at each tile's tail
            ekey = np.where(on, ends, T)
            tile_col = np.arange(NT, dtype=np.int64)[:, None]
            key = (tile_col * (T + 1) + ekey) * T + s[None, :]
            order = np.argsort(key.ravel(), kind="stable")
            ot = order // T
            oslot = order % T
            sig_es = self._sig_np[ot, oslot].reshape(NT, T)
            _ck("end-sort")

            # group boundaries among on slots (per tile, per distinct end)
            ek_sorted = ekey[ot, oslot]
            on_sorted = ek_sorted < T
            q = np.arange(NT * T) % T
            prev_diff = np.empty(NT * T, dtype=bool)
            prev_diff[0] = True
            prev_diff[1:] = (ek_sorted[1:] != ek_sorted[:-1]) | (q[1:] == 0)
            nxt_diff = np.empty(NT * T, dtype=bool)
            nxt_diff[-1] = True
            nxt_diff[:-1] = prev_diff[1:] | (~on_sorted[1:])
            gstart = np.nonzero(on_sorted & prev_diff)[0]
            glast = np.nonzero(on_sorted & nxt_diff)[0]
            gtile = gstart // T
            gend = ek_sorted[gstart]
            src_a = glast % T
            src_b = gstart % T - 1
            b0 = src_b < 0
            sig_dea = _pad_bij(gtile, gend, src_a, NT, T)
            sig_deb = _pad_bij(gtile[~b0], gend[~b0], src_b[~b0], NT, T)
            de_sel = np.zeros(NT * T, dtype=np.int8)
            de_sel[gtile * T + gend] = 1
            de_b0 = np.zeros(NT * T, dtype=np.int8)
            de_b0[gtile[b0] * T + gend[b0]] = 1
            _ck("group boundaries")

        dtabs = {}
        dtabs.update(self._stacked_fwd_tables(sig_es, th, self.G, "es"))
        _ck("es tables")
        dtabs.update(self._stacked_fwd_tables(sig_dea, th, self.G, "dea"))
        _ck("dea tables")
        dtabs.update(self._stacked_fwd_tables(sig_deb, th, self.G, "deb"))
        _ck("deb tables")
        dtabs["de_sel"] = de_sel.reshape(NT, th, _S)
        dtabs["de_b0"] = de_b0.reshape(NT, th, _S)
        cnt_r, root_end = self._root_np
        rt = np.repeat(np.arange(NT, dtype=np.int64), cnt_r)
        re_sel = np.zeros(NT * T, dtype=np.int8)
        re_sel[rt * T + root_end.astype(np.int64)] = 1
        dtabs["re_sel"] = re_sel.reshape(NT, th, _S)
        _ck("masks")

        # inverse exit/entry routers (palindromic schedule: per-row
        # inversion of the forward tables, no extra coloring)
        fams = [("ex", "exi")]
        if self.has_entries:
            fams.append(("ent", "enti"))
        for fwd, inv in fams:
            dtabs[f"{inv}_i1"] = _inv_rows(tabs[f"{fwd}_i3"])
            dtabs[f"{inv}_is1"] = _inv_rows(tabs[f"{fwd}_is2"])
            dtabs[f"{inv}_is2"] = _inv_rows(tabs[f"{fwd}_is1"])
            dtabs[f"{inv}_i3"] = _inv_rows(tabs[f"{fwd}_i1"])
            if self.G > 1:
                dtabs[f"{inv}_ig"] = _inv_rows(tabs[f"{fwd}_ig"])

        _ck("inverse routers")
        # static coarse-downward arrays (XLA 1-D scatter/cumsum solve)
        dfs = self._coarse_dfs
        k = int(dfs.n_tree)
        meta = self._coarse_meta
        pre = dfs.preorder_np.astype(np.int64)
        ends_pre = (
            np.arange(k, dtype=np.int64) + dfs.size_np[pre] - 1
        ).astype(np.int32)
        e2n = np.full(self.n_exit_flat, -1, dtype=np.int32)
        e2n[meta["in_slot"][: meta["m"]]] = np.arange(
            meta["m"], dtype=np.int32
        )
        # the router coarse (single-chunk or chunked) also solves the
        # *downward* continuation as pure router passes (XLA 1-D gathers
        # do not tile on TPU: the delta solve costs ~40 ms at 1.3M
        # coarse nodes, and scales linearly past that)
        use_cr = isinstance(self.coarse, _CoarseRouterSmall) or (
            isinstance(self.coarse, BigAccelPlan) and self.coarse.slot_mode
        )
        if use_cr:
            self.coarse.build_down(self._coarse_dfs)
        self._down = {
            "tabs": dtabs,
            "cd": {
                "pre": pre.astype(np.int32),
                "pos": dfs.pos_np.astype(np.int32),
                "ends_pre": ends_pre,
                "e2n": e2n,
                "wmap": meta["out_slot"].astype(np.int32),
            },
            "coarse_router": use_cr,
            "k": k,
        }
        self._down_dev = None
        _ck("coarse-down arrays")

    def _down_keys(self, which):
        def igs(prefixes):
            return [f"{p}_ig" for p in prefixes] if self.G > 1 else []

        if which in ("d1", "d1raw"):
            fams = ["rin", "es", "dea", "deb"]
            if which == "d1":  # raw D1 defers the rout chain to D2
                fams += ["rout"]
            keys = [f"{p}_{t}" for p in fams for t in ("i1", "is1", "is2", "i3")]
            keys += ["de_sel", "de_b0", "tree_mask"]
            if self.has_entries:
                keys += ["enti_i1", "enti_is1", "enti_is2", "enti_i3"]
                fams += ["enti"]
            return keys + igs(fams)
        fams = ["exi", "rout"]
        keys = [f"{p}_{t}" for p in fams for t in ("i1", "is1", "is2", "i3")]
        keys += ["re_sel", "tree_mask"]
        return keys + igs(fams)

    def down_arrays(self):
        """Device pytree for :meth:`accumulate_down` (jit argument)."""
        self._ensure_down()
        if self._down_dev is None:
            src = dict(self._tabs_np)
            src.update(self._down["tabs"])
            need = sorted(set(self._down_keys("d1") + self._down_keys("d2")))
            dev = {k: jnp.asarray(src[k]) for k in need}
            if self._down.get("coarse_router"):
                dev["cdr"] = self.coarse.down_arrays()
            else:
                dev["cd"] = {
                    k: jnp.asarray(v) for k, v in self._down["cd"].items()
                }
            if any(
                isinstance(x, jax.core.Tracer)
                for x in jax.tree_util.tree_leaves(dev)
            ):
                return dev
            self._down_dev = dev
        return self._down_dev

    def _down_tab_np(self, name):
        return self._down["tabs"].get(name, self._tabs_np.get(name))

    def _down_tab_spec(self, pl, vm, name, tb):
        shape = self._down_tab_np(name).shape
        zeros = (0,) * (len(shape) - 1)
        return pl.BlockSpec(
            (tb,) + shape[1:], lambda i, z=zeros: (i,) + z, memory_space=vm
        )

    def _down_block_tiles(self, keys, div, itemsize):
        per_tile = sum(
            self._down_tab_np(k).nbytes // self.NT for k in keys
        ) + 2 * self.Y * _S * itemsize
        tb = 1
        while (
            tb * 2 <= 16
            and div % (tb * 2) == 0
            and (tb * 2) * per_tile <= 3_000_000
        ):
            tb *= 2
        return tb

    def _pass_down(self, xg, arrs, cfg):
        keys = self._down_keys("d1")
        if not _on_tpu():
            xt = self._tiles_cpu(xg)
            body = lambda x, *tt: _body_down(x, dict(zip(keys, tt)), cfg)
            out, pk = jax.vmap(body)(xt, *[arrs[k] for k in keys])
            return self._untile_cpu(out), pk
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        nty, ntx = self.grid
        Y = self.Y
        TB = self._down_block_tiles(keys, ntx, xg.dtype.itemsize)
        nbx = ntx // TB

        def kern(x_ref, *refs):
            o_ref, p_ref = refs[-2], refs[-1]
            for b in range(TB):
                tb = {k: r[b] for k, r in zip(keys, refs[:-2])}
                r, p = _body_down(x_ref[:, b * _S : (b + 1) * _S], tb, cfg)
                o_ref[:, b * _S : (b + 1) * _S] = r
                p_ref[b] = p

        vm = pltpu.VMEM
        in_specs = [
            pl.BlockSpec(
                (Y, TB * _S), lambda k: (k // nbx, k % nbx), memory_space=vm
            )
        ] + [self._down_tab_spec(pl, vm, k, TB) for k in keys]
        return pl.pallas_call(
            kern,
            grid=(self.NT // TB,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec(
                    (Y, TB * _S),
                    lambda k: (k // nbx, k % nbx),
                    memory_space=vm,
                ),
                pl.BlockSpec(
                    (TB, self.E_rows, _S), lambda k: (k, 0, 0), memory_space=vm
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(self.pshape, xg.dtype),
                jax.ShapeDtypeStruct((self.NT, self.E_rows, _S), xg.dtype),
            ],
        )(xg, *[arrs[k] for k in keys])

    def _pass_down_lite(self, abar, xd, arrs, cfg):
        keys = self._down_keys("d2")
        if not _on_tpu():
            at = self._tiles_cpu(abar)
            body = lambda a, x, *tt: _body_down_lite(
                a, x, dict(zip(keys, tt)), cfg
            )
            out = jax.vmap(body)(at, xd, *[arrs[k] for k in keys])
            return self._untile_cpu(out)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        nty, ntx = self.grid
        Y = self.Y
        TB = self._down_block_tiles(keys, ntx, abar.dtype.itemsize)
        nbx = ntx // TB

        def kern(a_ref, x_ref, *refs):
            o_ref = refs[-1]
            for b in range(TB):
                tb = {k: r[b] for k, r in zip(keys, refs[:-1])}
                o_ref[:, b * _S : (b + 1) * _S] = _body_down_lite(
                    a_ref[:, b * _S : (b + 1) * _S], x_ref[b], tb, cfg
                )

        vm = pltpu.VMEM
        gmap = lambda k: (k // nbx, k % nbx)
        in_specs = [
            pl.BlockSpec((Y, TB * _S), gmap, memory_space=vm),
            pl.BlockSpec(
                (TB, self.R_rows, _S), lambda k: (k, 0, 0), memory_space=vm
            ),
        ] + [self._down_tab_spec(pl, vm, k, TB) for k in keys]
        return pl.pallas_call(
            kern,
            grid=(self.NT // TB,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((Y, TB * _S), gmap, memory_space=vm),
            out_shape=jax.ShapeDtypeStruct(self.pshape, abar.dtype),
        )(abar, xd, *[arrs[k] for k in keys])

    def _pass_down_raw(self, xg, arrs, cfg):
        """Raw pass D1: returns (z-grid, packed coarse operands); the
        rout chain + passthrough run once in :meth:`_pass_down_fin`."""
        keys = self._down_keys("d1raw")
        if not _on_tpu():
            xt = self._tiles_cpu(xg)
            body = lambda x, *tt: _body_down_raw(x, dict(zip(keys, tt)), cfg)
            z, pk = jax.vmap(body)(xt, *[arrs[k] for k in keys])
            return self._untile_cpu(z), pk
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        nty, ntx = self.grid
        Y = self.Y
        TB = self._down_block_tiles(keys, ntx, xg.dtype.itemsize)
        nbx = ntx // TB

        def kern(x_ref, *refs):
            z_ref, p_ref = refs[-2], refs[-1]
            for b in range(TB):
                tb = {k: r[b] for k, r in zip(keys, refs[:-2])}
                z, p = _body_down_raw(x_ref[:, b * _S : (b + 1) * _S], tb, cfg)
                z_ref[:, b * _S : (b + 1) * _S] = z
                p_ref[b] = p

        vm = pltpu.VMEM
        gmap = lambda k: (k // nbx, k % nbx)
        in_specs = [
            pl.BlockSpec((Y, TB * _S), gmap, memory_space=vm)
        ] + [self._down_tab_spec(pl, vm, k, TB) for k in keys]
        return pl.pallas_call(
            kern,
            grid=(self.NT // TB,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((Y, TB * _S), gmap, memory_space=vm),
                pl.BlockSpec(
                    (TB, self.E_rows, _S), lambda k: (k, 0, 0), memory_space=vm
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(self.pshape, xg.dtype),
                jax.ShapeDtypeStruct((self.NT, self.E_rows, _S), xg.dtype),
            ],
        )(xg, *[arrs[k] for k in keys])

    def _pass_down_fin(self, zg, xg, xd, arrs, cfg):
        """Finishing pass D2 for a raw D1 (see _body_down_fin)."""
        keys = self._down_keys("d2")
        if not _on_tpu():
            zt = self._tiles_cpu(zg)
            xt = self._tiles_cpu(xg)
            body = lambda z, x, ev, *tt: _body_down_fin(
                z, x, ev, dict(zip(keys, tt)), cfg
            )
            out = jax.vmap(body)(zt, xt, xd, *[arrs[k] for k in keys])
            return self._untile_cpu(out)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        nty, ntx = self.grid
        Y = self.Y
        TB = self._down_block_tiles(keys, ntx, zg.dtype.itemsize)
        nbx = ntx // TB

        def kern(z_ref, x_ref, e_ref, *refs):
            o_ref = refs[-1]
            for b in range(TB):
                tb = {k: r[b] for k, r in zip(keys, refs[:-1])}
                sl = slice(b * _S, (b + 1) * _S)
                o_ref[:, sl] = _body_down_fin(
                    z_ref[:, sl], x_ref[:, sl], e_ref[b], tb, cfg
                )

        vm = pltpu.VMEM
        gmap = lambda k: (k // nbx, k % nbx)
        grid_spec = pl.BlockSpec((Y, TB * _S), gmap, memory_space=vm)
        in_specs = [
            grid_spec,
            grid_spec,
            pl.BlockSpec(
                (TB, self.R_rows, _S), lambda k: (k, 0, 0), memory_space=vm
            ),
        ] + [self._down_tab_spec(pl, vm, k, TB) for k in keys]
        return pl.pallas_call(
            kern,
            grid=(self.NT // TB,),
            in_specs=in_specs,
            out_specs=grid_spec,
            out_shape=jax.ShapeDtypeStruct(self.pshape, zg.dtype),
        )(zg, xg, xd, *[arrs[k] for k in keys])

    def _pass_down_tiles(self, xt, arrs, cfg):
        """Pass D1 on a (NT', Y, 128) tile stack (shard-local layout)."""
        keys = self._down_keys("d1")
        if not _on_tpu():
            body = lambda x, *tt: _body_down(x, dict(zip(keys, tt)), cfg)
            return jax.vmap(body)(xt, *[arrs[k] for k in keys])
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        Y = self.Y
        NTl = xt.shape[0]
        TB = self._down_block_tiles(keys, NTl, xt.dtype.itemsize)

        def kern(x_ref, *refs):
            o_ref, p_ref = refs[-2], refs[-1]
            for b in range(TB):
                tb = {k: r[b] for k, r in zip(keys, refs[:-2])}
                r, p = _body_down(x_ref[b], tb, cfg)
                o_ref[b] = r
                p_ref[b] = p

        vm = pltpu.VMEM
        in_specs = [
            pl.BlockSpec((TB, Y, _S), lambda k: (k, 0, 0), memory_space=vm)
        ] + [self._down_tab_spec(pl, vm, k, TB) for k in keys]
        return pl.pallas_call(
            kern,
            grid=(NTl // TB,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((TB, Y, _S), lambda k: (k, 0, 0), memory_space=vm),
                pl.BlockSpec(
                    (TB, self.E_rows, _S), lambda k: (k, 0, 0), memory_space=vm
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((NTl, Y, _S), xt.dtype),
                jax.ShapeDtypeStruct((NTl, self.E_rows, _S), xt.dtype),
            ],
        )(xt, *[arrs[k] for k in keys])

    def _pass_down_lite_tiles(self, at, xd, arrs, cfg):
        """Pass D2 on a (NT', Y, 128) tile stack."""
        keys = self._down_keys("d2")
        if not _on_tpu():
            body = lambda a, x, *tt: _body_down_lite(
                a, x, dict(zip(keys, tt)), cfg
            )
            return jax.vmap(body)(at, xd, *[arrs[k] for k in keys])
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        Y = self.Y
        NTl = at.shape[0]
        TB = self._down_block_tiles(keys, NTl, at.dtype.itemsize)

        def kern(a_ref, x_ref, *refs):
            o_ref = refs[-1]
            for b in range(TB):
                tb = {k: r[b] for k, r in zip(keys, refs[:-1])}
                o_ref[b] = _body_down_lite(a_ref[b], x_ref[b], tb, cfg)

        vm = pltpu.VMEM
        in_specs = [
            pl.BlockSpec((TB, Y, _S), lambda k: (k, 0, 0), memory_space=vm),
            pl.BlockSpec(
                (TB, self.R_rows, _S), lambda k: (k, 0, 0), memory_space=vm
            ),
        ] + [self._down_tab_spec(pl, vm, k, TB) for k in keys]
        return pl.pallas_call(
            kern,
            grid=(NTl // TB,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (TB, Y, _S), lambda k: (k, 0, 0), memory_space=vm
            ),
            out_shape=jax.ShapeDtypeStruct((NTl, Y, _S), at.dtype),
        )(at, xd, *[arrs[k] for k in keys])

    def accumulate_down_sharded(self, data, mesh):
        """Multi-device downward-path sums under ``shard_map`` (SPMD) —
        the transpose of :meth:`accumulate_sharded`, with the same single
        collective: each device runs pass D1 on its tile slab, the packed
        entry-cell values are ``all_gather``-ed, every device solves the
        small coarse downward redundantly and slices its own per-root
        continuations for the local pass D2."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        self._ensure_down()
        axes = tuple(mesh.axis_names)
        ndev = int(mesh.devices.size)
        if self.NT % ndev:
            raise ValueError(
                f"NT={self.NT} tiles must divide over {ndev} devices"
            )
        NTl = self.NT // ndev
        H, W = self.shape
        Hp, Wp = self.pshape
        dtype = data.dtype
        cfg = self._acc_cfg(dtype)
        k = self._down["k"]

        xg = jnp.asarray(data).reshape(H, W).astype(cfg["acc"])
        if (Hp, Wp) != (H, W):
            xg = jnp.pad(xg, ((0, Hp - H), (0, Wp - W)))
        xt = self._tiles_cpu(xg)

        darrs = self.down_arrays()
        tile_keys = sorted(
            set(self._down_keys("d1") + self._down_keys("d2"))
        )
        tabs = {kk: darrs[kk] for kk in tile_keys}
        ts = P(axes)

        def body(xt_l, tabs_l, cd):
            abar_l, pk_l = self._pass_down_tiles(xt_l, tabs_l, cfg)
            if not (self.has_entries and k > 0):
                return abar_l
            pk_g = pk_l
            for ax in reversed(axes):  # minor axis first: row-major order
                pk_g = lax.all_gather(pk_g, ax, axis=0, tiled=True)
            pkf = pk_g.reshape(-1)
            if self._down.get("coarse_router"):
                Aslot = self.coarse.accumulate_down(pkf, cd)[
                    : self.n_exit_flat
                ]
            else:
                wmap = cd["wmap"]
                Wn = jnp.where(
                    wmap >= 0,
                    jnp.take(pkf, jnp.clip(wmap, 0, pkf.shape[0] - 1)),
                    jnp.zeros((), pkf.dtype),
                )
                A = self._coarse_down_apply(cd, Wn, k)
                e2n = cd["e2n"]
                Aslot = jnp.where(
                    e2n >= 0,
                    jnp.take(A, jnp.clip(e2n, 0, A.shape[0] - 1)),
                    jnp.zeros((), A.dtype),
                )
            A3 = Aslot.reshape(self.NT, self.R_pad)
            nxt = jnp.concatenate(
                [A3[:, 1:], jnp.zeros((self.NT, 1), A3.dtype)], axis=1
            )
            xd = (A3 - nxt).reshape(self.NT, self.R_rows, _S)
            idx = lax.axis_index(axes[0])
            for ax in axes[1:]:
                idx = idx * lax.axis_size(ax) + lax.axis_index(ax)
            xd_l = lax.dynamic_slice_in_dim(xd, idx * NTl, NTl, 0)
            return self._pass_down_lite_tiles(abar_l, xd_l, tabs_l, cfg)

        cdk = "cdr" if self._down.get("coarse_router") else "cd"
        out_t = shard_map(
            body,
            mesh=mesh,
            in_specs=(ts, {kk: ts for kk in tabs}, P()),
            out_specs=ts,
            check_rep=False,
        )(xt, tabs, darrs[cdk])
        out = self._untile_cpu(out_t)
        if (Hp, Wp) != (H, W):
            out = out[:H, :W]
        return out.reshape(-1).astype(dtype)

    @staticmethod
    def _coarse_down_apply(cd, W, k):
        """Downward anc-sum on the coarse forest (XLA 1-D delta solve):
        A[node] = sum of W over the node's coarse downstream path."""
        Wp = jnp.take(W, cd["pre"])
        inner = jnp.zeros(k, W.dtype).at[cd["ends_pre"]].add(Wp)
        inner = inner - jnp.concatenate([Wp[1:], jnp.zeros(1, W.dtype)])
        c = jnp.cumsum(inner)
        z = c[k - 1] - c + inner
        pos = cd["pos"]
        return jnp.where(
            pos >= 0, jnp.take(z, jnp.clip(pos, 0, k - 1)), jnp.zeros((), W.dtype)
        )

    def accumulate_down(self, data, darrs=None):
        """Inclusive downstream-path sum ``a[i] = sum of data[j] over the
        path i -> pit (j = i, ds(i), ..., pit)`` — the exact transpose of
        :meth:`accumulate`, at the same two-streaming-pass cost.

        This one primitive yields, by choice of ``data`` (and graph
        cutting): stream distance (edge lengths, pits 0), basin labels /
        root broadcast (value at roots, 0 elsewhere), height of the
        nearest downstream drain (cut at drains, z at the cut roots), and
        downstream fillnodata. Off-tree cells pass through. Integer
        inputs are exact.
        """
        self._ensure_down()
        if darrs is None:
            darrs = self.down_arrays()
        H, W = self.shape
        Hp, Wp = self.pshape
        dtype = data.dtype
        cfg = self._acc_cfg(dtype)
        xg = jnp.asarray(data).reshape(H, W).astype(cfg["acc"])
        if (Hp, Wp) != (H, W):
            xg = jnp.pad(xg, ((0, Hp - H), (0, Wp - W)))

        k = self._down["k"]
        fused = self.has_entries and k > 0
        if fused:  # raw D1: routing + passthrough deferred to D2
            abar, pk = self._pass_down_raw(xg, darrs, cfg)
        else:
            abar, pk = self._pass_down(xg, darrs, cfg)
        if fused:
            pkf = pk.reshape(-1)
            if self._down.get("coarse_router"):
                Aslot = self.coarse.accumulate_down(pkf, darrs["cdr"])[
                    : self.n_exit_flat
                ]
            else:
                cd = darrs["cd"]
                wmap = cd["wmap"]
                Wn = jnp.where(
                    wmap >= 0,
                    jnp.take(pkf, jnp.clip(wmap, 0, pkf.shape[0] - 1)),
                    jnp.zeros((), pkf.dtype),
                )
                A = self._coarse_down_apply(cd, Wn, k)
                e2n = cd["e2n"]
                Aslot = jnp.where(
                    e2n >= 0,
                    jnp.take(A, jnp.clip(e2n, 0, A.shape[0] - 1)),
                    jnp.zeros((), A.dtype),
                )
            A3 = Aslot.reshape(self.NT, self.R_pad)
            nxt = jnp.concatenate(
                [A3[:, 1:], jnp.zeros((self.NT, 1), A3.dtype)], axis=1
            )
            xd = (A3 - nxt).reshape(self.NT, self.R_rows, _S)
            out = self._pass_down_fin(abar, xg, xd, darrs, cfg)
        else:
            out = abar
        if (Hp, Wp) != (H, W):
            out = out[:H, :W]
        return out.reshape(-1).astype(dtype)


    # -- persistence (ops/plan_io.py) -----------------------------------
    def save(self, path, down=True):
        """Serialize to a directory (see :func:`ops.plan_io.save_tile_plan`)."""
        from .plan_io import save_tile_plan

        return save_tile_plan(self, path, down=down)

    @staticmethod
    def load(path, mmap=True):
        """Load a saved plan (see :func:`ops.plan_io.load_tile_plan`)."""
        from .plan_io import load_tile_plan

        return load_tile_plan(path, mmap=mmap)


def build_tile_plan(idxs_ds_np, shape, tile_rows=128):
    """Build a :class:`TilePlan` for a raster graph; raises on coarse
    overflow (shard across devices instead, see pyflwdir_tpu.parallel)."""
    return TilePlan(idxs_ds_np, shape, tile_rows=tile_rows)
