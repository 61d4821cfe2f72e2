"""Router-accelerated flow accumulation beyond the 2^21-cell VMEM chunk.

Same DFS-interval identity as :mod:`pyflwdir_tpu.ops.accel` (subtree sums
are contiguous-interval differences of one prefix sum over the DFS
preorder; reference semantics streams.py:37-41), executed at HBM scale:

* the three global data movements (cell->preorder, preorder->cell, and the
  far-interval value expansion) run on the 7-stage
  :class:`pyflwdir_tpu.ops.router_big.RouterPlanBig` — tiled Pallas lane
  gathers + XLA transposes, all streaming passes;
* the prefix sum is a row cumsum + row-offset broadcast (XLA, one pass);
* integer inputs accumulate in exact int32 (sums are exact up to 2^31 —
  past float32's 2^24 integer ceiling, covering continental cell counts);
  float inputs run in float32 with O(eps * total) absolute error;
* far intervals (subtree span >= 128) use a dense group expansion: one
  small XLA gather packs each distinct interval-end prefix value into a
  group array, a static row-pair gather + 256-wide lane gather broadcasts
  it to every duplicate, and a final router pass delivers the copies —
  no per-group alignment constraints, no duplicate-count cap (the small
  plan's ``dup <= 128`` / block-size limits are gone);
* the preorder->cell router is derived from the cell->preorder colorings
  by per-row table inversion (the stage schedule is palindromic), so a
  plan costs two colored router builds, not four.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .accel import _pad_bijection
from .plan import DfsPlan, build_plan
from .router import _S
from .router_big import RouterPlanBig, _on_tpu, lane_gather_tiled

__all__ = ["BigAccelPlan", "build_big_accel_plan", "down_sort_sigmas"]

_CHUNK = _S * _S * _S  # elements per router chunk (2^21)


def down_sort_sigmas(pre, size, n_pad, need_sigmas=True):
    """End-sort / group-boundary sigmas for the downward (transpose)
    coarse solve (shared by the single-chunk and chunked router coarse):
    returns (sig_es, sig_dea, sig_deb, de_sel, de_b0); the sigmas are
    None when ``need_sigmas`` is False (loading pre-colored routers)."""
    n_tree = pre.size
    k = np.arange(n_tree, dtype=np.int64)
    ends = k + size[pre] - 1
    de_sel = np.zeros(n_pad, dtype=bool)
    de_b0 = np.zeros(n_pad, dtype=bool)
    if n_tree:
        de_sel[np.unique(ends)] = True
        de_b0[ends[np.argmin(ends)]] = True
    if not need_sigmas:
        return None, None, None, de_sel, de_b0
    order = np.argsort(ends, kind="stable")  # (end, k) sort
    sig_es = _pad_bijection(k, order, n_pad)
    if n_tree:
        e_sorted = ends[order]
        bnd = np.empty(n_tree, dtype=bool)
        bnd[0] = True
        np.not_equal(e_sorted[1:], e_sorted[:-1], out=bnd[1:])
        gstart = np.flatnonzero(bnd)
        glast = np.append(gstart[1:] - 1, n_tree - 1)
        gend = e_sorted[gstart]
        sig_dea = _pad_bijection(gend, glast, n_pad)
        b0 = gstart == 0
        sig_deb = _pad_bijection(gend[~b0], gstart[~b0] - 1, n_pad)
    else:
        sig_dea = _pad_bijection(
            np.zeros(0, np.int64), np.zeros(0, np.int64), n_pad
        )
        sig_deb = sig_dea.copy()
    return sig_es, sig_dea, sig_deb, de_sel, de_b0


class _View:
    """Attribute access over the ``arrs`` pytree (accumulate internals)."""

    def __init__(self, arrs):
        self._arrs = arrs

    def __getattr__(self, k):
        return self._arrs[k]


class BigAccelPlan:
    """Per-graph device plan for HBM-scale router accumulation.

    ``routers`` optionally supplies prebuilt stage tables (as returned by
    :meth:`router_tables`) so callers can disk-cache the expensive
    edge-coloring step; when absent the two colored routers build
    concurrently (the native colorer releases the GIL).
    """

    def __init__(
        self, dfs: DfsPlan, idxs_ds_np, routers=None, in_slot=None, out_slot=None
    ):
        pre = dfs.preorder_np.astype(np.int64)
        pos = dfs.pos_np.astype(np.int64)
        size = dfs.size_np.astype(np.int64)
        n_cells = pos.size
        n_tree = pre.size
        self.n_cells = n_cells
        self.n_tree = n_tree

        # slot mode (hierarchical coarse level, ops/tile_plan.py): the
        # input value of node i lives at flat slot ``in_slot[i]`` and its
        # accumulated output is delivered to slot ``out_slot[i]`` (< 0 =
        # not needed). Off-layout slots read/return zeros; there is no
        # pass-through of off-tree nodes in slot mode.
        self.slot_mode = in_slot is not None or out_slot is not None
        if in_slot is not None:
            in_slot = np.asarray(in_slot, dtype=np.int64)
        if out_slot is not None:
            out_slot = np.asarray(out_slot, dtype=np.int64)
        self.n_in = (
            n_cells if in_slot is None else int(in_slot.max() + 1 if in_slot.size else 1)
        )
        self.n_out = (
            n_cells
            if out_slot is None
            else int(out_slot.max() + 1 if out_slot.size else 1)
        )

        n_pad = max(n_cells, n_tree, self.n_in, self.n_out, 1)
        n_pad = -(-n_pad // _CHUNK) * _CHUNK
        self.ok = n_pad // _CHUNK <= _S
        if not self.ok:
            return
        self.n_pad = n_pad
        Y = n_pad // _S

        k = np.arange(n_tree, dtype=np.int64)
        d = size[pre] - 1
        far = d >= _S

        # cell -> preorder permutation; preorder -> cell is its inverse
        # (pos inverts pre), derived from the same colorings for free
        src_in = pre if in_slot is None else in_slot[pre]
        if self.slot_mode:  # stashes for the lazy downward coarse solve
            self._in_slot_pre = src_in
            self._out_slot_pre = (
                out_slot[pre] if out_slot is not None else None
            )
            self._down_np = None
        sig_in = _pad_bijection(k, src_in, n_pad)
        sig_far = None
        sig_out = None
        if out_slot is not None:
            osel = (pos >= 0) & (out_slot >= 0)
            cells_o = np.nonzero(osel)[0]
            sig_out = _pad_bijection(out_slot[cells_o], pos[cells_o], n_pad)

        # near-interval lane gathers (preorder layout): slot k reads
        # c[k + d] from its own or the next row
        lane = k % _S
        near_sel = np.zeros(n_pad, dtype=bool)
        near_sel[k[~far]] = True
        idx_near = np.zeros(n_pad, dtype=np.int8)
        ln = lane + np.where(far, 0, d)
        idx_near[:n_tree] = (ln % _S).astype(np.int8)
        sel_next = np.zeros(n_pad, dtype=bool)
        sel_next[:n_tree] = ln >= _S
        self.near_sel = jnp.asarray(near_sel.reshape(Y, _S))
        self.idx_near = jnp.asarray(idx_near.reshape(Y, _S))
        self.sel_next = jnp.asarray(sel_next.reshape(Y, _S))

        # out-layout validity mask: default mode = on-tree cells (others
        # pass the input through); slot mode = slots that receive a value
        # (others return 0)
        tree_mask = np.zeros(n_pad, dtype=bool)
        if out_slot is None:
            tree_mask[:n_cells] = pos >= 0
        else:
            tree_mask[out_slot[cells_o]] = True
        self.tree_mask = jnp.asarray(tree_mask.reshape(Y, _S))

        # ---- far intervals: dense group expansion --------------------
        if out_slot is not None:
            far = far & (out_slot[pre] >= 0)
        k_far = k[far]
        self.has_far = k_far.size > 0
        if self.has_far:
            e_far = k_far + d[far]
            # group far cells by interval end; slots sorted by (end, k)
            order = np.lexsort((k_far, e_far))
            k_sorted = k_far[order]
            e_sorted = e_far[order]
            uniq_e, inv = np.unique(e_sorted, return_inverse=True)
            D = uniq_e.size
            F = k_far.size

            # packed group values are *routed* into the dense group array
            # (ends are distinct -> a bijection; XLA 1-D gathers over the
            # padded layout serialize on TPU — ms per call at ~100k+
            # indices); the F copies are delivered by the r_far router
            d_rows = -(-D // _S)
            uniq_pad = np.zeros(d_rows * _S, dtype=np.int64)
            uniq_pad[:D] = uniq_e
            self.uniq_e = jnp.asarray(uniq_pad.astype(np.int32))
            self.d_rows = d_rows
            sig_exp = _pad_bijection(
                np.arange(D, dtype=np.int64), uniq_e, n_pad
            )

            # broadcast: far slot q (holding group inv[q]) reads its value
            # from the packed group array. Groups covered by one 128-slot
            # row span < 128 ids, so a static pair of group rows per far
            # row suffices; the pair lookup runs as two 128-wide lane
            # gathers + select (Mosaic gathers need idx/source same width)
            f_rows = -(-F // _S)
            g_of_slot = np.zeros(f_rows * _S, dtype=np.int64)
            g_of_slot[:F] = inv
            g_of_slot[F:] = inv[-1] if F else 0
            g2 = g_of_slot.reshape(f_rows, _S)
            rlo = g2.min(axis=1) // _S
            self.rlo = jnp.asarray(rlo.astype(np.int32))
            bidx = g2 - (rlo * _S)[:, None]
            if bidx.max() >= 2 * _S:
                raise AssertionError("far group rows span more than a row pair")
            self.bidx_hi = jnp.asarray(bidx >= _S)
            self.bidx = jnp.asarray((bidx % _S).astype(np.int8))
            self.f_rows = f_rows

            # R_far: out slot of cell pre[k] <- far slot of k
            dst_far = (
                pre[k_sorted] if out_slot is None else out_slot[pre[k_sorted]]
            )
            sig_far = _pad_bijection(dst_far, np.arange(F, dtype=np.int64), n_pad)
            far_cell = np.zeros(n_pad, dtype=bool)
            far_cell[dst_far] = True
            self.far_cell = jnp.asarray(far_cell.reshape(Y, _S))

        # build the colored routers (concurrently unless supplied); in
        # default mode R_out is the inverse of R_in (pos inverts pre) and
        # costs nothing; in slot mode it is an independent permutation
        if routers is not None:
            self.r_in = RouterPlanBig(routers["G1"], routers["r_in"])
            self.r_far = (
                RouterPlanBig(routers["G1"], routers["r_far"])
                if self.has_far
                else None
            )
            self.r_exp = (
                RouterPlanBig(routers["G1"], routers["r_exp"])
                if self.has_far and "r_exp" in routers
                else None
            )
            self.r_out = (
                RouterPlanBig(routers["G1"], routers["r_out"])
                if "r_out" in routers
                else self.r_in.inverse()
            )
        else:
            from concurrent.futures import ThreadPoolExecutor

            jobs = {"r_in": sig_in}
            if sig_far is not None:
                jobs["r_far"] = sig_far
                jobs["r_exp"] = sig_exp
            if sig_out is not None:
                jobs["r_out"] = sig_out
            with ThreadPoolExecutor(max(len(jobs), 1)) as ex:
                futs = {
                    name: ex.submit(RouterPlanBig.build, sig)
                    for name, sig in jobs.items()
                }
                built = {name: f.result() for name, f in futs.items()}
            self.r_in = built["r_in"]
            self.r_far = built.get("r_far")
            self.r_exp = built.get("r_exp")
            self.r_out = built.get("r_out") or self.r_in.inverse()

    def router_tables(self):
        """Stage tables of the colored routers, for external disk caching."""
        out = {"G1": np.int64(self.r_in.G1), "r_in": tuple(self.r_in._np)}
        if self.has_far:
            out["r_far"] = tuple(self.r_far._np)
            if self.r_exp is not None:
                out["r_exp"] = tuple(self.r_exp._np)
        if self.slot_mode:
            out["r_out"] = tuple(self.r_out._np)
        return out

    # -- device execution --------------------------------------------------
    def _cumsum(self, xp):
        """Flat prefix sum of the (Y, 128) array: lane cumsum + row offsets."""
        c_row = jnp.cumsum(xp, axis=1)
        t = c_row[:, -1]
        off = jnp.concatenate([jnp.zeros(1, t.dtype), jnp.cumsum(t)[:-1]])
        return c_row + off[:, None]

    @staticmethod
    def _ds_add(a, b):
        """Double-single (hi, lo) compensated addition (Knuth TwoSum +
        Dekker renormalization) — associative to ~2^-45, giving
        float64-equivalent prefix sums on float32 hardware."""
        ahi, alo = a
        bhi, blo = b
        s = ahi + bhi
        v = s - ahi
        e = (ahi - (s - v)) + (bhi - v)
        t = e + alo + blo
        hi = s + t
        lo = t - (hi - s)
        return hi, lo

    def _cumsum_ds(self, xp):
        """Compensated flat prefix sum: (hi, lo) plane pair."""
        from jax import lax

        zero = jnp.zeros_like(xp)
        hi, lo = lax.associative_scan(self._ds_add, (xp, zero), axis=1)
        th, tl = hi[:, -1], lo[:, -1]
        oh, ol = lax.associative_scan(self._ds_add, (th, tl), axis=0)
        oh = jnp.concatenate([jnp.zeros(1, oh.dtype), oh[:-1]])
        ol = jnp.concatenate([jnp.zeros(1, ol.dtype), ol[:-1]])
        return self._ds_add((hi, lo), (oh[:, None], ol[:, None]))

    def _gather_pair(self, c, a):
        """Near-interval end / start values of the prefix plane ``c``.
        The end gather is a genuine lane gather (Pallas row blocks); the
        start value is the flat predecessor — a 1-D shift."""
        zrow = jnp.zeros((1, _S), c.dtype)
        c_next = jnp.concatenate([c[1:], zrow], axis=0)
        g_near = jnp.where(
            a.sel_next,
            lane_gather_tiled(c_next, a.idx_near),
            lane_gather_tiled(c, a.idx_near),
        )
        v = c.reshape(-1)
        g_prev = jnp.concatenate([jnp.zeros(1, c.dtype), v[:-1]]).reshape(
            c.shape
        )
        return g_near, g_prev

    def _far_values(self, c, a, route):
        """Interval-end prefix values delivered to far cells ((Y, S), to
        be masked by ``far_cell``): the distinct-end values ride the
        r_exp *router* into the dense group array (1-D XLA gathers
        serialize on TPU), a static row-pair + lane-gather expansion
        broadcasts to duplicates, and one router pass delivers."""
        Y = self.n_pad // _S
        if "r_exp" in a._arrs:
            g = route("r_exp", c)[: self.d_rows]
        else:  # plans cached before r_exp existed
            g = jnp.take(c.reshape(-1), a.uniq_e).reshape(self.d_rows, _S)
        g_lo = jnp.take(g, a.rlo, axis=0)
        g_hi = jnp.take(g, jnp.minimum(a.rlo + 1, self.d_rows - 1), axis=0)
        w = jnp.where(
            a.bidx_hi,
            lane_gather_tiled(g_hi, a.bidx),
            lane_gather_tiled(g_lo, a.bidx),
        )
        w_full = jnp.zeros((Y, _S), c.dtype).at[: self.f_rows].set(w)
        return route("r_far", w_full)

    # arrays consumed by the device step; exposed as a pytree so callers
    # can pass them as jit *arguments* (runtimes that serialize jit
    # constants — e.g. remote-compile tunnels — choke on GB-scale consts)
    _ARRAY_FIELDS = ("near_sel", "idx_near", "sel_next", "tree_mask")
    _FAR_FIELDS = ("far_cell", "uniq_e", "rlo", "bidx", "bidx_hi")

    def arrays(self):
        """Device-array pytree for :meth:`accumulate`'s ``arrs`` argument.

        On TPU the router tables are the fused-chain tile layouts
        (:meth:`RouterPlanBig.tpu_stages`); elsewhere the plain per-stage
        tables for the XLA chain. Both derive from the same host copies.
        """
        fused = _on_tpu()
        out = {k: getattr(self, k) for k in self._ARRAY_FIELDS}
        out["r_in"] = self.r_in.tpu_stages() if fused else self.r_in.stages
        out["r_out"] = self.r_out.tpu_stages() if fused else self.r_out.stages
        if self.has_far:
            out.update({k: getattr(self, k) for k in self._FAR_FIELDS})
            out["r_far"] = (
                self.r_far.tpu_stages() if fused else self.r_far.stages
            )
            if self.r_exp is not None:
                out["r_exp"] = (
                    self.r_exp.tpu_stages() if fused else self.r_exp.stages
                )
        return out

    # -- downward (transpose) coarse solve: slot mode only --------------
    def build_down(self, dfs, routers=None):
        """Router machinery for the downward coarse solve (the pass-D1
        identity on the coarse forest; see the single-chunk twin,
        ops/tile_plan._CoarseRouterSmall.build_down). 3 new colorings;
        the in/out routings reuse the upward routers' inverses."""
        if getattr(self, "_down_np", None) is not None:
            return
        pre = dfs.preorder_np.astype(np.int64)
        size = dfs.size_np.astype(np.int64)
        n_pad = self.n_pad
        n_tree = pre.size
        k = np.arange(n_tree, dtype=np.int64)

        sig_es, sig_dea, sig_deb, de_sel, de_b0 = down_sort_sigmas(
            pre, size, n_pad, need_sigmas=routers is None
        )
        Y = n_pad // _S
        w_sel = np.zeros(n_pad, dtype=bool)
        w_sel[k[self._out_slot_pre >= 0]] = True
        a_sel = np.zeros(n_pad, dtype=bool)
        isp = self._in_slot_pre
        a_sel[isp[isp < n_pad]] = True
        self._down_np = {
            "de_sel": de_sel.reshape(Y, _S),
            "de_b0": de_b0.reshape(Y, _S),
            "w_sel": w_sel.reshape(Y, _S),
            "a_sel": a_sel.reshape(Y, _S),
        }
        if routers is not None:
            self.r_es = RouterPlanBig(routers["G1"], routers["r_es"])
            self.r_dea = RouterPlanBig(routers["G1"], routers["r_dea"])
            self.r_deb = RouterPlanBig(routers["G1"], routers["r_deb"])
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(3) as ex:
                futs = {
                    "r_es": ex.submit(RouterPlanBig.build, sig_es),
                    "r_dea": ex.submit(RouterPlanBig.build, sig_dea),
                    "r_deb": ex.submit(RouterPlanBig.build, sig_deb),
                }
                built = {n: f.result() for n, f in futs.items()}
            self.r_es = built["r_es"]
            self.r_dea = built["r_dea"]
            self.r_deb = built["r_deb"]
        self.r_win = self.r_out.inverse()
        self.r_aout = self.r_in.inverse()
        self._down_dev = None

    def down_router_tables(self):
        return {
            "G1": np.int64(self.r_es.G1),
            "r_es": tuple(self.r_es._np),
            "r_dea": tuple(self.r_dea._np),
            "r_deb": tuple(self.r_deb._np),
        }

    def down_arrays(self):
        if getattr(self, "_down_dev", None) is None:
            fused = _on_tpu()
            dev = {k: jnp.asarray(v) for k, v in self._down_np.items()}
            for name in ("r_es", "r_dea", "r_deb", "r_win", "r_aout"):
                r = getattr(self, name)
                dev[name] = r.tpu_stages() if fused else r.stages
            import jax

            if any(
                isinstance(x, jax.core.Tracer)
                for x in jax.tree_util.tree_leaves(dev)
            ):
                return dev
            self._down_dev = dev
        return self._down_dev

    def accumulate_down(self, pkf, arrs=None):
        """Downward coarse solve (transpose of :meth:`accumulate`):
        ``pkf`` in the out_slot layout -> inclusive path-sums delivered
        at the in_slot layout, zero at uncovered slots."""
        from jax import lax

        if arrs is None:
            arrs = self.down_arrays()
        a = arrs
        G1 = self.r_es.G1
        fused = _on_tpu()

        def route(name, x2):
            if fused:
                return RouterPlanBig._chain_fused(x2, G1, arrs[name])
            return RouterPlanBig._chain(x2, G1, arrs[name], lane_gather_tiled)

        Y = self.n_pad // _S
        dtype = pkf.dtype
        is_int = jnp.issubdtype(dtype, jnp.integer) or dtype == jnp.bool_
        acc = jnp.int32 if is_int else jnp.float32
        x = jnp.asarray(pkf).astype(acc)
        x2 = jnp.concatenate(
            [x, jnp.zeros(self.n_pad - x.shape[0], acc)]
        ).reshape(Y, _S)
        zero = jnp.zeros((), acc)
        u = jnp.where(a["w_sel"], route("r_win", x2), zero)
        ues = route("r_es", u)
        c_row = jnp.cumsum(ues, axis=1)
        t = c_row[:, -1]
        off = jnp.concatenate([jnp.zeros(1, t.dtype), jnp.cumsum(t)[:-1]])
        cs = c_row + off[:, None]
        gA = route("r_dea", cs)
        gB = route("r_deb", cs)
        ge = jnp.where(
            a["de_sel"], gA - jnp.where(a["de_b0"], zero, gB), zero
        )
        # inner = ge - flat_next(u); z = flat suffix sum of inner
        v = u.reshape(-1)
        u_next = jnp.concatenate([v[1:], jnp.zeros(1, acc)]).reshape(Y, _S)
        inner = ge - u_next
        s_row = jnp.cumsum(inner[:, ::-1], axis=1)[:, ::-1]
        ts = inner.sum(axis=1)
        off_s = jnp.concatenate(
            [jnp.cumsum(ts[::-1])[::-1][1:], jnp.zeros(1, ts.dtype)]
        )
        z = s_row + off_s[:, None]
        out = jnp.where(a["a_sel"], route("r_aout", z), zero)
        return out.reshape(-1)[: self.n_in].astype(dtype)

    def accumulate(self, data, arrs=None):
        """Flow accumulation of ``data`` ((n_cells,) array) on device.

        Tree cells get their subtree sum, off-tree cells pass through.
        Integer inputs are exact (int32 internal; total must stay below
        2^31). Float inputs run compensated (double-single prefix sums +
        plane-wise interval differences): float64-equivalent accuracy on
        float32 hardware.

        Pass ``arrs=plan.arrays()`` as a jit argument to keep the plan
        tensors out of the compiled executable's constants.
        """
        if arrs is None:
            arrs = self.arrays()
        a = _View(arrs)
        G1 = self.r_in.G1
        fused = _on_tpu()

        def route(name, x2):
            if fused:
                return RouterPlanBig._chain_fused(x2, G1, arrs[name])
            return RouterPlanBig._chain(x2, G1, arrs[name], lane_gather_tiled)

        Y = self.n_pad // _S
        dtype = data.dtype
        is_int = jnp.issubdtype(dtype, jnp.integer) or dtype == jnp.bool_
        acc = jnp.int32 if is_int else jnp.float32
        x = jnp.asarray(data).astype(acc)
        x2 = jnp.concatenate(
            [x, jnp.zeros(self.n_pad - x.shape[0], acc)]
        ).reshape(Y, _S)

        xp = route("r_in", x2)

        if is_int:
            c = self._cumsum(xp)
            g_near, g_prev = self._gather_pair(c, a)
            outp = jnp.where(a.near_sel, g_near, 0) - g_prev
            out = route("r_out", outp)
            if self.has_far:
                out = out + jnp.where(
                    a.far_cell, self._far_values(c, a, route), 0
                )
        else:
            # nearby prefix values cancel exactly plane-wise (Sterbenz), so
            # interval differences collapse safely after subtraction
            chi, clo = self._cumsum_ds(xp)
            gn_hi, gp_hi = self._gather_pair(chi, a)
            gn_lo, gp_lo = self._gather_pair(clo, a)
            # near cells: full collapsed difference; far cells: the -c[k-1]
            # halves ride per plane so the far +c[e] can cancel first
            out_hi = route("r_out", jnp.where(a.near_sel, gn_hi - gp_hi, -gp_hi))
            out_lo = route("r_out", jnp.where(a.near_sel, gn_lo - gp_lo, -gp_lo))
            out = out_hi + out_lo
            if self.has_far:
                far = (out_hi + self._far_values(chi, a, route)) + (
                    out_lo + self._far_values(clo, a, route)
                )
                out = jnp.where(a.far_cell, far, out)

        if self.slot_mode:
            res = jnp.where(a.tree_mask, out, jnp.zeros((), out.dtype))
        else:
            res = jnp.where(a.tree_mask, out, x2)
        return res.reshape(-1)[: self.n_out].astype(dtype)


def build_big_accel_plan(idxs_ds_np, dfs: DfsPlan = None, routers=None):
    """Build a :class:`BigAccelPlan`; None if the graph exceeds 128 * 2^21
    cells (shard across devices instead, see pyflwdir_tpu.parallel)."""
    idxs_ds_np = np.asarray(idxs_ds_np)
    if dfs is None:
        dfs = build_plan(idxs_ds_np, fast=False)
    plan = BigAccelPlan(dfs, idxs_ds_np, routers=routers)
    return plan if plan.ok else None
