"""Router-accelerated flow accumulation (the north-star kernel).

Composes :mod:`pyflwdir_tpu.ops.router` static permutations with the
DFS-interval identity (``ops/plan.py``) so one accumulation executes as::

    x_pre   = R_in(x)                 # cell -> DFS-preorder layout
    c       = cumsum(x_pre)           # MXU prefix sums (hierarchical)
    near    = c[k + d]                # d < 128: two lane gathers + select
    out_pre = near_mask*near - c[k-1] # subtree sums for near intervals
    out     = R_out(out_pre)          # preorder -> cell layout
    # far intervals (d >= 128, ~8% of cells, shared-end heavy):
    v       = R_exp(c)                # place c[E] at slot 64*j per distinct
    v       = broadcast within slots  #   end E, lane-broadcast to dup slots
    out    += far_mask * R_far(v)     # route each copy to its cell

i.e. 4 static permutations + one matmul-based prefix sum + a handful of
VPU ops — no XLA gather/scatter/sort anywhere. Equivalent semantics to
:func:`pyflwdir_tpu.ops.plan.accumulate_planned` (reference sweep
streams.py:37-41: ``accu[ds[i]] += accu[i]`` over the topological order).

Numerics: accumulation runs in float32 (interval differences of a
float32 prefix sum). Integer-valued inputs (cell counts) are exact up to
2**24; float inputs see O(eps * total) absolute error, documented in
:meth:`AccelPlan.accumulate`.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .plan import DfsPlan, build_plan
from .router import RouterPlan, _S, _ta

__all__ = ["AccelPlan", "build_accel_plan"]

_TILE = _S * _S  # elements per G-slice


def _pad_bijection(dest_known, src_known, n_pad):
    """Extend a partial injective map dest->src to a bijection on [n_pad).

    dest_known/src_known: int64 arrays of equal length with unique values.
    Returns sigma (n_pad,) with sigma[dest_known] == src_known.
    """
    sigma = np.full(n_pad, -1, dtype=np.int64)
    sigma[dest_known] = src_known
    used_src = np.zeros(n_pad, dtype=bool)
    used_src[src_known] = True
    free_src = np.nonzero(~used_src)[0]
    free_dst = np.nonzero(sigma < 0)[0]
    sigma[free_dst] = free_src
    return sigma


class AccelPlan:
    """Per-graph device plan for router-accelerated accumulation."""

    def __init__(self, dfs: DfsPlan, idxs_ds_np):
        pre = dfs.preorder_np.astype(np.int64)
        pos = dfs.pos_np.astype(np.int64)
        size = dfs.size_np.astype(np.int64)
        n_cells = pos.size
        n_tree = pre.size
        self.n_cells = n_cells
        self.n_tree = n_tree

        k = np.arange(n_tree, dtype=np.int64)
        d = size[pre] - 1
        e = k + d
        far = d >= _S

        # distinct far interval ends and the slot block size
        e_far = e[far]
        uniq_e, inv = np.unique(e_far, return_inverse=True)
        D = uniq_e.size
        if D:
            dup = np.bincount(inv)
            b = 1 << int(int(dup.max() - 1).bit_length())
            b = min(max(b, 1), _S)
        else:
            b = 1
        self.ok = D * b <= _S * _S * _S and (not D or int(np.max(np.bincount(inv))) <= _S)

        n_pad = max(n_cells, n_tree, D * b)
        n_pad = -(-n_pad // _TILE) * _TILE
        G = n_pad // _TILE
        self.ok = self.ok and G <= _S
        if not self.ok:
            return
        self.n_pad = n_pad
        self.G = G
        Y = G * _S

        # R_in: preorder slot k <- cell pre[k]
        sig_in = _pad_bijection(k, pre, n_pad)
        self.r_in = RouterPlan.build(sig_in)

        # R_out: cell i <- preorder slot pos[i]
        on_tree = np.nonzero(pos >= 0)[0]
        sig_out = _pad_bijection(on_tree, pos[on_tree], n_pad)
        self.r_out = RouterPlan.build(sig_out)

        # near-interval gather arrays (preorder layout)
        lane = (k % _S).astype(np.int64)
        near_mask = np.zeros(n_pad, dtype=np.float32)
        near_mask[k[~far]] = 1.0
        idx_near = np.zeros(n_pad, dtype=np.int8)
        sel_next = np.zeros(n_pad, dtype=bool)
        ln = lane + np.where(far, 0, d)
        idx_near[:n_tree] = (ln % _S).astype(np.int8)
        sel_next[:n_tree] = ln >= _S
        idx_prev = ((np.arange(n_pad) % _S) - 1) % _S
        sel_prevrow = (np.arange(n_pad) % _S) == 0
        self.near_mask = jnp.asarray(near_mask.reshape(Y, _S))
        self.idx_near = jnp.asarray(idx_near.reshape(Y, _S))
        self.sel_next = jnp.asarray(sel_next.reshape(Y, _S))
        self.idx_prev = jnp.asarray(idx_prev.astype(np.int8).reshape(Y, _S))
        self.sel_prevrow = jnp.asarray(sel_prevrow.reshape(Y, _S))

        # cell-layout masks
        tree_mask = np.zeros(n_pad, dtype=bool)
        tree_mask[:n_cells] = pos >= 0
        self.tree_mask = jnp.asarray(tree_mask.reshape(Y, _S))
        # int8 mask copies for the fused in-kernel path (Mosaic-friendly)
        self.near_sel_i8 = jnp.asarray(
            near_mask.astype(np.int8).reshape(Y, _S)
        )
        self.sel_next_i8 = jnp.asarray(
            sel_next.astype(np.int8).reshape(Y, _S)
        )

        self.has_far = D > 0
        self.b = b
        if self.has_far:
            # R_exp: slot b*j <- preorder position uniq_e[j]
            slots = np.arange(D, dtype=np.int64) * b
            sig_exp = _pad_bijection(slots, uniq_e, n_pad)
            self.r_exp = RouterPlan.build(sig_exp)
            # lane broadcast within aligned b-blocks (b divides 128)
            bl = np.arange(_S, dtype=np.int64)
            bcast = ((bl // b) * b).astype(np.int8)
            self.bcast_idx = jnp.asarray(
                np.broadcast_to(bcast, (Y, _S)).copy()
            )
            # R_far: cell pre[k] <- slot b*group(k) + rank-in-group
            k_far = k[far]
            order = np.argsort(inv, kind="stable")
            ranks = np.empty(k_far.size, dtype=np.int64)
            counts = np.bincount(inv)
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            ranks[order] = np.arange(k_far.size) - np.repeat(starts, counts)
            src_slots = inv * b + ranks
            sig_far = _pad_bijection(pre[k_far], src_slots, n_pad)
            self.r_far = RouterPlan.build(sig_far)
            far_mask = np.zeros(n_pad, dtype=np.float32)
            far_mask[pre[k_far]] = 1.0
            self.far_mask = jnp.asarray(far_mask.reshape(Y, _S))
            self.far_sel_i8 = jnp.asarray(
                far_mask.astype(np.int8).reshape(Y, _S)
            )

        # constant upper-triangular matrices for matmul prefix sums
        iu = np.arange(_S)
        self.U_incl = jnp.asarray(
            (iu[:, None] <= iu[None, :]).astype(np.float32)
        )
        self.U_excl = jnp.asarray(
            (iu[:, None] < iu[None, :]).astype(np.float32)
        )

    # -- device execution -------------------------------------------------
    def _cumsum2(self, xp):
        """Inclusive flat cumsum of the (Y, 128) array via MXU matmuls."""
        G = self.G
        c_row = lax.dot(
            xp, self.U_incl, precision=lax.Precision.HIGHEST
        )
        t = c_row[:, -1].reshape(G, _S)
        off_in_g = lax.dot(t, self.U_excl, precision=lax.Precision.HIGHEST)
        bg = jnp.sum(t, axis=1)
        bgx = jnp.concatenate([jnp.zeros(1, bg.dtype), jnp.cumsum(bg)[:-1]])
        off = off_in_g + bgx[:, None]
        return c_row + off.reshape(G * _S, 1)

    # largest single fused kernel's VMEM footprint we allow (scoped-vmem
    # limit is ~16 MB on v5e; past it Mosaic spills catastrophically)
    _FUSED_VMEM_MAX = 15_000_000

    def _fused_fits(self):
        n = self.n_pad
        k1 = n * (4 + 4 + 5)
        k2 = n * (4 + 4 + 5 + 3)
        k3 = n * (4 + 4 + 10 + 1) if self.has_far else 0
        return max(k1, k2, k3) <= self._FUSED_VMEM_MAX

    def _accumulate_fused(self, x2):
        """Three-kernel fused sweep: (rin chain + cumsum) | (near
        intervals + rout chain) | (far chain), with one XLA where-add
        merge — replaces 4 router launches + the XLA glue between them
        (measurably launch/glue-bound at demo-grid scale). The in-kernel
        Hillis-Steele cumsum replaces the MXU-dot prefix sum; this path
        carries integer-valued data only (see Flwdir._accumulate_dev),
        so partial-sum order does not change the (exact) results."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from .tile_plan import _cumsum_tile, _flat_prev

        G = self.G
        spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        sds = jax.ShapeDtypeStruct(x2.shape, x2.dtype)

        def ta(v, idx):
            return jnp.take_along_axis(v, idx.astype(jnp.int32), axis=1)

        def k1(x_ref, i1, is1, ig, is2, i3, c_ref):
            v = RouterPlan._chain(
                x_ref[:], G, i1[:], is1[:], ig[:], is2[:], i3[:], ta
            )
            c_ref[:] = _cumsum_tile(v)

        c = pl.pallas_call(
            k1, out_shape=sds, in_specs=[spec] * 6, out_specs=spec
        )(x2, *self.r_in._device_arrays)

        def k2(c_ref, idxn, seln, nsel, r1, rs1, rg, rs2, r3, o_ref):
            cv = c_ref[:]
            zrow = jnp.zeros((1, _S), cv.dtype)
            c_next = jnp.concatenate([cv[1:], zrow], axis=0)
            g_near = jnp.where(
                seln[:].astype(jnp.int32) != 0,
                ta(c_next, idxn[:]),
                ta(cv, idxn[:]),
            )
            outp = (
                jnp.where(
                    nsel[:].astype(jnp.int32) != 0,
                    g_near,
                    jnp.zeros((), cv.dtype),
                )
                - _flat_prev(cv)
            )
            o_ref[:] = RouterPlan._chain(
                outp, G, r1[:], rs1[:], rg[:], rs2[:], r3[:], ta
            )

        out = pl.pallas_call(
            k2, out_shape=sds, in_specs=[spec] * 9, out_specs=spec
        )(
            c,
            self.idx_near,
            self.sel_next_i8,
            self.near_sel_i8,
            *self.r_out._device_arrays,
        )

        if self.has_far:
            b = self.b

            def k3(c_ref, *refs):
                o_ref = refs[-1]
                et = refs[0:5]
                ft = refs[5:10]
                fsel = refs[10]
                w = RouterPlan._chain(
                    c_ref[:], G, *(r[:] for r in et), ta
                )
                if b > 1:
                    lane = lax.broadcasted_iota(jnp.int32, w.shape, 1)
                    w = ta(w, (lane // b) * b)
                fv = RouterPlan._chain(w, G, *(r[:] for r in ft), ta)
                o_ref[:] = jnp.where(
                    fsel[:].astype(jnp.int32) != 0,
                    fv,
                    jnp.zeros((), fv.dtype),
                )

            far = pl.pallas_call(
                k3, out_shape=sds, in_specs=[spec] * 12, out_specs=spec
            )(
                c,
                *self.r_exp._device_arrays,
                *self.r_far._device_arrays,
                self.far_sel_i8,
            )
            out = out + far
        return jnp.where(self.tree_mask, out, x2)

    def accumulate(self, data):
        """Flow accumulation of ``data`` ((n_cells,) array) on device.

        Semantics match :func:`ops.plan.accumulate_planned`: tree cells
        get their subtree sum, off-tree cells pass through unchanged.
        """
        Y = self.G * _S
        dtype = data.dtype
        x = jnp.asarray(data, jnp.float32)
        x2 = jnp.concatenate(
            [x, jnp.zeros(self.n_pad - self.n_cells, jnp.float32)]
        ).reshape(Y, _S)

        from .router import _on_tpu

        if _on_tpu() and self._fused_fits():
            res = self._accumulate_fused(x2)
            return res.reshape(-1)[: self.n_cells].astype(dtype)

        xp = self.r_in.apply(x2)
        c = self._cumsum2(xp)

        zrow = jnp.zeros((1, _S), c.dtype)
        c_next = jnp.concatenate([c[1:], zrow], axis=0)
        c_prevrow = jnp.concatenate([zrow, c[:-1]], axis=0)
        g_near = jnp.where(
            self.sel_next,
            _ta(c_next, self.idx_near),
            _ta(c, self.idx_near),
        )
        g_prev = jnp.where(
            self.sel_prevrow,
            _ta(c_prevrow, self.idx_prev),
            _ta(c, self.idx_prev),
        )
        outp = self.near_mask * g_near - g_prev
        out = self.r_out.apply(outp)

        if self.has_far:
            v = self.r_exp.apply(c)
            v = _ta(v, self.bcast_idx)
            out = out + self.far_mask * self.r_far.apply(v)

        res = jnp.where(self.tree_mask, out, x2)
        return res.reshape(-1)[: self.n_cells].astype(dtype)


def build_accel_plan(idxs_ds_np, dfs: DfsPlan = None, routers=None):
    """Build the router accumulation plan for a graph.

    Returns the single-chunk :class:`AccelPlan` (fully fused Pallas kernel)
    when the graph fits its constraints, else the HBM-scale
    :class:`pyflwdir_tpu.ops.accel_big.BigAccelPlan` (tiled 7-stage
    routers, up to 128 * 2^21 cells), else None.
    """
    idxs_ds_np = np.asarray(idxs_ds_np)
    if dfs is None:
        dfs = build_plan(idxs_ds_np, fast=False)
    plan = AccelPlan(dfs, idxs_ds_np)
    if plan.ok:
        return plan
    from .accel_big import build_big_accel_plan

    return build_big_accel_plan(idxs_ds_np, dfs, routers=routers)
