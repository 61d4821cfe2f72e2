"""Stream-order kernels: Strahler fixpoint and classic (Hack) order.

The reference computes both orders with sequential sweeps over ``seq``
(streams.py:192-269). Here:

* **classic order** is a closed-form path sum: the order of a cell is one
  plus the number of tributary junctions on its path to the pit — an
  O(log L) :func:`pyflwdir_tpu.ops.graph.path_sum`.
* **Strahler order** is a monotone fixpoint: each round every cell
  recomputes ``max(upstream orders) + (>=2 upstream achieve the max)``
  via two scatter passes; converges in tree-height rounds. The reference's
  sequential update (streams.py:250-269) is order-independent and equals
  this closed form, so results match exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .graph import path_sum, reach, self_loop, upstream_count

__all__ = ["strahler_order", "strahler_tile_plan", "classic_order"]


def strahler_order(
    idxs_ds: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    max_rounds: int | None = None,
) -> jnp.ndarray:
    """Strahler "top down" stream order (uint8).

    Parity: reference ``streams.strahler_order`` (streams.py:229-269).
    Masked cells are skipped entirely (order 0, contribute nothing).
    """
    n = idxs_ds.shape[0]
    ar = jnp.arange(n, dtype=idxs_ds.dtype)
    valid = idxs_ds >= 0
    if mask is not None:
        valid = valid & mask
    send = valid & (idxs_ds != ar)
    sentinel = jnp.asarray(n, dtype=idxs_ds.dtype)
    tgt = jnp.where(send, idxs_ds, sentinel)
    if max_rounds is None:
        # tree height can reach n in degenerate chains; bound loosely but
        # rely on the early-exit convergence check (rounds ~ height of the
        # contracted confluence tree in practice)
        max_rounds = n

    sto0 = jnp.where(valid, 1, 0).astype(jnp.int32)

    def body(state):
        i, sto, _ = state
        vals = jnp.where(send, sto, 0)
        m = jnp.zeros(n, dtype=jnp.int32).at[tgt].max(vals, mode="drop")
        cnt = (
            jnp.zeros(n, dtype=jnp.int32)
            .at[jnp.where(send & (sto == m[jnp.minimum(tgt, n - 1)]), tgt, sentinel)]
            .add(1, mode="drop")
        )
        new = jnp.where(m > 0, m + (cnt >= 2), 1)
        new = jnp.where(valid, new, 0)
        changed = jnp.any(new != sto)
        return i + 1, new, changed

    def cond(state):
        i, _, changed = state
        return (i < max_rounds) & changed

    _, sto, _ = lax.while_loop(cond, body, (0, sto0, jnp.asarray(True)))
    return jnp.clip(sto, 0, 255).astype(jnp.uint8)


def strahler_tile_plan(codes, tp, arrs=None, mask=None, max_order=32):
    """Strahler order at HBM scale on one chip via the tile plan.

    Log-depth level formulation (the single-device twin of
    ``parallel.tiled.tiled_strahler``): ``order(c) >= s`` iff c's subtree
    contains a cell with two upstream branches of order ``>= s-1``; that
    set is the downstream closure of the level's confluence generators —
    one D8 child-count stencil (XLA elementwise, fused) plus one tile-plan
    accumulation per order level. Levels <= log2(#headwaters) (~12 on
    real networks), so the whole map costs ~a dozen accumulate sweeps.
    Matches reference ``streams.strahler_order`` (streams.py:229-269)
    incl. its mask semantics (cells outside ``mask`` are 0, invisible).

    Parameters: ``codes`` (H, W) uint8 D8 raster **already cut to the
    mask** when one applies (build ``tp`` on the same cut graph);
    ``tp`` a :class:`pyflwdir_tpu.ops.tile_plan.TilePlan` for it.
    """
    import numpy as np

    from ..codecs import d8 as d8c

    codes = np.asarray(codes)
    nrow, ncol = codes.shape
    # device-resident drain-direction grids, cached per (plan, raster):
    # re-uploading ~200MB per call dominates the (sub-second) compute on
    # remote-tunnel runtimes
    # identity keys hold strong references to the keyed arrays, so their
    # ids cannot be recycled by a different array (ADVICE r4)
    cached = getattr(tp, "_strahler_grids", None)
    if (
        cached is not None
        and cached[0] is codes
        and (cached[1] is mask or (cached[1] is None and mask is None))
    ):
        _, _, dr, dc, member = cached
    else:
        dr_np = d8c._DR_LUT[codes]
        dc_np = d8c._DC_LUT[codes]
        valid = (dr_np != 0) | (dc_np != 0) | np.isin(codes, d8c._pv)
        if mask is not None:
            valid = valid & np.asarray(mask, bool)
        dr = jnp.asarray(dr_np)
        dc = jnp.asarray(dc_np)
        member = jnp.asarray(valid)
        tp._strahler_grids = (codes, mask, dr, dc, member)
    order = member.astype(jnp.uint8)
    if arrs is None:
        arrs = tp.arrays()

    # the whole level loop runs on device inside one jitted while_loop
    # (early exit via the carried any_gen flag — a host round-trip per
    # level costs ~1s over remote runtimes); the compiled fn is cached on
    # the plan so repeated calls reuse one compilation
    run = getattr(tp, "_strahler_run_jit", None)
    if run is None or getattr(tp, "_strahler_run_shape", None) != (nrow, ncol):

        def level_fn(member, dr, dc, arrs):
            cnt = jnp.zeros((nrow, ncol), jnp.int32)
            for sr in (-1, 0, 1):
                for sc in (-1, 0, 1):
                    if sr == 0 and sc == 0:
                        continue
                    src = (member & (dr == sr) & (dc == sc)).astype(jnp.int32)
                    shifted = jnp.roll(src, (sr, sc), axis=(0, 1))
                    # cells rolled around the grid edge cannot drain there
                    if sr != 0:
                        edge = 0 if sr > 0 else nrow - 1
                        shifted = shifted.at[edge, :].set(0)
                    if sc != 0:
                        edge = 0 if sc > 0 else ncol - 1
                        shifted = shifted.at[:, edge].set(0)
                    cnt = cnt + shifted
            gen = ((cnt >= 2) & member).astype(jnp.int32)
            accu = tp.accumulate(gen.reshape(-1), arrs).reshape(nrow, ncol)
            new_member = (accu >= 1) & member
            return new_member, jnp.any(gen)

        def run_fn(member, order, dr, dc, arrs, max_order):
            def cond(state):
                i, _, order_, go = state
                return go & (i < max_order)

            def body(state):
                i, member_, order_, _ = state
                new_member, any_gen = level_fn(member_, dr, dc, arrs)
                order_ = jnp.where(
                    any_gen, order_ + new_member.astype(jnp.uint8), order_
                )
                return i + 1, new_member, order_, any_gen

            _, _, order, _ = lax.while_loop(
                cond, body, (1, member, order, jnp.asarray(True))
            )
            return order

        run = jax.jit(run_fn, static_argnames=("max_order",))
        tp._strahler_run_jit = run
        tp._strahler_run_shape = (nrow, ncol)

    return run(member, order, dr, dc, arrs, max_order)


def classic_order(
    idxs_ds: jnp.ndarray,
    idxs_us_main: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Classic / Hack "bottom up" stream order (uint8): main stem 1, each
    tributary one higher than the stream it joins.

    Parity: reference ``streams.stream_order`` (streams.py:192-225). The
    sequential recursion ``strord[i] = strord[ds] (+1 at tributary
    junctions)`` telescopes to ``base + #tributary-hops`` along the path to
    the first masked cell or pit, computed as one O(log L) path sum. The
    reference reads ``strord[ds]`` of masked cells as 0, reproduced via the
    stop-at-masked-cell base term.
    """
    n = idxs_ds.shape[0]
    ar = jnp.arange(n, dtype=idxs_ds.dtype)
    valid = idxs_ds >= 0
    live = valid if mask is None else (valid & mask)
    nup = upstream_count(idxs_ds, mask=mask)
    ds = self_loop(idxs_ds)
    # hop: cell is a tributary start (not the main upstream of a confluence)
    is_trib = (nup[ds] > 1) & (idxs_us_main[ds] != ar) & (ds != ar)
    hops = jnp.where(live & is_trib, 1, 0).astype(jnp.int32)
    if mask is None:
        base = jnp.ones(n, dtype=jnp.int32)
        order = base + path_sum(idxs_ds, hops)
    else:
        stop = valid & ~mask  # masked cells read as order 0
        t = reach(idxs_ds, stop)
        base = jnp.where(valid & mask[t], 1, 0).astype(jnp.int32)
        order = base + path_sum(idxs_ds, hops, stop=stop)
    order = jnp.where(live, order, 0)
    return jnp.clip(order, 0, 255).astype(jnp.uint8)
