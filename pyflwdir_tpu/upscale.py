"""Flow-direction upscaling: DMM, EAM and IHU.

TPU-native re-design of the reference ``pyflwdir/upscale.py``:

* per-pixel maps (cell edge / effective area / representative-cell
  selection) are vectorized scatter-argmax passes instead of scalar loops
  (reference upscale.py:67-111, 244-287);
* the outlet trace of IHU (upscale.py:381-434) reduces to a pointer-
  doubling ``reach`` with a *static* stop mask — a pixel stops where its
  downstream pixel belongs to another lowres cell;
* the remaining traces (dmm/eam/ihu nextidx, upscale_error/check) are
  lockstep vectorized walks over lowres-sized index arrays;
* the IHU repair passes (relocate / optimize_rivlen / minimize_error,
  upscale.py:523-1152) are inherently sequential mutation-with-rollback
  over a small set of problem cells and run on the host, consuming the
  device-computed maps.

Naming convention follows the reference (upscale.py:13-18): ``idx``/
``ncol`` = lowres, ``subidx``/``subncol`` = highres.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .ops import graph

__all__ = [
    "dmm",
    "eam",
    "eam_plus",
    "ihu",
    "ihu_tiled",
    "upscale_error",
    "upscale_check",
]

_MV = -1


# ---------------------------------------------------------------------------
# vectorized helpers
# ---------------------------------------------------------------------------


def subidx_2_idx(subidx, subncol, cellsize, ncol):
    """Lowres index of highres index (vectorized). Parity: upscale.py:23-27."""
    subidx = np.asarray(subidx)
    r = (subidx // subncol) // cellsize
    c = (subidx % subncol) // cellsize
    return r * ncol + c


def in_d8(idx0, idx_ds, ncol):
    """True if idx_ds is within the 3x3 neighborhood of idx0 (vectorized).

    Parity: upscale.py:31-35.
    """
    idx0 = np.asarray(idx0)
    idx_ds = np.asarray(idx_ds)
    cond1 = np.abs((idx_ds % ncol).astype(np.int64) - (idx0 % ncol).astype(np.int64)) <= 1
    cond2 = np.abs((idx_ds // ncol).astype(np.int64) - (idx0 // ncol).astype(np.int64)) <= 1
    return np.logical_and(cond1, cond2)


def cell_edge(subidx, subncol, cellsize):
    """True if highres cell is on the edge of its lowres cell (vectorized).

    Parity: upscale.py:42-46.
    """
    subidx = np.asarray(subidx)
    ri = (subidx // subncol) % cellsize
    ci = (subidx % subncol) % cellsize
    return (ri == 0) | (ci == 0) | (ri + 1 == cellsize) | (ci + 1 == cellsize)


def effective_area(subidx, subncol, cellsize, r_ratio=0.5):
    """True if highres cell lies in the EAM effective (diamond) area.

    Parity: upscale.py:215-223.
    """
    subidx = np.asarray(subidx)
    R = cellsize * r_ratio
    offset = cellsize / 2.0 - 0.5
    ri = np.abs((subidx // subncol) % cellsize - offset)
    ci = np.abs((subidx % subncol) % cellsize - offset)
    return (ri**0.5 + ci**0.5 <= R**0.5) | (ri <= 0.5) | (ci <= 0.5)


def map_celledge(subidxs_ds, subshape, cellsize, mv=_MV):
    """int8 map: 1 on lowres cell edges, 0 inside, -1 missing.

    Parity: upscale.py:50-63.
    """
    subncol = subshape[1]
    subidx = np.arange(subidxs_ds.size)
    edge = cell_edge(subidx, subncol, cellsize)
    out = np.where(edge, np.int8(1), np.int8(0))
    return np.where(subidxs_ds == mv, np.int8(-1), out)


def map_effare(subidxs_ds, subshape, cellsize, r_ratio=0.5, mv=_MV):
    """int8 map: 1 in effective areas, 0 outside, -1 missing.

    Parity: upscale.py:227-240.
    """
    subncol = subshape[1]
    subidx = np.arange(subidxs_ds.size)
    ea = effective_area(subidx, subncol, cellsize, r_ratio)
    out = np.where(ea, np.int8(1), np.int8(0))
    return np.where(subidxs_ds == mv, np.int8(-1), out)


def _scatter_argmax(sel_mask, lowres_idx, subuparea, nlow, dtype):
    """Per-lowres-cell highres index with the largest uparea among selected
    pixels; the lowest highres index wins ties (matching the reference's
    ascending-scan strict-greater update)."""
    sel = np.where(sel_mask)[0]
    if sel.size == 0:
        return np.full(nlow, _MV, dtype=dtype)
    tgt = lowres_idx[sel]
    upa = subuparea[sel]
    best_upa = np.zeros(nlow, dtype=np.float64)
    np.maximum.at(best_upa, tgt, upa)
    # candidates achieving the max (and > 0, reference init uparea = 0)
    cand = (upa == best_upa[tgt]) & (upa > 0)
    best_idx = np.full(nlow, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(best_idx, tgt[cand], sel[cand])
    out = np.where(best_idx == np.iinfo(np.int64).max, _MV, best_idx)
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# DMM
# ---------------------------------------------------------------------------


def dmm_exitcell(subidxs_ds, subuparea, subshape, shape, cellsize, mv=_MV):
    """DMM exit cells: largest-uparea pixel on each lowres cell edge (or pit).

    Parity: upscale.py:67-111 (vectorized scatter-argmax).
    """
    _, subncol = subshape
    nrow, ncol = shape
    subidx = np.arange(subidxs_ds.size)
    valid = subidxs_ds != mv
    ispit = subidxs_ds == subidx
    edge = cell_edge(subidx, subncol, cellsize)
    sel = valid & (ispit | edge)
    lowres = subidx_2_idx(subidx, subncol, cellsize, ncol)
    return _scatter_argmax(sel, lowres, subuparea, nrow * ncol, subidxs_ds.dtype)


def dmm_nextidx(subidxs_rep, subidxs_ds, subshape, shape, cellsize, mv=_MV):
    """DMM next lowres index: trace each representative pixel downstream
    until it leaves a half-cell buffered box around its (offset) lowres
    cell. Lockstep vectorized walk. Parity: upscale.py:115-169.
    """
    _, subncol = subshape
    nrow, ncol = shape
    R = cellsize / 2
    nlow = nrow * ncol
    idxs_ds = np.full(nlow, mv, dtype=subidxs_ds.dtype)
    idx0 = np.where(subidxs_rep != mv)[0]
    if idx0.size == 0:
        return idxs_ds
    sub = subidxs_rep[idx0].astype(np.int64)
    # highres coords of the offset lowres cell center
    dr = (sub // subncol) % cellsize // R
    dc = (sub % subncol) % cellsize // R
    subr0 = (idx0 // ncol + dr) * cellsize - 0.5
    subc0 = (idx0 % ncol + dc) * cellsize - 0.5
    cur = sub.copy()
    out = idx0.copy().astype(np.int64)  # current lowres cell of walk
    active = np.ones(idx0.size, dtype=bool)
    for _ in range(subidxs_ds.size):
        if not active.any():
            break
        sub1 = subidxs_ds[cur[active]].astype(np.int64)
        low1 = subidx_2_idx(sub1, subncol, cellsize, ncol)
        pit = sub1 == cur[active]
        outside = low1 != idx0[active]
        subr = cur[active] // subncol
        subc = cur[active] % subncol
        beyond = (np.abs(subr - subr0[active]) > R) | (
            np.abs(subc - subc0[active]) > R
        )
        stop = pit | (outside & beyond)
        ai = np.where(active)[0]
        step = ~stop
        cur[ai[step]] = sub1[step]
        out[ai[step]] = low1[step]
        active[ai[stop]] = False
    idxs_ds[idx0] = out.astype(subidxs_ds.dtype)
    return idxs_ds


def dmm(subidxs_ds, subuparea, subshape, cellsize, mv=_MV):
    """Double maximum method driver. Parity: upscale.py:172-208."""
    subnrow, subncol = subshape
    shape = (int(np.ceil(subnrow / cellsize)), int(np.ceil(subncol / cellsize)))
    subidxs_out = dmm_exitcell(subidxs_ds, subuparea, subshape, shape, cellsize, mv)
    idxs_ds = dmm_nextidx(subidxs_out, subidxs_ds, subshape, shape, cellsize, mv)
    return idxs_ds, subidxs_out, shape


# ---------------------------------------------------------------------------
# EAM
# ---------------------------------------------------------------------------


def eam_repcell(subidxs_ds, subuparea, subshape, shape, cellsize, r_ratio=0.5, mv=_MV):
    """EAM representative cells: largest-uparea pixel in each effective area.

    Parity: upscale.py:244-287 (vectorized scatter-argmax).
    """
    _, subncol = subshape
    nrow, ncol = shape
    subidx = np.arange(subidxs_ds.size)
    valid = subidxs_ds != mv
    ispit = subidxs_ds == subidx
    ea = effective_area(subidx, subncol, cellsize, r_ratio)
    sel = valid & (ispit | ea)
    lowres = subidx_2_idx(subidx, subncol, cellsize, ncol)
    return _scatter_argmax(sel, lowres, subuparea, nrow * ncol, subidxs_ds.dtype)


def eam_nextidx(subidxs_rep, subidxs_ds, subshape, shape, cellsize, r_ratio=0.5, mv=_MV):
    """EAM next lowres index: trace each representative pixel to the next
    downstream effective area outside its own cell. Lockstep walk.
    Parity: upscale.py:291-335.
    """
    _, subncol = subshape
    nrow, ncol = shape
    nlow = nrow * ncol
    idxs_ds = np.full(nlow, mv, dtype=subidxs_ds.dtype)
    idx0 = np.where(subidxs_rep != mv)[0]
    if idx0.size == 0:
        return idxs_ds
    cur = subidxs_rep[idx0].astype(np.int64)
    out = np.full(idx0.size, mv, dtype=np.int64)
    active = np.ones(idx0.size, dtype=bool)
    for _ in range(subidxs_ds.size):
        if not active.any():
            break
        ai = np.where(active)[0]
        sub1 = subidxs_ds[cur[ai]].astype(np.int64)
        low1 = subidx_2_idx(sub1, subncol, cellsize, ncol)
        pit = sub1 == cur[ai]
        hit = (low1 != idx0[ai]) & effective_area(sub1, subncol, cellsize, r_ratio)
        stop = pit | hit
        out[ai[stop]] = low1[stop]
        cur[ai[~stop]] = sub1[~stop]
        active[ai[stop]] = False
    idxs_ds[idx0] = out.astype(subidxs_ds.dtype)
    return idxs_ds


def eam(subidxs_ds, subuparea, subshape, cellsize, r_ratio=0.5, mv=_MV):
    """Effective area method driver. Parity: upscale.py:338-376."""
    subnrow, subncol = subshape
    shape = (int(np.ceil(subnrow / cellsize)), int(np.ceil(subncol / cellsize)))
    subidxs_rep = eam_repcell(
        subidxs_ds, subuparea, subshape, shape, cellsize, r_ratio=r_ratio, mv=mv
    )
    idxs_ds = eam_nextidx(
        subidxs_rep, subidxs_ds, subshape, shape, cellsize, r_ratio=r_ratio, mv=mv
    )
    return idxs_ds, subidxs_rep, shape


# ---------------------------------------------------------------------------
# IHU
# ---------------------------------------------------------------------------


def ihu_outlets(subidxs_rep, subidxs_ds, subuparea, subshape, shape, cellsize, mv=_MV):
    """IHU outlet pixels: each representative pixel traced downstream to
    the last pixel inside its lowres cell.

    The trace's stop condition is a static pixel property — a pixel whose
    downstream pixel lies in another lowres cell (or a pit) — so the scalar
    walk (reference upscale.py:381-434) becomes one pointer-doubling
    ``reach`` over the highres grid.
    """
    _, subncol = subshape
    nrow, ncol = shape
    sub_n = subidxs_ds.size
    subidx = np.arange(sub_n)
    valid = subidxs_ds != mv
    ds = np.where(valid, subidxs_ds, subidx).astype(np.int64)
    own = subidx_2_idx(subidx, subncol, cellsize, ncol)
    exit_ = own != subidx_2_idx(ds, subncol, cellsize, ncol)
    pit = valid & (subidxs_ds == subidx)
    stop = exit_ | pit
    jds = jnp.asarray(np.where(valid, subidxs_ds, -1).astype(np.int32))
    t = np.asarray(graph.reach(jds, jnp.asarray(stop)))
    subidxs_out = np.full(nrow * ncol, mv, dtype=subidxs_ds.dtype)
    rep = np.where(subidxs_rep != mv)[0]
    subidxs_out[rep] = t[subidxs_rep[rep]]
    return subidxs_out


def ihu_nextidx(subidxs_out, subidxs_ds, subshape, shape, cellsize, r_ratio=0.5, mv=_MV):
    """IHU next lowres index: trace each outlet pixel to the next outlet
    pixel; flag non-D8 connections for repair and fall back to the first
    effective area pixel. Lockstep walk. Parity: upscale.py:437-496.
    """
    _, subncol = subshape
    nrow, ncol = shape
    nlow = nrow * ncol
    idxs_ds = np.full(nlow, mv, dtype=subidxs_ds.dtype)
    idx0 = np.where(subidxs_out != mv)[0]
    if idx0.size == 0:
        return idxs_ds, np.array([], dtype=subidxs_ds.dtype)
    is_outlet = np.zeros(subidxs_ds.size, dtype=bool)
    is_outlet[subidxs_out[idx0]] = True  # outlet-pixel lookup by value

    cur = subidxs_out[idx0].astype(np.int64)
    ea_first = np.full(idx0.size, mv, dtype=np.int64)  # first effective-area pixel
    result = np.full(idx0.size, mv, dtype=np.int64)  # chosen downstream pixel
    fix = np.zeros(idx0.size, dtype=bool)
    active = np.ones(idx0.size, dtype=bool)
    for _ in range(subidxs_ds.size):
        if not active.any():
            break
        ai = np.where(active)[0]
        sub1 = subidxs_ds[cur[ai]].astype(np.int64)
        low1 = subidx_2_idx(sub1, subncol, cellsize, ncol)
        pit = sub1 == cur[ai]
        at_outlet = subidxs_out[low1] == sub1
        stop = at_outlet | pit
        # first-pass effective area (only while ea_first unset)
        ea = effective_area(sub1, subncol, cellsize, r_ratio)
        unset = ea_first[ai] == mv
        take = unset & ea & ~stop
        ea_first[ai[take]] = sub1[take]
        # stopping walks: resolve connection
        si = ai[stop]
        d8ok = in_d8(idx0[si], low1[stop], ncol)
        res = result[si]
        # outside d8: flag and use first-pass ea
        res = np.where(d8ok, sub1[stop], ea_first[si])
        fix[si] |= ~d8ok
        # pit that is not an outlet: connect but flag
        not_outlet_pit = d8ok & ~at_outlet[stop]
        fix[si] |= not_outlet_pit
        result[si] = res
        cur[ai[~stop]] = sub1[~stop]
        active[si] = False
    # unresolved (never stopped, shouldn't happen) fall back to ea_first
    result = np.where(result == mv, ea_first, result)
    good = result != mv
    vals = np.full(idx0.size, mv, dtype=np.int64)
    vals[good] = subidx_2_idx(result[good], subncol, cellsize, ncol)
    idxs_ds[idx0] = vals.astype(subidxs_ds.dtype)
    idxs_fix = idx0[fix].astype(subidxs_ds.dtype)
    return idxs_ds, idxs_fix


def upscale_error(subidxs_out, idxs_ds, subidxs_ds, mv=_MV):
    """Connection validity of upscaled cells (1 ok / 0 error / 255 missing).

    Parity: upscale.py:1312-1363 (lockstep walk).
    """
    assert subidxs_out.size == idxs_ds.size
    outlets = np.zeros(subidxs_ds.size, dtype=bool)
    sel = subidxs_out[subidxs_out != mv]
    outlets[sel] = True
    n = idxs_ds.size
    connect_map = np.full(n, 1, np.uint8)
    missing = (idxs_ds == mv) | (subidxs_out == mv)
    connect_map[missing] = 255
    idx0 = np.where(~missing)[0]
    if idx0.size == 0:
        return connect_map, np.array([], dtype=idxs_ds.dtype)
    cur = subidxs_out[idx0].astype(np.int64)
    active = np.ones(idx0.size, dtype=bool)
    bad = np.zeros(idx0.size, dtype=bool)
    for _ in range(subidxs_ds.size):
        if not active.any():
            break
        ai = np.where(active)[0]
        sub1 = subidxs_ds[cur[ai]].astype(np.int64)
        stop = outlets[sub1] | (sub1 == cur[ai])
        si = ai[stop]
        bad[si] = sub1[stop] != subidxs_out[idxs_ds[idx0[si]]]
        cur[ai[~stop]] = sub1[~stop]
        active[si] = False
    connect_map[idx0[bad]] = 0
    idxs_fix = idx0[bad].astype(idxs_ds.dtype)
    return connect_map, idxs_fix


def upscale_check(subidxs_out, idxs_ds, subidxs_ds, minlen=0, mv=_MV):
    """Stream map, validity and short/erroneous cell lists.

    Parity: upscale.py:1366-1398: builds the subgrid ``streams`` map
    (outlet pixels hold their lowres index, stream pixels -1, else -9),
    flags invalid connections and short inter-outlet distances.
    """
    streams = np.full(subidxs_ds.size, -9, dtype=np.int32)
    valid = np.ones(idxs_ds.size, dtype=bool)
    sel = np.where(subidxs_out != mv)[0]
    streams[subidxs_out[sel]] = sel
    idxs_fix, idxs_short = [], []
    idx0s = np.where(idxs_ds != mv)[0]
    cur = subidxs_out[idx0s].astype(np.int64)
    d = np.zeros(idx0s.size, dtype=np.int64)
    active = np.ones(idx0s.size, dtype=bool)
    bad = np.zeros(idx0s.size, dtype=bool)
    short = np.zeros(idx0s.size, dtype=bool)
    for _ in range(subidxs_ds.size):
        if not active.any():
            break
        ai = np.where(active)[0]
        sub1 = subidxs_ds[cur[ai]].astype(np.int64)
        stop = (streams[sub1] >= 0) | (sub1 == cur[ai])
        si = ai[stop]
        tgt = subidxs_out[idxs_ds[idx0s[si]]]
        bad[si] = sub1[stop] != tgt
        short[si] = (
            (sub1[stop] == tgt) & (minlen > 0) & (d[si] + 1 <= minlen)
        )
        # mark stream pixels (only walked-over, not stopping ones)
        go = ai[~stop]
        streams[cur[go]] = np.maximum(streams[cur[go]], -1)
        d[go] += 1
        cur[go] = sub1[~stop]
        active[si] = False
    valid[idx0s[bad]] = False
    t = idxs_ds.dtype
    return (
        valid,
        streams,
        idx0s[bad].astype(t),
        idx0s[short].astype(t),
    )

# -- IHU repair passes (native host kernels; csrc/upscale_kernels.cpp) -------
#
# The relocate / optimize-rivlen / minimize-error passes are sequential
# mutation-with-rollback sweeps over a small set of problem cells; they run
# as native kernels built around an explicit edit-log transaction design.
# The wrappers below own dtype normalization and the NumPy orderings
# (argsort tie-breaks are part of the observable behavior).


def _as_i64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def ihu_relocate_outlets(
    idxs_fix,
    idxs_ds,
    subidxs_out,
    subidxs_ds,
    subuparea,
    subshape,
    shape,
    cellsize,
    mv=_MV,
):
    """Relocate outlet pixels to reconnect disconnected cells.

    Behavioral spec: reference upscale.py:522-877 (trace alternatives,
    collect tributaries, greedy reconnect with bottleneck rollback); native
    implementation in csrc/upscale_kernels.cpp::ihu_relocate.
    """
    from .runtime import ihu_relocate as _native

    if idxs_fix is None:
        idxs_fix = upscale_error(subidxs_out, idxs_ds, subidxs_ds, mv=mv)[1]
    cell_ds = _as_i64(idxs_ds)
    cell_out = _as_i64(subidxs_out)
    broken = _as_i64(idxs_fix)
    # ascending outlet uparea (NumPy argsort order is part of the contract)
    broken = broken[np.argsort(np.asarray(subuparea)[cell_out[broken]])]
    still = _native(
        cell_ds, cell_out, _as_i64(subidxs_ds), subuparea, broken,
        shape, subshape[1], cellsize,
    )
    t = idxs_ds.dtype
    return cell_ds.astype(t), cell_out.astype(t), still.astype(t)


def ihu_optimize_rivlen(
    idxs_short,
    valid,
    streams,
    idxs_ds,
    subidxs_out,
    subidxs_ds,
    subuparea,
    subshape,
    shape,
    cellsize,
    minlen=0,
    minupa=0,
    mv=_MV,
):
    """Reduce cells with a too-short downstream subgrid length.

    Behavioral spec: reference upscale.py:971-1019; native implementation
    in csrc/upscale_kernels.cpp::ihu_opt_rivlen. Mutates ``streams`` in
    place (it is reused by the later minimize-error pass).
    """
    from .runtime import ihu_opt_rivlen as _native

    cell_ds = _as_i64(idxs_ds)
    cell_out = _as_i64(subidxs_out)
    _native(
        cell_ds, cell_out, streams,
        np.ascontiguousarray(valid, dtype=np.uint8),
        _as_i64(subidxs_ds), subuparea, _as_i64(idxs_short),
        shape, subshape[1], cellsize, minlen, minupa,
    )
    t = idxs_ds.dtype
    return cell_ds.astype(t), cell_out.astype(t)


def ihu_minimize_error(
    idxs_fix,
    valid,
    streams,
    idxs_ds,
    subidxs_out,
    subidxs_ds,
    subuparea,
    subshape,
    shape,
    cellsize,
    minlen=0,
    minupa=0,
    pit_out_of_cell=2,
    mv=_MV,
):
    """Minimize cells with upstream-area errors.

    Behavioral spec: reference upscale.py:1022-1152; native implementation
    in csrc/upscale_kernels.cpp::ihu_min_error.
    """
    from .runtime import ihu_min_error as _native

    cell_ds = _as_i64(idxs_ds)
    cell_out = _as_i64(subidxs_out)
    broken = _as_i64(idxs_fix)
    # descending outlet uparea (NumPy argsort order is part of the contract)
    broken = broken[np.argsort(np.asarray(subuparea)[cell_out[broken]])[::-1]]
    _native(
        cell_ds, cell_out, streams,
        np.ascontiguousarray(valid, dtype=np.uint8),
        _as_i64(subidxs_ds), subuparea, broken,
        shape, subshape[1], cellsize, minlen, minupa, pit_out_of_cell,
    )
    t = idxs_ds.dtype
    return cell_ds.astype(t), cell_out.astype(t)


def ihu(
    subidxs_ds,
    subuparea,
    subshape,
    cellsize,
    minlen_ratio=0.25,
    minupa_ratio=0.25,
    r_ratio=0.5,
    niter=5,
    opt_rivlen=True,
    min_error=True,
    pit_out_of_cell=2,
    mv=_MV,
):
    """Iterative hydrography upscaling.

    Behavioral spec: reference upscale.py:1155-1305. Construction phase:
    EAM representative cells (device scatter-argmax) -> outlet pixels (one
    pointer-doubling ``reach``) -> lowres pointers (lockstep walk). Repair
    phase: up to ``niter`` rounds of the native repair kernels — relocate
    broken cells, re-check connectivity, shorten sub-minimum reaches,
    minimize upstream-area error — stopping early once a round fixes
    nothing new (the final round additionally allows near-cell pits).
    """
    subnrow, subncol = subshape
    shape = (int(np.ceil(subnrow / cellsize)), int(np.ceil(subncol / cellsize)))
    geo = dict(subshape=subshape, shape=shape, cellsize=cellsize, mv=mv)
    min_reach_len = cellsize * minlen_ratio
    min_outlet_upa = cellsize**2 * minupa_ratio

    # construction
    rep = eam_repcell(subidxs_ds, subuparea, r_ratio=r_ratio, **geo)
    subidxs_out = ihu_outlets(rep, subidxs_ds, subuparea, **geo)
    idxs_ds, broken = ihu_nextidx(
        subidxs_out, subidxs_ds, r_ratio=r_ratio, **geo
    )

    # repair rounds
    for round_no in range(niter):
        idxs_ds, subidxs_out, _ = ihu_relocate_outlets(
            broken, idxs_ds, subidxs_out, subidxs_ds, subuparea, **geo
        )
        valid, strm, still_broken, short = upscale_check(
            subidxs_out, idxs_ds, subidxs_ds, minlen=min_reach_len, mv=mv
        )
        converged = still_broken.size in (0, broken.size)
        final = converged or round_no + 1 == niter
        repair_args = (idxs_ds, subidxs_out, subidxs_ds, subuparea)
        if opt_rivlen:
            idxs_ds, subidxs_out = ihu_optimize_rivlen(
                short, valid, strm, *repair_args,
                minlen=min_reach_len, minupa=min_outlet_upa, **geo,
            )
            repair_args = (idxs_ds, subidxs_out, subidxs_ds, subuparea)
        if min_error:
            idxs_ds, subidxs_out = ihu_minimize_error(
                still_broken, valid, strm, *repair_args,
                minlen=min_reach_len, minupa=min_outlet_upa,
                pit_out_of_cell=pit_out_of_cell if final else 0, **geo,
            )
        if final:
            break
        broken = still_broken

    return idxs_ds, subidxs_out, shape


def eam_plus(subidxs_ds, subuparea, subshape, cellsize, mv=_MV):
    """EAM+ = IHU without repair iterations. Parity: upscale.py:1308-1309."""
    return ihu(subidxs_ds, subuparea, subshape, cellsize, niter=0, mv=mv)


# ---------------------------------------------------------------------------
# banded (out-of-core) IHU — continental mosaics within bounded host RAM
# ---------------------------------------------------------------------------
def _ihu_construct_banded(
    subidxs_ds, subuparea, subshape, shape, cellsize, r_ratio, mv, band_rows,
    halo_rows,
):
    """IHU construction passes over lowres-row bands of the highres grid.

    Representative cells and outlet traces are confined to their own
    lowres cell, so bands need no halo; the outlet->outlet nextidx walks
    *end* at most one lowres ring away for valid connections, so a
    ``halo_rows`` lowres-ring covers them in almost all geometries. A
    highres path can however *detour* beyond the halo and still return
    to a valid in-D8 connection; such walks are conservatively flagged
    for the repair rounds (which may resolve them differently than the
    monolithic :func:`ihu`). Escaped walks are counted and warned about
    so callers can raise ``halo_rows`` when they occur.
    ``subidxs_ds``/``subuparea`` may be memmaps: only one band (+halo)
    is resident at a time.
    """
    subnrow, subncol = subshape
    nrow, ncol = shape
    nlow = nrow * ncol
    dtype = np.int64
    rep_g = np.full(nlow, mv, dtype=dtype)
    out_g = np.full(nlow, mv, dtype=dtype)

    # pass 1: representative cells + outlet pixels (no halo needed)
    for b0 in range(0, nrow, band_rows):
        b1 = min(b0 + band_rows, nrow)
        r0, r1 = b0 * cellsize, min(b1 * cellsize, subnrow)
        off = r0 * subncol
        sds = np.asarray(subidxs_ds[off : r1 * subncol], dtype=np.int64)
        supa = np.asarray(subuparea[off : r1 * subncol])
        sub_g = off + np.arange(sds.size, dtype=np.int64)
        valid = sds != mv
        ispit = sds == sub_g
        ea = effective_area(sub_g, subncol, cellsize, r_ratio)
        sel = valid & (ispit | ea)
        lowres = subidx_2_idx(sub_g, subncol, cellsize, ncol)
        # local scatter-argmax over the band's lowres rows only
        lo0, lo1 = b0 * ncol, b1 * ncol
        rep_loc = _scatter_argmax(sel, lowres - lo0, supa, lo1 - lo0, dtype)
        rep_g[lo0:lo1] = np.where(rep_loc != mv, rep_loc + off, mv)

        # outlet trace: stop where the downstream pixel leaves the cell
        # (paths never leave the cell, hence never the band)
        ds_g = np.where(valid, sds, sub_g)
        exit_ = lowres != subidx_2_idx(ds_g, subncol, cellsize, ncol)
        pit = valid & ispit
        stop = exit_ | pit
        lds = np.where(valid & ~stop, sds - off, -1).astype(np.int32)
        ar = np.arange(sds.size, dtype=np.int32)
        lds = np.where(stop & valid, ar, lds)  # freeze at stops
        t = np.asarray(
            graph.reach(jnp.asarray(lds), jnp.asarray(stop & valid))
        ).astype(np.int64)
        rep_band = rep_g[lo0:lo1]
        has = rep_band != mv
        out_g[lo0:lo1][has] = t[rep_band[has] - off] + off

    # pass 2: outlet -> next outlet walks with a lowres-ring halo
    idxs_ds = np.full(nlow, mv, dtype=dtype)
    fix_all = []
    n_escaped = 0
    for b0 in range(0, nrow, band_rows):
        b1 = min(b0 + band_rows, nrow)
        h0 = max(b0 - halo_rows, 0) * cellsize
        h1 = min((b1 + halo_rows) * cellsize, subnrow)
        off = h0 * subncol
        hi = h1 * subncol
        sds = np.asarray(subidxs_ds[off:hi], dtype=np.int64)
        supa = np.asarray(subuparea[off:hi])
        lo0, lo1 = b0 * ncol, b1 * ncol
        idx0 = lo0 + np.where(out_g[lo0:lo1] != mv)[0]
        if idx0.size == 0:
            continue
        cur = out_g[idx0]  # global pixel ids, inside the band
        ea_first = np.full(idx0.size, mv, dtype=np.int64)
        result = np.full(idx0.size, mv, dtype=np.int64)
        fix = np.zeros(idx0.size, dtype=bool)
        active = np.ones(idx0.size, dtype=bool)
        for _ in range(hi - off):
            if not active.any():
                break
            ai = np.where(active)[0]
            sub1 = sds[cur[ai] - off]
            low1 = subidx_2_idx(sub1, subncol, cellsize, ncol)
            pit = sub1 == cur[ai]
            at_outlet = out_g[low1] == sub1
            escaped = (sub1 < off) | (sub1 >= hi)
            stop = at_outlet | pit | escaped
            ea = effective_area(sub1, subncol, cellsize, r_ratio)
            unset = ea_first[ai] == mv
            take = unset & ea & ~stop
            ea_first[ai[take]] = sub1[take]
            si = ai[stop]
            n_escaped += int(escaped.sum())
            # escaped walks are flagged for repair (a detour past the halo
            # could still return in-D8; see docstring)
            d8ok = in_d8(idx0[si], low1[stop], ncol) & ~escaped[stop]
            res = np.where(d8ok, sub1[stop], ea_first[si])
            fix[si] |= ~d8ok
            fix[si] |= d8ok & ~at_outlet[stop]
            result[si] = res
            cur[ai[~stop]] = sub1[~stop]
            active[si] = False
        result = np.where(result == mv, ea_first, result)
        good = result != mv
        vals = np.full(idx0.size, mv, dtype=np.int64)
        vals[good] = subidx_2_idx(result[good], subncol, cellsize, ncol)
        idxs_ds[idx0] = vals
        fix_all.append(idx0[fix])

    if n_escaped:
        import warnings

        warnings.warn(
            f"{n_escaped} outlet walk(s) left the {halo_rows}-row halo and"
            " were flagged for repair; raise halo_rows to match the"
            " monolithic IHU on these cells"
        )
    idxs_fix = (
        np.concatenate(fix_all) if fix_all else np.array([], dtype=dtype)
    )
    return idxs_ds, out_g, idxs_fix


def ihu_tiled(
    subidxs_ds,
    subuparea,
    subshape,
    cellsize,
    band_rows=64,
    halo_rows=4,
    minlen_ratio=0.25,
    minupa_ratio=0.25,
    r_ratio=0.5,
    niter=5,
    opt_rivlen=True,
    min_error=True,
    pit_out_of_cell=2,
    mv=_MV,
):
    """Out-of-core IHU for continental mosaics (BASELINE config 4).

    Same behavioral spec as :func:`ihu`, with the highres construction
    passes streamed over ``band_rows`` lowres-row bands (+``halo_rows``
    rings for the cross-cell walks): pass ``subidxs_ds`` as an int64
    ``np.memmap`` (and ``subuparea`` as float64) and at most one band is
    ever resident; the repair rounds run on the (cellsize^2-smaller)
    global lowres arrays with random paged access into the memmaps —
    exactly the split the reference cannot do (its numba loops assume
    resident arrays, upscale.py:1155-1305).
    """
    subnrow, subncol = subshape
    shape = (int(np.ceil(subnrow / cellsize)), int(np.ceil(subncol / cellsize)))
    geo = dict(subshape=subshape, shape=shape, cellsize=cellsize, mv=mv)
    min_reach_len = cellsize * minlen_ratio
    min_outlet_upa = cellsize**2 * minupa_ratio

    idxs_ds, subidxs_out, broken = _ihu_construct_banded(
        subidxs_ds_m := subidxs_ds,
        subuparea,
        subshape,
        shape,
        cellsize,
        r_ratio,
        mv,
        band_rows,
        halo_rows,
    )

    for round_no in range(niter):
        idxs_ds, subidxs_out, _ = ihu_relocate_outlets(
            broken, idxs_ds, subidxs_out, subidxs_ds_m, subuparea, **geo
        )
        valid, strm, still_broken, short = upscale_check(
            subidxs_out, idxs_ds, subidxs_ds_m, minlen=min_reach_len, mv=mv
        )
        converged = still_broken.size in (0, broken.size)
        final = converged or round_no + 1 == niter
        repair_args = (idxs_ds, subidxs_out, subidxs_ds_m, subuparea)
        if opt_rivlen:
            idxs_ds, subidxs_out = ihu_optimize_rivlen(
                short, valid, strm, *repair_args,
                minlen=min_reach_len, minupa=min_outlet_upa, **geo,
            )
            repair_args = (idxs_ds, subidxs_out, subidxs_ds_m, subuparea)
        if min_error:
            idxs_ds, subidxs_out = ihu_minimize_error(
                still_broken, valid, strm, *repair_args,
                minlen=min_reach_len, minupa=min_outlet_upa,
                pit_out_of_cell=pit_out_of_cell if final else 0, **geo,
            )
        if final:
            break
        broken = still_broken

    return idxs_ds, subidxs_out, shape
