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

__all__ = ["dmm", "eam", "eam_plus", "ihu", "upscale_error", "upscale_check"]

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


# -- IHU repair passes (host sequential; small problem sets) ----------------


def _upstream_d8_idx(idx0, idxs_ds, shape):
    """Linear indices of D8 neighbors draining to idx0 (reference
    core.py:295-304)."""
    nrow, ncol = shape
    r, c = idx0 // ncol, idx0 % ncol
    out = []
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            r1, c1 = r + dr, c + dc
            if 0 <= r1 < nrow and 0 <= c1 < ncol:
                idx = r1 * ncol + c1
                if idxs_ds[idx] == idx0:
                    out.append(idx)
    return np.array(out, dtype=idxs_ds.dtype)


def _d8_idx(idx0, shape):
    """Linear indices of the 8 neighbors (reference core.py:276-291)."""
    nrow, ncol = shape
    r, c = idx0 // ncol, idx0 % ncol
    out = []
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            r1, c1 = r + dr, c + dc
            if 0 <= r1 < nrow and 0 <= c1 < ncol:
                out.append(r1 * ncol + c1)
    return np.array(out, dtype=np.int64)


def _next_outlet(subidx, subidxs_ds, subidxs_out, subncol, cellsize, ncol):
    """Walk to the next outlet pixel (reference upscale.py:499-519)."""
    while True:
        subidx1 = subidxs_ds[subidx]
        idx1 = int(subidx_2_idx(subidx1, subncol, cellsize, ncol))
        outlet = subidx1 == subidxs_out[idx1]
        pit = subidx1 == subidx
        if outlet or pit:
            break
        subidx = subidx1
    return subidx1, idx1, outlet


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
    """Relocate outlet pixels to reconnect disconnected cells (host).

    Faithful port of reference upscale.py:522-877: for each disconnected
    cell (ascending outlet uparea): (1) trace downstream collecting
    alternative outlet pixels, (2) find tributary cells flowing into the
    trace, (3) find the alternative outlets each tributary can connect to,
    (4) greedily re-route main and tributary connections along the trace,
    rolling back on bottlenecks or created loops.
    """
    _, subncol = subshape
    _, ncol = shape

    if idxs_fix is None:
        idxs_fix1 = upscale_error(subidxs_out, idxs_ds, subidxs_ds, mv=mv)[1]
    else:
        idxs_fix1 = idxs_fix

    idxs_fix_out = []
    seq = np.argsort(subuparea[subidxs_out[idxs_fix1]])
    for i0 in seq:  # @0A
        nextiter = False
        idx00 = int(idxs_fix1[i0])

        # STEP 1: downstream trace collecting alternative outlet pixels
        idxs_lst = []
        subidxs_lst = []
        stop = False
        idx_ds0 = idxs_ds[idx00]
        subidx = subidxs_ds[subidxs_out[idx00]]
        idx0 = int(subidx_2_idx(subidx, subncol, cellsize, ncol))
        while True:  # @1A
            subidx1 = subidxs_ds[subidx]
            idx1 = int(subidx_2_idx(subidx1, subncol, cellsize, ncol))
            pit = subidx1 == subidx
            if pit or idx0 != idx1:
                if pit:
                    stop = True
                elif subidx == subidxs_out[idx_ds0]:
                    if idx_ds0 in idxs_lst:
                        pass
                    else:
                        stop = True
                if idxs_ds[idx0] != mv:
                    subidxs_lst.append(subidx)
                    idxs_lst.append(idx0)
                if subidx == subidxs_out[idx0]:
                    idx_ds0 = idxs_ds[idx0]
                idx0 = idx1
            if stop:
                break
            subidx = subidx1
        if stop and subidx == subidxs_out[idxs_ds[idx00]]:
            continue  # already fixed
        elif stop is False:
            continue  # no successful trace end

        # STEP 2: tributary cells directly upstream of the trace
        idxs_us_lst = []
        idxs_ds0 = np.unique(np.array(idxs_lst, dtype=idxs_ds.dtype))
        for idx_ds in idxs_ds0:  # @2A
            idxs_us = _upstream_d8_idx(idx_ds, idxs_ds, shape)
            for iu in idxs_us:
                if subidxs_out[iu] in subidxs_lst or iu == idx00:
                    continue
                idxs_us_lst.append(int(iu))

        # STEP 3: connect tributaries to alternative outlets on the trace
        noutlets = len(subidxs_lst)
        idxs_us_conn_lst = []
        idxs_us_conn_lst1 = []
        for i in range(len(idxs_us_lst)):  # @3A
            idx0 = idxs_us_lst[i]
            subidx = subidxs_out[idx0]
            connected = False
            j0, j1 = 0, 0
            subidx = subidxs_ds[subidx]
            idx = idx0
            ii = 0
            while True and ii <= 10:  # @3B
                subidx1 = subidxs_ds[subidx]
                idx1 = int(subidx_2_idx(subidx1, subncol, cellsize, ncol))
                if subidx == subidx1 or idx != idx1:
                    if not connected:
                        ii += 1
                    for j in range(j0, noutlets):  # @3C
                        if subidxs_lst[j] == subidx:
                            if not connected:
                                j0, j1, connected = j, j, True
                            elif in_d8(idx0, idx, ncol):
                                j1 = j
                            break
                    if (j1 + 1 == noutlets) or subidx == subidx1:
                        break
                subidx = subidx1
                idx = idx1
            if connected:
                idxs_us_conn_lst.append(j0)
                idxs_us_conn_lst1.append(j1)
            else:
                idxs_us_conn_lst.append(noutlets - 1)
                idxs_us_conn_lst1.append(noutlets - 1)
        idxs_us_conn = np.array(idxs_us_conn_lst, dtype=idxs_ds.dtype)
        seq1 = np.argsort(idxs_us_conn)
        idxs_us0 = np.array(idxs_us_lst, dtype=idxs_ds.dtype)[seq1]
        subidxs_ds0 = subidxs_out[idxs_ds[idxs_us0]]
        idxs_us_conn1 = np.array(idxs_us_conn_lst1, dtype=idxs_ds.dtype)[seq1]
        idxs_us_conn = idxs_us_conn[seq1]

        # STEP 4: connect the dots
        bottleneck = []
        nbottlenecks = -1
        idx0_lst = []
        idx_ds0_lst = []
        idx_out_lst = []
        subidx0_out_lst = []
        idx_ds_lst = []
        while len(bottleneck) > nbottlenecks:
            nextiter = False
            nbottlenecks = len(bottleneck)
            subidx0_out_lst = []
            idx_out_lst = []
            idx_ds_lst = []
            idx_ds0_lst = []
            idx0_lst = []
            idx0 = idx00
            j0, k0 = 0, 0
            for j in range(noutlets):  # @4A
                if nextiter:
                    continue
                subidx_out1 = subidxs_lst[j]
                idx1 = idxs_lst[j]
                if idx1 in idx_out_lst or idx1 in bottleneck:
                    d8 = False
                else:
                    d8 = bool(in_d8(idx0, idx1, ncol))
                ks_bool = np.logical_and(
                    idxs_us_conn[k0:] >= j0, idxs_us_conn[k0:] <= j
                )
                ks = np.where(ks_bool)[0] + k0
                lats = ks.size > 0
                nextlats = bool(np.all(idxs_us_conn1[ks] > j)) if lats else False
                nextd8 = False
                if subidxs_out[idx1] != subidx_out1:
                    for jj in range(j + 1, noutlets):
                        idx = idxs_lst[jj]
                        if idx in idx_out_lst or idx in bottleneck:
                            continue
                        elif in_d8(idx0, idx, ncol):
                            nextd8 = True
                        if subidxs_out[idx] == subidxs_lst[jj]:
                            break
                nextd8 = nextd8 and subidxs_out[idx1] != subidx_out1
                if not d8 and not nextd8:
                    nextiter = True
                elif (not lats and nextd8) or (nextlats and nextd8):
                    continue
                if (d8 and lats) or (d8 and not nextd8):
                    # update MAIN connection
                    if idxs_ds[idx0] != idx1:
                        idx_ds0_lst.append(idxs_ds[idx0])
                        idx0_lst.append(idx0)
                        idx_ds_lst.append(idx1)
                        idxs_ds[idx0] = idx1
                    if subidx_out1 != subidxs_out[idx1]:
                        idx_out_lst.append(idx1)
                        subidx0_out_lst.append(subidxs_out[idx1])
                        subidxs_out[idx1] = subidx_out1
                    # update tributary connections
                    for k in ks:  # @4C
                        idx0t = int(idxs_us0[k])
                        if idx0t in idx_out_lst:
                            continue
                        subidx_ds0 = subidxs_ds0[k]
                        subidx = subidxs_out[idx0t]
                        idx_ds0t = idx0t
                        path = []
                        while True:  # @4D
                            subidx1 = subidxs_ds[subidx]
                            idx_ds = int(subidx_2_idx(subidx1, subncol, cellsize, ncol))
                            outlet = subidx1 == subidxs_out[idx_ds]
                            pit = subidx1 == subidx
                            idx_ds_edit = idx_ds0t in idx_out_lst
                            if outlet or pit:
                                idx_ds0_edit = (
                                    idx0t in idx0_lst or idxs_ds[idx0t] in idx_out_lst
                                )
                                ind8 = bool(in_d8(idx0t, idx_ds, ncol))
                                if (not ind8 and idx_ds0_edit) or (not outlet and pit):
                                    nextiter = True
                                    if idxs_ds[idx0t] not in bottleneck:
                                        bottleneck.append(idxs_ds[idx0t])
                                elif ind8 and idxs_ds[idx0t] != idx_ds:
                                    idx_ds0_lst.append(idxs_ds[idx0t])
                                    idx0_lst.append(idx0t)
                                    idx_ds_lst.append(idx_ds)
                                    idxs_ds[idx0t] = idx_ds
                                break
                            elif (
                                idx_ds0t != idx_ds
                                and idx_ds0t != idx0t
                                and subidx_ds0 in path
                                and not idx_ds_edit
                                and in_d8(idx0t, idx_ds0t, ncol)
                            ):
                                idx_us0 = _upstream_d8_idx(idx_ds0t, idxs_ds, shape)
                                _, idx_ds00, outlet0 = _next_outlet(
                                    subidx, subidxs_ds, subidxs_out, subncol,
                                    cellsize, ncol,
                                )
                                idx_ds00_edit = idx_ds00 in idx_out_lst
                                if (
                                    idx_us0.size == 0
                                    and outlet0
                                    and not idx_ds00_edit
                                    and idx_ds0t != idx_ds00
                                    and in_d8(idx_ds0t, idx_ds00, ncol)
                                ):
                                    if idxs_ds[idx0t] != idx_ds0t:
                                        idx_ds0_lst.append(idxs_ds[idx0t])
                                        idx0_lst.append(idx0t)
                                        idx_ds_lst.append(idx_ds0t)
                                        idxs_ds[idx0t] = idx_ds0t
                                    if idxs_ds[idx_ds0t] != idx_ds00:
                                        idx_ds0_lst.append(idxs_ds[idx_ds0t])
                                        idx0_lst.append(idx_ds0t)
                                        idx_ds_lst.append(idx_ds00)
                                        idxs_ds[idx_ds0t] = idx_ds00
                                    if subidx != subidxs_out[idx_ds0t]:
                                        idx_out_lst.append(idx_ds0t)
                                        subidx0_out_lst.append(subidxs_out[idx_ds0t])
                                        subidxs_out[idx_ds0t] = subidx
                                    break
                            path.append(subidx1)
                            subidx = subidx1
                            idx_ds0t = idx_ds
                    idx0 = idx1
                    j0 = j + 1
                elif not nextiter and lats:
                    for k in ks:  # @4E
                        idx_ds0t = idxs_ds[idxs_us0[k]]
                        lat_ds = idx_ds0t in idxs_lst[j:]
                        lat_edit = idx_ds0t in idx_out_lst
                        if not lat_ds and not lat_edit:
                            k0 = k
                        else:
                            break

                # unroll edits
                if nextiter:
                    for i in range(len(idx0_lst)):
                        idxs_ds[idx0_lst[-1 - i]] = idx_ds0_lst[-1 - i]
                    for i in range(len(idx_out_lst)):
                        subidxs_out[idx_out_lst[i]] = subidx0_out_lst[i]

        loop = noutlets > 0 and idxs_ds[idx1] in idx_out_lst
        if loop:
            nextiter = True
            for i in range(len(idx0_lst)):
                idxs_ds[idx0_lst[-1 - i]] = idx_ds0_lst[-1 - i]
            for i in range(len(idx_out_lst)):
                subidxs_out[idx_out_lst[i]] = subidx0_out_lst[i]

        if nextiter or loop:
            idxs_fix_out.append(idx00)

    return idxs_ds, subidxs_out, np.array(idxs_fix_out, dtype=idxs_ds.dtype)


def outlet_pix(idx, subidxs_ds, ncol, subncol, cellsize, all=False):
    """Edge pixels of a lowres cell whose downstream pixel leaves the cell.

    Parity: upscale.py:880-905.
    """
    subidxs = []
    subnrow = int(subidxs_ds.size / subncol)
    args = (subncol, cellsize, ncol)
    c_ul = (idx % ncol) * cellsize
    r_ul = (idx // ncol) * cellsize
    for ci in range(cellsize):
        if c_ul + ci >= subncol:
            continue
        we_edge = ci == 0 or ci + 1 == cellsize
        for ri in range(cellsize):
            if r_ul + ri >= subnrow:
                continue
            ns_edge = ri == 0 or ri + 1 == cellsize
            edge = we_edge or ns_edge
            subidx = (r_ul + ri) * subncol + c_ul + ci
            subidx1 = subidxs_ds[subidx]
            if subidx == subidx1:
                subidxs.append(subidx)
            elif edge and (all or int(subidx_2_idx(subidx1, *args)) != idx):
                subidxs.append(subidx)
    return subidxs


def new_outlet(
    idx0,
    subidx0,
    streams,
    idxs_ds,
    subidxs_out,
    subidxs_ds,
    subuparea,
    ncol,
    subncol,
    cellsize,
    minlen=0,
    minupa=0,
    mv=_MV,
    subidx1=None,
):
    """Find an alternative outlet pixel for a lowres cell (host).

    Parity: upscale.py:908-968.
    """
    path0 = np.full(1, mv, dtype=subidxs_ds.dtype)
    subidx_out = mv
    idx_ds = mv
    upa0 = minupa
    streams[subidx0] = -1
    subidxs = outlet_pix(idx0, subidxs_ds, ncol, subncol, cellsize)
    for i in range(len(subidxs)):
        subidx = subidxs[i]
        if streams[subidx] != -9 or subuparea[subidx] <= upa0:
            continue
        path = []
        while True:
            subidx_ds = subidxs_ds[subidx]
            path.append(subidx_ds)
            if streams[subidx_ds] >= 0 or subidx == subidx_ds:
                break
            subidx = subidx_ds
        n = len(path)
        idx1 = int(subidx_2_idx(subidx_ds, subncol, cellsize, ncol))
        outlet1 = subidx1 is None or subidx1 == subidx_ds
        outlet = n > minlen and bool(in_d8(idx0, idx1, ncol)) and idx0 != idx1
        pit = n == 1 and subidx == path[0] and idx0 == idx1
        if outlet1 and (outlet or pit):
            upa0 = subuparea[subidxs[i]]
            subidx_out = subidxs[i]
            idx_ds = idx1
            path0 = np.array(path, dtype=subidxs_ds.dtype)

    if idx_ds != mv:
        idxs_ds[idx0] = idx_ds
        subidxs_out[idx0] = subidx_out
        streams[subidx_out] = idx0
        for subidx in path0:
            streams[subidx] = max(streams[subidx], -1)
    else:
        streams[subidx0] = idx0  # restore
    return streams, idxs_ds, subidxs_out, idx_ds != mv


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
    """Reduce cells with a too-short downstream subgrid length (host).

    Parity: upscale.py:971-1019.
    """
    _, subncol = subshape
    _, ncol = shape
    args = (subidxs_ds, subuparea, ncol, subncol, cellsize, minlen, minupa, mv)
    for i in range(len(idxs_short)):
        for idx0 in [int(idxs_short[i]), int(idxs_ds[idxs_short[i]])]:
            subidx0 = subidxs_out[idx0]
            idx1 = idxs_ds[idx0]
            if idx1 == idx0 or valid[idx1] == False or valid[idx0] == False:  # noqa: E712
                continue
            idxs_us = _upstream_d8_idx(idx0, idxs_ds, shape)
            idxs_us_ind8 = [bool(in_d8(idx, idx1, ncol)) for idx in idxs_us if valid[idx]]
            if idxs_us.size == 0 or np.all(np.array(idxs_us_ind8, dtype=bool)):
                streams, idxs_ds, subidxs_out, success = new_outlet(
                    idx0, subidx0, streams, idxs_ds, subidxs_out, *args
                )
                if success:
                    for idx in idxs_us:
                        if valid[idx]:
                            assert idx != idx1
                            idxs_ds[idx] = idx1
                        elif idxs_ds[idx0] == idx:  # loop -> undo
                            streams[subidxs_out[idx0]] = -1
                            streams[subidx0] = idx0
                            subidxs_out[idx0] = subidx0
                            idxs_ds[idx0] = idx1
                    break
    return idxs_ds, subidxs_out


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
    """Minimize cells with upstream-area errors (host).

    Parity: upscale.py:1022-1152.
    """
    _, subncol = subshape
    _, ncol = shape
    args = (subidxs_ds, subuparea, ncol, subncol, cellsize, minlen, minupa, mv)

    seq = np.argsort(subuparea[subidxs_out[idxs_fix]])
    for i0 in seq[::-1]:  # @0A
        idx0 = int(idxs_fix[i0])
        fixed = False
        subidx0 = subidxs_out[idx0]
        idxs = []
        subidx = subidx0
        while True:
            subidx_ds = subidxs_ds[subidx]
            if subidx_ds == subidx:
                break
            if streams[subidx_ds] >= 0:
                idx1 = int(streams[subidx_ds])
                idxs.append(idx1)
                if len(idxs) == 100 or (len(idxs) == 1 and in_d8(idx0, idx1, ncol)):
                    break
            subidx = subidx_ds

        check_pit = pit_out_of_cell > 0 and subidx_ds == subidx
        if check_pit:
            idx1 = int(subidx_2_idx(subidx_ds, subncol, cellsize, ncol))
            dr = int(idx1 % ncol) - int(idx0 % ncol)
            dc = int(idx1 // ncol) - int(idx0 // ncol)
            check_pit = abs(dr) <= pit_out_of_cell and abs(dc) <= pit_out_of_cell
        if check_pit and (subidx_ds == subidx0 or len(idxs) == 0):
            streams[subidxs_out[idx0]] = -1
            streams[subidx_ds] = idx0
            idxs_ds[idx0] = idx0
            subidxs_out[idx0] = subidx_ds
            continue

        idxs_d8 = _d8_idx(idx0, shape)
        if np.all(idxs_ds[idxs_d8] != idx0):
            streams, idxs_ds, subidxs_out, fixed = new_outlet(
                idx0, subidx0, streams, idxs_ds, subidxs_out, *args
            )
        for _ in range(2):
            max_dist = 999999
            max_upa = 0
            idxs_hw = []
            if not fixed:
                for idx1 in idxs_d8:
                    idx1 = int(idx1)
                    idx = idx1
                    upa = subuparea[subidxs_out[idx1]]
                    hor = abs(idx1 - idx0) == 1
                    ver = abs(idx1 - idx0) == ncol
                    for j in range(max_dist + 1):
                        if idx in idxs:
                            d0 = idxs.index(idx) + j
                            if d0 < max_dist or (d0 == max_dist and upa > max_upa):
                                cross = False
                                if not (hor or ver):
                                    dr = (idx1 % ncol) - (idx0 % ncol)
                                    dc = (idx1 // ncol) - (idx0 // ncol)
                                    idxh = idx0 + dr
                                    idxv = idx0 + dc * ncol
                                    cross = (
                                        idxs_ds[idxh] == idxv or idxs_ds[idxv] == idxh
                                    )
                                if not cross:
                                    idxs_ds[idx0] = idx1
                                    assert idx0 != idx1
                                    max_dist = d0
                                    max_upa = upa
                                    fixed = True
                            break
                        idx_ds = idxs_ds[idx]
                        if idx_ds == idx or idx_ds == idx0:
                            if idx_ds == idx0:
                                idxs_us = _upstream_d8_idx(idx1, idxs_ds, shape)
                                if idxs_us.size == 0:
                                    idxs_hw.append(idx1)
                            break
                        idx = idx_ds

            if not fixed and len(idxs_hw) > 0 and len(idxs) > 0:
                for idx in idxs_hw:
                    subidx0h = subidxs_out[idx]
                    subidx1 = subidxs_out[idxs[0]]
                    args2 = args + (subidx1,)
                    streams, idxs_ds, subidxs_out, fixed1 = new_outlet(
                        idx, subidx0h, streams, idxs_ds, subidxs_out, *args2
                    )
                    if fixed1:
                        break
            else:
                break
    return idxs_ds, subidxs_out


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
    """Iterative hydrography upscaling driver.

    Parity: reference upscale.py:1155-1305: repcell -> outlets -> nextidx,
    then ``niter`` rounds of relocate / check / optimize-rivlen /
    minimize-error.
    """
    subnrow, subncol = subshape
    nrow = int(np.ceil(subnrow / cellsize))
    ncol = int(np.ceil(subncol / cellsize))
    shape = (nrow, ncol)
    minlen = cellsize * minlen_ratio
    minupa = cellsize**2 * minupa_ratio
    subidxs_rep = eam_repcell(
        subidxs_ds, subuparea, subshape, shape, cellsize, r_ratio=r_ratio, mv=mv
    )
    subidxs_out = ihu_outlets(
        subidxs_rep, subidxs_ds, subuparea, subshape, shape, cellsize, mv=mv
    )
    idxs_ds, idxs_fix = ihu_nextidx(
        subidxs_out, subidxs_ds, subshape, shape, cellsize, r_ratio=r_ratio, mv=mv
    )
    for j in range(niter):
        idxs_ds, subidxs_out, idxs_fix1 = ihu_relocate_outlets(
            idxs_fix, idxs_ds, subidxs_out, subidxs_ds, subuparea,
            subshape, shape, cellsize, mv=mv,
        )
        valid, streams, idxs_fix1, idxs_short = upscale_check(
            subidxs_out, idxs_ds, subidxs_ds, minlen=minlen, mv=mv
        )
        last_iter = (
            idxs_fix1.size == 0 or idxs_fix1.size == idxs_fix.size or j + 1 == niter
        )
        if opt_rivlen:
            idxs_ds, subidxs_out = ihu_optimize_rivlen(
                idxs_short, valid, streams, idxs_ds, subidxs_out, subidxs_ds,
                subuparea, subshape, shape, cellsize, minlen=minlen,
                minupa=minupa, mv=mv,
            )
        if min_error:
            idxs_ds, subidxs_out = ihu_minimize_error(
                idxs_fix1, valid, streams, idxs_ds, subidxs_out, subidxs_ds,
                subuparea, subshape, shape, cellsize, minlen=minlen,
                minupa=minupa,
                pit_out_of_cell=pit_out_of_cell if last_iter else 0, mv=mv,
            )
        if last_iter:
            break
        idxs_fix = idxs_fix1

    return idxs_ds, subidxs_out, shape


def eam_plus(subidxs_ds, subuparea, subshape, cellsize, mv=_MV):
    """EAM+ = IHU without repair iterations. Parity: upscale.py:1308-1309."""
    return ihu(subidxs_ds, subuparea, subshape, cellsize, niter=0, mv=mv)
