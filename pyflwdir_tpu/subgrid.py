"""Unit catchments and subgrid river statistics.

TPU-native equivalents of the reference ``pyflwdir/subgrid.py``: the unit
catchment map/area/volume reductions (subgrid.py:52-142) become pointer
``reach`` + scatter-adds (O(log L) device rounds); the per-outlet segment
walks (length/average/median/slope, subgrid.py:146-559) run as lockstep
vectorized walks over the (small) outlet set.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from . import upscale as upscale_mod
from .arithmetics import lstsq as _lstsq
from .ops import graph

__all__ = [
    "outlets",
    "ucat_area",
    "ucat_volume",
    "segment_length",
    "segment_average",
    "segment_median",
    "segment_indices",
    "segment_slope",
    "fixed_length_slope",
]

_MV = -1


def outlets(idxs_ds, uparea, cellsize, shape, method="eam_plus", mv=_MV):
    """Unit-catchment outlet pixel indices.

    Parity: reference subgrid.py:13-48.
    """
    nrow, ncol = shape
    shape_out = (int(np.ceil(nrow / cellsize)), int(np.ceil(ncol / cellsize)))
    args = (idxs_ds, uparea, shape, shape_out, cellsize)
    if method.lower() == "dmm":
        idxs_out = upscale_mod.dmm_exitcell(*args, mv=mv)
    elif method.lower() == "eam_plus":
        idxs_rep = upscale_mod.eam_repcell(*args, mv=mv)
        idxs_out = upscale_mod.ihu_outlets(idxs_rep, *args, mv=mv)
    else:
        raise ValueError(f'Method {method} unknown, choose from ["eam_plus", "dmm"]')
    return idxs_out, shape_out


def ucat_area(idxs_out, idxs_ds, area, mv=_MV):
    """Unit catchment map (highres) and contributing area per outlet.

    Parity: reference subgrid.py:52-93. The fill-upstream sweep becomes a
    ``reach`` to the first outlet at-or-downstream; the per-catchment area
    is one scatter-add over the labels.
    """
    idxs_out = np.asarray(idxs_out)
    n = idxs_ds.shape[0]
    valid_out = idxs_out != mv
    out_cells = idxs_out[valid_out]
    # label map: outlet cells get 1-based outlet rank
    label = jnp.zeros(n, dtype=jnp.int32)
    label = label.at[jnp.asarray(out_cells)].set(
        jnp.asarray(np.where(valid_out)[0].astype(np.int32) + 1)
    )
    stop = jnp.zeros(n, dtype=bool).at[jnp.asarray(out_cells)].set(True)
    t = graph.reach(idxs_ds, stop)
    ucat = jnp.where((idxs_ds >= 0) & stop[t], label[t], 0)
    # per-catchment area: scatter-add of cell areas over labels
    sums = jnp.zeros(idxs_out.size + 1, dtype=area.dtype).at[ucat].add(
        jnp.where(ucat > 0, area, 0), mode="drop"
    )
    ucat_are = jnp.where(
        jnp.asarray(valid_out), sums[1:], jnp.asarray(-9999, dtype=area.dtype)
    )
    return ucat.astype(idxs_ds.dtype), ucat_are


def ucat_volume(idxs_out, idxs_ds, hand, area, depths=None, mv=_MV):
    """Unit catchment map and flood-volume profile per outlet.

    Parity: reference subgrid.py:97-142: volume per depth d is the
    catchment sum of ``area * max(0, d - hand)``.
    """
    if depths is None:
        depths = np.arange(0.5, 3.0, 0.5, dtype=np.float32)
    depths = np.asarray(depths)
    idxs_out = np.asarray(idxs_out)
    n = idxs_ds.shape[0]
    valid_out = idxs_out != mv
    out_cells = idxs_out[valid_out]
    label = jnp.zeros(n, dtype=jnp.int32)
    label = label.at[jnp.asarray(out_cells)].set(
        jnp.asarray(np.where(valid_out)[0].astype(np.int32) + 1)
    )
    stop = jnp.zeros(n, dtype=bool).at[jnp.asarray(out_cells)].set(True)
    t = graph.reach(idxs_ds, stop)
    ucat = jnp.where((idxs_ds >= 0) & stop[t], label[t], 0)
    vols = []
    hand = jnp.asarray(hand)
    area = jnp.asarray(area)
    for d in depths:
        dv = area * jnp.maximum(0.0, d - hand)
        s = jnp.zeros(idxs_out.size + 1, dtype=jnp.float32).at[ucat].add(
            jnp.where(ucat > 0, dv, 0).astype(jnp.float32), mode="drop"
        )
        vols.append(jnp.where(jnp.asarray(valid_out), s[1:], -9999.0))
    fldpln_vol = jnp.stack(vols, axis=0).astype(depths.dtype)
    return ucat.astype(idxs_ds.dtype), fldpln_vol


def segment_length(idxs_out, idxs_nxt, distnc, mask=None, nodata=-9999.0, mv=_MV):
    """Channel length per outlet: |distnc| difference between the outlet
    and the walk's end pixel (the next outlet, inclusive).

    Parity: reference subgrid.py:146-205 (lockstep vectorized).
    """
    idxs_out = np.asarray(idxs_out)
    is_outlet = np.zeros(idxs_nxt.size, dtype=bool)
    sel = idxs_out[idxs_out != mv]
    is_outlet[sel] = True
    rivlen = np.full(idxs_out.size, nodata, dtype=distnc.dtype)
    i0 = np.where(idxs_out != mv)[0]
    if i0.size == 0:
        return rivlen
    start = idxs_out[i0].astype(np.int64)
    cur = start.copy()
    active = np.ones(i0.size, dtype=bool)
    for _ in range(idxs_nxt.size):
        if not active.any():
            break
        ai = np.where(active)[0]
        nxt = idxs_nxt[cur[ai]].astype(np.int64)
        invalid = (nxt == mv) | (nxt == cur[ai])
        if mask is not None:
            invalid |= ~(mask[np.maximum(nxt, 0)] != 0)
        step = ~invalid
        cur[ai[step]] = nxt[step]
        # stop after stepping onto an outlet (inclusive), or on invalid
        done = invalid | is_outlet[np.maximum(nxt, 0)] & step
        active[ai[done]] = False
    rivlen[i0] = np.abs(distnc[cur] - distnc[start])
    return rivlen


def _walk_collect(idx0, idxs_nxt, is_outlet, mask=None, mv=_MV, max_len=0):
    """Host walk from idx0 collecting pixels until the next outlet
    (exclusive), pit, missing or masked-out pixel (reference
    subgrid.py:254-267 semantics)."""
    idxs = [idx0]
    idx = idx0
    while True:
        idx1 = idxs_nxt[idx]
        if (
            idx1 == mv
            or idx1 == idx
            or is_outlet[idx1]
            or (mask is not None and not mask[idx1])
            or (max_len > 0 and len(idxs) == max_len)
        ):
            break
        idxs.append(int(idx1))
        idx = idx1
    return idxs


def segment_average(idxs_out, idxs_nxt, data, weights, mask=None, nodata=-9999.0, mv=_MV):
    """Weighted mean over each subgrid river segment.

    Parity: reference subgrid.py:208-272.
    """
    idxs_out = np.asarray(idxs_out)
    is_outlet = np.zeros(idxs_nxt.size, dtype=bool)
    is_outlet[idxs_out[idxs_out != mv]] = True
    out = np.full(idxs_out.size, nodata, dtype=data.dtype)
    nan = isinstance(nodata, float) and np.isnan(nodata)
    for i in range(idxs_out.size):
        idx0 = idxs_out[i]
        if idx0 == mv:
            continue
        idxs = np.asarray(
            _walk_collect(int(idx0), idxs_nxt, is_outlet, mask=mask, mv=mv)
        )
        vals = data[idxs]
        w = weights[idxs]
        bad = np.isnan(vals) if nan else (vals == nodata)
        wsum = w[~bad].sum()
        if wsum != 0:
            out[i] = (vals[~bad] * w[~bad]).sum() / wsum
    return out


def segment_median(idxs_out, idxs_nxt, data, weights=None, mask=None, nodata=-9999.0, mv=_MV):
    """Median over each subgrid river segment.

    Parity: reference subgrid.py:276-337.
    """
    idxs_out = np.asarray(idxs_out)
    is_outlet = np.zeros(idxs_nxt.size, dtype=bool)
    is_outlet[idxs_out[idxs_out != mv]] = True
    out = np.full(idxs_out.size, nodata, dtype=data.dtype)
    for i in range(idxs_out.size):
        idx0 = idxs_out[i]
        if idx0 == mv:
            continue
        idxs = np.asarray(
            _walk_collect(int(idx0), idxs_nxt, is_outlet, mask=mask, mv=mv)
        )
        seg = data[idxs]
        med = np.nanmedian(np.where(seg == nodata, np.nan, seg))
        if not np.isnan(med):
            out[i] = med
    return out


def segment_indices(idxs_out, idxs_nxt, mask=None, max_len=0, mv=_MV):
    """Linear indices of river segments between outlet pixels.

    Parity: reference subgrid.py:341-410 (incl. zero-length pit stubs).
    """
    idxs_out = np.asarray(idxs_out)
    is_outlet = np.zeros(idxs_nxt.size, dtype=bool)
    is_outlet[idxs_out[idxs_out != mv]] = True
    segments = []
    for i in range(idxs_out.size):
        idx0 = idxs_out[i]
        if idx0 == mv:
            continue
        idxs = [int(idx0)]
        idx = int(idx0)
        pit = False
        while True:
            idx1 = idxs_nxt[idx]
            pit = idx1 == idx
            if (
                idx1 == mv
                or pit
                or (mask is not None and not mask[idx1])
                or (max_len > 0 and len(idxs) == max_len)
            ):
                break
            idxs.append(int(idx1))
            if is_outlet[idx1]:  # include next outlet
                break
            idx = idx1
        if len(idxs) > 1:
            segments.append(np.array(idxs, dtype=idxs_nxt.dtype))
        if pit:
            segments.append(np.array([idx1, idx1], dtype=idxs_nxt.dtype))
    return segments


def segment_slope(
    idxs_out, idxs_nxt, elevtn, distnc, mask=None, nodata=-9999.0, lstsq=True, mv=_MV
):
    """Slope over each subgrid river segment (mean or least squares).

    Parity: reference subgrid.py:414-485.
    """
    idxs_out = np.asarray(idxs_out)
    is_outlet = np.zeros(idxs_nxt.size, dtype=bool)
    is_outlet[idxs_out[idxs_out != mv]] = True
    out = np.full(idxs_out.size, nodata, dtype=elevtn.dtype)
    for i in range(idxs_out.size):
        idx0 = idxs_out[i]
        if idx0 == mv:
            continue
        idxs = np.asarray(
            _walk_collect(int(idx0), idxs_nxt, is_outlet, mask=mask, mv=mv)
        )
        if idxs.size > 1:
            if lstsq:
                slope = float(np.asarray(_lstsq(distnc[idxs], elevtn[idxs])[0]))
                out[i] = abs(slope)
            else:
                dz = elevtn[idxs[0]] - elevtn[idxs[-1]]
                dx = distnc[idxs[0]] - distnc[idxs[-1]]
                out[i] = abs(dz / dx)
        else:
            out[i] = 0.0
    return out


def fixed_length_slope(
    idxs_out,
    idxs_ds,
    idxs_us_main,
    elevtn,
    distnc,
    length=1e3,
    mask=None,
    lstsq=True,
    mv=_MV,
):
    """Channel slope over a fixed length centred at each outlet pixel.

    Parity: reference subgrid.py:488-559.
    """
    idxs_out = np.asarray(idxs_out)
    out = np.full(idxs_out.size, -9999.0, dtype=np.float32)
    for i in range(idxs_out.size):
        idx0 = idxs_out[i]
        if idx0 == mv:
            continue
        idx0 = int(idx0)
        x0 = distnc[idx0] - length / 2
        x1 = distnc[idx0] + length / 2
        while distnc[idx0] > x0:
            idx_ds = idxs_ds[idx0]
            if idx_ds == idx0 or (mask is not None and not mask[idx0]):
                break
            idx0 = int(idx_ds)
        xs = [distnc[idx0]]
        zs = [elevtn[idx0]]
        while distnc[idx0] < x1:
            idx_us = idxs_us_main[idx0]
            if idx_us == mv or (mask is not None and not mask[idx_us]):
                break
            xs.append(distnc[idx_us])
            zs.append(elevtn[idx_us])
            idx0 = int(idx_us)
        if len(xs) >= 2:
            if lstsq:
                out[i] = abs(float(np.asarray(_lstsq(np.array(xs), np.array(zs))[0])))
            else:
                out[i] = abs((zs[0] - zs[-1]) / (xs[0] - xs[-1]))
        else:
            out[i] = 0.0
    return out
