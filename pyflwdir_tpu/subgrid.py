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


def _segment_csr(idxs_out, idxs_nxt, mask=None, max_len=0, include_outlet=False):
    """CSR channel paths per outlet via the native batched walker
    (csrc/network_kernels.cpp); see runtime.channel_paths."""
    from .runtime import channel_paths

    return channel_paths(
        idxs_nxt,
        np.asarray(idxs_out),
        mask=None if mask is None else np.asarray(mask),
        max_len=max_len,
        include_outlet=include_outlet,
    )


def _ols_slope(n, sx, sy, sxy, sxx):
    """Vectorized OLS slope from per-segment moment sums (same closed form
    as :func:`pyflwdir_tpu.arithmetics.lstsq`)."""
    denom = n * sxx - sx * sx
    return np.divide(
        n * sxy - sx * sy, denom, out=np.zeros_like(denom), where=denom != 0
    )


def segment_length(idxs_out, idxs_nxt, distnc, mask=None, nodata=-9999.0, mv=_MV):
    """Channel length per outlet: |distnc| difference between the outlet
    and the walk's end pixel (the next outlet, inclusive).

    Semantics: reference subgrid.py:146-205 (native batched walks).
    """
    idxs_out = np.asarray(idxs_out)
    off, data, _, _ = _segment_csr(idxs_out, idxs_nxt, mask, include_outlet=True)
    rivlen = np.full(idxs_out.size, nodata, dtype=distnc.dtype)
    has = off[1:] > off[:-1]
    last = data[np.maximum(off[1:] - 1, 0)]
    first = data[np.minimum(off[:-1], data.size - 1 if data.size else 0)]
    rivlen[has] = np.abs(distnc[last[has]] - distnc[first[has]])
    return rivlen


def segment_average(idxs_out, idxs_nxt, data, weights, mask=None, nodata=-9999.0, mv=_MV):
    """Weighted mean over each subgrid river segment.

    Semantics: reference subgrid.py:208-272 (native walks + vectorized
    per-segment reductions).
    """
    idxs_out = np.asarray(idxs_out)
    off, pix, _, _ = _segment_csr(idxs_out, idxs_nxt, mask)
    out = np.full(idxs_out.size, nodata, dtype=data.dtype)
    nan = isinstance(nodata, float) and np.isnan(nodata)
    counts = np.diff(off)
    seg = np.repeat(np.arange(idxs_out.size), counts)
    vals = np.asarray(data)[pix].astype(np.float64)
    w = np.asarray(weights)[pix].astype(np.float64)
    good = ~(np.isnan(vals) if nan else (vals == nodata))
    wsum = np.bincount(seg[good], weights=w[good], minlength=idxs_out.size)
    vsum = np.bincount(
        seg[good], weights=(vals * w)[good], minlength=idxs_out.size
    )
    ok = (counts > 0) & (wsum != 0)
    out[ok] = (vsum[ok] / wsum[ok]).astype(data.dtype)
    return out


def segment_median(idxs_out, idxs_nxt, data, weights=None, mask=None, nodata=-9999.0, mv=_MV):
    """Median over each subgrid river segment (nodata/NaN excluded).

    Semantics: reference subgrid.py:276-337 (native walks + one grouped
    sort instead of per-segment nanmedian calls).
    """
    idxs_out = np.asarray(idxs_out)
    off, pix, _, _ = _segment_csr(idxs_out, idxs_nxt, mask)
    out = np.full(idxs_out.size, nodata, dtype=data.dtype)
    counts = np.diff(off)
    seg = np.repeat(np.arange(idxs_out.size), counts)
    vals = np.asarray(data)[pix].astype(np.float64)
    good = ~(np.isnan(vals) | (vals == nodata))
    seg, vals = seg[good], vals[good]
    if seg.size == 0:
        return out
    order = np.lexsort((vals, seg))
    seg, vals = seg[order], vals[order]
    k = np.bincount(seg, minlength=idxs_out.size)
    starts = np.concatenate([[0], np.cumsum(k)[:-1]])
    ok = k > 0
    lo = starts[ok] + (k[ok] - 1) // 2
    hi = starts[ok] + k[ok] // 2
    out[ok] = ((vals[lo] + vals[hi]) / 2.0).astype(data.dtype)
    return out


def segment_indices(idxs_out, idxs_nxt, mask=None, max_len=0, mv=_MV):
    """Linear indices of river segments between outlet pixels.

    Semantics: reference subgrid.py:341-410 (incl. zero-length pit stubs).
    """
    idxs_out = np.asarray(idxs_out)
    off, pix, ends, kinds = _segment_csr(
        idxs_out, idxs_nxt, mask, max_len=max_len, include_outlet=True
    )
    pix = pix.astype(idxs_nxt.dtype)
    segments = []
    for i in range(idxs_out.size):
        row = pix[off[i] : off[i + 1]]
        if row.size > 1:
            segments.append(row)
        if kinds[i] == 2:  # ended at a pit: zero-length stub
            segments.append(np.array([ends[i], ends[i]], dtype=idxs_nxt.dtype))
    return segments


def segment_slope(
    idxs_out, idxs_nxt, elevtn, distnc, mask=None, nodata=-9999.0, lstsq=True, mv=_MV
):
    """Slope over each subgrid river segment (endpoint or least squares).

    Semantics: reference subgrid.py:414-485 (native walks + vectorized
    per-segment moment sums).
    """
    idxs_out = np.asarray(idxs_out)
    off, pix, _, _ = _segment_csr(idxs_out, idxs_nxt, mask)
    out = np.full(idxs_out.size, nodata, dtype=elevtn.dtype)
    counts = np.diff(off)
    out[counts == 1] = 0.0
    multi = counts > 1
    if not multi.any():
        return out
    if lstsq:
        seg = np.repeat(np.arange(idxs_out.size), counts)
        x = np.asarray(distnc)[pix].astype(np.float64)
        y = np.asarray(elevtn)[pix].astype(np.float64)
        m = idxs_out.size
        sx = np.bincount(seg, weights=x, minlength=m)
        sy = np.bincount(seg, weights=y, minlength=m)
        sxy = np.bincount(seg, weights=x * y, minlength=m)
        sxx = np.bincount(seg, weights=x * x, minlength=m)
        slope = _ols_slope(counts.astype(np.float64), sx, sy, sxy, sxx)
        out[multi] = np.abs(slope[multi]).astype(elevtn.dtype)
    else:
        first = pix[off[:-1][multi]]
        last = pix[off[1:][multi] - 1]
        dz = np.asarray(elevtn)[first] - np.asarray(elevtn)[last]
        dx = np.asarray(distnc)[first] - np.asarray(distnc)[last]
        out[multi] = np.abs(dz / dx).astype(elevtn.dtype)
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

    Semantics: reference subgrid.py:488-559 (native fixed-length window
    walks + vectorized OLS).
    """
    from .runtime import fixed_windows

    idxs_out = np.asarray(idxs_out)
    off, pix = fixed_windows(
        np.asarray(idxs_ds),
        np.asarray(idxs_us_main),
        np.asarray(distnc, dtype=np.float64),
        idxs_out,
        float(length),
        mask=None if mask is None else np.asarray(mask),
    )
    out = np.full(idxs_out.size, -9999.0, dtype=np.float32)
    counts = np.diff(off)
    out[counts == 1] = 0.0
    multi = counts > 1
    if not multi.any():
        return out
    x = np.asarray(distnc)[pix].astype(np.float64)
    y = np.asarray(elevtn)[pix].astype(np.float64)
    if lstsq:
        seg = np.repeat(np.arange(idxs_out.size), counts)
        m = idxs_out.size
        sx = np.bincount(seg, weights=x, minlength=m)
        sy = np.bincount(seg, weights=y, minlength=m)
        sxy = np.bincount(seg, weights=x * y, minlength=m)
        sxx = np.bincount(seg, weights=x * x, minlength=m)
        slope = _ols_slope(counts.astype(np.float64), sx, sy, sxy, sxx)
        out[multi] = np.abs(slope[multi]).astype(np.float32)
    else:
        first = off[:-1][multi]
        last = off[1:][multi] - 1
        out[multi] = np.abs((y[first] - y[last]) / (x[first] - x[last])).astype(
            np.float32
        )
    return out
