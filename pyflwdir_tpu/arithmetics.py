"""Moving window statistics and simple regressions over the flow network.

TPU-native equivalents of the reference ``pyflwdir/arithmetics.py``: the
per-cell scalar window loops (arithmetics.py:68-143) become one batched
``(2n+1, size)`` window gather followed by masked reductions along the
window axis — no per-cell Python loops.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .ops import graph
from .ops.walk import window_indices

__all__ = ["moving_average", "moving_median", "upstream_sum", "lstsq"]


def _window_values(data, win, nodata):
    """Gather data at window indices; mask absent entries and nodata."""
    vals = data[jnp.maximum(win, 0)]
    nan = isinstance(nodata, float) and np.isnan(nodata)
    bad = jnp.isnan(vals) if nan else (vals == nodata)
    ok = (win >= 0) & ~bad
    return vals, ok


def moving_average(
    data,
    weights,
    n,
    idxs_ds,
    idxs_us_main,
    strord=None,
    nodata=-9999.0,
):
    """Moving weighted average over the ±n-cell window along the network.

    Parity: reference ``arithmetics.moving_average`` (arithmetics.py:68-103)
    incl. the stream-order restriction and nodata handling (nodata cells
    stay nodata; nodata window entries are excluded from the average).
    """
    win = window_indices(idxs_ds, idxs_us_main, n, strord=strord)
    vals, ok = _window_values(data, win, nodata)
    if weights is None:
        w = jnp.where(ok, 1.0, 0.0)
    else:
        w = jnp.where(ok, weights[jnp.maximum(win, 0)], 0.0)
    wsum = w.sum(axis=0)
    avg = jnp.where(wsum != 0, (w * jnp.where(ok, vals, 0)).sum(axis=0) / jnp.where(wsum != 0, wsum, 1.0), nodata)
    nan = isinstance(nodata, float) and np.isnan(nodata)
    center_bad = jnp.isnan(data) if nan else (data == nodata)
    return jnp.where(center_bad, nodata, avg).astype(data.dtype)


def moving_median(
    data,
    n,
    idxs_ds,
    idxs_us_main,
    strord=None,
    nodata=-9999.0,
):
    """Moving median over the ±n-cell window along the network.

    Parity: reference ``arithmetics.moving_median`` (arithmetics.py:107-143).
    """
    win = window_indices(idxs_ds, idxs_us_main, n, strord=strord)
    vals, ok = _window_values(data, win, nodata)
    vals = jnp.where(ok, vals, jnp.nan).astype(jnp.float64 if data.dtype == jnp.float64 else jnp.float32)
    med = jnp.nanmedian(vals, axis=0)
    nan = isinstance(nodata, float) and np.isnan(nodata)
    center_bad = jnp.isnan(data) if nan else (data == nodata)
    return jnp.where(center_bad, nodata, med).astype(data.dtype)


def upstream_sum(idxs_ds, data, nodata=-9999.0):
    """Sum of direct upstream values per cell.

    Parity: reference ``arithmetics.upstream_sum`` (arithmetics.py:147-169):
    cells whose own or downstream value is nodata are set to nodata; other
    cells receive the sum of their (valid) upstream neighbors' values.
    """
    n = idxs_ds.shape[0]
    ar = jnp.arange(n, dtype=idxs_ds.dtype)
    valid = idxs_ds >= 0
    send = valid & (idxs_ds != ar) & (data != nodata)
    ds = graph.self_loop(idxs_ds)
    send = send & (data[ds] != nodata)
    sentinel = jnp.asarray(n, dtype=idxs_ds.dtype)
    tgt = jnp.where(send, idxs_ds, sentinel)
    out = jnp.zeros(n, dtype=data.dtype).at[tgt].add(
        jnp.where(send, data, 0), mode="drop"
    )
    bad = valid & (idxs_ds != ar) & ((data == nodata) | (data[ds] == nodata))
    return jnp.where(bad, nodata, out)


def lstsq(x, y):
    """Ordinary least squares slope/intercept (closed form).

    Parity: reference ``arithmetics.lstsq`` (arithmetics.py:47-64).
    """
    x = jnp.asarray(x, dtype=jnp.float64)
    y = jnp.asarray(y, dtype=jnp.float64)
    n = x.shape[-1]
    x_sum = x.sum(axis=-1)
    y_sum = y.sum(axis=-1)
    x_sq_sum = (x * x).sum(axis=-1)
    x_y_sum = (x * y).sum(axis=-1)
    slope = (n * x_y_sum - x_sum * y_sum) / (n * x_sq_sum - x_sum**2)
    intercept = (y_sum - slope * x_sum) / n
    return slope, intercept
