"""Window gathers and batched walks over the flow network.

The reference implements per-cell scalar walks (``core._trace``,
``core._window``, ``core.path``/``snap`` — core.py:309-480). Here the
whole-grid window ops are vectorized: an n-step window is n dense gathers
(one per step), which XLA fuses into a handful of HBM passes — no scalar
loops. Irregular per-seed outputs (variable-length paths) are assembled on
the host, which matches the reference's list-of-arrays return contract.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..utils import geodesy
from ..utils.affine import IDENTITY
from .graph import self_loop

__all__ = ["window_indices", "trace", "paths", "snap_walk"]


def window_indices(
    idxs_ds: jnp.ndarray,
    idxs_us_main: jnp.ndarray,
    n: int,
    strord: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-cell window of the n nearest up- and downstream cells.

    Returns a ``(2n+1, size)`` int array: row ``n`` is the cell itself,
    rows ``n+1..2n`` the 1..n-step downstream cells and rows ``n-1..0``
    the 1..n-step main-upstream cells; -1 marks absent entries.

    Parallel equivalent of reference ``core._window`` (core.py:370-397)
    including its stream-order restriction: the downstream walk stops when
    entering a cell of higher stream order.
    """
    size = idxs_ds.shape[0]
    ar = jnp.arange(size, dtype=idxs_ds.dtype)
    ds = self_loop(idxs_ds)
    rows = [ar]
    # downstream steps
    cur = ar
    stopped = idxs_ds < 0
    strord0 = strord if strord is not None else None
    for _ in range(n):
        nxt = ds[jnp.maximum(cur, 0)]
        stop_here = (nxt == cur) | (cur < 0)
        if strord is not None:
            stop_here = stop_here | (strord[jnp.maximum(nxt, 0)] > strord0)
        stopped = stopped | stop_here
        cur = jnp.where(stopped, -1, nxt)
        rows.append(cur)
    # upstream steps (main upstream channel)
    up_rows = []
    cur = ar
    stopped = idxs_ds < 0
    for _ in range(n):
        nxt = jnp.where(cur >= 0, idxs_us_main[jnp.maximum(cur, 0)], -1)
        stopped = stopped | (nxt < 0)
        cur = jnp.where(stopped, -1, nxt)
        up_rows.append(cur)
    return jnp.stack(up_rows[::-1] + rows, axis=0)


def _step_tables(nrow, latlon, transform):
    """(2*nrow,) metric step lengths indexed by r0+r1 (degree lengths at
    the mean latitude of the two rows — geodesy.distance semantics,
    including the reference's xres/yres swap on projected grids)."""
    xres, yres, north = transform[0], transform[4], transform[5]
    if latlon:
        lat = north + np.arange(2 * nrow) / 2.0 * yres
        stepy = geodesy.degree_metres_y(lat) * yres
        stepx = geodesy.degree_metres_x(lat) * xres
    else:
        stepy = np.full(2 * nrow, xres, dtype=np.float64)
        stepx = np.full(2 * nrow, yres, dtype=np.float64)
    return np.ascontiguousarray(stepx), np.ascontiguousarray(stepy)


def _trace_batch(
    idxs0, idxs_nxt, ncol, mask, max_length, real_length, latlon, transform
):
    """CSR paths + distances for a batch of seeds (native walk engine;
    semantics of reference ``core._trace``, core.py:309-366: stop at a
    pit / missing next cell, at a True ``mask`` cell — checked at the
    *current* cell including the seed — or when the accumulated distance
    would exceed ``max_length``)."""
    from ..runtime import trace_walks

    idxs_nxt = np.asarray(idxs_nxt)
    if real_length and ncol is not None:
        nrow = -(-idxs_nxt.size // ncol)
        stepx, stepy = _step_tables(nrow, latlon, transform)
    else:
        stepx = stepy = None
    return trace_walks(
        idxs_nxt,
        np.atleast_1d(np.asarray(idxs0)),
        mask=None if mask is None else np.asarray(mask),
        stepx=stepx,
        stepy=stepy,
        ncol=0 if ncol is None else int(ncol),
        max_length=-1.0 if max_length is None else float(max_length),
    )


def trace(
    idx0: int,
    idxs_nxt: np.ndarray,
    ncol=None,
    mask=None,
    max_length=None,
    real_length=False,
    latlon=False,
    transform=IDENTITY,
):
    """Single walk along ``idxs_nxt`` from ``idx0`` (native)."""
    off, data, dists = _trace_batch(
        [idx0], idxs_nxt, ncol, mask, max_length, real_length, latlon, transform
    )
    return data.astype(idxs_nxt.dtype), float(dists[0])


def paths(
    idxs0,
    idxs_nxt,
    ncol=None,
    mask=None,
    max_length=None,
    real_length=False,
    latlon=False,
    transform=IDENTITY,
):
    """Walks from multiple seeds; returns (list of index paths, distances).

    Semantics: reference ``core.path`` (core.py:401-437); one native
    batched CSR walk instead of per-seed python loops.
    """
    off, data, dists = _trace_batch(
        idxs0, idxs_nxt, ncol, mask, max_length, real_length, latlon, transform
    )
    data = data.astype(np.asarray(idxs_nxt).dtype)
    out_paths = [data[off[i] : off[i + 1]] for i in range(off.size - 1)]
    return out_paths, dists


def snap_walk(
    idxs0,
    idxs_nxt,
    ncol=None,
    mask=None,
    max_length=None,
    real_length=False,
    latlon=False,
    transform=IDENTITY,
):
    """Endpoint + distance of walks from multiple seeds.

    Semantics: reference ``core.snap`` (core.py:441-480); native batched.
    """
    idxs0 = np.atleast_1d(np.asarray(idxs0))
    off, data, dists = _trace_batch(
        idxs0, idxs_nxt, ncol, mask, max_length, real_length, latlon, transform
    )
    ends = data[off[1:] - 1].astype(idxs0.dtype)
    return ends, dists.astype(np.float32)
