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
    """Single walk along ``idxs_nxt`` from ``idx0`` (host, sequential).

    Semantics parity with reference ``core._trace`` (core.py:309-366):
    stops at a pit / missing next cell, at a True ``mask`` cell
    (checked at the *start* cell first), or when the accumulated distance
    would exceed ``max_length``.
    """
    idxs = [idx0]
    dist = 0.0
    d = 1.0
    while mask is None or not mask[idx0]:
        idx1 = idxs_nxt[idx0]
        if idx1 == idx0 or idx1 < 0:
            break
        if real_length and ncol is not None:
            d = float(
                geodesy.distance(
                    np.asarray(idx0), np.asarray(idx1), ncol, latlon, transform
                )
            )
        if max_length is not None and dist + d > max_length:
            break
        dist += d
        idx0 = int(idx1)
        idxs.append(idx0)
    return np.array(idxs, dtype=idxs_nxt.dtype), dist


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

    Parity: reference ``core.path`` (core.py:401-437).
    """
    idxs0 = np.atleast_1d(np.asarray(idxs0))
    out_paths = []
    dists = np.zeros(idxs0.size, dtype=np.float64)
    for i, idx in enumerate(idxs0):
        p, d = trace(
            int(idx),
            idxs_nxt,
            ncol=ncol,
            mask=mask,
            max_length=max_length,
            real_length=real_length,
            latlon=latlon,
            transform=transform,
        )
        out_paths.append(p)
        dists[i] = d
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

    Parity: reference ``core.snap`` (core.py:441-480).
    """
    idxs0 = np.atleast_1d(np.asarray(idxs0))
    idxs = np.full(idxs0.size, -1, dtype=idxs0.dtype)
    dists = np.zeros(idxs0.size, dtype=np.float32)
    for i, idx in enumerate(idxs0):
        p, d = trace(
            int(idx),
            idxs_nxt,
            ncol=ncol,
            mask=mask,
            max_length=max_length,
            real_length=real_length,
            latlon=latlon,
            transform=transform,
        )
        idxs[i] = p[-1]
        dists[i] = d
    return idxs, dists
