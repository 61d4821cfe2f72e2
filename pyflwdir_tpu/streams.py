"""Stream and accumulation maps over the flow network.

TPU-native equivalents of the reference ``pyflwdir/streams.py``: the
sequential ``seq``-ordered sweeps become O(log L) pointer-doubling calls
into :mod:`pyflwdir_tpu.ops`. Functions take/return jnp arrays and are
jit-safe; host-side segment assembly (``streams``) returns numpy lists to
match the reference's list-of-paths contract.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .ops import graph
from .ops.order import classic_order, strahler_order
from .ops.walk import window_indices
from .utils import geodesy
from .utils.affine import IDENTITY

__all__ = [
    "accuflux",
    "accuflux_ds",
    "upstream_area",
    "stream_order",
    "strahler_order",
    "stream_distance",
    "streams",
    "smooth_rivlen",
]


def accuflux(idxs_ds, data, nodata=-9999, tree=None):
    """Accumulated upstream ``data`` (flow accumulation).

    Parity: reference ``streams.accuflux`` (streams.py:16-41) — nodata
    cells stay nodata and block their subtree's flow.
    """
    return graph.accumulate(idxs_ds, data, tree=tree, nodata=nodata)


def accuflux_ds(idxs_ds, data, nodata=-9999):
    """Accumulated downstream ``data``.

    Parity: reference ``streams.accuflux_ds`` (streams.py:45-70).
    """
    return graph.accumulate_downstream(idxs_ds, data, nodata=nodata)


def upstream_area(idxs_ds, area, nodata=-9999.0, tree=None):
    """Upstream area accumulation with nodata outside the valid domain.

    Parity: reference ``streams.upstream_area`` (streams.py:74-129); the
    per-cell (latlon) areas are precomputed by
    :func:`pyflwdir_tpu.utils.geodesy.area_grid` and passed in dense.
    """
    uparea = graph.accumulate(idxs_ds, area, tree=tree)
    valid = idxs_ds >= 0
    return jnp.where(valid, uparea, nodata)


def stream_order(idxs_ds, idxs_us_main, mask=None):
    """Classic/Hack "bottom up" stream order (see ops.order.classic_order)."""
    return classic_order(idxs_ds, idxs_us_main, mask=mask)


def stream_distance(
    idxs_ds,
    shape,
    mask=None,
    real_length=True,
    latlon=False,
    transform=IDENTITY,
    edge_length=None,
):
    """Distance to outlet, or to the next downstream True cell in ``mask``.

    Parity: reference ``streams.stream_distance`` (streams.py:272-315):
    invalid cells -9999; mask cells are distance 0 (they are outlets for
    the cells upstream of them).
    """
    n = idxs_ds.shape[0]
    if real_length:
        if edge_length is None:
            edge_length = jnp.asarray(
                geodesy.distance_grid(
                    np.asarray(idxs_ds), shape, latlon=latlon, transform=transform
                ),
                dtype=jnp.float32,
            )
        w = edge_length.astype(jnp.float32)
        out_dtype = jnp.float32
    else:
        w = jnp.ones(n, dtype=jnp.int32)
        out_dtype = jnp.int32
    dist = graph.path_sum(idxs_ds, w, stop=mask)
    valid = idxs_ds >= 0
    return jnp.where(valid, dist, -9999).astype(out_dtype)


def smooth_rivlen(
    idxs_ds,
    idxs_us_main,
    rivlen,
    min_rivlen,
    max_window=10,
    nodata=-9999.0,
):
    """Smooth river lengths below ``min_rivlen`` over a growing window.

    Parity: reference ``streams.smooth_rivlen`` (streams.py:319-369). The
    reference mutates the output while iterating cells in index order, so
    the result is inherently sequential; the per-cell ±n windows are
    computed in one batched device pass (:func:`window_indices`), then the
    few short cells are smoothed exactly on the host in the reference's
    order.
    """
    n_half = max_window // 2
    win = np.asarray(window_indices(idxs_ds, idxs_us_main, n_half))  # (2n+1, size)
    rivlen_out = np.asarray(rivlen).copy()
    # NB: window writes can also *lower* values, so a cell may become short
    # mid-loop — iterate all cells in index order exactly as the reference.
    for idx0 in range(rivlen_out.size):
        len0 = rivlen_out[idx0]
        if len0 == nodata or len0 >= min_rivlen:
            continue
        len_avg1 = len0
        idxs1 = None
        col = win[:, idx0]
        for i in range(1, n_half):
            idxs0 = col[n_half - i : n_half + i + 1]
            idxs0 = idxs0[idxs0 >= 0]
            idxs0 = idxs0[rivlen_out[idxs0] != nodata]
            if idxs0.size == 0:
                continue
            len_avg0 = float(np.mean(rivlen_out[idxs0]))
            if len_avg0 > len_avg1:
                idxs1 = idxs0
                len_avg1 = len_avg0
            if len_avg1 > min_rivlen:
                break
        if idxs1 is not None and len_avg1 > len0:
            rivlen_out[idxs1] = len_avg1
    return rivlen_out


def streams(idxs_ds_np, rank_np, nup_np, mask=None, max_len=0):
    """Stream segments as lists of linear indices (host assembly).

    Parity: reference ``streams.streams`` (streams.py:133-188): walk from
    each segment head (up- to downstream) to the next confluence or pit,
    split segments longer than ``max_len``, and append zero-length pit
    stubs. Segment heads and the processing order are derived from the
    device-computed rank/upstream counts.
    """
    size = idxs_ds_np.size
    done = np.zeros(size, dtype=bool)
    out = []
    # up- to downstream processing: decreasing rank (stable ties by index)
    valid = rank_np >= 0
    order = np.argsort(-rank_np[valid], kind="stable")
    idxs_sorted = np.where(valid)[0][order]
    for idx0 in idxs_sorted:
        if done[idx0] or (mask is not None and not mask[idx0]):
            continue
        idxs = [idx0]
        while True:
            done[idx0] = True
            idx_ds = idxs_ds_np[idx0]
            pit = idx_ds == idx0
            if not pit:
                idxs.append(idx_ds)
            if nup_np[idx_ds] > 1 or pit:
                length = len(idxs)
                if length > max_len > 0:
                    nseg, k = length, 1
                    if (length / max_len) > 1.5:
                        k = round(length / max_len)
                        nseg = round(length / k)
                    for i in range(k):
                        if i + 1 == k:
                            out.append(
                                np.array(idxs[i * nseg :], dtype=idxs_ds_np.dtype)
                            )
                        else:
                            out.append(
                                np.array(
                                    idxs[i * nseg : nseg * (i + 1) + 1],
                                    dtype=idxs_ds_np.dtype,
                                )
                            )
                else:
                    out.append(np.array(idxs, dtype=idxs_ds_np.dtype))
                if pit:
                    out.append(np.array([idx_ds, idx_ds], dtype=idxs_ds_np.dtype))
                break
            idx0 = idx_ds
    return out
