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

    Semantics of reference ``streams.smooth_rivlen`` (streams.py:319-369):
    the reference mutates the output while iterating cells in index order,
    so the result is inherently sequential; the sweep runs natively
    (csrc/network_kernels.cpp::smooth_rivlen_host).
    """
    from .runtime import smooth_rivlen as _native

    rivlen_np = np.asarray(rivlen)
    out = _native(
        np.asarray(idxs_ds),
        np.asarray(idxs_us_main),
        rivlen_np,
        min_rivlen,
        max_window,
        nodata,
    )
    return out.astype(rivlen_np.dtype)


def streams(idxs_ds_np, rank_np, nup_np, mask=None, max_len=0):
    """Stream segments as lists of linear indices (host assembly).

    Parity: reference ``streams.streams`` (streams.py:133-188): walk from
    each segment head (up- to downstream) to the next confluence or pit,
    split segments longer than ``max_len``, and append zero-length pit
    stubs. Segment heads and the processing order are derived from the
    device-computed rank/upstream counts.
    """
    from .runtime import stream_segments as _native

    # up- to downstream processing: decreasing rank (stable ties by index)
    valid = rank_np >= 0
    order = np.argsort(-rank_np[valid], kind="stable")
    heads = np.where(valid)[0][order]
    seg_off, data = _native(
        idxs_ds_np,
        heads,
        np.asarray(nup_np),
        mask=None if mask is None else np.asarray(mask),
        max_len=max_len,
    )
    data = data.astype(idxs_ds_np.dtype)
    return [data[seg_off[i] : seg_off[i + 1]] for i in range(seg_off.size - 1)]
