"""DEM conditioning: depression filling, profile adjustment, slope, HAND,
floodplains, D4 digging.

TPU-native equivalents of the reference ``pyflwdir/dem.py``:

* :func:`slope` — 3x3 Horn stencil as one vectorized (jit-safe) pass
  (reference dem.py:229-296 is a scalar loop).
* :func:`height_above_nearest_drain` / :func:`floodplains` — the
  sequential down->up sweeps (dem.py:299-379) telescope into pointer
  ``reach`` + path reductions: O(log L) device rounds.
* :func:`fill_depressions` — exact Wang & Liu (2006) priority-flood. The
  heap ordering is inherently sequential, so the exact path runs on the
  host (native C++ via :mod:`pyflwdir_tpu.runtime`, with a python
  fallback); a device iterative fill for large tiled domains lives in
  :mod:`pyflwdir_tpu.ops.fill`.
* :func:`adjust_elevation` / :func:`dig_4connectivity` — per-streamline
  profile repair (Yamazaki et al. 2012 semantics, dem.py:147-225) on host.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .ops import graph
from .utils import geodesy
from .utils.affine import IDENTITY

__all__ = [
    "fill_depressions",
    "adjust_elevation",
    "slope",
    "height_above_nearest_drain",
    "floodplains",
    "dig_4connectivity",
    "get_edge",
]


def get_edge(a, structure=None):
    """Edge cells of the valid mask (vectorized).

    Parity: reference ``gis_utils.get_edge`` (gis_utils.py:118-144): a valid
    cell is an edge cell if it lies on the array border or any structuring-
    element neighbor is invalid.
    """
    a = np.asarray(a, dtype=bool)
    if structure is None:
        structure = np.ones((3, 3), dtype=bool)
    nrow, ncol = a.shape
    pad = np.pad(a, 1, mode="constant", constant_values=False)
    all_nb = np.ones_like(a)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if structure[dr + 1, dc + 1]:
                all_nb &= pad[1 + dr : 1 + dr + nrow, 1 + dc : 1 + dc + ncol]
    edge = a.copy()
    interior = np.zeros_like(a)
    interior[1:-1, 1:-1] = True
    edge[interior & all_nb] = False
    return edge


def fill_depressions(
    elevtn,
    outlets="edge",
    idxs_pit=None,
    nodata=-9999.0,
    max_depth=-1.0,
    elv_max=None,
    connectivity=8,
):
    """Fill local depressions and derive D8 flow directions.

    Exact Wang & Liu (2006) priority-flood with the reference's semantics
    (dem.py:18-143): seeds at valid-edge cells ('edge'), the single lowest
    edge cell ('min') or user pits; heap ordered by (elevation, boundary
    flag, row, col); ``max_depth`` pour-point escape creates interior pits
    and revisits neighbors; the D8 direction of each cell points to the
    cell that popped it.

    Runs the native C++ kernel (csrc/host_kernels.cpp::priority_flood); a
    device iterative fill for large/tiled domains lives in
    :mod:`pyflwdir_tpu.ops.fill`.
    """
    try:
        from .runtime import priority_flood as _native
    except ImportError as e:
        raise RuntimeError(
            "fill_depressions needs the native host kernels "
            "(`make -C csrc`); the device alternative is "
            "pyflwdir_tpu.ops.fill.fill_depressions_dev"
        ) from e
    return _native(
        np.asarray(elevtn),
        outlets=outlets,
        idxs_pit=idxs_pit,
        nodata=nodata,
        max_depth=max_depth,
        elv_max=elv_max,
        connectivity=connectivity,
    )


def slope(elevtn, nodata=-9999.0, latlon=False, transform=IDENTITY):
    """Local gradient from 2nd-order partial derivatives on a 3x3 window.

    Vectorized parity with reference ``dem.slope`` (dem.py:229-296):
    out-of-bounds or nodata window entries take the center value.
    """
    elevtn = jnp.asarray(elevtn)
    nrow, ncol = elevtn.shape
    xres, yres, north = transform[0], transform[4], transform[5]
    nan = isinstance(nodata, float) and np.isnan(nodata)
    bad = jnp.isnan(elevtn) if nan else (elevtn == nodata)

    center = elevtn
    pad = jnp.pad(elevtn, 1, constant_values=nodata)
    pad_bad = jnp.pad(bad, 1, constant_values=True)

    def nb(dr, dc):
        v = pad[1 + dr : 1 + dr + nrow, 1 + dc : 1 + dc + ncol]
        b = pad_bad[1 + dr : 1 + dr + nrow, 1 + dc : 1 + dc + ncol]
        return jnp.where(b, center, v)

    dzdx = (
        (nb(-1, -1) + 2 * nb(0, -1) + nb(1, -1))
        - (nb(-1, 1) + 2 * nb(0, 1) + nb(1, 1))
    ) / (8 * abs(xres))
    dzdy = (
        (nb(-1, -1) + 2 * nb(-1, 0) + nb(-1, 1))
        - (nb(1, -1) + 2 * nb(1, 0) + nb(1, 1))
    ) / (8 * abs(yres))

    if latlon:
        lat_np = north + (np.arange(nrow) + 0.5) * yres
        deg_x = jnp.asarray(geodesy.degree_metres_x(lat_np))[:, None]
        deg_y = jnp.asarray(geodesy.degree_metres_y(lat_np))[:, None]
        slp = jnp.hypot(dzdx / deg_x, dzdy / deg_y)
    else:
        slp = jnp.hypot(dzdx, dzdy)
    return jnp.where(bad, nodata, slp).astype(jnp.float32)


def height_above_nearest_drain(idxs_ds, drain, elevtn):
    """HAND: drop to the nearest downstream drain cell.

    Parity: reference ``dem.height_above_nearest_drain`` (dem.py:299-330):
    the sweep ``hand[i] = hand[ds] + (z[i] - z[ds])`` telescopes to
    ``z[i] - z[t]`` with t the first drain cell (else pit) downstream.
    Drain cells are 0; invalid cells -9999.
    """
    valid = idxs_ds >= 0
    drain = jnp.asarray(drain) != 0
    t = graph.reach(idxs_ds, drain)
    z = jnp.asarray(elevtn)
    if not jnp.issubdtype(z.dtype, jnp.floating):
        z = z.astype(jnp.float32)
    hand = z - z[t]
    hand = jnp.where(drain, 0.0, hand)
    return jnp.where(valid, hand, -9999.0)


def floodplains(idxs_ds, elevtn, uparea, upa_min=1000.0, b=0.3):
    """GFPLAIN floodplain delineation.

    Parity: reference ``dem.floodplains`` (dem.py:333-379): a cell belongs
    to the floodplain of its nearest downstream stream cell t
    (uparea >= upa_min) iff every cell k on the path i..t satisfies
    ``z[k] - z[t] <= uparea[t]**b`` — i.e. the path max of z stays under
    the threshold. Streams are 1, invalid cells -1.
    """
    valid = idxs_ds >= 0
    stream = (jnp.asarray(uparea) >= upa_min) & valid
    t = graph.reach(idxs_ds, stream)
    z = jnp.asarray(elevtn, dtype=jnp.float32)
    pathmax = graph.path_reduce(idxs_ds, z, stop=stream, op="max")
    # half-open path max excludes t but includes i; stream cells get -inf
    thresh = jnp.asarray(uparea, dtype=jnp.float32)[t] ** jnp.float32(b)
    ok = stream[t] & (pathmax - z[t] <= thresh)
    fld = jnp.where(stream, 1, jnp.where(ok, 1, 0)).astype(jnp.int8)
    return jnp.where(valid, fld, -1).astype(jnp.int8)


def _headwater_first_order(rank_np):
    """Valid cells ordered up- to downstream (decreasing rank, stable)."""
    valid = rank_np >= 0
    order = np.argsort(-rank_np[valid], kind="stable")
    return np.where(valid)[0][order]


def adjust_elevation(idxs_ds_np, rank_np, elevtn_np):
    """Hydrologically adjust elevation along streamlines (native host).

    Semantics of reference ``dem.adjust_elevation`` (dem.py:147-167): walk
    from each headwater down to the first already-fixed cell and repair the
    profile with the minimum dig/fill/flatten cost (dem.py:171-225), in
    up- to downstream (decreasing rank) processing order. The sweep and
    the profile repair run in csrc/network_kernels.cpp.
    """
    from .runtime import adjust_elevation as _native

    order = _headwater_first_order(np.asarray(rank_np))
    return _native(np.asarray(idxs_ds_np), order, np.asarray(elevtn_np))


def _adjust_elevation_profile(elevtn):
    """Minimum-modification repair of a single up->downstream profile
    (native; csrc/network_kernels.cpp::repair_profile)."""
    from .runtime import repair_profile as _native

    return _native(np.asarray(elevtn)).astype(np.asarray(elevtn).dtype)


def _local_d4(idx0, idx_ds, ncol):
    """The D4 neighbors bridging a diagonal D8 link ``idx0 -> idx_ds``
    (vertical neighbor first when the step direction has dr == dc), or all
    four D4 neighbors when ``idx_ds == idx0`` (pit). Semantics of reference
    ``dem._local_d4`` (dem.py:383-402)."""
    if idx_ds == idx0:
        return np.asarray([idx0 - 1, idx0 + ncol, idx0 + 1, idx0 - ncol])
    dr = idx_ds // ncol - idx0 // ncol
    dc = idx_ds % ncol - idx0 % ncol
    vert, horz = idx0 + dr * ncol, idx0 + dc
    return np.asarray([vert, horz] if dr == dc else [horz, vert])


def dig_4connectivity(
    idxs_ds_np, rank_np, elv_flat, shape, mask=None, nodata=-9999, dz_min=1e-3
):
    """Ensure a D4-connected channel along every diagonal D8 link (native
    host; csrc/network_kernels.cpp::dig_d4_host).

    Semantics of reference ``dem.dig_4connectivity`` (dem.py:405-439);
    processed up- to downstream by decreasing rank.
    """
    from .runtime import dig_d4 as _native

    order = _headwater_first_order(np.asarray(rank_np))
    return _native(
        np.asarray(idxs_ds_np),
        order,
        shape,
        np.asarray(elv_flat),
        mask=None if mask is None else np.asarray(mask),
        nodata=nodata,
        dz_min=dz_min,
    )
