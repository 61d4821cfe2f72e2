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

import heapq

import numpy as np

import jax.numpy as jnp

from .codecs import d8 as core_d8
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

    Uses the native C++ kernel when available, else the python heapq
    implementation below (identical semantics).
    """
    try:
        from .runtime import priority_flood as _native

        return _native(
            np.asarray(elevtn),
            outlets=outlets,
            idxs_pit=idxs_pit,
            nodata=nodata,
            max_depth=max_depth,
            elv_max=elv_max,
            connectivity=connectivity,
        )
    except ImportError:
        pass
    return _fill_depressions_py(
        np.asarray(elevtn),
        outlets=outlets,
        idxs_pit=idxs_pit,
        nodata=nodata,
        max_depth=max_depth,
        elv_max=elv_max,
        connectivity=connectivity,
    )


def _fill_depressions_py(
    elevtn,
    outlets="edge",
    idxs_pit=None,
    nodata=-9999.0,
    max_depth=-1.0,
    elv_max=None,
    connectivity=8,
):
    """Reference-parity priority-flood (host python)."""
    nrow, ncol = elevtn.shape
    delv = np.zeros_like(elevtn)
    done = np.isnan(elevtn) if np.isnan(nodata) else elevtn == nodata
    d8 = np.where(done, np.uint8(247), np.uint8(0))
    if connectivity not in (4, 8):
        raise ValueError('"connectivity" should either be 4 or 8')
    struct = np.ones((3, 3), dtype=bool)
    if connectivity == 4:
        struct[0, 0] = struct[-1, -1] = struct[0, -1] = struct[-1, 0] = False

    if idxs_pit is None:
        queued = get_edge(~done, structure=struct)
        if elv_max is not None:
            queued = np.logical_and(queued, elevtn <= elv_max)
            if not np.any(queued):
                raise ValueError("No initial outlet cells found.")
    else:
        queued = np.zeros((nrow, ncol), dtype=bool)
        for idx in np.atleast_1d(idxs_pit):
            queued.flat[idx] = True

    q = []
    for r, c in zip(*np.where(queued)):
        heapq.heappush(
            q, (np.float32(elevtn[r, c]), np.uint8(1), np.uint32(r), np.uint32(c))
        )
    if outlets == "min":
        q = [heapq.heappop(q)]
        queued[:, :] = False
        queued[int(q[0][-2]), int(q[0][-1])] = True

    drs, dcs = np.where(struct)
    drs, dcs = drs - 1, dcs - 1
    while q:
        z0, _, r0, c0 = heapq.heappop(q)
        for dr, dc in zip(drs, dcs):
            r = int(r0) + dr
            c = int(c0) + dc
            if r < 0 or r == nrow or c < 0 or c == ncol or done[r, c]:
                continue
            z1 = elevtn[r, c]
            dz = z0 - z1  # local depression if dz > 0
            if max_depth >= 0:
                if dz >= max_depth:  # keep as pit, revisit neighbors
                    heapq.heappush(
                        q, (np.float32(z1), np.uint8(0), np.uint32(r), np.uint32(c))
                    )
                    queued[r, c] = True
                    for dr2, dc2 in zip(drs, dcs):
                        done[r + dr2, c + dc2] = False
                    continue
                elif delv[r, c] > 0:  # reset if previously filled & revisited
                    queued[r, c] = False
                    delv[r, c] = 0
            if dz > 0:
                delv[r, c] = dz
                z1 += dz
            if not queued[r, c]:
                heapq.heappush(
                    q, (np.float32(z1), np.uint8(0), np.uint32(r), np.uint32(c))
                )
                queued[r, c] = True
            done[r, c] = True
            d8[r, c] = core_d8._us[dr + 1, dc + 1]
    return elevtn + delv, d8


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


def adjust_elevation(idxs_ds_np, rank_np, elevtn_np):
    """Hydrologically adjust elevation along streamlines (host).

    Parity: reference ``dem.adjust_elevation`` (dem.py:147-167): walk from
    each headwater down to the first already-fixed cell and repair the
    profile with minimum dig/fill/dig+fill cost (dem.py:171-225).
    Processing order is up- to downstream by decreasing rank, matching the
    reference's ``seq[::-1]``.
    """
    elevtn_out = np.asarray(elevtn_np, dtype=np.float64).copy()
    mask = np.zeros(idxs_ds_np.size, dtype=bool)
    valid = rank_np >= 0
    order = np.argsort(-rank_np[valid], kind="stable")
    for idx0 in np.where(valid)[0][order]:
        if not mask[idx0]:
            # trace down to first fixed cell (inclusive)
            idxs = [idx0]
            j = idx0
            while not mask[j]:
                ds = idxs_ds_np[j]
                if ds == j or ds < 0:
                    break
                j = ds
                idxs.append(j)
            idxs = np.array(idxs, dtype=np.int64)
            elevtn_out[idxs] = _adjust_elevation_profile(elevtn_out[idxs])
            mask[idxs] = True
    return elevtn_out


def _adjust_elevation_profile(elevtn):
    """Minimum-modification repair of a single up->downstream profile.

    Parity: reference ``dem._adjust_elevation`` (dem.py:171-225): at each
    pit (local minimum followed by a rise), choose the cheapest of digging
    (lower to the local min after it), filling (raise to the local max
    before it) or an intermediate dig+fill level.
    """
    n = elevtn.size
    elevtn = np.maximum(elevtn, elevtn[-1])
    imax, imin = -1, -1
    zmax = zmin = elevtn[0]
    zi_min1 = zi_min2 = zmin
    for i in range(n):
        zi = elevtn[i]
        if zi >= zmax:
            zmax = zi
            imax = i
        if (zi > zi_min1 and zi_min2 >= zi_min1) or (imin >= 0 and i + 1 == n):
            if imin >= 0:
                # option 1: dig
                idxs = np.arange(imin, i, dtype=np.int64)
                zmod = np.minimum(zmin, elevtn[idxs])
                cost = np.sum(np.abs(elevtn[idxs] - zmod))
                # option 2: fill
                idxs2 = np.arange(0, imax, dtype=np.int64)
                zmod2 = np.maximum(zmax, elevtn[idxs2])
                cost2 = np.sum(np.abs(elevtn[idxs2] - zmod2))
                if cost2 < cost:
                    cost, idxs, zmod = cost2, idxs2, zmod2
                # option 3: dig & fill at intermediate levels
                i0, i1 = 0, imax
                zs = np.unique(elevtn[imin + 1 : i])[::-1]
                for z in zs[1:]:
                    j0 = i0
                    for j0 in range(i0, imin + 1):
                        if elevtn[j0] <= z:
                            break
                    j1 = i1
                    for j1 in range(i1, i + 1):
                        if elevtn[j1] <= z:
                            break
                    i0, i1 = j0, j1
                    idxs2 = np.arange(j0, max(imax + 1, j1), dtype=np.int64)
                    zmod2 = np.full(idxs2.size, z, dtype=elevtn.dtype)
                    cost2 = np.sum(np.abs(elevtn[idxs2] - zmod2))
                    if cost2 < cost:
                        cost, idxs, zmod = cost2, idxs2, zmod2
                elevtn[idxs] = zmod
            imax = i
            zmax = elevtn[imax]
            imin = max(0, i - 1)
            zmin = elevtn[imin]
        if zi_min2 != zi_min1:
            zi_min2 = zi_min1
        zi_min1 = zi
    return elevtn


def _local_d4(idx0, idx_ds, ncol):
    """Indices of the D4 neighbors adjacent to a diagonal D8 link.

    Parity: reference ``dem._local_d4`` (dem.py:383-402).
    """
    idxs_d4 = [idx0 - ncol, idx0 - 1, idx0 + ncol, idx0 + 1, idx0 - ncol]
    if idx_ds != idx0:
        idxs_diag = [idx0 - ncol - 1, idx0 + ncol - 1, idx0 + ncol + 1, idx0 - ncol + 1]
        di = idxs_diag.index(idx_ds)
        return np.asarray(idxs_d4[di : di + 2])
    return np.asarray(idxs_d4[1:])


def dig_4connectivity(
    idxs_ds_np, rank_np, elv_flat, shape, mask=None, nodata=-9999, dz_min=1e-3
):
    """Ensure a D4-connected channel along every diagonal D8 link (host).

    Parity: reference ``dem.dig_4connectivity`` (dem.py:405-439); processed
    up- to downstream by decreasing rank.
    """
    elv_out = np.asarray(elv_flat, dtype=np.float64).copy()
    nrow, ncol = shape
    valid = rank_np >= 0
    order = np.argsort(-rank_np[valid], kind="stable")
    for idx0 in np.where(valid)[0][order]:
        if mask is not None and not mask[idx0]:
            continue
        idx_ds = idxs_ds_np[idx0]
        dd = abs(int(idx0) - int(idx_ds))
        if dd > 1 and dd != ncol:  # diagonal link
            idxs_d4 = _local_d4(int(idx0), int(idx_ds), ncol)
            z0 = elv_out[idx0]
            zs = elv_out[idxs_d4]
            ok = zs != nodata
            if not np.any(ok):
                continue
            idx_d4_min = idxs_d4[ok][np.argmin(zs[ok] - z0)]
            elv_out[idx_d4_min] = min(elv_out[idx_d4_min] - dz_min, z0)
        if idxs_ds_np[idx_ds] == idx_ds:  # pit: keep D4 link out of the pit
            r, c = int(idx_ds) // ncol, int(idx_ds) % ncol
            if r == 0 or r == nrow - 1 or c == 0 or c == ncol - 1:
                continue
            idxs_d4 = _local_d4(int(idx_ds), int(idx_ds), ncol)
            if np.any(elv_out[idxs_d4] == nodata):
                continue
            idxs_d4 = np.asarray([i for i in idxs_d4 if i != idx0])
            elv_out[idxs_d4] = np.minimum(elv_out[idx_ds], elv_out[idxs_d4])
    return elv_out
