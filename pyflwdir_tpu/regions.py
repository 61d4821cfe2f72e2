"""Region (labeled-area) measurements.

Equivalents of the reference ``pyflwdir/regions.py``: thin wrappers over
scipy.ndimage for host-side measurements, plus a vectorized
``region_outlets`` that replaces the sequential sweep (regions.py:129-163)
with a device reach/scatter pass.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage

from .utils import geodesy
from .utils.affine import IDENTITY

__all__ = [
    "region_bounds",
    "region_slices",
    "region_sum",
    "region_area",
    "region_outlets",
    "region_dissolve",
]


def region_sum(data, regions):
    """Sum of ``data`` per unique region label. Parity: regions.py:16-32."""
    lbs = np.unique(regions[regions > 0])
    return lbs, ndimage.sum(data, regions, index=lbs)


def region_area(regions, transform=IDENTITY, latlon=False):
    """Area [m2] per unique region label. Parity: regions.py:35-54."""
    area = geodesy.area_grid(transform=transform, shape=regions.shape, latlon=latlon)
    return region_sum(area, regions)


def _label_extents(regions):
    """Per-label (row, col) min/max via one grouped scatter reduction.

    Returns (lbs, rmin, rmax, cmin, cmax) for the sorted unique positive
    labels — the vectorized core shared by :func:`region_slices` and
    :func:`region_bounds` (no per-region python loop).
    """
    regions = np.asarray(regions)
    if regions.ndim != 2:
        raise ValueError('The "regions" array should be two dimensional')
    nrow, ncol = regions.shape
    flat = regions.ravel()
    cells = np.nonzero(flat > 0)[0]
    if cells.size == 0:
        raise ValueError("No regions found in data")
    lbs, inv = np.unique(flat[cells], return_inverse=True)
    rows, cols = cells // ncol, cells % ncol
    k = lbs.size
    rmin = np.full(k, nrow, dtype=np.int64)
    cmin = np.full(k, ncol, dtype=np.int64)
    rmax = np.full(k, -1, dtype=np.int64)
    cmax = np.full(k, -1, dtype=np.int64)
    np.minimum.at(rmin, inv, rows)
    np.maximum.at(rmax, inv, rows)
    np.minimum.at(cmin, inv, cols)
    np.maximum.at(cmax, inv, cols)
    return lbs, rmin, rmax, cmin, cmax


def region_slices(regions):
    """Bounding slices per unique region label. Parity: regions.py:57-82."""
    lbs, rmin, rmax, cmin, cmax = _label_extents(regions)
    slices = [
        (slice(int(r0), int(r1) + 1), slice(int(c0), int(c1) + 1))
        for r0, r1, c0, c1 in zip(rmin, rmax, cmin, cmax)
    ]
    return lbs, slices


def region_bounds(regions, transform=IDENTITY):
    """Bounding boxes per unique region label. Parity: regions.py:85-125.

    Cell-edge boxes follow directly from the per-label index extents and
    the affine: the west/east edges of column range [c0, c1] are the two
    x values ``xoff + c0 * xres`` and ``xoff + (c1 + 1) * xres`` in either
    order (negative resolutions just swap them), likewise for rows.
    """
    lbs, rmin, rmax, cmin, cmax = _label_extents(regions)
    xres, yres = transform[0], transform[4]
    xoff, yoff = transform[2], transform[5]
    xa, xb = xoff + cmin * xres, xoff + (cmax + 1) * xres
    ya, yb = yoff + rmin * yres, yoff + (rmax + 1) * yres
    bboxs = np.stack(
        [
            np.minimum(xa, xb),
            np.minimum(ya, yb),
            np.maximum(xa, xb),
            np.maximum(ya, yb),
        ],
        axis=1,
    )
    total_bbox = np.hstack([bboxs[:, :2].min(axis=0), bboxs[:, 2:].max(axis=0)])
    return lbs, bboxs, total_bbox


def region_outlets(regions, idxs_ds, rank_np=None):
    """Outlet cell (most downstream in-region cell) per region label.

    Parity: reference ``regions.region_outlets`` (regions.py:129-163): an
    outlet is an in-region cell whose downstream cell is a pit or lies in
    a different region. Vectorized; results sorted by label.
    """
    regions_flat = np.asarray(regions).ravel()
    ids = np.asarray(idxs_ds)
    n = ids.size
    ar = np.arange(n, dtype=ids.dtype)
    ds = np.where(ids < 0, ar, ids)
    valid = ids >= 0
    lb0 = regions_flat
    is_out = valid & (lb0 > 0) & ((ds == ar) | (regions_flat[ds] != lb0))
    idxs_out = np.where(is_out)[0]
    lbs = regions_flat[idxs_out]
    sort = np.argsort(lbs, kind="stable")
    return lbs[sort], idxs_out[sort].astype(ids.dtype)


def region_dissolve(
    regions,
    labels=None,
    idxs=None,
    transform=IDENTITY,
    latlon=False,
    **kwargs,
):
    """Dissolve regions into their nearest neighboring regions.

    Parity: reference ``regions.region_dissolve`` (regions.py:166-227),
    built on :func:`pyflwdir_tpu.gridtools.spread2d`.
    """
    from .gridtools import spread2d

    regions = np.asarray(regions)
    if regions.ndim != 2:
        raise ValueError('The "regions" array should be two dimensional')
    if (labels is None) == (idxs is None):
        raise ValueError('Either "labels" or "idxs" must be provided.')
    if labels is None:
        labels = regions.flat[np.atleast_1d(idxs)]
    else:
        labels = np.atleast_1d(labels)
    if np.unique(labels[labels > 0]).size != labels.size:
        raise ValueError("Found non-unique or zero-value labels.")

    # spread the surviving regions into the dissolved area
    keep = np.where(np.isin(regions, labels), 0, regions)
    if not np.any(keep != 0):
        raise ValueError("No regions left to dissolve into")
    out, _, dst = spread2d(
        keep, nodata=0, transform=transform, latlon=latlon, **kwargs
    )

    if idxs is None:
        # representative cell per dissolved label: its minimum-distance
        # cell (row-major first on ties), found by one grouped sort
        sel = np.isin(regions.ravel(), labels)
        cells = np.nonzero(sel)[0]
        order = np.lexsort((cells, dst.ravel()[cells], regions.ravel()[cells]))
        li = regions.ravel()[cells][order]
        first = np.searchsorted(li, labels)
        idxs = cells[order][first]
    idxs = np.atleast_1d(idxs)

    # vectorized relabel: binary search into the sorted dissolved labels
    new_of = out.flat[idxs]
    order = np.argsort(labels)
    src, dst_lb = np.asarray(labels)[order], np.asarray(new_of)[order]
    flat = regions.ravel()
    p = np.clip(np.searchsorted(src, flat), 0, src.size - 1)
    hit = src[p] == flat
    return np.where(hit, dst_lb[p], flat).reshape(regions.shape)
