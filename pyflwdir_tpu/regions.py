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


def region_slices(regions):
    """Bounding slices per unique region label. Parity: regions.py:57-82."""
    if regions.ndim != 2:
        raise ValueError('The "regions" array should be two dimensional')
    lbs = np.unique(regions[regions > 0])
    if lbs.size == 0:
        raise ValueError("No regions found in data")
    slices = ndimage.find_objects(regions)
    slices = [s for s in slices if s is not None]
    return lbs, slices


def region_bounds(regions, transform=IDENTITY):
    """Bounding boxes per unique region label. Parity: regions.py:85-125."""
    lbs, slices = region_slices(regions)
    xres, yres = transform[0], transform[4]
    lons, lats = geodesy.affine_to_coords(transform, regions.shape)
    iy = np.array([0, -1])
    ix = iy.copy()
    if yres < 0:
        iy = iy[::-1]
    if xres < 0:
        ix = ix[::-1]
    dx = np.abs(xres) / 2
    dy = np.abs(yres) / 2
    bboxs = []
    for yslice, xslice in slices:
        xmin, xmax = lons[xslice][ix]
        ymin, ymax = lats[yslice][iy]
        bboxs.append([xmin - dx, ymin - dy, xmax + dx, ymax + dy])
    bboxs = np.asarray(bboxs)
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

    if idxs is not None and labels is None:
        labels = regions.flat[idxs]
    elif labels is not None and idxs is None:
        labels = np.atleast_1d(labels)
    else:
        raise ValueError('Either "labels" or "idxs" must be provided.')
    if np.unique(labels[labels > 0]).size != labels.size:
        raise ValueError("Found non-unique or zero-value labels.")
    if regions.ndim != 2:
        raise ValueError('The "regions" array should be two dimensional')
    regions0 = regions.copy()
    regions0[np.isin(regions, labels)] = 0
    assert np.any(regions0 != 0)
    out, _, dst = spread2d(
        regions0, nodata=0, transform=transform, latlon=latlon, **kwargs
    )
    if idxs is None:
        r, c = zip(*ndimage.minimum_position(dst, regions, labels))
        idxs = np.asarray(r) * regions.shape[1] + np.asarray(c)
    labels1 = out.flat[idxs]
    lut = {old: new for old, new in zip(labels, labels1)}
    return np.vectorize(lambda x: lut.get(x, x))(regions)
