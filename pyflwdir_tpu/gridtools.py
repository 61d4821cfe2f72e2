"""Grid tools: nearest-observation spreading and GeoJSON feature assembly.

Host-side equivalents of the reference ``gis_utils.spread2d`` (Dijkstra
with friction, gis_utils.py:32-114) and ``gis_utils.features``
(gis_utils.py:490-549). ``spread2d`` uses the native C++ kernel when
built (see csrc/), with a python heapq fallback of identical semantics.
"""

from __future__ import annotations

import heapq

import numpy as np

from .utils import geodesy
from .utils.affine import IDENTITY

__all__ = ["spread2d", "features", "get_edge"]


def get_edge(a, structure=None):
    """Morphological edge of a boolean mask (reference gis_utils.py:118-135).

    Re-exported from :mod:`pyflwdir_tpu.dem`, where the jittable 3x3
    stencil lives.
    """
    from .dem import get_edge as _get_edge

    return _get_edge(a, structure=structure)


def spread2d(obs, msk=None, nodata=0, frc=None, latlon=False, transform=IDENTITY):
    """Fill array with nearest observations; returns (out, src, dst).

    Parity: reference ``gis_utils.spread2d`` (gis_utils.py:32-114):
    Dijkstra spread through valid mask cells with optional friction;
    diagonal steps cost the hypotenuse; latlon converts degrees to metres
    per row.
    """
    try:
        from .runtime import spread2d as _native

        return _native(
            np.asarray(obs), msk=msk, nodata=nodata, frc=frc, latlon=latlon,
            transform=transform,
        )
    except ImportError:
        pass
    return _spread2d_py(obs, msk, nodata, frc, latlon, transform)


def _spread2d_py(obs, msk=None, nodata=0, frc=None, latlon=False, transform=IDENTITY):
    nrow, ncol = obs.shape
    xres, yres, north = transform[0], abs(transform[4]), transform[5]
    if latlon:
        lats = north + (np.arange(nrow) + 0.5) * yres
        dys = geodesy.degree_metres_y(lats) * yres
        dxs = geodesy.degree_metres_x(lats) * xres
    else:
        dx, dy = xres, yres

    out = obs.copy()
    src = np.full(obs.shape, -1, dtype=np.int32)
    dst = np.full(obs.shape, 0, dtype=np.float32)

    q = []
    for r, c in zip(*np.where(obs != nodata)):
        if msk is None or msk[r, c]:
            heapq.heappush(q, (np.float32(0), np.uint32(r), np.uint32(c)))
        src[r, c] = r * ncol + c

    obs_flat = obs.ravel()
    while q:
        d0, r, c = heapq.heappop(q)
        if dst[r, c] < d0:
            continue
        f0 = 1.0 if frc is None else frc[r, c]
        if latlon:
            dx, dy = dxs[r], dys[r]
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                r1, c1 = int(r) + dr, int(c) + dc
                outside = r1 < 0 or r1 >= nrow or c1 < 0 or c1 >= ncol
                if outside or (msk is not None and not msk[r1, c1]):
                    continue
                d = d0 + np.hypot(dr * dy, dc * dx) * f0
                if src[r1, c1] == -1 or d < dst[r1, c1]:
                    idx0 = src[r, c]
                    src[r1, c1] = idx0
                    dst[r1, c1] = d
                    out[r1, c1] = obs_flat[idx0]
                    heapq.heappush(q, (np.float32(d), np.uint32(r1), np.uint32(c1)))
    return out, src, dst


def features(flowpaths, xs=None, ys=None, transform=None, shape=None, **kwargs):
    """LineString GeoJSON feature dicts, one per flow path.

    Parity: reference ``gis_utils.features`` (gis_utils.py:490-549):
    properties sampled at the path head; ``pit`` flag from a repeated last
    index.
    """
    if xs is None or ys is None:
        if transform is None or shape is None:
            raise ValueError(
                "transform and shape should be provided if xs and ys are None"
            )
        _size = shape[0] * shape[1]
    else:
        _size = xs.size

    for key in kwargs:
        if not isinstance(kwargs[key], np.ndarray) or kwargs[key].size != _size:
            raise ValueError(
                f'Kwargs map "{key}" should be ndarrays of same size as coordinates'
            )
    feats = []
    for idxs in flowpaths:
        n = len(idxs)
        if n < 2:
            continue
        idx0 = idxs[0]
        pit = idxs[-1] == idxs[-2]
        props = {key: kwargs[key].flat[idx0] for key in kwargs}
        if xs is None or ys is None:
            xi, yi = geodesy.idxs_to_coords(idxs, transform, shape)
            coordinates = list(zip(xi, yi))
        else:
            coordinates = [(xs[i], ys[i]) for i in idxs]
        feats.append(
            {
                "type": "Feature",
                "geometry": {"type": "LineString", "coordinates": coordinates},
                "properties": {"idx": idx0, "idx_ds": idxs[-1], "pit": pit, **props},
            }
        )
    return feats
