"""Grid tools: nearest-observation spreading and GeoJSON feature assembly.

Host-side equivalents of the reference ``gis_utils.spread2d`` (Dijkstra
with friction, gis_utils.py:32-114) and ``gis_utils.features``
(gis_utils.py:490-549). ``spread2d`` uses the native C++ kernel when
built (see csrc/), with a python heapq fallback of identical semantics.
"""

from __future__ import annotations

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
    except ImportError as e:
        raise RuntimeError(
            "spread2d needs the native host kernels (`make -C csrc`)"
        ) from e
    return _native(
        np.asarray(obs), msk=msk, nodata=nodata, frc=frc, latlon=latlon,
        transform=transform,
    )


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
