"""Grid tools: nearest-observation spreading and GeoJSON feature assembly.

Host-side equivalents of the reference ``gis_utils.spread2d`` (Dijkstra
with friction, gis_utils.py:32-114) and ``gis_utils.features``
(gis_utils.py:490-549). ``spread2d`` requires the native C++ kernels
(``make -C csrc``, built automatically on first import when a compiler
is available) and raises a RuntimeError otherwise.
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


def features(flowpaths, xs=None, ys=None, transform=None, shape=None, **properties):
    """LineString GeoJSON feature dicts, one per flow path.

    Parity: reference ``gis_utils.features`` (gis_utils.py:490-549):
    property maps are sampled at the path head; a repeated final index
    marks a pit; single-cell paths are dropped.
    """
    if xs is None or ys is None:
        if transform is None or shape is None:
            raise ValueError(
                "transform and shape should be provided if xs and ys are None"
            )
        size = shape[0] * shape[1]

        def _coords(path):
            x, y = geodesy.idxs_to_coords(path, transform, shape)
            return list(zip(np.asarray(x).tolist(), np.asarray(y).tolist()))

    else:
        xs, ys = np.asarray(xs).ravel(), np.asarray(ys).ravel()
        size = xs.size

        def _coords(path):
            return list(zip(xs[path].tolist(), ys[path].tolist()))

    for name, arr in properties.items():
        if not isinstance(arr, np.ndarray) or arr.size != size:
            raise ValueError(
                f'Kwargs map "{name}" should be ndarrays of same size as coordinates'
            )

    feats = []
    for path in flowpaths:
        path = np.asarray(path)
        if path.size < 2:
            continue
        head = path[0]
        props = {
            "idx": head,
            "idx_ds": path[-1],
            "pit": path[-1] == path[-2],
        }
        props.update({name: arr.flat[head] for name, arr in properties.items()})
        feats.append(
            {
                "type": "Feature",
                "geometry": {"type": "LineString", "coordinates": _coords(path)},
                "properties": props,
            }
        )
    return feats
