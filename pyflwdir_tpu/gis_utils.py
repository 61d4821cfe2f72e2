"""Compatibility namespace mirroring the reference's ``pyflwdir.gis_utils``.

Reference users import geospatial helpers from one module
(reference gis_utils.py:15-28); here the implementations live in
:mod:`pyflwdir_tpu.utils.affine` (transform math),
:mod:`pyflwdir_tpu.utils.geodesy` (coordinates, WGS84 lengths/areas) and
:mod:`pyflwdir_tpu.gridtools` (spread2d, features, edges). This module
re-exports them under the reference's names.
"""

from .dem import get_edge
from .gridtools import features, spread2d
from .utils.affine import (
    Affine,
    array_bounds,
    transform_from_bounds,
    transform_from_origin,
)
from .utils.geodesy import (
    affine_to_coords,
    area_grid,
    cellarea,
    coords_to_idxs,
    degree_metres_x,
    degree_metres_y,
    distance,
    idxs_to_coords,
    reggrid_area,
    reggrid_dx,
    reggrid_dy,
    rowcol,
    xy,
)

__all__ = [
    "Affine",
    "transform_from_origin",
    "transform_from_bounds",
    "array_bounds",
    "xy",
    "rowcol",
    "idxs_to_coords",
    "coords_to_idxs",
    "affine_to_coords",
    "reggrid_area",
    "reggrid_dy",
    "reggrid_dx",
    "area_grid",
    "cellarea",
    "degree_metres_x",
    "degree_metres_y",
    "distance",
    "get_edge",
    "spread2d",
    "features",
]
