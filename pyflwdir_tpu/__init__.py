"""pyflwdir_tpu — TPU-native raster hydrography framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Deltares/pyflwdir: flow-direction parsing (D8/LDD/NEXTXY), flow
accumulation and up/downstream arithmetics, DEM conditioning, basin and
stream-order delineation, HAND/floodplains, flow-direction upscaling,
subgrid statistics and stream vectorization — recast from sequential
topological sweeps into data-parallel pointer-doubling and fixpoint
kernels that scale over TPU device meshes.

Public API parity: reference ``pyflwdir/__init__.py:16-29``.
"""

__version__ = "0.1.0"

from . import (
    arithmetics,
    basins,
    codecs,
    dem,
    gridtools,
    ops,
    regions,
    rivers,
    streams,
    subgrid,
    upscale,
    utils,
)
from .codecs import FTYPES, d8_to_ldd, ldd_to_d8, read_nextxy
from .dem import fill_depressions, slope
from .flwdir import Flwdir, from_dataframe
from .gridtools import spread2d
from .raster import FlwdirRaster, from_array, from_dem
from .utils import Affine
from .utils.geodesy import (
    affine_to_coords,
    area_grid,
    coords_to_idxs,
    idxs_to_coords,
)

__all__ = [
    "Flwdir",
    "FlwdirRaster",
    "from_array",
    "from_dem",
    "from_dataframe",
    "read_nextxy",
    "d8_to_ldd",
    "ldd_to_d8",
    "fill_depressions",
    "slope",
    "spread2d",
    "area_grid",
    "affine_to_coords",
    "idxs_to_coords",
    "coords_to_idxs",
    "Affine",
    "FTYPES",
    "codecs",
    "ops",
    "utils",
    "streams",
    "basins",
    "dem",
    "upscale",
    "subgrid",
    "arithmetics",
    "rivers",
    "regions",
    "gridtools",
    "__version__",
]
