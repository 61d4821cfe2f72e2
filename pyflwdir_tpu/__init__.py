"""pyflwdir_tpu — TPU-native raster hydrography framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Deltares/pyflwdir: flow-direction parsing (D8/LDD/NEXTXY), flow
accumulation and up/downstream arithmetics, DEM conditioning, basin and
stream-order delineation, HAND/floodplains, flow-direction upscaling,
subgrid statistics and stream vectorization — recast from sequential
topological sweeps into data-parallel pointer-doubling and fixpoint
kernels that scale over TPU device meshes.
"""

__version__ = "0.1.0"

from . import codecs, ops, utils
from .codecs import FTYPES, d8_to_ldd, ldd_to_d8, read_nextxy

__all__ = [
    "codecs",
    "ops",
    "utils",
    "FTYPES",
    "d8_to_ldd",
    "ldd_to_d8",
    "read_nextxy",
    "__version__",
]
