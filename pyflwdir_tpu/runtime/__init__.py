"""Native (C++) host kernels: exact priority-flood and Dijkstra spread.

The inherently heap-ordered host algorithms (Wang & Liu priority-flood,
``spread2d``) have native C++ implementations in ``csrc/`` built into
``libpyflwdir_host.so``. This module loads them via ctypes; if the library
has not been built, importing the kernel names raises ImportError and
callers fall back to the pure-python implementations of identical
semantics.

Build: ``make -C csrc`` (see csrc/Makefile).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "libpyflwdir_host.so")
_lib = None
if os.path.exists(_LIB_PATH):
    try:
        _lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _lib = None

if _lib is not None:
    _lib.priority_flood.restype = None
    _lib.priority_flood.argtypes = [
        ctypes.POINTER(ctypes.c_double),  # elevtn (in/out: filled)
        ctypes.POINTER(ctypes.c_uint8),  # d8 (out)
        ctypes.c_int64,  # nrow
        ctypes.c_int64,  # ncol
        ctypes.c_double,  # nodata
        ctypes.c_double,  # max_depth
        ctypes.c_int,  # connectivity
        ctypes.POINTER(ctypes.c_int64),  # seed idxs
        ctypes.c_int64,  # n seeds
    ]

    def priority_flood(
        elevtn,
        outlets="edge",
        idxs_pit=None,
        nodata=-9999.0,
        max_depth=-1.0,
        elv_max=None,
        connectivity=8,
    ):
        """Exact Wang & Liu (2006) priority-flood via the native kernel.

        Same semantics as ``pyflwdir_tpu.dem._fill_depressions_py``
        (reference dem.py:18-143).
        """
        from ..dem import get_edge

        elevtn = np.asarray(elevtn)
        nrow, ncol = elevtn.shape
        work = elevtn.astype(np.float64).copy()
        d8 = np.zeros((nrow, ncol), dtype=np.uint8)
        nan = isinstance(nodata, float) and np.isnan(nodata)
        done = np.isnan(elevtn) if nan else elevtn == nodata
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
            seeds = np.where(queued.ravel())[0].astype(np.int64)
            if outlets == "min":
                # single outlet at the lowest (boundary-tie-broken) edge cell
                zb = work.ravel()[seeds].astype(np.float32)
                rr = (seeds // ncol).astype(np.uint32)
                cc = (seeds % ncol).astype(np.uint32)
                order = np.lexsort((cc, rr, zb))
                seeds = seeds[order[:1]]
        else:
            seeds = np.atleast_1d(np.asarray(idxs_pit)).astype(np.int64)
        _lib.priority_flood(
            work.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            d8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            nrow,
            ncol,
            float("nan") if nan else float(nodata),
            float(max_depth),
            int(connectivity),
            seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            seeds.size,
        )
        filled = work.astype(elevtn.dtype)
        return filled, d8

    __all__ = ["priority_flood"]
else:
    __all__ = []
