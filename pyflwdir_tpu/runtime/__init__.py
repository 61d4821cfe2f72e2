"""Native (C++) host kernels: exact priority-flood, Dijkstra spread, and
the sequential CPU baseline sweep.

The inherently heap-ordered host algorithms (Wang & Liu priority-flood,
``spread2d``) have native C++ implementations in ``csrc/`` built into
``libpyflwdir_host.so``. This module loads them via ctypes; if the library
has not been built, importing the kernel names raises ImportError and
callers fall back to the pure-python implementations of identical
semantics.

Build: ``make -C csrc`` (done automatically on first import when a
compiler is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CSRC = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "csrc"))
_LIB_PATH = os.path.join(_CSRC, "libpyflwdir_host.so")


def _load():
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_CSRC, "host_kernels.cpp")
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["make", "-C", _CSRC], capture_output=True, timeout=120, check=True
                )
            except Exception:
                return None
    try:
        return ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None


_lib = _load()

if _lib is not None:
    _lib.priority_flood.restype = None
    _lib.priority_flood.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    _lib.accuflux_sweep.restype = None
    _lib.accuflux_sweep.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    _lib.spread2d.restype = None
    _lib.spread2d.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_void_p,  # msk or NULL
        ctypes.c_void_p,  # frc or NULL
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_double,
        ctypes.c_int,
        ctypes.c_void_p,  # dxs or NULL
        ctypes.c_void_p,  # dys or NULL
        ctypes.c_double,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
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
        work = np.ascontiguousarray(elevtn, dtype=np.float64).copy()
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
                # single outlet: lowest edge cell, (z32, r, c) tie-break
                zb = work.ravel()[seeds].astype(np.float32)
                rr = (seeds // ncol).astype(np.uint32)
                cc = (seeds % ncol).astype(np.uint32)
                order = np.lexsort((cc, rr, zb))
                seeds = seeds[order[:1]]
        else:
            seeds = np.atleast_1d(np.asarray(idxs_pit)).astype(np.int64)
        seeds = np.ascontiguousarray(seeds)
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

    def accuflux_sweep(idxs_ds, seq, accu):
        """Sequential topological-sweep accumulation (CPU baseline).

        Numba-equivalent native version of the reference's north-star loop
        (streams.py:37-41): ``accu[ds[i]] += accu[i]`` over seq reversed.
        Mutates and returns ``accu`` (float64).
        """
        idxs_ds = np.ascontiguousarray(idxs_ds, dtype=np.int64)
        seq = np.ascontiguousarray(seq, dtype=np.int64)
        accu = np.ascontiguousarray(accu, dtype=np.float64)
        _lib.accuflux_sweep(
            idxs_ds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            seq.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            seq.size,
            accu.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return accu

    def spread2d(obs, msk=None, nodata=0, frc=None, latlon=False, transform=None):
        """Dijkstra nearest-observation spread via the native kernel.

        Same semantics as ``pyflwdir_tpu.gridtools._spread2d_py``
        (reference gis_utils.py:32-114).
        """
        from ..utils import geodesy
        from ..utils.affine import IDENTITY

        if transform is None:
            transform = IDENTITY
        obs = np.asarray(obs)
        nrow, ncol = obs.shape
        obs64 = np.ascontiguousarray(obs, dtype=np.float64)
        xres, yres, north = transform[0], abs(transform[4]), transform[5]
        if latlon:
            lats = north + (np.arange(nrow) + 0.5) * yres
            dys = np.ascontiguousarray(geodesy.degree_metres_y(lats) * yres)
            dxs = np.ascontiguousarray(geodesy.degree_metres_x(lats) * xres)
            dxs_p = dxs.ctypes.data_as(ctypes.c_void_p)
            dys_p = dys.ctypes.data_as(ctypes.c_void_p)
        else:
            dxs_p = dys_p = None
        msk_arr = None
        msk_p = None
        if msk is not None:
            msk_arr = np.ascontiguousarray(msk, dtype=np.uint8)
            msk_p = msk_arr.ctypes.data_as(ctypes.c_void_p)
        frc_arr = None
        frc_p = None
        if frc is not None:
            frc_arr = np.ascontiguousarray(frc, dtype=np.float64)
            frc_p = frc_arr.ctypes.data_as(ctypes.c_void_p)
        out = np.zeros((nrow, ncol), dtype=np.float64)
        src = np.zeros((nrow, ncol), dtype=np.int32)
        dst = np.zeros((nrow, ncol), dtype=np.float32)
        _lib.spread2d(
            obs64.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            msk_p,
            frc_p,
            nrow,
            ncol,
            float(nodata),
            int(bool(latlon)),
            dxs_p,
            dys_p,
            float(xres),
            float(yres),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out.astype(obs.dtype), src, dst

    _lib.strahler_order_host.restype = None
    _lib.strahler_order_host.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_void_p,  # mask or NULL
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib.classic_order_host.restype = None
    _lib.classic_order_host.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_void_p,  # mask or NULL
        ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_uint8),
    ]

    def strahler_order(idxs_ds, preorder, mask=None):
        """O(n) Strahler order over the reverse DFS preorder (native).

        Exact reference semantics (streams.py:229-269)."""
        ids64 = np.ascontiguousarray(idxs_ds, dtype=np.int64)
        pre64 = np.ascontiguousarray(preorder, dtype=np.int64)
        out = np.zeros(ids64.size, dtype=np.uint8)
        if mask is not None:
            mask = np.ascontiguousarray(mask, dtype=np.uint8)
            mask_p = mask.ctypes.data_as(ctypes.c_void_p)
        else:
            mask_p = None
        _lib.strahler_order_host(
            ids64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            pre64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            pre64.size,
            ids64.size,
            mask_p,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out

    def classic_order(idxs_ds, preorder, idxs_us_main, nup, mask=None):
        """O(n) classic (Hack) order over the DFS preorder (native).

        Exact reference semantics (streams.py:192-225)."""
        ids64 = np.ascontiguousarray(idxs_ds, dtype=np.int64)
        pre64 = np.ascontiguousarray(preorder, dtype=np.int64)
        usm64 = np.ascontiguousarray(idxs_us_main, dtype=np.int64)
        nup8 = np.ascontiguousarray(nup, dtype=np.int8)
        out = np.zeros(ids64.size, dtype=np.uint8)
        if mask is not None:
            mask = np.ascontiguousarray(mask, dtype=np.uint8)
            mask_p = mask.ctypes.data_as(ctypes.c_void_p)
        else:
            mask_p = None
        _lib.classic_order_host(
            ids64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            pre64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            usm64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            pre64.size,
            ids64.size,
            mask_p,
            nup8.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out

    __all__ = ["priority_flood", "accuflux_sweep", "spread2d",
               "strahler_order", "classic_order"]
else:
    __all__ = []
