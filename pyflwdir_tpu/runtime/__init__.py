"""Native (C++) host kernels: exact priority-flood, Dijkstra spread, walk
engines, IHU repair and the sequential CPU baseline sweep.

The inherently heap-ordered or sequential host algorithms have native C++
implementations in ``csrc/`` built into ``libpyflwdir_host.so``. This
module loads them via ctypes; if the library has not been built,
importing the kernel names raises ImportError and the depending features
(``fill_depressions``, ``spread2d``, walks, IHU upscaling, stream
segments, ...) raise a RuntimeError directing to the build. A C++
toolchain is a hard requirement of those features — there are no python
fallbacks.

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

        Exact reference semantics (dem.py:18-143).
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

        Exact reference semantics (gis_utils.py:32-114).
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

    _I64P = ctypes.POINTER(ctypes.c_int64)
    _I32P = ctypes.POINTER(ctypes.c_int32)
    _F64P = ctypes.POINTER(ctypes.c_double)
    _U8P = ctypes.POINTER(ctypes.c_uint8)
    _U32P = ctypes.POINTER(ctypes.c_uint32)
    _I8P = ctypes.POINTER(ctypes.c_int8)

    def _i64(a):
        return np.ascontiguousarray(a, dtype=np.int64)

    def _mask_arg(mask, n=None):
        if mask is None:
            return None, None
        m = np.ascontiguousarray(mask, dtype=np.uint8).ravel()
        return m, m.ctypes.data_as(ctypes.c_void_p)

    _lib.ucat_paths_count.restype = None
    _lib.ucat_paths_count.argtypes = [
        _I64P, ctypes.c_int64, _I64P, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int32, _I64P, _I64P, _I8P,
    ]
    _lib.ucat_paths_fill.restype = None
    _lib.ucat_paths_fill.argtypes = [
        _I64P, ctypes.c_int64, _I64P, ctypes.c_int64, _I64P, _I64P,
    ]

    def channel_paths(nxt, seeds, mask=None, max_len=0, include_outlet=False):
        """Batched ucat channel walks between outlet pixels (CSR).

        Returns (offsets, data, ends, kinds): offsets is (m+1,), data the
        concatenated pixel paths, ends the terminating pixel per seed and
        kinds its classification (0 other, 1 outlet, 2 pit). Same walk
        semantics as the reference's per-outlet subgrid loops
        (reference subgrid.py:146-410).
        """
        nxt = _i64(nxt)
        seeds = _i64(seeds)
        m = seeds.size
        counts = np.empty(m, dtype=np.int64)
        ends = np.empty(m, dtype=np.int64)
        kinds = np.empty(m, dtype=np.int8)
        _mask_keep, mask_p = _mask_arg(mask)
        _lib.ucat_paths_count(
            nxt.ctypes.data_as(_I64P), nxt.size,
            seeds.ctypes.data_as(_I64P), m, mask_p,
            int(max_len), int(bool(include_outlet)),
            counts.ctypes.data_as(_I64P), ends.ctypes.data_as(_I64P),
            kinds.ctypes.data_as(_I8P),
        )
        offsets = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        data = np.empty(int(offsets[-1]), dtype=np.int64)
        # fill walks only need the pointer chain and per-seed lengths
        seeds_safe = np.where(seeds < 0, 0, seeds)
        _lib.ucat_paths_fill(
            nxt.ctypes.data_as(_I64P), nxt.size,
            seeds_safe.ctypes.data_as(_I64P), m,
            offsets.ctypes.data_as(_I64P), data.ctypes.data_as(_I64P),
        )
        return offsets, data, ends, kinds

    _lib.stream_segments_count.restype = None
    _lib.stream_segments_count.argtypes = [
        _I64P, _I64P, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        _I32P, ctypes.c_int64, _I64P, _I64P,
    ]
    _lib.stream_segments_fill.restype = None
    _lib.stream_segments_fill.argtypes = [
        _I64P, _I64P, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        _I32P, ctypes.c_int64, _I64P, _I64P,
    ]

    def stream_segments(nxt, order, nup, mask=None, max_len=0):
        """Confluence-to-confluence stream reaches (CSR), with over-long
        reaches chunked and pit stubs appended (reference
        streams.py:133-188 semantics). Returns (seg_off, data)."""
        nxt = _i64(nxt)
        order = _i64(order)
        nup32 = np.ascontiguousarray(nup, dtype=np.int32)
        _mask_keep, mask_p = _mask_arg(mask)
        nseg = np.zeros(1, dtype=np.int64)
        ndata = np.zeros(1, dtype=np.int64)
        _lib.stream_segments_count(
            nxt.ctypes.data_as(_I64P), order.ctypes.data_as(_I64P),
            order.size, nxt.size, mask_p, nup32.ctypes.data_as(_I32P),
            int(max_len), nseg.ctypes.data_as(_I64P),
            ndata.ctypes.data_as(_I64P),
        )
        seg_off = np.empty(int(nseg[0]) + 1, dtype=np.int64)
        data = np.empty(int(ndata[0]), dtype=np.int64)
        _lib.stream_segments_fill(
            nxt.ctypes.data_as(_I64P), order.ctypes.data_as(_I64P),
            order.size, nxt.size, mask_p, nup32.ctypes.data_as(_I32P),
            int(max_len), seg_off.ctypes.data_as(_I64P),
            data.ctypes.data_as(_I64P),
        )
        return seg_off, data

    _lib.smooth_rivlen_host.restype = None
    _lib.smooth_rivlen_host.argtypes = [
        _I64P, _I64P, ctypes.c_int64, _F64P, ctypes.c_double,
        ctypes.c_int64, ctypes.c_double,
    ]

    def smooth_rivlen(nxt, us_main, rivlen, min_rivlen, max_window, nodata):
        """Sequential short-river window smoothing (reference
        streams.py:319-369 semantics). Returns a new float64 array."""
        nxt = _i64(nxt)
        us = _i64(us_main)
        out = np.ascontiguousarray(rivlen, dtype=np.float64).copy()
        _lib.smooth_rivlen_host(
            nxt.ctypes.data_as(_I64P), us.ctypes.data_as(_I64P), nxt.size,
            out.ctypes.data_as(_F64P), float(min_rivlen), int(max_window),
            float(nodata),
        )
        return out

    _lib.subbasin_area_outlets.restype = ctypes.c_int64
    _lib.subbasin_area_outlets.argtypes = [
        _I64P, _I64P, _I64P, ctypes.c_int64, ctypes.c_int64, _F64P,
        ctypes.c_double, _U32P, _I64P,
    ]

    def subbasin_area_outlets(nxt, us_main, order, uparea, area_min):
        """Area-threshold subbasin outlets via the native down->up sweep
        (reference basins.py:195-233 semantics). Returns (labels, outlets)."""
        nxt = _i64(nxt)
        us = _i64(us_main)
        order = _i64(order)
        upa = np.ascontiguousarray(uparea, dtype=np.float64)
        labels = np.zeros(nxt.size, dtype=np.uint32)
        outlets = np.empty(nxt.size, dtype=np.int64)
        k = _lib.subbasin_area_outlets(
            nxt.ctypes.data_as(_I64P), us.ctypes.data_as(_I64P),
            order.ctypes.data_as(_I64P), order.size, nxt.size,
            upa.ctypes.data_as(_F64P), float(area_min),
            labels.ctypes.data_as(_U32P), outlets.ctypes.data_as(_I64P),
        )
        return labels, outlets[:k]

    _lib.adjust_elevation_host.restype = None
    _lib.adjust_elevation_host.argtypes = [
        _I64P, _I64P, ctypes.c_int64, ctypes.c_int64, _F64P,
    ]
    _lib.repair_profile_host.restype = None
    _lib.repair_profile_host.argtypes = [_F64P, ctypes.c_int64]

    def adjust_elevation(nxt, order, elevtn):
        """Streamline profile conditioning (reference dem.py:147-225
        semantics); order = headwater-first processing order."""
        nxt = _i64(nxt)
        order = _i64(order)
        z = np.ascontiguousarray(elevtn, dtype=np.float64).copy()
        _lib.adjust_elevation_host(
            nxt.ctypes.data_as(_I64P), order.ctypes.data_as(_I64P),
            order.size, nxt.size, z.ctypes.data_as(_F64P),
        )
        return z

    def repair_profile(profile):
        """Minimum-modification repair of one up->downstream profile."""
        z = np.ascontiguousarray(profile, dtype=np.float64).copy()
        _lib.repair_profile_host(z.ctypes.data_as(_F64P), z.size)
        return z

    _lib.dig_d4_host.restype = None
    _lib.dig_d4_host.argtypes = [
        _I64P, _I64P, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_void_p, _F64P, ctypes.c_double,
        ctypes.c_double,
    ]

    def dig_d4(nxt, order, shape, elevtn, mask=None, nodata=-9999.0,
               dz_min=1e-3):
        """D4-connect diagonal D8 channel links (reference dem.py:405-439
        semantics)."""
        nxt = _i64(nxt)
        order = _i64(order)
        z = np.ascontiguousarray(elevtn, dtype=np.float64).copy()
        _mask_keep, mask_p = _mask_arg(mask)
        _lib.dig_d4_host(
            nxt.ctypes.data_as(_I64P), order.ctypes.data_as(_I64P),
            order.size, nxt.size, int(shape[0]), int(shape[1]), mask_p,
            z.ctypes.data_as(_F64P), float(nodata), float(dz_min),
        )
        return z

    _lib.trace_walks_count.restype = None
    _lib.trace_walks_count.argtypes = [
        _I64P, ctypes.c_int64, _I64P, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_double,
        _I64P, _F64P,
    ]
    _lib.trace_walks_fill.restype = None
    _lib.trace_walks_fill.argtypes = [
        _I64P, ctypes.c_int64, _I64P, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_double,
        _I64P, _I64P,
    ]

    def trace_walks(nxt, seeds, mask=None, stepx=None, stepy=None, ncol=0,
                    max_length=-1.0):
        """Batched trace walks (reference core._trace/path/snap semantics):
        CSR paths + metric distances per seed. ``stepx``/``stepy`` are
        (2*nrow,) step lengths indexed by r0+r1 (mean-latitude metres), or
        None for unit steps."""
        nxt = _i64(nxt)
        seeds = _i64(seeds)
        m = seeds.size
        _mask_keep, mask_p = _mask_arg(mask)
        if stepx is not None:
            stepx = np.ascontiguousarray(stepx, dtype=np.float64)
            stepy = np.ascontiguousarray(stepy, dtype=np.float64)
            sx_p = stepx.ctypes.data_as(ctypes.c_void_p)
            sy_p = stepy.ctypes.data_as(ctypes.c_void_p)
        else:
            sx_p = sy_p = None
        counts = np.empty(m, dtype=np.int64)
        dists = np.empty(m, dtype=np.float64)
        args = (
            nxt.ctypes.data_as(_I64P), nxt.size,
            seeds.ctypes.data_as(_I64P), m, mask_p, sx_p, sy_p,
            int(ncol), float(max_length),
        )
        _lib.trace_walks_count(*args, counts.ctypes.data_as(_I64P),
                               dists.ctypes.data_as(_F64P))
        offsets = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        data = np.empty(int(offsets[-1]), dtype=np.int64)
        _lib.trace_walks_fill(*args, offsets.ctypes.data_as(_I64P),
                              data.ctypes.data_as(_I64P))
        return offsets, data, dists

    _lib.fixed_window_count.restype = None
    _lib.fixed_window_count.argtypes = [
        _I64P, _I64P, _F64P, ctypes.c_void_p, _I64P, ctypes.c_int64,
        ctypes.c_double, _I64P, _I64P,
    ]
    _lib.fixed_window_fill.restype = None
    _lib.fixed_window_fill.argtypes = [_I64P, _I64P, ctypes.c_int64, _I64P, _I64P]

    def fixed_windows(nxt, us_main, distnc, seeds, length, mask=None):
        """Fixed-length main-stem windows centred on outlet pixels (CSR;
        reference subgrid.py:488-559 walk semantics)."""
        nxt = _i64(nxt)
        us = _i64(us_main)
        seeds = _i64(seeds)
        dst = np.ascontiguousarray(distnc, dtype=np.float64)
        m = seeds.size
        starts = np.empty(m, dtype=np.int64)
        counts = np.empty(m, dtype=np.int64)
        _mask_keep, mask_p = _mask_arg(mask)
        _lib.fixed_window_count(
            nxt.ctypes.data_as(_I64P), us.ctypes.data_as(_I64P),
            dst.ctypes.data_as(_F64P), mask_p, seeds.ctypes.data_as(_I64P),
            m, float(length), starts.ctypes.data_as(_I64P),
            counts.ctypes.data_as(_I64P),
        )
        offsets = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        data = np.empty(int(offsets[-1]), dtype=np.int64)
        _lib.fixed_window_fill(
            us.ctypes.data_as(_I64P), starts.ctypes.data_as(_I64P), m,
            offsets.ctypes.data_as(_I64P), data.ctypes.data_as(_I64P),
        )
        return offsets, data

    _DIMS = [ctypes.c_int64] * 6  # nlow, nsub, nrow, ncol, subncol, cellsize

    _lib.ihu_relocate.restype = ctypes.c_int64
    _lib.ihu_relocate.argtypes = [
        _I64P, _I64P, _I64P, _F64P, *_DIMS, _I64P, ctypes.c_int64, _I64P,
    ]
    _lib.ihu_opt_rivlen.restype = None
    _lib.ihu_opt_rivlen.argtypes = [
        _I64P, _I64P, _I32P, _U8P, _I64P, _F64P, *_DIMS, _I64P,
        ctypes.c_int64, ctypes.c_double, ctypes.c_double,
    ]
    _lib.ihu_min_error.restype = None
    _lib.ihu_min_error.argtypes = [
        _I64P, _I64P, _I32P, _U8P, _I64P, _F64P, *_DIMS, _I64P,
        ctypes.c_int64, ctypes.c_double, ctypes.c_double, ctypes.c_int64,
    ]

    def _ihu_dims(cell_ds, pix_ds, shape, subncol, cellsize):
        return (
            cell_ds.size, pix_ds.size, int(shape[0]), int(shape[1]),
            int(subncol), int(cellsize),
        )

    def ihu_relocate(cell_ds, cell_out, pix_ds, pix_upa, broken, shape,
                     subncol, cellsize):
        """IHU outlet-relocation repair (csrc/upscale_kernels.cpp).

        Mutates ``cell_ds`` / ``cell_out`` in place; ``broken`` must be
        pre-sorted (ascending outlet uparea). Returns the cells that are
        still broken. Behavioral spec: reference upscale.py:499-877.
        """
        upa = np.ascontiguousarray(pix_upa, dtype=np.float64)
        broken = _i64(broken)
        still = np.empty(max(broken.size, 1), dtype=np.int64)
        k = _lib.ihu_relocate(
            cell_ds.ctypes.data_as(_I64P), cell_out.ctypes.data_as(_I64P),
            pix_ds.ctypes.data_as(_I64P), upa.ctypes.data_as(_F64P),
            *_ihu_dims(cell_ds, pix_ds, shape, subncol, cellsize),
            broken.ctypes.data_as(_I64P), broken.size,
            still.ctypes.data_as(_I64P),
        )
        return still[:k]

    def ihu_opt_rivlen(cell_ds, cell_out, strm, valid, pix_ds, pix_upa,
                       shorts, shape, subncol, cellsize, minlen, minupa):
        """IHU short-reach optimization (csrc/upscale_kernels.cpp); mutates
        cell_ds/cell_out/strm in place. Spec: reference upscale.py:971-1019."""
        upa = np.ascontiguousarray(pix_upa, dtype=np.float64)
        shorts = _i64(shorts)
        _lib.ihu_opt_rivlen(
            cell_ds.ctypes.data_as(_I64P), cell_out.ctypes.data_as(_I64P),
            strm.ctypes.data_as(_I32P), valid.ctypes.data_as(_U8P),
            pix_ds.ctypes.data_as(_I64P), upa.ctypes.data_as(_F64P),
            *_ihu_dims(cell_ds, pix_ds, shape, subncol, cellsize),
            shorts.ctypes.data_as(_I64P), shorts.size,
            float(minlen), float(minupa),
        )

    def ihu_min_error(cell_ds, cell_out, strm, valid, pix_ds, pix_upa,
                      broken, shape, subncol, cellsize, minlen, minupa,
                      pit_out_of_cell):
        """IHU upstream-area-error minimization (csrc/upscale_kernels.cpp);
        mutates in place. ``broken`` pre-sorted by descending outlet uparea.
        Spec: reference upscale.py:1022-1152."""
        upa = np.ascontiguousarray(pix_upa, dtype=np.float64)
        broken = _i64(broken)
        _lib.ihu_min_error(
            cell_ds.ctypes.data_as(_I64P), cell_out.ctypes.data_as(_I64P),
            strm.ctypes.data_as(_I32P), valid.ctypes.data_as(_U8P),
            pix_ds.ctypes.data_as(_I64P), upa.ctypes.data_as(_F64P),
            *_ihu_dims(cell_ds, pix_ds, shape, subncol, cellsize),
            broken.ctypes.data_as(_I64P), broken.size,
            float(minlen), float(minupa), int(pit_out_of_cell),
        )

    # -- native tile-plan construction (csrc/tile_plan_build.cpp) --------
    _lib.tp_phase1.restype = ctypes.c_void_p
    _lib.tp_phase1.argtypes = [
        _I64P, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        _I32P, _I8P, _I8P, _I8P, _I8P, _I32P, _I32P,
        _I64P, _I64P, _I64P, _I64P, _I64P,
    ]
    _lib.tp_phase1_export.restype = None
    _lib.tp_phase1_export.argtypes = [ctypes.c_void_p, _I64P, _I32P, _I32P, _I32P]
    _lib.tp_pad_bijection.restype = None
    _lib.tp_pad_bijection.argtypes = [
        _I64P, _I64P, _I64P, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        _I32P,
    ]
    _lib.tp_fwd_tables.restype = None
    _lib.tp_fwd_tables.argtypes = [
        _I32P, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        _I8P, _I8P, _I8P, _I8P, ctypes.c_void_p,
    ]
    _lib.tp_inv_rows.restype = None
    _lib.tp_inv_rows.argtypes = [_I8P, ctypes.c_int64, ctypes.c_int64, _I8P]
    _lib.tp_down_phase.restype = None
    _lib.tp_down_phase.argtypes = [
        _I8P, _I8P, _I8P, _I32P, _I64P, _I32P, _I32P,
        ctypes.c_int64, ctypes.c_int64,
        _I32P, _I32P, _I32P, _I8P, _I8P,
    ]

    def tile_down_phase(near_sel, idx_near, sel_next, sig, cnt_far,
                        far_slot, far_end, NT, T):
        """Per-tile downward-plan sort/boundary structures
        (csrc/tile_plan_build.cpp::tp_down_phase): returns
        (sig_es, sig_dea, sig_deb, de_sel, de_b0)."""
        NT, T = int(NT), int(T)
        ns = np.ascontiguousarray(near_sel, np.int8).reshape(-1)
        idn = np.ascontiguousarray(idx_near, np.int8).reshape(-1)
        sn = np.ascontiguousarray(sel_next, np.int8).reshape(-1)
        sig = np.ascontiguousarray(sig, np.int32)
        cnt_far = np.ascontiguousarray(cnt_far, np.int64)
        far_slot = np.ascontiguousarray(far_slot, np.int32)
        far_end = np.ascontiguousarray(far_end, np.int32)
        sig_es = np.empty((NT, T), np.int32)
        sig_dea = np.empty((NT, T), np.int32)
        sig_deb = np.empty((NT, T), np.int32)
        de_sel = np.empty(NT * T, np.int8)
        de_b0 = np.empty(NT * T, np.int8)
        _lib.tp_down_phase(
            ns.ctypes.data_as(_I8P), idn.ctypes.data_as(_I8P),
            sn.ctypes.data_as(_I8P), sig.ctypes.data_as(_I32P),
            cnt_far.ctypes.data_as(_I64P), far_slot.ctypes.data_as(_I32P),
            far_end.ctypes.data_as(_I32P), NT, T,
            sig_es.ctypes.data_as(_I32P), sig_dea.ctypes.data_as(_I32P),
            sig_deb.ctypes.data_as(_I32P), de_sel.ctypes.data_as(_I8P),
            de_b0.ctypes.data_as(_I8P),
        )
        return sig_es, sig_dea, sig_deb, de_sel, de_b0

    def tile_plan_phase1(ids_p, Hp, Wp, th):
        """Per-tile forest DFS and table fill for the TilePlan build
        (csrc/tile_plan_build.cpp::tp_phase1); returns a dict of the
        phase-1 intermediates (see ops/tile_plan.py)."""
        S = 128
        nty, ntx = Hp // th, Wp // S
        NT = nty * ntx
        T = th * S
        n = Hp * Wp
        ids_p = np.ascontiguousarray(ids_p, dtype=np.int64)
        sig = np.empty((NT, T), np.int32)
        near_sel = np.zeros(NT * T, np.int8)
        idx_near = np.zeros(NT * T, np.int8)
        sel_next = np.zeros(NT * T, np.int8)
        tree_mask = np.empty(NT * T, np.int8)
        slot = np.empty(n, np.int32)
        root_node = np.empty(n, np.int32)
        cnt_on = np.empty(NT, np.int64)
        cnt_r = np.empty(NT, np.int64)
        cnt_far = np.empty(NT, np.int64)
        m = ctypes.c_int64()
        nf = ctypes.c_int64()
        h = _lib.tp_phase1(
            ids_p.ctypes.data_as(_I64P), Hp, Wp, th,
            sig.ctypes.data_as(_I32P), near_sel.ctypes.data_as(_I8P),
            idx_near.ctypes.data_as(_I8P), sel_next.ctypes.data_as(_I8P),
            tree_mask.ctypes.data_as(_I8P), slot.ctypes.data_as(_I32P),
            root_node.ctypes.data_as(_I32P), cnt_on.ctypes.data_as(_I64P),
            cnt_r.ctypes.data_as(_I64P), cnt_far.ctypes.data_as(_I64P),
            ctypes.byref(m), ctypes.byref(nf),
        )
        root_cell = np.empty(m.value, np.int64)
        root_end = np.empty(m.value, np.int32)
        far_slot = np.empty(nf.value, np.int32)
        far_end = np.empty(nf.value, np.int32)
        _lib.tp_phase1_export(
            h, root_cell.ctypes.data_as(_I64P), root_end.ctypes.data_as(_I32P),
            far_slot.ctypes.data_as(_I32P), far_end.ctypes.data_as(_I32P),
        )
        return {
            "sig": sig, "near_sel": near_sel, "idx_near": idx_near,
            "sel_next": sel_next, "tree_mask": tree_mask, "slot": slot,
            "root_node": root_node, "cnt_on": cnt_on, "cnt_r": cnt_r,
            "cnt_far": cnt_far, "root_cell": root_cell, "root_end": root_end,
            "far_slot": far_slot, "far_end": far_end,
        }

    def tile_pad_bijection(tk, dk, sk, NT, T):
        """Pad per-tile partial bijections (tk ascending) into (NT, T)
        int32 sigma tables (csrc/tile_plan_build.cpp::tp_pad_bijection)."""
        tk = _i64(tk)
        dk = _i64(dk)
        sk = _i64(sk)
        sigma = np.empty((int(NT), int(T)), np.int32)
        _lib.tp_pad_bijection(
            tk.ctypes.data_as(_I64P), dk.ctypes.data_as(_I64P),
            sk.ctypes.data_as(_I64P), tk.size, int(NT), int(T),
            sigma.ctypes.data_as(_I32P),
        )
        return sigma

    def tile_fwd_tables(sig, Y, G):
        """Stacked 5-stage router tables incl. per-tile Hall colorings
        (csrc/tile_plan_build.cpp::tp_fwd_tables)."""
        sig = np.ascontiguousarray(sig, dtype=np.int32)
        NT = sig.shape[0]
        i1 = np.empty((NT, Y, 128), np.int8)
        is1 = np.empty((NT, Y, 128), np.int8)
        is2 = np.empty((NT, Y, 128), np.int8)
        i3 = np.empty((NT, Y, 128), np.int8)
        ig = np.empty((NT, 128 * 128, G), np.int8) if G > 1 else None
        _lib.tp_fwd_tables(
            sig.ctypes.data_as(_I32P), NT, int(Y), int(G),
            i1.ctypes.data_as(_I8P), is1.ctypes.data_as(_I8P),
            is2.ctypes.data_as(_I8P), i3.ctypes.data_as(_I8P),
            ig.ctypes.data_as(_I8P) if ig is not None else None,
        )
        return i1, is1, is2, i3, ig

    _lib.flw_from_array_lut.restype = None
    _lib.flw_from_array_lut.argtypes = [
        _U8P, _I8P, _I8P, ctypes.c_uint8, ctypes.c_int64, ctypes.c_int64,
        _I32P, _I64P, _I64P,
    ]
    _lib.flw_collect_pits.restype = None
    _lib.flw_collect_pits.argtypes = [_I32P, ctypes.c_int64, _I32P]

    def flw_from_array_lut(flwdir, drlut, dclut, mv):
        """LUT-decode a uint8 flow-direction raster to downstream indices
        (csrc/tile_plan_build.cpp::flw_from_array_lut); returns
        ``(idxs_ds int32, idxs_pit int32, n_valid)``. Reference semantics
        core_d8.py:43-67 (edge/nodata drains become pits)."""
        flwdir = np.ascontiguousarray(flwdir, dtype=np.uint8)
        nrow, ncol = flwdir.shape
        idxs_ds = np.empty(nrow * ncol, np.int32)
        drlut = np.ascontiguousarray(drlut, dtype=np.int8)
        dclut = np.ascontiguousarray(dclut, dtype=np.int8)
        np_ = ctypes.c_int64()
        nv = ctypes.c_int64()
        _lib.flw_from_array_lut(
            flwdir.ctypes.data_as(_U8P), drlut.ctypes.data_as(_I8P),
            dclut.ctypes.data_as(_I8P), int(mv), nrow, ncol,
            idxs_ds.ctypes.data_as(_I32P), ctypes.byref(np_), ctypes.byref(nv),
        )
        pits = np.empty(np_.value, np.int32)
        _lib.flw_collect_pits(
            idxs_ds.ctypes.data_as(_I32P), nrow * ncol,
            pits.ctypes.data_as(_I32P),
        )
        return idxs_ds, pits, int(nv.value)

    _lib.downward_sweep.restype = None
    _lib.downward_sweep.argtypes = [_I64P, _I64P, ctypes.c_int64, _F64P, _F64P]

    def downward_sweep(idxs_ds, seq, w):
        """Sequential downward path-sum sweep (reference-style numba loop
        as native -O3): out[i] = w[i] + out[ds(i)] over the parents-first
        preorder. CPU baseline for the downward device kernels."""
        ids = _i64(idxs_ds)
        seq = _i64(seq)
        w = np.ascontiguousarray(w, dtype=np.float64)
        out = np.zeros_like(w)
        _lib.downward_sweep(
            ids.ctypes.data_as(_I64P), seq.ctypes.data_as(_I64P), seq.size,
            w.ctypes.data_as(_F64P), out.ctypes.data_as(_F64P),
        )
        return out

    def tile_inv_rows(t):
        """Row-wise inverse of stacked permutation tables (..., S)."""
        t = np.ascontiguousarray(t, dtype=np.int8)
        out = np.empty_like(t)
        s = t.shape[-1]
        _lib.tp_inv_rows(
            t.ctypes.data_as(_I8P), t.size // s, s, out.ctypes.data_as(_I8P)
        )
        return out

    __all__ = ["priority_flood", "accuflux_sweep", "spread2d",
               "strahler_order", "classic_order", "channel_paths",
               "stream_segments", "smooth_rivlen", "subbasin_area_outlets",
               "adjust_elevation", "repair_profile", "dig_d4",
               "fixed_windows", "trace_walks", "ihu_relocate",
               "ihu_opt_rivlen", "ihu_min_error", "tile_plan_phase1",
               "tile_pad_bijection", "tile_fwd_tables", "tile_inv_rows",
               "flw_from_array_lut", "downward_sweep"]
else:
    __all__ = []
