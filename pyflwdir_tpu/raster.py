"""FlwdirRaster: the raster flow-direction object and factories.

API-parity port of the reference ``pyflwdir/pyflwdir.py``: ``from_array``,
``from_dem`` and the ``FlwdirRaster`` class with its basins / streams /
upscale / unit-catchment / DEM method surface, dispatching to the TPU
kernels in :mod:`pyflwdir_tpu.ops` and the algorithm modules.
"""

from __future__ import annotations

import pickle
import warnings

import numpy as np

import jax
import jax.numpy as jnp

from . import basins as basins_mod
from . import dem as dem_mod
from . import regions as regions_mod
from . import streams as streams_mod
from . import subgrid as subgrid_mod
from . import upscale as upscale_mod
from .codecs import FTYPES, infer_ftype
from .flwdir import Flwdir
from .gridtools import features as _features
from .ops import graph
from .ops.walk import paths as _paths
from .ops.walk import snap_walk
from .utils import geodesy
from .utils.affine import IDENTITY, Affine, array_bounds

__all__ = ["FlwdirRaster", "from_array", "from_dem"]


def from_dem(
    data,
    nodata=-9999.0,
    max_depth=-1.0,
    transform=IDENTITY,
    latlon=False,
    outlets="edge",
    engine="auto",
):
    """Flow direction raster from a DEM by steepest gradient.

    Parity: reference pyflwdir.py:51-102 — priority-flood depression
    filling (Wang & Liu 2006) emits D8 directions which are parsed into a
    FlwdirRaster.

    ``engine="device"`` replaces the O(n log n) single-core host heap by
    the device fill (:mod:`pyflwdir_tpu.ops.fill`: strip Pallas kernels
    running the erosion row recurrence at VPU latency + steepest-
    descent/flat-resolution D8). The filled *surface* matches the host
    kernel exactly (verified bitwise at 8192^2; 8.3 s vs 37 s host
    heap); the derived D8 directions may differ on ties/flats (both are
    valid drainages of the same surface, like the reference's heap-pop
    order-dependent choices). ``"auto"`` picks the device above
    ``_FROM_DEM_DEV_MIN`` cells on an accelerator backend and the host
    heap otherwise.
    """
    if engine not in ("auto", "host", "device"):
        raise ValueError(f"Unknown engine: {engine}")
    data = np.asarray(data)
    if engine == "auto":
        engine = (
            "device"
            if _accel_backend() and data.size >= _FROM_DEM_DEV_MIN
            else "host"
        )
    d8 = None
    if engine == "device":
        from .ops.fill import d8_from_filled, fill_depressions_dev

        filled = fill_depressions_dev(
            data, nodata=nodata, outlets=outlets, max_depth=max_depth
        )
        d8 = np.asarray(d8_from_filled(filled, nodata=nodata))
    if d8 is None:
        d8 = dem_mod.fill_depressions(
            data, nodata=nodata, max_depth=max_depth, outlets=outlets
        )[1]
    return from_array(
        d8, ftype="d8", check_ftype=False, transform=transform, latlon=latlon
    )


# device-fill threshold for from_dem (cells); the host heap costs
# O(n log n) single-core minutes past this scale
_FROM_DEM_DEV_MIN = 1 << 21


def _accel_backend():
    """True when the default backend is an accelerator (from_dem auto)."""
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


def _get_idxs_dtype(n):
    """Smallest index dtype for n cells (int32 / int64).

    The reference additionally uses uint32 for the 2^31..2^32 range
    (pyflwdir.py:105-127); this framework uses a signed -1 sentinel
    throughout so it steps from int32 directly to int64.
    """
    return np.int32 if n < 2147483647 else np.int64


def from_array(
    data,
    ftype="infer",
    check_ftype=True,
    mask=None,
    transform=IDENTITY,
    latlon=False,
    **kwargs,
):
    """Parse a flow direction raster to an actionable FlwdirRaster.

    Parity: reference pyflwdir.py:130-205.
    """
    if ftype == "infer":
        ftype = infer_ftype(data)
        check_ftype = False
    if ftype == "nextxy":
        shape = data[0].shape
        ndim = data[0].ndim
    else:
        data = np.asarray(data)
        ndim = data.ndim
        shape = data.shape

    if ndim != 2:
        raise ValueError("The FlwdirRaster should be 2 dimensional")

    fd = FTYPES[ftype]
    if check_ftype and not fd.isvalid(data):
        raise ValueError(f'The flow direction data with type "{ftype}" is invalid.')
    if mask is not None:
        mask = np.asarray(mask)
        if mask.shape != (shape if ftype != "nextxy" else shape):
            raise ValueError('"mask" shape does not match with data shape')
        if ftype == "nextxy":
            data = tuple(np.where(mask != 0, d, fd._mv) for d in data)
        else:
            data = np.where(mask != 0, data, fd._mv)

    dtype = _get_idxs_dtype(shape[0] * shape[1])
    idxs_ds, idxs_pit, _ = fd.from_array(data, dtype=dtype)
    if ftype == "nextxy":
        pit_values = fd.ispit(np.asarray(data[0]).flat[idxs_pit])
    else:
        pit_values = fd.ispit(np.asarray(data).flat[idxs_pit])
    idxs_outlet = idxs_pit[pit_values]

    return FlwdirRaster(
        idxs_ds=idxs_ds,
        idxs_pit=idxs_pit,
        idxs_outlet=idxs_outlet,
        shape=shape,
        ftype=ftype,
        transform=transform,
        latlon=latlon,
        **kwargs,
    )


class FlwdirRaster(Flwdir):
    """Flow direction raster array parsed to general actionable format.

    Parity: reference ``FlwdirRaster`` (pyflwdir.py:208-1566).
    """

    def __init__(
        self,
        idxs_ds,
        shape,
        ftype,
        idxs_pit=None,
        idxs_outlet=None,
        idxs_seq=None,
        nnodes=None,
        transform=IDENTITY,
        latlon=False,
        cache=True,
    ):
        super().__init__(
            idxs_ds=idxs_ds,
            idxs_pit=idxs_pit,
            idxs_outlet=idxs_outlet,
            idxs_seq=idxs_seq,
            nnodes=nnodes,
            cache=cache,
        )
        if ftype not in FTYPES:
            ftypes_str = '" ,"'.join(list(FTYPES.keys()))
            raise ValueError(
                f'Unknown flow direction type: "{ftype}", select from {ftypes_str}'
            )
        self.ftype = ftype
        self._core = FTYPES[ftype]

        if int(np.multiply(*np.array(shape, np.uint64))) != self.size:
            raise ValueError(
                f"Invalid FlwdirRaster: shape {shape} does not match size {self.size}"
            )
        self.shape = tuple(shape)
        self.set_transform(transform, latlon)

    @property
    def _dict(self):
        return {
            "ftype": self.ftype,
            "shape": self.shape,
            "nnodes": self.nnodes,
            "transform": self.transform,
            "latlon": self.latlon,
            "idxs_ds": self.idxs_ds,
            "idxs_seq": self._seq,
            "idxs_pit": self._pit,
        }

    @property
    def ncells(self):
        return self.nnodes

    ### SET/MODIFY PROPERTIES ###

    def add_pits(self, idxs=None, xy=None, streams=None):
        """Add pits; snap to streams if given. Parity: pyflwdir.py:301-316."""
        idxs1 = self._check_idxs_xy(idxs, xy, streams)
        Flwdir.add_pits(self, idxs=idxs1)

    def set_transform(self, transform, latlon=False):
        """Set the affine transform. Parity: pyflwdir.py:318-337."""
        if not isinstance(transform, Affine):
            try:
                transform = Affine(*transform)
            except TypeError:
                raise ValueError("Invalid transform.")
        self.transform = transform
        self.latlon = bool(latlon)

    ### WRITE / EXPORT ###

    def to_array(self, ftype=None):
        """Dense 2-D flow direction raster. Parity: pyflwdir.py:341-360."""
        if ftype is None:
            ftype = self.ftype
        if ftype not in FTYPES:
            raise ValueError(f'ftype "{ftype}" unknown')
        return FTYPES[ftype].to_array(self.idxs_ds, self.shape, mv=self._mv)

    @staticmethod
    def load(fn):
        """Load serialized FlwdirRaster object from file."""
        with open(fn, "rb") as handle:
            kwargs = pickle.load(handle)
        return FlwdirRaster(**kwargs)

    ### SPATIAL METHODS ###

    def index(self, xs, ys, **kwargs):
        """Linear cell indices of x/y coordinates."""
        return geodesy.coords_to_idxs(xs, ys, self.transform, self.shape, **kwargs)

    def xy(self, idxs, **kwargs):
        """Cell-center x/y coordinates of linear indices."""
        return geodesy.idxs_to_coords(idxs, self.transform, self.shape, **kwargs)

    @property
    def bounds(self):
        """[xmin, ymin, xmax, ymax] raster bounding box."""
        return np.array(array_bounds(*self.shape, self.transform), dtype=np.float64)

    @property
    def extent(self):
        """[xmin, xmax, ymin, ymax] raster extent (cartopy order)."""
        xmin, ymin, xmax, ymax = self.bounds
        return np.array([xmin, xmax, ymin, ymax], dtype=np.float64)

    @property
    def distnc(self):
        """Distance to outlet [m]."""
        if "distnc" in self._cached:
            return self._cached["distnc"]
        distnc = self.stream_distance(unit="m")
        if self.cache:
            self._cached["distnc"] = distnc
        return distnc

    @property
    def area(self):
        """Cell area [m2]."""
        if "area" in self._cached:
            return self._cached["area"]
        area = geodesy.area_grid(self.transform, self.shape, self.latlon, unit="m2")
        if self.cache:
            self._cached["area"] = area
        return area

    ### LOCAL METHODS ###

    def path(
        self, idxs=None, xy=None, mask=None, max_length=None, unit="cell",
        direction="down",
    ):
        """Paths from seed points. Parity: pyflwdir.py:443-500."""
        unit = str(unit).lower()
        if unit not in ["m", "cell"]:
            raise ValueError(f'Unknown unit: {unit}, select from ["m", "cell"].')
        direction = str(direction).lower()
        if direction not in ["up", "down"]:
            raise ValueError(
                f'Unknown flow direction: {direction}, select from ["up", "down"].'
            )
        return _paths(
            self._check_idxs_xy(idxs, xy),
            self.idxs_ds if direction == "down" else self.idxs_us_main,
            mask=self._check_data(mask, "mask", optional=True),
            max_length=max_length,
            real_length=unit == "m",
            ncol=self.shape[1],
            latlon=self.latlon,
            transform=self.transform,
        )

    def snap(
        self, idxs=None, xy=None, mask=None, max_length=None, unit="cell",
        direction="down",
    ):
        """Snap seed points along the network. Parity: pyflwdir.py:502-560."""
        unit = str(unit).lower()
        if unit not in ["m", "cell"]:
            raise ValueError(f'Unknown unit: {unit}, select from ["m", "cell"].')
        direction = str(direction).lower()
        if direction not in ["up", "down"]:
            raise ValueError(
                f'Unknown flow direction: {direction}, select from ["up", "down"].'
            )
        return snap_walk(
            self._check_idxs_xy(idxs, xy),
            self.idxs_ds if direction == "down" else self.idxs_us_main,
            mask=self._check_data(mask, "mask", optional=True),
            max_length=max_length,
            real_length=unit == "m",
            ncol=self.shape[1],
            latlon=self.latlon,
            transform=self.transform,
        )

    ### BASINS ###

    def basins(self, idxs=None, xy=None, ids=None, **kwargs):
        """(Sub)basin map with unique IDs. Parity: pyflwdir.py:564-599."""
        if idxs is None and xy is None:
            idxs = self.idxs_pit
        else:
            idxs = self._check_idxs_xy(idxs, xy, **kwargs)
        if ids is not None:
            ids = np.atleast_1d(ids).ravel()
            if ids.size != idxs.size:
                raise ValueError("IDs size does not match size of idxs.")
            elif np.any(ids == 0):
                raise ValueError("IDs cannot contain a value zero.")
        cut = np.zeros(self.size, dtype=bool)
        cut[np.asarray(idxs)] = True
        tp = self._tp_down(cut=cut)
        if tp is not None:
            # root-id broadcast over the graph cut at the outlets: one
            # downward sweep, exact in int32
            ids_np = (
                np.arange(1, np.asarray(idxs).size + 1, dtype=np.uint32)
                if ids is None
                else np.asarray(ids)
            )
            if ids_np.size and int(ids_np.max()) >= 2**31:
                tp = None  # exact int32 downward sweep cannot hold the ids
        if tp is not None:
            w = np.zeros(self.size, np.int32)
            w[np.asarray(idxs)] = ids_np.astype(np.int32)
            out = np.asarray(tp.accumulate_down(jnp.asarray(w)))
            valid = self._idxs_ds != self._mv
            basids = np.where(valid, out, 0).astype(ids_np.dtype)
            return basids.reshape(self.shape)
        basids = np.asarray(basins_mod.basins(self._jds, idxs, ids=None if ids is None else jnp.asarray(ids)))
        return basids.reshape(self.shape)

    def subbasins_streamorder(self, strord=None, mask=None, min_sto=-2):
        """Subbasins split at stream-order changes. Parity: pyflwdir.py:601-629."""
        subbas, idxs_out = basins_mod.subbasins_streamorder(
            self._jds,
            jnp.asarray(self._check_data(strord, "strord")),
            self.rank.ravel(),
            mask=None
            if mask is None
            else jnp.asarray(self._check_data(mask, "mask") != 0),
            min_sto=min_sto,
        )
        return np.asarray(subbas).reshape(self.shape), idxs_out

    def subbasins_pfafstetter(self, depth=1, uparea=None, upa_min=0.0):
        """Pfafstetter subbasins. Parity: pyflwdir.py:631-663."""
        uparea = self._check_data(uparea, "uparea")
        mask = uparea >= upa_min if upa_min is not None else None
        subbas, idxs_out = basins_mod.subbasins_pfafstetter(
            self.idxs_pit,
            self._jds,
            jnp.asarray(self.idxs_us_main),
            jnp.asarray(uparea),
            self.rank.ravel(),
            mask=None if mask is None else jnp.asarray(mask),
            depth=depth,
        )
        return np.asarray(subbas).reshape(self.shape), idxs_out

    def subbasins_area(self, area_min, uparea=None):
        """Subbasins with minimum area. Parity: pyflwdir.py:665-692."""
        subbas, idxs_out = basins_mod.subbasins_area(
            self._idxs_ds,
            self.rank.ravel(),
            np.asarray(self.idxs_us_main),
            np.asarray(self._check_data(uparea, "uparea", unit="km2")),
            area_min,
        )
        return np.asarray(subbas).reshape(self.shape), idxs_out

    def basin_bounds(self, basins=None, **kwargs):
        """Basin bounding boxes. Parity: pyflwdir.py:694-718."""
        return regions_mod.region_bounds(
            self._check_data(basins, "basins", flatten=False, **kwargs),
            transform=self.transform,
        )

    def basin_outlets(self, basins):
        """Outlet cell per basin. Parity: pyflwdir.py:720-740."""
        return regions_mod.region_outlets(
            self._check_data(basins, "basins"), self._idxs_ds
        )

    def interbasin_mask(self, region, stream=None):
        """Most downstream contiguous area within region. Parity: pyflwdir.py:742-766."""
        mask = basins_mod.interbasin_mask(
            self._jds,
            jnp.asarray(self._check_data(region, "region") != 0),
            stream=None
            if stream is None
            else jnp.asarray(self._check_data(stream, "stream") != 0),
        )
        return np.asarray(mask).reshape(self.shape)

    ### ACCUMULATE ###

    # below this size the whole padded graph fits the single-chunk fused
    # VMEM router (ops/accel.py) — measured ~4x faster than the two-pass
    # tile plan on the Rhine (the tile plan's per-tile fixed costs don't
    # amortize until the grid spans many hundreds of tiles)
    _TILE_PLAN_MIN = 1 << 21

    def _tile_plan(self):
        """Build (once) and cache the hierarchical tile plan. Returns None
        when the build legitimately cannot proceed (coarse-graph overflow:
        shard across devices instead) — with a warning, so the silent fall
        back to host sweeps is visible; unexpected errors propagate."""
        if "tile_plan" not in self._cached:
            from .ops.tile_plan import build_tile_plan

            try:
                self._cached["tile_plan"] = build_tile_plan(
                    self._idxs_ds, self.shape
                )
            except ValueError as e:
                warnings.warn(
                    f"tile plan build failed ({e}); falling back to host"
                    " sweeps for this object"
                )
                self._cached["tile_plan"] = None
        return self._cached["tile_plan"]

    def save_plans(self, path, down=True):
        """Persist this raster's accumulation plan to ``path`` (a
        directory) so a future process can :meth:`load_plans` in seconds
        instead of re-running the minutes-scale plan build. With
        ``down=True`` the downward-transpose tables (stream_distance /
        basins / HAND / fillnodata-up at scale) are built and included.

        The reference keeps its analogous cached topological order only
        in memory (flwdir.py:164-168); continental plans warrant a disk
        artifact."""
        tp = self._tile_plan()
        if tp is None:
            raise ValueError("tile plan build failed; nothing to save")
        return tp.save(path, down=down)

    def load_plans(self, path, mmap=True):
        """Load a :meth:`save_plans` directory into this object's plan
        cache (validating the grid shape)."""
        from .ops.tile_plan import TilePlan

        tp = TilePlan.load(path, mmap=mmap)
        if tuple(tp.shape) != tuple(self.shape):
            raise ValueError(
                f"plan shape {tp.shape} does not match raster {self.shape}"
            )
        self._cached["tile_plan"] = tp
        return tp

    def _accumulate_dev(self, data):
        """Flow accumulation through the cached hierarchical tile plan
        (ops/tile_plan.py: per-tile VMEM DFS-interval kernels + a small
        coarse pass) for HBM-scale grids, or the 1-D graph plans
        (Flwdir._accumulate_dev: fused single-chunk router / compensated
        sort-based kernel) when the grid fits a single chunk."""
        if self.size <= self._TILE_PLAN_MIN:
            return super()._accumulate_dev(data)
        tp = self._tile_plan()
        if tp is not None:
            return tp.accumulate(data)
        return super()._accumulate_dev(data)

    def stream_order(self, type="strahler", mask=None):
        """Strahler / classic stream order map.

        Above the tile-plan threshold the Strahler map runs on-chip
        through the cached hierarchical tile plan (one child-count
        stencil + one accumulation per order level,
        ops/order.py:strahler_tile_plan) instead of the sequential host
        sweep. Parity: reference flwdir.py:508-547.
        """
        if (
            str(type).lower() == "strahler"
            and mask is None
            and self.ftype in ("d8",)
            and self.size > self._TILE_PLAN_MIN
        ):
            if "strord" in self._cached:
                return self._cached["strord"].reshape(self.shape)
            tp = self._tile_plan()
            if tp is not None:
                from .codecs import d8 as d8c
                from .ops.order import strahler_tile_plan

                codes = d8c.to_array(self._idxs_ds, self.shape)
                strord = np.asarray(strahler_tile_plan(codes, tp))
                if self.cache:
                    self._cached["strord"] = strord.ravel()
                return strord.reshape(self.shape)
        return super().stream_order(type=type, mask=mask)

    def upstream_area(self, unit="cell"):
        """Upstream area map. Parity: pyflwdir.py:770-801."""
        unit = str(unit).lower()
        if unit not in geodesy.AREA_FACTORS:
            fstr = '", "'.join(geodesy.AREA_FACTORS.keys())
            raise ValueError(f'Unknown unit: {unit}, select from "{fstr}".')
        if unit == "cell":
            area = np.ones(self.size, dtype=np.int32)
        else:
            area = np.asarray(self.area).ravel() / geodesy.AREA_FACTORS[unit]
        # the cached hierarchical tile plan (ops/tile_plan.py) — same fast
        # path as Flwdir.accuflux/upstream_area; jnp.asarray keeps float64
        # when x64 is enabled (tests/CPU) and float32 otherwise (TPU)
        uparea = np.asarray(self._accumulate_dev(jnp.asarray(area)))
        uparea = np.where(np.asarray(self.mask), uparea, -9999)
        out = uparea.astype(np.float64 if area.dtype.kind == "f" else uparea.dtype)
        return out.reshape(self.shape)

    ### STREAMS ###

    def inflow_idxs(self, region):
        """Most upstream cells flowing into region. Parity: pyflwdir.py:804-818."""
        region = jnp.asarray(self._check_data(region, "region") != 0)
        n = self.size
        jds = self._jds
        ar = jnp.arange(n, dtype=jds.dtype)
        valid = jds >= 0
        ds = graph.self_loop(jds)
        cand = valid & ~region & region[ds] & (ds != ar)
        cnt = graph.accumulate(jds, cand.astype(jnp.int32), tree=self._tree)
        out = np.where(np.asarray(cand & (cnt == 1)))[0]
        return out.astype(self._idxs_ds.dtype)

    def outflow_idxs(self, region):
        """Most downstream cells within region. Parity: pyflwdir.py:820-835."""
        region = jnp.asarray(self._check_data(region, "region") != 0)
        n = self.size
        jds = self._jds
        ar = jnp.arange(n, dtype=jds.dtype)
        valid = jds >= 0
        ds = graph.self_loop(jds)
        crossing = valid & region & ((ds == ar) | ~region[ds])
        below = graph.path_sum(jds, crossing.astype(jnp.int32))
        root = graph.reach(jds, None)
        n_below = below - crossing.astype(jnp.int32) + crossing[root].astype(jnp.int32)
        out = np.where(np.asarray(crossing & (n_below == 0)))[0]
        return out.astype(self._idxs_ds.dtype)

    def _tp_down(self, cut=None):
        """Tile plan for downward-path ops (ops/tile_plan.py
        accumulate_down), optionally on the graph *cut* at ``cut`` cells
        (made pits, so they act as outlets for everything upstream).
        None below the size threshold or when the build fails."""
        if self.size <= self._TILE_PLAN_MIN:
            return None
        from .ops.tile_plan import build_tile_plan

        if cut is None:
            return self._tile_plan()
        try:
            ar = np.arange(self.size, dtype=self._idxs_ds.dtype)
            valid = self._idxs_ds != self._mv
            ids2 = np.where(np.asarray(cut, bool) & valid, ar, self._idxs_ds)
            return build_tile_plan(ids2, self.shape)
        except ValueError as e:
            warnings.warn(
                f"cut-graph tile plan build failed ({e}); falling back to"
                " the host sweep"
            )
            return None

    def stream_distance(self, mask=None, unit="cell"):
        """Distance to outlet or downstream mask cell. Parity: pyflwdir.py:837-863.

        Above the tile-plan threshold this is one
        :meth:`TilePlan.accumulate_down` sweep (downstream-path sum of
        step lengths; mask cells become cut-graph pits) on the chip.
        """
        unit = str(unit).lower()
        if unit not in ["m", "cell"]:
            raise ValueError(f'Unknown unit: {unit}, select from "m", "cell"')
        mask = self._check_data(mask, "mask", optional=True)
        cutm = None if mask is None else (mask != 0)
        tp = self._tp_down(cut=cutm)
        if tp is not None:
            ar = np.arange(self.size, dtype=np.int64)
            valid = self._idxs_ds != self._mv
            ids2 = self._idxs_ds.astype(np.int64)
            if cutm is not None:
                ids2 = np.where(cutm & valid, ar, ids2)
            moving = (ids2 >= 0) & (ids2 != ar)
            if unit == "cell":
                out = np.asarray(
                    tp.accumulate_down(jnp.asarray(moving.astype(np.int32)))
                )
                dist = np.where(valid, out, -9999).astype(np.int32)
            else:
                w = np.asarray(
                    geodesy.distance_grid(
                        ids2,
                        self.shape,
                        latlon=self.latlon,
                        transform=self.transform,
                    ),
                    np.float32,
                ).ravel()
                w = np.where(moving, w, 0).astype(np.float32)
                out = np.asarray(tp.accumulate_down(jnp.asarray(w)))
                dist = np.where(valid, out, -9999.0).astype(np.float32)
            return dist.reshape(self.shape)
        dist = np.asarray(
            streams_mod.stream_distance(
                self._jds,
                self.shape,
                mask=None if mask is None else jnp.asarray(mask != 0),
                real_length=unit != "cell",
                latlon=self.latlon,
                transform=self.transform,
            )
        )
        return dist.reshape(self.shape)

    def vectorize(self, mask=None, xs=None, ys=None, direction="down", **kwargs):
        """One LineString feature per flow direction. Parity: pyflwdir.py:865-892."""
        nxt = self.idxs_ds if direction == "down" else self.idxs_us_main
        mask = self._check_data(mask, "mask", optional=True)
        valid = nxt != self._mv
        if mask is not None:
            valid &= mask != 0
        # one (k, 2) array instead of k per-cell arrays — features()
        # iterates its rows (no per-cell Python allocation)
        w = np.flatnonzero(valid)
        idxs = np.stack([w.astype(nxt.dtype), nxt[w]], axis=1)
        return self.geofeatures(idxs, xs=xs, ys=ys, **kwargs)

    def streams(
        self,
        mask=None,
        min_sto=1,
        xs=None,
        ys=None,
        idxs_out=None,
        max_len=0,
        direction="up",
        **kwargs,
    ):
        """Stream segments as LineString features. Parity: pyflwdir.py:894-974."""
        if mask is not None:
            mask = self._check_data(mask, "mask")
        elif min_sto > 1:
            strord = self._check_data(kwargs.get("strord"), "strord")
            mask = strord >= min_sto
            kwargs.update(strord=strord)

        if idxs_out is not None:
            idxs = subgrid_mod.segment_indices(
                idxs_out=np.asarray(idxs_out).ravel(),
                idxs_nxt=self.idxs_us_main if direction == "up" else self.idxs_ds,
                mask=mask,
                max_len=max_len,
            )
            if direction == "up":
                idxs = [idxs0[::-1] for idxs0 in idxs]
        else:
            nup = np.asarray(graph.upstream_count(self._jds, mask=None if mask is None else jnp.asarray(mask != 0)))
            idxs = streams_mod.streams(
                self._idxs_ds,
                self.rank.ravel(),
                nup,
                mask=None if mask is None else (np.asarray(mask) != 0),
                max_len=max_len,
            )
        return self.geofeatures(idxs, xs=xs, ys=ys, **kwargs)

    def geofeatures(self, flowpaths, xs=None, ys=None, **kwargs):
        """LineString features for flow paths. Parity: pyflwdir.py:976-1009."""
        return _features(
            flowpaths=flowpaths,
            xs=self._check_data(xs, "xs", optional=True),
            ys=self._check_data(ys, "ys", optional=True),
            transform=self.transform,
            shape=self.shape,
            **kwargs,
        )

    ### UPSCALE ###

    def upscale(self, scale_factor, method="ihu", uparea=None, **kwargs):
        """Upscale the flow direction network. Parity: pyflwdir.py:1013-1091."""
        if self.ftype not in ["d8", "ldd"]:
            raise ValueError(
                "The upscale method only works for D8 or LDD flow directon data."
            )
        methods = ["ihu", "eam_plus", "com2", "com", "eam", "dmm"]
        method = str(method).lower()
        if method not in methods:
            methodstr = "', '".join(methods)
            raise ValueError(f"Unknown method: {method}, select from: '{methodstr}'")
        if "com" in method:
            method_new = {"com": "eam_plus", "com2": "ihu"}.get(method)
            warnings.warn(f"{method} renamed to {method_new}.", DeprecationWarning)
            method = method_new
        idxs_ds1, idxs_out, shape1 = getattr(upscale_mod, method)(
            subidxs_ds=self._idxs_ds,
            subuparea=np.asarray(self._check_data(uparea, "uparea")),
            subshape=self.shape,
            cellsize=scale_factor,
            **kwargs,
        )
        transform1 = Affine(
            self.transform[0] * scale_factor,
            self.transform[1],
            self.transform[2],
            self.transform[3],
            self.transform[4] * scale_factor,
            self.transform[5],
        )
        flw1 = FlwdirRaster(
            idxs_ds=idxs_ds1,
            shape=shape1,
            transform=transform1,
            ftype=self.ftype,
            latlon=self.latlon,
        )
        if not flw1.isvalid:
            raise ValueError(
                "The upscaled flow direction network is invalid. "
                + "Please provide a minimal reproducible example."
            )
        return flw1, idxs_out.reshape(shape1)

    def upscale_error(self, other, idxs_out):
        """Validity of upscaled flow directions. Parity: pyflwdir.py:1093-1121."""
        assert self._mv == other._mv
        flwerr = upscale_mod.upscale_error(
            np.asarray(other._check_data(idxs_out, "idxs_out")),
            other._idxs_ds,
            self._idxs_ds,
        )[0]
        return flwerr.reshape(other.shape)

    ### UNIT CATCHMENTS ###

    def ucat_outlets(self, cellsize, uparea=None, method="eam_plus"):
        """Unit-catchment outlet pixels. Parity: pyflwdir.py:1125-1157."""
        methods = ["eam_plus", "dmm"]
        method = str(method).lower()
        if method not in methods:
            methodstr = "', '".join(methods)
            raise ValueError(f"Unknown method: {method}, select from: '{methodstr}'")
        idxs_out, shape1 = subgrid_mod.outlets(
            idxs_ds=self._idxs_ds,
            uparea=np.asarray(self._check_data(uparea, "uparea")),
            cellsize=int(cellsize),
            shape=self.shape,
            method=method,
        )
        return idxs_out.reshape(shape1)

    def ucat_area(self, idxs_out, unit="cell"):
        """Unit-catchment map and areas. Parity: pyflwdir.py:1159-1191."""
        unit = str(unit).lower()
        if unit not in geodesy.AREA_FACTORS:
            fstr = '", "'.join(geodesy.AREA_FACTORS.keys())
            raise ValueError(f'Unknown unit: {unit}, select from "{fstr}".')
        if unit == "cell":
            area = np.ones(self.size, dtype=np.int32)
        else:
            area = np.asarray(self.area).ravel() / geodesy.AREA_FACTORS[unit]
        ucat_map, ucat_are = subgrid_mod.ucat_area(
            idxs_out=np.asarray(idxs_out).ravel(),
            idxs_ds=self._jds,
            area=jnp.asarray(area),
        )
        return (
            np.asarray(ucat_map).reshape(self.shape),
            np.asarray(ucat_are).reshape(np.asarray(idxs_out).shape),
        )

    def ucat_volume(self, idxs_out, hand, depths=np.arange(0.5, 3.0, 0.5, dtype=np.float32)):
        """Unit-catchment flood volumes per depth. Parity: pyflwdir.py:1193-1225."""
        ucat_map, ucat_vol = subgrid_mod.ucat_volume(
            idxs_out=np.asarray(idxs_out).ravel(),
            idxs_ds=self._jds,
            area=jnp.asarray(np.asarray(self.area).ravel()),
            hand=jnp.asarray(self._check_data(hand, "hand")),
            depths=depths,
        )
        shape_out = (len(depths), *np.asarray(idxs_out).shape)
        return (
            np.asarray(ucat_map).reshape(self.shape),
            np.asarray(ucat_vol).reshape(shape_out),
        )

    def subgrid_rivlen(self, idxs_out, mask=None, direction="up", unit="cell"):
        """Subgrid river length. Parity: pyflwdir.py:1227-1274."""
        direction = str(direction).lower()
        if direction not in ["up", "down"]:
            raise ValueError(
                f'Unknown flow direction: {direction}, select from ["up", "down"].'
            )
        if unit not in ["m", "cell"]:
            raise ValueError(f'Unknown unit: {unit}, select from ["m", "cell"]')
        if idxs_out is None:
            idxs_out = np.arange(self.size, dtype=np.intp).reshape(self.shape)
        distnc = self.distnc if unit == "m" else self.stream_distance(unit=unit)
        rivlen = subgrid_mod.segment_length(
            idxs_out=np.asarray(idxs_out).ravel(),
            idxs_nxt=self.idxs_ds if direction == "down" else self.idxs_us_main,
            mask=self._check_data(mask, "mask", optional=True),
            distnc=np.asarray(distnc).ravel(),
        )
        return rivlen.reshape(np.asarray(idxs_out).shape)

    def subgrid_rivslp(
        self, idxs_out, elevtn, length=1000, direction="both", method="mean", mask=None
    ):
        """Subgrid river slope. Parity: pyflwdir.py:1276-1342."""
        direction = str(direction).lower()
        if direction not in ["both", "up", "down"]:
            raise ValueError(
                f'Unknown flow direction: {direction}, select from ["both", "up", "down"].'
            )
        if idxs_out is None:
            idxs_out = np.arange(self.size, dtype=np.intp).reshape(self.shape)
        if direction == "both":
            rivslp = subgrid_mod.fixed_length_slope(
                idxs_out=np.asarray(idxs_out).ravel(),
                idxs_ds=self._idxs_ds,
                idxs_us_main=np.asarray(self.idxs_us_main),
                elevtn=np.asarray(self._check_data(elevtn, "elevtn")),
                distnc=np.asarray(self.distnc).ravel(),
                length=length,
                mask=self._check_data(mask, "mask", optional=True),
                lstsq=method == "lstsq",
            )
        else:
            rivslp = subgrid_mod.segment_slope(
                idxs_out=np.asarray(idxs_out).ravel(),
                idxs_nxt=self.idxs_ds if direction == "down" else self.idxs_us_main,
                elevtn=np.asarray(self._check_data(elevtn, "elevtn")),
                distnc=np.asarray(self.distnc).ravel(),
                mask=self._check_data(mask, "mask", optional=True),
                lstsq=method == "lstsq",
            )
        return rivslp.reshape(np.asarray(idxs_out).shape)

    def subgrid_rivavg(
        self, idxs_out, data, weights=None, nodata=-9999.0, mask=None, direction="up"
    ):
        """Subgrid segment average. Parity: pyflwdir.py:1344-1398."""
        direction = str(direction).lower()
        if direction not in ["up", "down"]:
            raise ValueError(
                f'Unknown flow direction: {direction}, select from ["up", "down"].'
            )
        if idxs_out is None:
            idxs_out = np.arange(self.size, dtype=np.intp).reshape(self.shape)
        if weights is None:
            weights = np.ones(self.size, dtype=np.float32)
        rivavg = subgrid_mod.segment_average(
            idxs_out=np.asarray(idxs_out).ravel(),
            idxs_nxt=self.idxs_ds if direction == "down" else self.idxs_us_main,
            data=np.asarray(self._check_data(data, "data")),
            weights=np.asarray(weights).ravel(),
            nodata=nodata,
            mask=self._check_data(mask, "mask", optional=True),
        )
        return rivavg.reshape(np.asarray(idxs_out).shape)

    def subgrid_rivmed(
        self, idxs_out, data, weights=None, nodata=-9999.0, mask=None, direction="up"
    ):
        """Subgrid segment median. Parity: pyflwdir.py:1400-1454."""
        direction = str(direction).lower()
        if direction not in ["up", "down"]:
            raise ValueError(
                f'Unknown flow direction: {direction}, select from ["up", "down"].'
            )
        if idxs_out is None:
            idxs_out = np.arange(self.size, dtype=np.intp).reshape(self.shape)
        if weights is None:
            weights = np.ones(self.size, dtype=np.float32)
        rivmed = subgrid_mod.segment_median(
            idxs_out=np.asarray(idxs_out).ravel(),
            idxs_nxt=self.idxs_ds if direction == "down" else self.idxs_us_main,
            data=np.asarray(self._check_data(data, "data")),
            weights=np.asarray(weights).ravel(),
            nodata=nodata,
            mask=self._check_data(mask, "mask", optional=True),
        )
        return rivmed.reshape(np.asarray(idxs_out).shape)

    ### ELEVATION ###

    def dem_dig_d4(self, elevtn, rivmsk=None, nodata=-9999.0):
        """D4-connected channel elevation. Parity: pyflwdir.py:1458-1483."""
        elv_out = dem_mod.dig_4connectivity(
            self._idxs_ds,
            self.rank.ravel(),
            np.asarray(self._check_data(elevtn, "elevtn")),
            shape=self.shape,
            mask=self._check_data(rivmsk, "rivmsk", optional=True),
            nodata=nodata,
        )
        return elv_out.reshape(self.shape).astype(np.asarray(elevtn).dtype)

    def fillnodata(self, data, nodata, direction="down", how="max"):
        """Fill nodata cells from the nearest valid up-/downstream value.

        Parity: reference flwdir.py:360-392. Above the tile-plan
        threshold, ``direction="up"`` (fill from the first valid value
        *downstream*) runs as one cut-graph root broadcast on the chip
        (:meth:`TilePlan.accumulate_down`)."""
        if str(direction).lower() == "up" and self.size > self._TILE_PLAN_MIN:
            dflat = np.asarray(self._check_data(data, "data"))
            # dtype routing for exactness (the downward sweep picks the
            # accumulator from the weight dtype via TilePlan._acc_cfg):
            # integers ride int32/int64 exactly when they fit, big ints
            # fall back to the exact pointer-doubling path; floats run in
            # the backend float width (float32 on chip — values needing a
            # >24-bit mantissa are rounded, like every float32 raster op)
            if dflat.dtype.kind in "iu":
                lo = int(dflat.min(initial=0))
                hi = int(dflat.max(initial=0))
                x64 = (
                    jax.dtypes.canonicalize_dtype(jnp.int64) == jnp.int64
                )
                if -(2**31) <= lo and hi < 2**31:
                    wdt = np.int32
                elif x64 and -(2**63) <= lo and hi < 2**63:
                    wdt = np.int64
                else:  # values the device sweep cannot hold exactly
                    return super().fillnodata(
                        data, nodata, direction=direction, how=how
                    )
            else:
                wdt = np.float32
            has = dflat != nodata
            valid = self._idxs_ds != self._mv
            tp = self._tp_down(cut=has & valid)
            if tp is not None:
                ar = np.arange(self.size, dtype=np.int64)
                is_root = ((has) | (self._idxs_ds.astype(np.int64) == ar)) & valid
                w = np.where(
                    is_root & has, dflat.astype(wdt), 0
                ).astype(wdt)
                a = np.asarray(tp.accumulate_down(jnp.asarray(w)))
                ok = np.asarray(
                    tp.accumulate_down(
                        jnp.asarray((is_root & has).astype(np.int32))
                    )
                ) > 0
                out = np.where(
                    valid & (dflat == nodata) & ok, a, dflat
                ).astype(np.asarray(data).dtype)
                return out.reshape(np.asarray(data).shape)
        return super().fillnodata(data, nodata, direction=direction, how=how)

    def hand(self, drain, elevtn):
        """Height above nearest drain. Parity: pyflwdir.py:1485-1511.

        Above the tile-plan threshold: cut the graph at the drain cells
        and broadcast each cut-root's elevation over its tree with one
        :meth:`TilePlan.accumulate_down` sweep (root-value broadcast —
        the path sum touches exactly one nonzero weight). On that path
        elevations ride float32 (on-chip storage format): values needing
        a >24-bit mantissa are rounded, like every float32 raster op;
        the small-grid path below the threshold is exact in the input
        dtype."""
        drain_arr = self._check_data(drain, "drain")
        elev_arr = self._check_data(elevtn, "elevtn")
        dr = np.asarray(drain_arr).ravel() != 0
        valid = self._idxs_ds != self._mv
        tp = self._tp_down(cut=dr)
        if tp is not None:
            ar = np.arange(self.size, dtype=np.int64)
            z = np.asarray(elev_arr, np.float32).ravel()
            is_root = (dr | (self._idxs_ds.astype(np.int64) == ar)) & valid
            w = np.where(is_root, z, 0).astype(np.float32)
            zroot = np.asarray(tp.accumulate_down(jnp.asarray(w)))
            hand = np.where(valid, z - zroot, -9999.0)
            hand = np.where(dr & valid, 0.0, hand)
            return hand.reshape(self.shape).astype(np.float64)
        hand = np.asarray(
            dem_mod.height_above_nearest_drain(
                self._jds,
                jnp.asarray(drain_arr),
                jnp.asarray(elev_arr),
            )
        )
        return hand.reshape(self.shape)

    def floodplains(self, elevtn, uparea=None, upa_min=1000, b=0.3):
        """Geomorphic floodplains. Parity: pyflwdir.py:1513-1544."""
        fldpln = np.asarray(
            dem_mod.floodplains(
                self._jds,
                jnp.asarray(self._check_data(elevtn, "elevtn")),
                jnp.asarray(self._check_data(uparea, "uparea", unit="km2")),
                upa_min=upa_min,
                b=b,
            )
        )
        return fldpln.reshape(self.shape)

    ### SHORTCUTS ###

    def _check_data(self, data, name, optional=False, flatten=True, **kwargs):
        """Check or derive-on-demand named data arrays.

        Parity: reference pyflwdir.py:1548-1559.
        """
        if data is None and optional:
            return None
        if data is None:
            if name == "uparea":
                data = self.upstream_area(**kwargs)
            elif name == "basins":
                data = self.basins(**kwargs)
            elif name == "strord":
                data = self.stream_order(**kwargs)
        return Flwdir._check_data(self, data, name, optional, flatten=flatten)

    def _check_idxs_xy(self, idxs=None, xy=None, streams=None):
        if (xy is not None and idxs is not None) or (xy is None and idxs is None):
            raise ValueError("Either idxs or xy should be provided.")
        elif xy is not None:
            idxs = self.index(*xy)
        return Flwdir._check_idxs_xy(self, idxs, streams)
