"""Flwdir: the graph-only flow-direction object (1-D networks).

API-parity port of the reference ``pyflwdir/flwdir.py`` ``Flwdir`` class:
same constructor contract, lazily cached properties and method surface,
but every kernel dispatches to the TPU pointer-doubling engine in
:mod:`pyflwdir_tpu.ops`. Inputs/outputs are numpy arrays (device arrays
are an internal detail cached per object).
"""

from __future__ import annotations

import pickle
import pprint

import numpy as np

import jax
import jax.numpy as jnp

from . import arithmetics, dem, rivers, streams
from .ops import graph
from .ops.walk import paths as _paths
from .ops.walk import snap_walk

__all__ = ["Flwdir", "from_dataframe"]


def get_loc_idx(idxs, idxs_ds):
    """Remap arbitrary node ids to local indices; missing downstream id
    means pit. Parity: reference flwdir.py:26-36 (vectorized via argsort
    searchsorted instead of a dict)."""
    idxs = np.asarray(idxs)
    idxs_ds = np.asarray(idxs_ds)
    sorter = np.argsort(idxs, kind="stable")
    pos = np.searchsorted(idxs[sorter], idxs_ds, sorter=sorter)
    pos_clip = np.minimum(pos, idxs.size - 1)
    found = idxs[sorter[pos_clip]] == idxs_ds
    local = sorter[pos_clip].astype(idxs.dtype)
    self_idx = np.arange(idxs.size, dtype=idxs.dtype)
    return np.where(found, local, self_idx)


def from_dataframe(df, ds_col="idx_ds"):
    """Create a Flwdir object from a dataframe with flow direction data.

    Parity: reference flwdir.py:39-57.
    """
    idxs_ds = df[ds_col].values
    idxs = df.index.values
    return Flwdir(idxs_ds=get_loc_idx(idxs=idxs, idxs_ds=idxs_ds))


class Flwdir(object):
    """Flow direction parsed to general actionable format.

    Parity: reference ``Flwdir`` (flwdir.py:69-811). Data contract:
    ``idxs_ds[i] == i`` marks a pit, negative (-1) marks missing.
    """

    def __init__(
        self,
        idxs_ds,
        area=None,
        idxs_pit=None,
        idxs_outlet=None,
        idxs_seq=None,
        nnodes=None,
        cache=True,
    ):
        self.size = idxs_ds.size
        if self.size <= 1:
            raise ValueError(f"Invalid FlwdirRaster: size {self.size}")
        self.shape = self.size

        # normalize missing values to -1 (the reference uses dtype-specific
        # sentinels: -1 / uint32-max / uint64-max, flwdir.py:112-117)
        idxs_ds = np.asarray(idxs_ds)
        if idxs_ds.dtype.kind == "u":
            mv = np.iinfo(idxs_ds.dtype).max
            signed = np.int64
            idxs_ds = np.where(idxs_ds == mv, -1, idxs_ds.astype(signed))
            if idxs_ds.max() < 2**31 - 1:
                idxs_ds = idxs_ds.astype(np.int32)
        self._idxs_ds = idxs_ds
        self._mv = -1
        self._pit = idxs_pit
        self.idxs_outlet = idxs_outlet
        self._seq = idxs_seq
        self._nnodes = nnodes

        self.cache = cache
        self._cached = dict()
        if area is not None:
            self._cached.update(area=area)

        if self.idxs_pit.size == 0:
            raise ValueError("Invalid FlwdirRaster: no pits found")

    ### REPRESENTATION ###

    def __str__(self):
        return pprint.pformat(self._dict)

    def __getitem__(self, idx):
        return self.idxs_ds[idx]

    ### INTERNAL DEVICE STATE ###

    @property
    def _jds(self):
        """Device copy of idxs_ds (int32/int64)."""
        if "jds" not in self._cached:
            self._cached["jds"] = jnp.asarray(self._idxs_ds)
        return self._cached["jds"]

    @property
    def _plan(self):
        """Cached DFS-interval accumulation plan (ops.plan.DfsPlan)."""
        if "plan" not in self._cached:
            from .ops.plan import build_plan

            self._cached["plan"] = build_plan(self._idxs_ds)
        return self._cached["plan"]

    @property
    def _tree(self):
        """Device mask of cells that reach a pit (excludes loops/missing)."""
        if "tree" not in self._cached:
            self._cached["tree"] = jnp.asarray(self.rank.ravel() >= 0)
        return self._cached["tree"]

    def _accumulate_dev(self, data):
        """Router-plan flow accumulation (cached per graph): the fused
        single-chunk kernel for integers, the HBM-scale compensated plan
        past 2^21 cells, the widest-dtype sort-based kernel for small
        float inputs (ops/accel.py, ops/accel_big.py, ops/plan.py)."""
        from .ops.accel_big import BigAccelPlan

        if "accel" not in self._cached:
            from .ops.accel import build_accel_plan

            self._cached["accel"] = build_accel_plan(self._idxs_ds, self._plan)
        aplan = self._cached["accel"]
        is_int = jnp.issubdtype(data.dtype, jnp.integer) or data.dtype == jnp.bool_
        # the single-chunk fused kernel sums in float32 — exact for
        # integer totals below 2^24 only (unit counts always are; big
        # weighted ints fall back to the exact widest-dtype path)
        if (
            is_int
            and not isinstance(aplan, BigAccelPlan)
            and not isinstance(data, jax.core.Tracer)
            and data.size
            and int(jnp.max(jnp.abs(data))) * data.size >= 1 << 24
        ):
            from .ops.plan import accumulate_planned

            return accumulate_planned(self._plan, data)
        if aplan is not None and (is_int or isinstance(aplan, BigAccelPlan)):
            return aplan.accumulate(data)
        from .ops.plan import accumulate_planned_fast

        return accumulate_planned_fast(self._plan, data)

    def _invalidate(self):
        self._cached.clear()
        self._seq = None
        self._nnodes = None
        self._pit = None

    ### PROPERTIES ###

    @property
    def _dict(self):
        return {
            "nnodes": self.nnodes,
            "idxs_ds": self.idxs_ds,
            "idxs_seq": self._seq,
            "idxs_pit": self._pit,
        }

    @property
    def idxs_ds(self):
        """Linear indices of downstream cell."""
        return self._idxs_ds

    @property
    def idxs_us_main(self):
        """Linear indices of main upstream cell (largest uparea), -1 at
        headwaters."""
        if "idxs_us_main" in self._cached:
            return self._cached["idxs_us_main"]
        return self.main_upstream()

    @property
    def idxs_seq(self):
        """Linear indices of valid cells ordered from down- to upstream."""
        if self._seq is None:
            self.order_cells(method="sort")
        return self._seq

    @property
    def idxs_pit(self):
        """Linear indices of pits/outlets."""
        if self._pit is None:
            ids = self._idxs_ds
            self._pit = np.where(ids == np.arange(ids.size, dtype=ids.dtype))[0].astype(
                ids.dtype
            )
        return self._pit

    @property
    def nnodes(self):
        """Number of valid cells."""
        if self._nnodes is None:
            self._nnodes = int(np.sum(self.rank >= 0))
        return self._nnodes

    @property
    def rank(self):
        """Cell rank: distance to the outlet in number of cells; -1 for
        loops, -9999 for missing cells."""
        if "rank" in self._cached:
            return self._cached["rank"]
        rank = np.asarray(graph.rank(self._jds)).reshape(self.shape)
        if self.cache:
            self._cached["rank"] = rank
        return rank

    @property
    def isvalid(self):
        """True if the flow direction map is valid (no loops)."""
        self._cached.pop("rank", None)
        return bool(np.all(self.rank != -1))

    @property
    def mask(self):
        """Boolean array of valid cells."""
        return self.idxs_ds != self._mv

    @property
    def distnc(self):
        """Distance to outlet [m] (graph objects default to unit steps)."""
        if "distnc" in self._cached:
            return self._cached["distnc"]
        return np.ones_like(self.idxs_ds, dtype=np.float32)

    @property
    def area(self):
        """Cell area (graph objects default to unit areas)."""
        if "area" in self._cached:
            return self._cached["area"]
        return np.ones_like(self.idxs_ds, dtype=np.float32)

    @property
    def n_upstream(self):
        """Number of upstream connections per cell."""
        return np.asarray(graph.upstream_count(self._jds)).reshape(self.shape)

    ### SET/MODIFY PROPERTIES ###

    def order_cells(self, method="sort"):
        """Order valid cells from down- to upstream.

        Both reference methods ('sort' via rank argsort, 'walk' via BFS —
        flwdir.py:231-250) produce a valid topological order; here both
        map to the deterministic rank sort (ties by linear index).
        """
        if method not in ("sort", "walk"):
            raise ValueError(f'Invalid method {method}, select from ["walk", "sort"]')
        rnk = self.rank.ravel()
        valid = rnk >= 0
        idxs = np.where(valid)[0]
        order = np.argsort(rnk[valid], kind="stable")
        self._seq = idxs[order].astype(self._idxs_ds.dtype)
        self._nnodes = int(self._seq.size)

    def main_upstream(self, uparea=None):
        idxs_us_main = np.asarray(
            graph.main_upstream(
                self._jds, jnp.asarray(self._check_data(uparea, "uparea"))
            )
        )
        if self.cache:
            self._cached["idxs_us_main"] = idxs_us_main
        return idxs_us_main

    def add_pits(self, idxs=None, streams=None):
        """Add pits to the flow direction; snap to streams if given.

        Parity: reference flwdir.py:260-279.
        """
        idxs1 = self._check_idxs_xy(idxs, streams=streams)
        self.idxs_ds[idxs1] = idxs1
        pits = np.unique(np.concatenate([self.idxs_pit, idxs1]))
        self._invalidate()
        self._pit = pits

    def repair_loops(self):
        """Set a pit at every cell that does not drain to a pit.

        Parity: reference flwdir.py:281-286.
        """
        repair_idx = np.where(self.rank.ravel() == -1)[0]
        if repair_idx.size > 0:
            self.add_pits(repair_idx.astype(self._idxs_ds.dtype))

    ### IO ###

    def dump(self, fn):
        """Serialize object to file using pickle."""
        with open(fn, "wb") as handle:
            pickle.dump(self._dict, handle, protocol=-1)

    @staticmethod
    def load(fn):
        """Load serialized Flwdir object from file."""
        with open(fn, "rb") as handle:
            kwargs = pickle.load(handle)
        return Flwdir(**kwargs)

    ### LOCAL METHODS ###

    def path(self, idxs=None, mask=None, max_length=None, direction="down"):
        """Paths of indices in down- or upstream direction from seeds.

        Parity: reference flwdir.py:309-356.
        """
        direction = str(direction).lower()
        if direction not in ["up", "down"]:
            raise ValueError(
                f'Unknown flow direction: {direction}, select from ["up", "down"].'
            )
        return _paths(
            idxs,
            self.idxs_ds if direction == "down" else self.idxs_us_main,
            mask=self._check_data(mask, "mask", optional=True),
            max_length=max_length,
            real_length=False,
            ncol=None,
        )

    def snap(self, idxs=None, mask=None, max_length=None, direction="down", **kwargs):
        """Most down-/upstream cell where mask is True or a pit."""
        direction = str(direction).lower()
        if direction not in ["up", "down"]:
            raise ValueError(
                f'Unknown flow direction: {direction}, select from ["up", "down"].'
            )
        return snap_walk(
            idxs,
            self.idxs_ds if direction == "down" else self.idxs_us_main,
            mask=self._check_data(mask, "mask", optional=True),
            max_length=max_length,
            real_length=False,
            ncol=None,
        )

    ### GLOBAL ARITHMETICS ###

    def fillnodata(self, data, nodata, direction="down", how="max"):
        """Fill nodata cells from the nearest valid up-/downstream value.

        Parity: reference flwdir.py:360-392.
        """
        direction = str(direction).lower()
        dflat = jnp.asarray(self._check_data(data, "data"))
        if direction == "up":
            dout = graph.fillnodata_upstream(self._jds, dflat, nodata)
        elif direction == "down":
            dout = graph.fillnodata_downstream(self._jds, dflat, nodata, how=how)
        else:
            raise ValueError(
                f'Unknown flow direction: {direction}, select from ["up", "down"].'
            )
        return np.asarray(dout).reshape(np.asarray(data).shape)

    def downstream(self, data):
        """Next downstream value per cell. Parity: flwdir.py:394-410."""
        dflat = self._check_data(data, "data")
        data_out = dflat.copy()
        m = self.mask
        data_out[m] = dflat[self.idxs_ds[m]]
        return data_out.reshape(np.asarray(data).shape)

    def upstream_sum(self, data, mv=-9999):
        """Sum of direct upstream values. Parity: flwdir.py:412-433."""
        out = arithmetics.upstream_sum(
            self._jds, jnp.asarray(self._check_data(data, "data")), nodata=mv
        )
        return np.asarray(out).reshape(np.asarray(data).shape)

    def moving_average(
        self, data, n, weights=None, restrict_strord=False, strord=None, nodata=-9999.0
    ):
        """Moving window average over the network. Parity: flwdir.py:435-470."""
        strord_arr = self._check_data(strord, "strord", optional=not restrict_strord)
        out = arithmetics.moving_average(
            data=jnp.asarray(self._check_data(data, "data")),
            weights=None if weights is None else jnp.asarray(
                self._check_data(weights, "weights")
            ),
            n=n,
            idxs_ds=self._jds,
            idxs_us_main=jnp.asarray(self.idxs_us_main),
            strord=None if strord_arr is None else jnp.asarray(strord_arr),
            nodata=nodata,
        )
        return np.asarray(out).reshape(np.asarray(data).shape)

    def moving_median(self, data, n, restrict_strord=False, strord=None, nodata=-9999.0):
        """Moving window median over the network. Parity: flwdir.py:472-504."""
        strord_arr = self._check_data(strord, "strord", optional=not restrict_strord)
        out = arithmetics.moving_median(
            data=jnp.asarray(self._check_data(data, "data")),
            n=n,
            idxs_ds=self._jds,
            idxs_us_main=jnp.asarray(self.idxs_us_main),
            strord=None if strord_arr is None else jnp.asarray(strord_arr),
            nodata=nodata,
        )
        return np.asarray(out).reshape(np.asarray(data).shape)

    ### STREAMS ###

    def stream_order(self, type="strahler", mask=None):
        """Strahler (default) or classic stream order map.

        Parity: reference flwdir.py:508-547.
        """
        mask = self._check_data(mask, "mask", optional=True)
        jmask = None if mask is None else jnp.asarray(mask != 0)
        if type.lower() == "strahler":
            if mask is None and "strord" in self._cached:
                return self._cached["strord"].reshape(self.shape)
            # O(n) native sweep over the cached DFS preorder when built;
            # device scatter fixpoint otherwise (O(tree height) rounds)
            try:
                from .runtime import strahler_order as _native_strahler

                strord = _native_strahler(
                    self._idxs_ds,
                    np.asarray(self._plan.preorder),
                    mask=None if mask is None else (mask != 0),
                )
            except ImportError:
                strord = np.asarray(streams.strahler_order(self._jds, mask=jmask))
            if self.cache and mask is None:
                self._cached["strord"] = strord
        elif type.lower() == "classic":
            strord = np.asarray(
                streams.stream_order(
                    self._jds, jnp.asarray(self.idxs_us_main), mask=jmask
                )
            )
        else:
            raise ValueError(f'Unknown stream order type: {type}')
        return strord.reshape(self.shape)

    def upstream_area(self):
        """Upstream area map based on the set per-cell area."""
        uparea = np.asarray(
            self._accumulate_dev(jnp.asarray(np.asarray(self.area).ravel()))
        )
        uparea = np.where(np.asarray(self.mask), uparea, -9999)
        return uparea.reshape(self.shape)

    def accuflux(self, data, nodata=-9999, direction="up"):
        """Accumulated values along the flow directions.

        Parity: reference flwdir.py:567-602.
        """
        data_np = self._check_data(data, "data")
        dflat = jnp.asarray(data_np)
        if direction == "up":
            if not np.any(data_np == nodata):
                accu = self._accumulate_dev(dflat)
            else:
                accu = streams.accuflux(
                    self._jds, dflat, nodata=nodata, tree=self._tree
                )
        elif direction == "down":
            accu = streams.accuflux_ds(self._jds, dflat, nodata=nodata)
        else:
            raise ValueError(
                f'Unknown flow direction: {direction}, select from ["up", "down"].'
            )
        return np.asarray(accu).reshape(np.asarray(data).shape)

    def smooth_rivlen(self, rivlen, min_rivlen, max_window=10, nodata=-9999.0):
        """Smooth short river lengths. Parity: flwdir.py:604-638."""
        out = streams.smooth_rivlen(
            self._jds,
            jnp.asarray(self.idxs_us_main),
            np.asarray(self._check_data(rivlen, "rivlen")),
            min_rivlen=min_rivlen,
            max_window=max_window,
            nodata=nodata,
        )
        return np.asarray(out).reshape(np.asarray(rivlen).shape)

    ### ELEVATION ###

    def dem_adjust(self, elevtn):
        """Hydrologically adjusted, downstream-monotone elevation.

        Parity: reference flwdir.py:642-662.
        """
        out = dem.adjust_elevation(
            self._idxs_ds,
            self.rank.ravel() if np.ndim(self.rank) else self.rank,
            np.asarray(self._check_data(elevtn, "elevtn")),
        )
        return out.reshape(np.asarray(elevtn).shape).astype(np.asarray(elevtn).dtype)

    ### RIVERS ###

    def classify_estuaries(
        self, elevtn, rivwth, rivdst=None, min_convergence=1e-2, max_elevtn=0
    ):
        """Classify estuaries by width convergence. Parity: flwdir.py:666-696."""
        rivdst = self.distnc if rivdst is None else rivdst
        est = rivers.classify_estuary(
            self._jds,
            jnp.asarray(self.idxs_pit),
            rivdst=jnp.asarray(self._check_data(rivdst, "rivdst")),
            rivwth=jnp.asarray(self._check_data(rivwth, "rivwth")),
            elevtn=jnp.asarray(self._check_data(elevtn, "elevtn")),
            min_convergence=min_convergence,
            max_elevtn=max_elevtn,
        )
        return np.asarray(est)

    def river_depth(
        self,
        qbankfull,
        rivwth,
        zs=None,
        rivdst=None,
        rivslp=None,
        manning=0.03,
        method="manning",
        min_rivdph=1,
        min_rivslp=1e-5,
        **kwargs,
    ):
        """River depth from Manning's equation or gvf solver.

        Parity: reference flwdir.py:698-778.
        """
        methods = ["manning", "gvf"]
        if method not in methods:
            raise ValueError(f"Method unknown {method}, select from {methods}")
        manning = self._check_data(manning, "manning")
        qbankfull = self._check_data(qbankfull, "qbankfull")
        rivwth = self._check_data(rivwth, "rivwth")
        _opt = method == "manning" and rivslp is not None
        rivslp = self._check_data(rivslp, "rivslp", optional=True)
        rivdst = self._check_data(rivdst, "rivdst", optional=_opt)
        zs = self._check_data(zs, "zs", optional=_opt)
        if rivslp is None:
            dz = zs - self.downstream(zs)
            dx = rivdst - self.downstream(rivdst)
            rivslp = np.where(dx >= 1, dz / np.maximum(1, dx), -9999)
            rivslp = self.fillnodata(rivslp, nodata=-9999)
        rivslp = np.maximum(min_rivslp, rivslp)
        rivdph = ((manning * qbankfull) / (np.sqrt(rivslp) * rivwth)) ** (3 / 5)
        rivdph = np.maximum(min_rivdph, rivdph)
        rivdph[self.idxs_ds == self._mv] = -9999.0
        if method == "gvf":
            rivdph = rivers.rivdph_gvf(
                self._idxs_ds,
                self.rank.ravel() if np.ndim(self.rank) else self.rank,
                zs=zs,
                rivdph=rivdph,
                qbankfull=qbankfull,
                rivdst=rivdst,
                rivwth=rivwth,
                manning=manning,
                min_rivslp=min_rivslp,
                min_rivdph=min_rivdph,
                **kwargs,
            )
        return np.asarray(rivdph).reshape(self.shape)

    ### SHORTCUTS ###

    def _check_data(self, data, name, optional=False, flatten=True, **kwargs):
        """Check data shape/size; by default return a flattened array.

        Parity: reference flwdir.py:782-803 (uparea/strord derived on
        demand when passed as None).
        """
        if data is None and optional:
            return None
        if data is None:
            if name == "uparea":
                data = self.upstream_area(**kwargs)
            elif name == "strord":
                data = self.stream_order(**kwargs)
        data = np.atleast_1d(data)
        if flatten:
            if data.size == 1:
                data = np.full(self.size, data, dtype=data.dtype)
            elif data.size != self.size:
                raise ValueError(f'"{name}" size does not match.')
            return data.ravel()
        else:
            if data.size == 1:
                data = np.full(self.shape, data, dtype=data.dtype)
            elif data.shape != self.shape:
                raise ValueError(f'"{name}" shape does not match.')
            return data

    def _check_idxs_xy(self, idxs, streams=None):
        idxs = np.atleast_1d(idxs).ravel()
        streams = self._check_data(streams, "streams", optional=True)
        if streams is not None:
            idxs = self.snap(idxs=idxs, mask=streams)[0]
        return idxs
