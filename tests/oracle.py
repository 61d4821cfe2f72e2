"""Sequential numpy oracle implementations for parity testing.

These are straightforward, independently-written sequential versions of the
flow-network algorithms (same semantics as the reference library's numba
kernels, implemented from the behavioral spec in SURVEY.md). They exist so
the TPU pointer-doubling engine can be checked against a trivially
auditable implementation on small grids.
"""

from __future__ import annotations

import numpy as np

# neighbor scan order used throughout: (dr, dc) row-major over the 3x3
# window, matching the reference's nested ``for dr: for dc:`` loops.
NEIGHBORS = [
    (dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1) if not (dr == 0 and dc == 0)
]


def d8_from_dem_steepest(dem: np.ndarray) -> np.ndarray:
    """Generate a valid D8 raster from a DEM by steepest descent.

    Cells with no strictly lower neighbor become pits; NaN cells nodata.
    Guaranteed acyclic since elevation strictly decreases along flow.
    """
    d8_code = {
        (-1, -1): 32, (-1, 0): 64, (-1, 1): 128,
        (0, -1): 16, (0, 0): 0, (0, 1): 1,
        (1, -1): 8, (1, 0): 4, (1, 1): 2,
    }
    nrow, ncol = dem.shape
    out = np.full((nrow, ncol), 247, dtype=np.uint8)
    for r in range(nrow):
        for c in range(ncol):
            z0 = dem[r, c]
            if np.isnan(z0):
                continue
            best, slope_max = (0, 0), 0.0
            for dr, dc in NEIGHBORS:
                r1, c1 = r + dr, c + dc
                if 0 <= r1 < nrow and 0 <= c1 < ncol and not np.isnan(dem[r1, c1]):
                    dist = np.hypot(dr, dc)
                    slope = (z0 - dem[r1, c1]) / dist
                    if slope > slope_max:
                        slope_max, best = slope, (dr, dc)
            out[r, c] = d8_code[best]
    return out


def rank(idxs_ds: np.ndarray) -> np.ndarray:
    """Distance to pit; loops -> -1; missing -> -9999 (memoized walking)."""
    n = idxs_ds.size
    ranks = np.full(n, -9999, dtype=np.int32)
    for i in range(n):
        if idxs_ds[i] < 0 or ranks[i] != -9999:
            continue
        path = []
        j = i
        onpath = set()
        while True:
            if idxs_ds[j] < 0:
                # dead end into missing cell: treat as loop-less terminal
                ranks[j] = -1
                break
            if idxs_ds[j] == j:  # pit
                if ranks[j] == -9999:
                    ranks[j] = 0
                break
            if ranks[j] != -9999:
                break
            if j in onpath:  # cycle
                for k in path:
                    ranks[k] = -1
                break
            path.append(j)
            onpath.add(j)
            j = idxs_ds[j]
        if ranks[j] == -1:
            for k in path:
                ranks[k] = -1
        elif ranks[j] >= 0:
            r = ranks[j]
            for k in reversed(path):
                if ranks[k] == -9999:
                    r += 1
                    ranks[k] = r
    return ranks


def seq(idxs_ds: np.ndarray) -> np.ndarray:
    """A valid down->upstream topological order (by increasing rank)."""
    r = rank(idxs_ds)
    idx = np.where(r >= 0)[0]
    return idx[np.argsort(r[idx], kind="stable")]


def accuflux(idxs_ds: np.ndarray, data: np.ndarray, nodata=-9999) -> np.ndarray:
    """Sequential upstream accumulation (reference streams.py:16-41):
    nodata cells block the flow from their subtree but do not poison
    downstream cells."""
    accu = data.copy()
    for i in seq(idxs_ds)[::-1]:  # up- to downstream
        ds = idxs_ds[i]
        if i != ds and accu[ds] != nodata and accu[i] != nodata:
            accu[ds] += accu[i]
    return accu


def accuflux_ds(idxs_ds: np.ndarray, data: np.ndarray, nodata=-9999) -> np.ndarray:
    """Sequential downstream accumulation (reference streams.py:45-70)."""
    accu = data.copy()
    for i in seq(idxs_ds):  # down- to upstream
        ds = idxs_ds[i]
        if i != ds and accu[ds] != nodata and accu[i] != nodata:
            accu[i] += accu[ds]
    return accu


def basins(idxs_ds: np.ndarray, idxs_pit: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """Basin labels by walking each cell to its root."""
    n = idxs_ds.size
    pit_id = {int(p): int(ids[k]) for k, p in enumerate(idxs_pit)}
    out = np.zeros(n, dtype=ids.dtype)
    for i in range(n):
        if idxs_ds[i] < 0:
            continue
        j = i
        steps = 0
        while idxs_ds[j] != j and steps <= n:
            j = idxs_ds[j]
            steps += 1
        out[i] = pit_id.get(int(j), 0)
    return out


def upstream_count(idxs_ds: np.ndarray, mask=None) -> np.ndarray:
    n = idxs_ds.size
    cnt = np.full(n, -9, dtype=np.int8)
    for i in range(n):
        ds = idxs_ds[i]
        if ds >= 0:
            cnt[i] = max(cnt[i], 0)
            if ds != i and (mask is None or mask[i]):
                cnt[ds] = max(cnt[ds], 0) + 1
    return cnt


def main_upstream(idxs_ds: np.ndarray, uparea: np.ndarray, upa_min=0.0) -> np.ndarray:
    n = idxs_ds.size
    out = np.full(n, -1, dtype=idxs_ds.dtype)
    upa_main = np.full(n, upa_min, dtype=np.float64)
    for i in range(n):
        ds = idxs_ds[i]
        if ds == i or ds < 0:
            continue
        if uparea[i] > upa_main[ds]:
            out[ds] = i
            upa_main[ds] = uparea[i]
    return out


def fillnodata_upstream(idxs_ds, data, nodata):
    out = data.copy()
    for i in seq(idxs_ds):
        ds = idxs_ds[i]
        if out[i] == nodata and out[ds] != nodata:
            out[i] = out[ds]
    return out


def fillnodata_downstream(idxs_ds, data, nodata, how="max"):
    out = data.copy()
    for i in seq(idxs_ds)[::-1]:
        ds = idxs_ds[i]
        if ds == i:
            continue
        if data[ds] == nodata and out[i] != nodata:
            if out[ds] == nodata:
                out[ds] = out[i]
            elif how == "max":
                out[ds] = max(out[i], out[ds])
            elif how == "min":
                out[ds] = min(out[i], out[ds])
            else:
                out[ds] += out[i]
    return out


def strahler_order(idxs_ds, mask=None):
    """Sequential Strahler stream order (reference streams.py:229-268 semantics)."""
    n = idxs_ds.size
    strord = np.zeros(n, dtype=np.uint8)
    strmax = np.zeros(n, dtype=np.uint8)
    for i in seq(idxs_ds)[::-1]:  # up- to downstream
        ds = idxs_ds[i]
        if mask is not None and not mask[i]:
            continue
        sto = max(strord[i], 1)
        strord[i] = sto
        if ds == i:
            continue
        if sto > strord[ds]:
            strord[ds] = sto
        elif sto == strmax[ds] and sto == strord[ds]:
            strord[ds] = sto + 1
        if sto > strmax[ds]:
            strmax[ds] = sto
    return strord


def fill_oracle(dem, nodata=-9999.0, connectivity=8, seeds=None):
    """Independent depression-fill oracle: morphological reconstruction by
    erosion. w = dem at seed (outlet) cells, +inf elsewhere; iterate
    w[i] = max(dem[i], min over neighbors w) to fixpoint. Equals
    priority-flood filling (epsilon = 0)."""
    dem = np.asarray(dem, dtype=np.float64)
    nrow, ncol = dem.shape
    bad = np.isnan(dem) if np.isnan(nodata) else dem == nodata
    if connectivity == 8:
        nbrs = NEIGHBORS
    else:
        nbrs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if seeds is None:
        # valid cells on the array border or adjacent to nodata
        seeds = np.zeros_like(bad)
        for r in range(nrow):
            for c in range(ncol):
                if bad[r, c]:
                    continue
                if r == 0 or r == nrow - 1 or c == 0 or c == ncol - 1:
                    seeds[r, c] = True
                    continue
                for dr, dc in nbrs:
                    if bad[r + dr, c + dc]:
                        seeds[r, c] = True
                        break
    w = np.where(seeds & ~bad, dem, np.inf)
    changed = True
    while changed:
        changed = False
        for r in range(nrow):
            for c in range(ncol):
                if bad[r, c] or seeds[r, c]:
                    continue
                m = np.inf
                for dr, dc in nbrs:
                    r1, c1 = r + dr, c + dc
                    if 0 <= r1 < nrow and 0 <= c1 < ncol and not bad[r1, c1]:
                        m = min(m, w[r1, c1])
                new = max(dem[r, c], m)
                if new < w[r, c]:
                    w[r, c] = new
                    changed = True
    return np.where(bad, nodata, w)
