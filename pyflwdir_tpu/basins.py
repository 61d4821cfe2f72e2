"""Basin and subbasin delineation.

TPU-native equivalents of the reference ``pyflwdir/basins.py``: label
propagation becomes pointer-doubling ``reach`` + gather (O(log L) rounds);
the pfafstetter and area partitioners keep the reference's small sequential
branch bookkeeping on the host but consume device-computed maps (stream
order, upstream area, main-upstream indices).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .ops import graph
from .ops.order import classic_order

__all__ = [
    "basins",
    "interbasin_mask",
    "subbasins_streamorder",
    "subbasins_pfafstetter",
    "subbasins_area",
]


def basins(idxs_ds, idxs_pit, ids=None):
    """Basin map: every cell labeled with the id of its outlet.

    Parity: reference ``basins.basins`` (basins.py:12-18) — seed the pits
    with ids and fill upstream; cells not draining to a seeded pit get 0.
    """
    idxs_pit = jnp.asarray(idxs_pit)
    if ids is None:
        ids = jnp.arange(1, idxs_pit.shape[0] + 1, dtype=jnp.uint32)
    else:
        ids = jnp.asarray(ids)
    n = idxs_ds.shape[0]
    seed = jnp.zeros(n, dtype=ids.dtype).at[idxs_pit].set(ids)
    # freeze pointers at seeded cells so labels propagate from them
    stop = jnp.zeros(n, dtype=bool).at[idxs_pit].set(True)
    t = graph.reach(idxs_ds, stop)
    out = jnp.where(idxs_ds >= 0, seed[t], 0)
    return out.astype(ids.dtype)


def interbasin_mask(idxs_ds, region, stream=None):
    """Most downstream contiguous area within ``region``.

    Parity: reference ``basins.interbasin_mask`` (basins.py:25-64). The two
    sequential sweeps become: (1) downstream closure of the stream mask via
    a subtree max; (2) a path test — a cell is masked out iff any cell on
    its path to the root is a region-entry cell (``~region & region[ds]``).
    """
    n = idxs_ds.shape[0]
    valid = idxs_ds >= 0
    if stream is not None:
        has_stream_up = graph.accumulate(
            idxs_ds, stream.astype(jnp.int32)
        )
        mask1 = has_stream_up > 0
    else:
        mask1 = jnp.ones(n, dtype=bool)
    ds = graph.self_loop(idxs_ds)
    entry = valid & ~region & region[ds] & (ds != jnp.arange(n, dtype=idxs_ds.dtype))
    entries_below = graph.path_sum(idxs_ds, entry.astype(jnp.int32))
    root = graph.reach(idxs_ds, None)
    mask2 = (entries_below == 0) & mask1[root]
    return jnp.where(valid, mask2 & region, False)


def subbasins_streamorder(idxs_ds, strord, rank, mask=None, min_sto=-2):
    """Subbasin map split at stream-order changes.

    Parity: reference ``basins.subbasins_streamorder`` (basins.py:68-103):
    outlets are cells with ``strord >= min_sto`` whose downstream cell has a
    different order (or are pits). The reference numbers outlets in its
    up- to downstream ``seq`` order; here outlets are numbered by
    decreasing rank (ties by linear index) — a valid up- to downstream
    order, so ids differ only in permutation.

    Returns (subbasin labels, outlet indices).
    """
    strord = jnp.asarray(strord)
    if min_sto < 0:
        min_sto = int(strord.max()) + min_sto
    n = idxs_ds.shape[0]
    ar = jnp.arange(n, dtype=idxs_ds.dtype)
    valid = idxs_ds >= 0
    live = valid & (strord >= min_sto)
    if mask is not None:
        live = live & mask
    ds = graph.self_loop(idxs_ds)
    is_out = live & ((strord != strord[ds]) | (ds == ar))
    # number outlets in up- to downstream order (decreasing rank)
    is_out_np = np.asarray(is_out)
    rank_np = np.asarray(rank)
    idxs_out = np.where(is_out_np)[0]
    order = np.argsort(-rank_np[idxs_out], kind="stable")
    idxs1 = idxs_out[order].astype(np.asarray(idxs_ds).dtype)
    seed = jnp.zeros(n, dtype=jnp.int32).at[jnp.asarray(idxs1)].set(
        jnp.arange(1, idxs1.size + 1, dtype=jnp.int32)
    )
    t = graph.reach(idxs_ds, is_out)
    subbas = jnp.where(valid & is_out[t], seed[t], 0)
    return subbas.astype(jnp.int32), idxs1


def subbasins_pfafstetter(
    idxs_pit_np,
    idxs_ds,
    idxs_us_main,
    uparea,
    rank,
    mask=None,
    depth=1,
):
    """Pfafstetter coding of subbasins.

    Parity: reference ``basins.subbasins_pfafstetter`` (basins.py:117-191).
    The stream order limited to depth+1, tributary identification, and the
    per-branch labelling worklist run on the host over the (small) set of
    branch outlets; main-stem label propagation and the final
    fill-upstream run on device.
    """
    n = idxs_ds.shape[0]
    strord = classic_order(idxs_ds, idxs_us_main, mask=mask)
    strord = jnp.where(strord <= depth + 1, strord, 0).astype(strord.dtype)
    strord_np = np.asarray(strord)
    ds_np = np.asarray(graph.self_loop(idxs_ds))
    us_main_np = np.asarray(idxs_us_main)
    upa_np = np.asarray(uparea)

    # tributaries: strord > 0 and strord > strord[ds] (basins.py:107-113)
    trib_mask = (strord_np > 0) & (strord_np > strord_np[ds_np])
    idxs_trib = np.where(trib_mask)[0]

    # Level-synchronous subdivision over explicit stem arrays.  Each
    # branch record carries its full main stem (outlet-first); the
    # Pfafstetter rules then become slice assignments on that array:
    # the i-th (downstream-first) of the 4 largest tributaries takes code
    # +(2i+1)*step, and the parent-stem segment above its confluence is
    # relabelled +(2i+2)*step — assigning the tail slice per tributary in
    # downstream-to-upstream order leaves exactly the between-confluence
    # segments with their interbasin codes.
    pfaf = np.zeros(n, dtype=np.int64)
    outlets = []
    registered = set()

    def _stem(outlet):
        """Main-stem cells strictly upstream of ``outlet`` inside the
        depth-limited stream-order network."""
        cells = []
        j = int(us_main_np[outlet])
        while j >= 0 and strord_np[j] != 0:
            cells.append(j)
            j = int(us_main_np[j])
        return np.asarray(cells, dtype=np.int64)

    def _register(outlet, code, stem):
        pfaf[outlet] = code
        if stem.size:
            pfaf[stem] = code
        outlets.append(int(outlet))
        registered.add(int(outlet))

    base = sum(10**d for d in range(depth))  # 1, 11, 111, ...
    level = []  # (outlet-first stem incl. outlet, code, subdivision depth)
    for i, pit in enumerate(np.asarray(idxs_pit_np)):
        code = base + (i + 1) * 10**depth
        stem = _stem(int(pit))
        _register(int(pit), code, stem)
        level.append((np.concatenate([[int(pit)], stem]), code, 1))

    while level:
        deeper = []
        for stem, code, d0 in level:
            step = 10 ** (depth - d0)
            # unlabelled tributaries whose confluence lies on this stem
            order = np.argsort(stem, kind="stable")
            ssort = stem[order]
            dst = ds_np[idxs_trib]
            p = np.clip(np.searchsorted(ssort, dst), 0, stem.size - 1)
            on = (ssort[p] == dst) & (pfaf[idxs_trib] == 0)
            cand = idxs_trib[on]
            if cand.size == 0:
                continue
            cpos = order[p[on]]  # confluence position along the stem
            big4 = np.argsort(-upa_np[cand], kind="stable")[:4]
            dsf = np.argsort(cpos[big4], kind="stable")  # downstream first
            for i, (trib, p0) in enumerate(
                zip(cand[big4][dsf], cpos[big4][dsf])
            ):
                tstem = _stem(int(trib))
                _register(int(trib), code + (2 * i + 1) * step, tstem)
                if d0 < depth:
                    deeper.append(
                        (
                            np.concatenate([[int(trib)], tstem]),
                            code + (2 * i + 1) * step,
                            d0 + 1,
                        )
                    )
                # interbasin: the parent stem above this confluence
                seg = stem[p0 + 1 :]
                ib = int(seg[0]) if seg.size else int(us_main_np[stem[p0]])
                if ib < 0 or ib in registered:
                    continue
                code_ib = code + (2 * i + 2) * step
                _register(ib, code_ib, seg)
                if d0 < depth:
                    child = seg if seg.size else np.asarray([ib], dtype=np.int64)
                    deeper.append((child, code_ib, d0 + 1))
        level = deeper

    idxs1 = np.array(outlets, dtype=np.asarray(idxs_ds).dtype)
    filled = graph.fillnodata_upstream(idxs_ds, jnp.asarray(pfaf), 0)
    pfafbas = (filled % 10**depth).astype(jnp.int32)
    return pfafbas, idxs1


def subbasins_area(idxs_ds_np, rank_np, idxs_us_main_np, uparea_np, area_min):
    """Subbasins with a minimum area.

    Semantics of reference ``basins.subbasins_area`` (basins.py:195-233):
    the down- to upstream sweep carrying the unclaimed drainage budget is
    inherently sequential and runs natively
    (csrc/network_kernels.cpp::subbasin_area_outlets); the outlet labels
    then fill upstream on device.
    """
    from .runtime import subbasin_area_outlets as _native

    valid = rank_np >= 0
    order = np.argsort(rank_np[valid], kind="stable")
    seq = np.where(valid)[0][order]  # down- to upstream
    subbas, idxs1 = _native(
        idxs_ds_np, np.asarray(idxs_us_main_np), seq, np.asarray(uparea_np),
        float(area_min),
    )
    filled = graph.fillnodata_upstream(
        jnp.asarray(idxs_ds_np), jnp.asarray(subbas), 0
    )
    return np.asarray(filled), idxs1.astype(idxs_ds_np.dtype)
