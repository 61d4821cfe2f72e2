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

    pfaf_branch = np.zeros(n, dtype=np.int64)
    idxs = []
    labs = []
    pfaf0 = 1
    for d0 in range(1, depth):
        pfaf0 += 10**d0

    def _propagate_main_stem(idx, label):
        """walk up the main stem labelling cells until leaving the
        depth-limited stream order network"""
        while True:
            idx = us_main_np[idx]
            if idx < 0 or strord_np[idx] == 0:
                break
            pfaf_branch[idx] = label

    for i, idx in enumerate(np.asarray(idxs_pit_np)):
        idxs.append(int(idx))
        pfaf1 = pfaf0 + (i + 1) * 10**depth
        labs.append((pfaf1, 1))
        pfaf_branch[idx] = pfaf1
        _propagate_main_stem(int(idx), pfaf1)

    while labs:
        pfaf0_, d0 = labs.pop(0)
        sel = idxs_trib[
            (pfaf_branch[idxs_trib] == 0)
            & (pfaf_branch[ds_np[idxs_trib]] == pfaf0_)
        ]
        if sel.size == 0:
            continue
        # 4 largest subbasins, then ordered down- to upstream
        sel_s = sel[np.argsort(-upa_np[sel], kind="stable")]
        trib0 = sel_s[:4]
        trib0s = trib0[np.argsort(-upa_np[ds_np[trib0]], kind="stable")]
        pfaf_int_ds = pfaf0_
        for i, idx in enumerate(trib0s):
            idxs.append(int(idx))
            idx1 = us_main_np[ds_np[idx]]  # interbasin outlet
            pfaf_sub = pfaf0_ + (i * 2 + 1) * 10 ** (depth - d0)
            pfaf_branch[idx] = pfaf_sub
            _propagate_main_stem(int(idx), pfaf_sub)
            if d0 < depth:
                labs.append((pfaf_sub, d0 + 1))
            if int(idx1) not in idxs:
                idxs.append(int(idx1))
                pfaf_int = pfaf0_ + (i + 1) * 2 * 10 ** (depth - d0)
                pfaf_branch[idx1] = pfaf_int
                j = int(idx1)
                while True:
                    j = us_main_np[j]
                    if j < 0 or pfaf_branch[j] != pfaf_int_ds:
                        break
                    pfaf_branch[j] = pfaf_int
                pfaf_int_ds = pfaf_int
                if d0 < depth:
                    labs.append((pfaf_int, d0 + 1))

    idxs1 = np.array(idxs, dtype=np.asarray(idxs_ds).dtype)
    filled = graph.fillnodata_upstream(
        idxs_ds, jnp.asarray(pfaf_branch), 0
    )
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
