"""TPU-native flow-graph engine: pointer-doubling primitives.

The reference (``/root/reference/pyflwdir/core.py``) computes everything
with *sequential* topologically-ordered sweeps over ``seq`` — O(n) scalar
loops whose dependency chain equals the longest flow path. This module
recasts those sweeps as **data-parallel pointer-doubling** (a.k.a. pointer
jumping): O(log L) rounds of whole-array gathers/scatters, where L is the
longest flow path. Every round is a dense XLA op, so the kernels are fully
jittable and shard well over a device mesh.

Data contract (matches reference ``core.py:2-12``):
  * ``idxs_ds`` — 1-D int array of linear next-downstream indices,
  * ``idxs_ds[i] == i``  -> pit (outlet),
  * ``idxs_ds[i] == -1`` -> missing value (inactive cell).

Primitives
----------
 * :func:`rank`              — distance-to-pit, loops -> -1 (core.py:18-47)
 * :func:`roots`             — pit index of each cell (basin fill seed)
 * :func:`reach`             — first downstream cell in a stop mask
 * :func:`path_sum`          — additive carry along the downstream path
 * :func:`accumulate`        — subtree (flow) accumulation (streams.py:16)
 * :func:`upstream_count`    — #direct upstream neighbors (core.py:51-61)
 * :func:`main_upstream`     — argmax-uparea upstream neighbor (core.py:192)
 * :func:`fillnodata_upstream`/:func:`fillnodata_downstream` (core.py:121-188)

All functions take/return ``jnp`` arrays and are safe to call under
``jax.jit``; the number of doubling rounds is bounded by ``ceil(log2 n)+1``
with early exit via ``lax.while_loop``.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "self_loop",
    "pit_mask",
    "valid_mask",
    "rank",
    "roots",
    "reach",
    "path_sum",
    "path_reduce",
    "accumulate",
    "accumulate_downstream",
    "upstream_count",
    "main_upstream",
    "fillnodata_upstream",
    "fillnodata_downstream",
    "propagate_downstream",
    "upstream_matrix",
    "pit_indices",
    "loop_indices",
    "headwater_indices",
    "confluence_indices",
    "flwdir_tuples",
    "idxs_seq",
]


def _n_rounds(n: int) -> int:
    """Static doubling-round bound: enough to traverse any simple path."""
    return max(1, int(math.ceil(math.log2(max(n, 2)))) + 1)


def self_loop(idxs_ds: jnp.ndarray) -> jnp.ndarray:
    """Replace missing (-1) pointers with self-loops."""
    n = idxs_ds.shape[0]
    ar = jnp.arange(n, dtype=idxs_ds.dtype)
    return jnp.where(idxs_ds < 0, ar, idxs_ds)


def valid_mask(idxs_ds: jnp.ndarray) -> jnp.ndarray:
    """True for active (non-missing) cells."""
    return idxs_ds >= 0


def pit_mask(idxs_ds: jnp.ndarray) -> jnp.ndarray:
    """True for pit cells (``idxs_ds[i] == i``)."""
    n = idxs_ds.shape[0]
    return idxs_ds == jnp.arange(n, dtype=idxs_ds.dtype)


# ---------------------------------------------------------------------------
# downstream-path primitives (gather-based doubling)
# ---------------------------------------------------------------------------


def rank(idxs_ds: jnp.ndarray) -> jnp.ndarray:
    """Distance to pit counted in cells; loops -> -1, missing -> -9999.

    Parallel equivalent of reference ``core.rank`` (core.py:18-47): additive
    carry pointer doubling. Loop detection: a cell is on (or drains into) a
    cycle iff its converged pointer does not land on an *original* pit —
    note that cycles whose length is a power of two collapse to self-loops
    under doubling, so testing the final pointer against the original pit
    set (not pointer convergence) is required.
    """
    n = idxs_ds.shape[0]
    ar = jnp.arange(n, dtype=idxs_ds.dtype)
    ptr = self_loop(idxs_ds)
    valid = idxs_ds >= 0
    ispit0 = idxs_ds == ar
    step = jnp.where(valid & ~ispit0, 1, 0).astype(
        jnp.int64 if n > 2**30 else jnp.int32
    )
    max_rounds = _n_rounds(n)

    def body(state):
        i, d, p = state
        d = d + d[p]
        p = p[p]
        return i + 1, d, p

    def cond(state):
        i, d, p = state
        return (i < max_rounds) & jnp.any(p != p[p])

    # max_rounds suffices: 2^max_rounds >= 2n > any simple path length
    _, d, p = lax.while_loop(cond, body, (0, step, ptr))
    # odd-length cycles may still be mid-rotation: one extra collapse of p
    # is irrelevant since any non-pit landing marks a loop
    ranks = jnp.where(ispit0[p], d, -1).astype(jnp.int32)
    return jnp.where(valid, ranks, -9999)


def roots(idxs_ds: jnp.ndarray) -> jnp.ndarray:
    """Index of the pit (root) each cell drains to; cycle cells get an
    arbitrary cell of their cycle; missing cells map to themselves."""
    return reach(idxs_ds, None)


def reach(idxs_ds: jnp.ndarray, stop: jnp.ndarray | None) -> jnp.ndarray:
    """First downstream cell (inclusive) where ``stop`` is True, else pit.

    Pointer doubling on a graph whose pointers are frozen at stop cells.
    With ``stop=None`` this returns the pit/root of each cell. This is the
    parallel form of reference ``core.snap`` (core.py:441-480) without the
    max-length option.
    """
    n = idxs_ds.shape[0]
    ar = jnp.arange(n, dtype=idxs_ds.dtype)
    ptr = self_loop(idxs_ds)
    if stop is not None:
        ptr = jnp.where(stop, ar, ptr)
    max_rounds = _n_rounds(n)

    def body(state):
        i, p = state
        return i + 1, p[p]

    def cond(state):
        i, p = state
        return (i < max_rounds) & jnp.any(p != p[p])

    _, ptr = lax.while_loop(cond, body, (0, ptr))
    return ptr


def path_reduce(
    idxs_ds: jnp.ndarray,
    weights: jnp.ndarray,
    stop: jnp.ndarray | None = None,
    op: str = "add",
) -> jnp.ndarray:
    """Half-open reduction (add/min/max) along the downstream path.

    ``out[i] = reduce(weights[j] for j on path i..t)`` excluding the
    terminal cell ``t`` (the first stop cell, else the pit). Used for
    distance to outlet (add over edge lengths), downstream accumulation,
    and floodplain path-max tests. Pits/stop cells get the identity
    (0 / +inf / -inf).
    """
    n = idxs_ds.shape[0]
    ar = jnp.arange(n, dtype=idxs_ds.dtype)
    ptr = self_loop(idxs_ds)
    if stop is not None:
        ptr = jnp.where(stop, ar, ptr)
    ident = _identity(op, weights.dtype)
    carry = jnp.where(ptr != ar, weights, ident).astype(weights.dtype)
    max_rounds = _n_rounds(n)

    def combine(a, b):
        if op == "add":
            return a + b
        return jnp.maximum(a, b) if op == "max" else jnp.minimum(a, b)

    def body(state):
        i, c, p = state
        c = combine(c, jnp.where(p != ar, c[p], ident))
        p = p[p]
        return i + 1, c, p

    def cond(state):
        i, c, p = state
        return (i < max_rounds) & jnp.any(p != p[p])

    _, carry, _ = lax.while_loop(cond, body, (0, carry, ptr))
    return carry


def path_sum(
    idxs_ds: jnp.ndarray,
    weights: jnp.ndarray,
    stop: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Half-open additive carry along the downstream path (see path_reduce)."""
    return path_reduce(idxs_ds, weights, stop=stop, op="add")


def accumulate_downstream(
    idxs_ds: jnp.ndarray, data: jnp.ndarray, nodata=None
) -> jnp.ndarray:
    """Downstream accumulation: ``out[i] = sum(data[j] for j on path i..pit)``
    including both endpoints.

    Parallel equivalent of reference ``streams.accuflux_ds``
    (streams.py:45-70) including its nodata semantics: nodata cells stay
    nodata and cut the path — cells upstream of a nodata cell accumulate
    only up to (excluding) it.
    """
    if nodata is None:
        s = path_sum(idxs_ds, data)
        root = reach(idxs_ds, None)
        return s + data[root]
    block = data == nodata
    t = reach(idxs_ds, block)  # first nodata cell downstream, else pit
    s = path_sum(idxs_ds, jnp.where(block, 0, data), stop=block)
    out = s + jnp.where(block[t], 0, data[t])
    valid = idxs_ds >= 0
    return jnp.where(valid & ~block, out, data)


# ---------------------------------------------------------------------------
# subtree accumulation (scatter-based doubling)
# ---------------------------------------------------------------------------


def _identity(op: str, dtype):
    if op == "add":
        return jnp.asarray(0, dtype=dtype)
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.asarray(-jnp.inf if op == "max" else jnp.inf, dtype=dtype)
    info = jnp.iinfo(dtype)
    return jnp.asarray(info.min if op == "max" else info.max, dtype=dtype)


def _subtree_reduce(ptr0: jnp.ndarray, values: jnp.ndarray, op: str) -> jnp.ndarray:
    """Generic subtree reduction by pointer doubling.

    ``ptr0[j]`` is j's forwarding target (or the sentinel ``n`` when j does
    not forward). Returns, for every cell i, the reduction (add/min/max) of
    ``values`` over all cells j whose forwarding chain passes through i —
    including i itself.

    Invariant after round m: ``s[i]`` reduces the subtree truncated at depth
    ``2^m`` and ``p[j]`` is j's ``2^m``-step target (n once the chain ends).
    """
    n = ptr0.shape[0]
    sentinel = jnp.asarray(n, dtype=ptr0.dtype)
    s = values
    max_rounds = _n_rounds(n)
    ident = _identity(op, values.dtype)

    def scatter(target, vals):
        if op == "add":
            return jnp.zeros(n, dtype=vals.dtype).at[target].add(vals, mode="drop")
        base = jnp.full(n, ident, dtype=vals.dtype)
        if op == "max":
            return base.at[target].max(vals, mode="drop")
        return base.at[target].min(vals, mode="drop")

    def combine(a, b):
        if op == "add":
            return a + b
        return jnp.maximum(a, b) if op == "max" else jnp.minimum(a, b)

    def body(state):
        i, s, p = state
        s = combine(s, scatter(p, s))
        p = jnp.where(p < n, jnp.take(p, jnp.minimum(p, n - 1)), sentinel)
        return i + 1, s, p

    def cond(state):
        i, s, p = state
        return (i < max_rounds) & jnp.any(p < n)

    _, s, _ = lax.while_loop(cond, body, (0, s, ptr0))
    return s


def accumulate(
    idxs_ds: jnp.ndarray,
    data: jnp.ndarray,
    tree: jnp.ndarray | None = None,
    nodata=None,
) -> jnp.ndarray:
    """Flow accumulation: ``out[i] = sum(data[j] for j in subtree(i))``.

    Parallel equivalent of the reference's north-star kernel
    ``streams.accuflux`` (streams.py:16-41, the ``accu[idxs_ds[i]] +=
    accu[i]`` sweep): O(log L) rounds of ``s += scatter_add(s along the
    2^k-step ancestor pointer)``.

    Invariant after round m: ``s[i]`` holds the subtree sum truncated at
    depth ``2^m`` and ``ptr[j]`` is j's ``2^m``-step ancestor (or n when the
    walk passed its root).

    Parameters
    ----------
    tree : bool array, optional
        cells that belong to a valid tree (reach a pit). Cells outside
        (missing or on/above cycles) contribute nothing and return
        ``data`` unchanged. If None, all valid cells are assumed on a tree
        (no cycles).
    nodata : scalar, optional
        reference nodata semantics (streams.py:39): nodata cells stay
        nodata, contribute nothing, and block the flow from their entire
        subtree (without poisoning cells further downstream).
    """
    n = idxs_ds.shape[0]
    ar = jnp.arange(n, dtype=idxs_ds.dtype)
    ok = valid_mask(idxs_ds) if tree is None else tree
    if nodata is not None:
        block = data == nodata
        ok = ok & ~block
    active = ok & (idxs_ds != ar)  # non-pit tree cells forward their sum
    sentinel = jnp.asarray(n, dtype=idxs_ds.dtype)
    ptr = jnp.where(active, idxs_ds, sentinel)
    s = jnp.where(ok, data, 0).astype(data.dtype)
    s = _subtree_reduce(ptr, s, "add")
    return jnp.where(ok, s, data)


def upstream_count(
    idxs_ds: jnp.ndarray, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Number of direct upstream neighbors per cell; -9 for missing cells.

    Parallel equivalent of reference ``core.upstream_count`` (core.py:51-61),
    including its mask semantics (masked cells don't count as upstream
    neighbors but still get a count themselves).
    """
    n = idxs_ds.shape[0]
    ar = jnp.arange(n, dtype=idxs_ds.dtype)
    valid = idxs_ds >= 0
    send = valid & (idxs_ds != ar)
    if mask is not None:
        send = send & mask
    sentinel = jnp.asarray(n, dtype=idxs_ds.dtype)
    tgt = jnp.where(send, idxs_ds, sentinel)
    counts = jnp.zeros(n, dtype=jnp.int32).at[tgt].add(1, mode="drop")
    return jnp.where(valid, counts, -9).astype(jnp.int8)


def main_upstream(
    idxs_ds: jnp.ndarray, uparea: jnp.ndarray, upa_min=0.0
) -> jnp.ndarray:
    """Index of the upstream neighbor with the largest ``uparea`` (> upa_min),
    -1 at headwaters.

    Parallel equivalent of reference ``core.main_upstream`` (core.py:192-219).
    The reference's sequential scan keeps the *first* strictly-greater
    upstream cell, i.e. the lowest linear index wins ties — reproduced here
    with a scatter-max over uparea followed by a scatter-min over candidate
    indices.
    """
    n = idxs_ds.shape[0]
    ar = jnp.arange(n, dtype=idxs_ds.dtype)
    send = (idxs_ds >= 0) & (idxs_ds != ar)
    sentinel = jnp.asarray(n, dtype=idxs_ds.dtype)
    tgt = jnp.where(send, idxs_ds, sentinel)
    neg_inf = _identity("max", uparea.dtype)
    upa_max = (
        jnp.full(n, neg_inf, dtype=uparea.dtype)
        .at[tgt]
        .max(jnp.where(send, uparea, neg_inf), mode="drop")
    )
    # candidates: upstream cells whose uparea equals the max at their ds cell
    is_cand = send & (uparea == upa_max[jnp.minimum(tgt, n - 1)]) & (uparea > upa_min)
    cand_idx = jnp.where(is_cand, ar, sentinel)
    best = (
        jnp.full(n, sentinel, dtype=idxs_ds.dtype)
        .at[jnp.where(is_cand, tgt, sentinel)]
        .min(cand_idx, mode="drop")
    )
    return jnp.where(best < n, best, -1).astype(idxs_ds.dtype)


# ---------------------------------------------------------------------------
# nodata filling
# ---------------------------------------------------------------------------


def fillnodata_upstream(idxs_ds: jnp.ndarray, data: jnp.ndarray, nodata) -> jnp.ndarray:
    """Fill nodata cells with the first valid value downstream.

    Parallel equivalent of reference ``core.fillnodata_upstream``
    (core.py:121-146): freeze pointers at valid-data cells and pointer-double
    to the nearest valid (or pit) cell, then gather its value.
    """
    has_data = data != nodata
    tgt = reach(idxs_ds, has_data)
    filled = data[tgt]
    valid = idxs_ds >= 0
    out = jnp.where(valid & (data == nodata), filled, data)
    # cells whose entire downstream path is nodata keep nodata
    return jnp.where(valid & ~has_data[tgt], data, out)


def fillnodata_downstream(
    idxs_ds: jnp.ndarray, data: jnp.ndarray, nodata, how: str = "max"
) -> jnp.ndarray:
    """Fill nodata cells from upstream valid values, merging at confluences.

    Parallel equivalent of reference ``core.fillnodata_downstream``
    (core.py:150-188): every (originally) nodata cell receives the
    min/max/sum over its *nearest valid ancestors* (the first valid cell up
    each upstream path). Implemented as a full-recompute fixpoint — each
    round scatters candidate values from all cells into their downstream
    neighbor; converges in max-nodata-gap-length rounds.
    """
    how = {"sum": "add"}.get(how, how)
    assert how in ("min", "max", "add")
    n = idxs_ds.shape[0]
    ar = jnp.arange(n, dtype=idxs_ds.dtype)
    valid = idxs_ds >= 0
    has_data = valid & (data != nodata)
    was_nodata = valid & (data == nodata)
    # forwarding graph H: a value travels downstream through originally-
    # nodata cells only, depositing in each; it stops before a valid cell.
    ds_sl = self_loop(idxs_ds)
    send = valid & (idxs_ds != ar) & was_nodata[ds_sl]
    sentinel = jnp.asarray(n, dtype=idxs_ds.dtype)
    ptr = jnp.where(send, idxs_ds, sentinel)
    ident = _identity(how, data.dtype)
    vals = jnp.where(has_data, data, ident)
    agg = _subtree_reduce(ptr, vals, how)
    # a nodata cell is filled iff it has at least one nearest valid ancestor
    cnt = _subtree_reduce(ptr, jnp.where(has_data, 1, 0).astype(jnp.int32), "add")
    return jnp.where(was_nodata & (cnt > 0), agg, data)


def propagate_downstream(idxs_ds: jnp.ndarray, data: jnp.ndarray) -> jnp.ndarray:
    """``out[i] = data[idxs_ds[i]]`` — one-step downstream gather, with
    missing cells keeping their own value. (Reference ``Flwdir.downstream``
    semantics, flwdir.py:394-410.)"""
    return data[self_loop(idxs_ds)]


# ---------------------------------------------------------------------------
# index-set extraction (variable-length outputs -> host numpy arrays)
# ---------------------------------------------------------------------------


def pit_indices(idxs_ds):
    """Indices of pit cells (``idxs_ds[i] == i``).

    Equivalent of reference ``core.pit_indices`` (core.py:226-232); the
    device predicate is :func:`pit_mask`, this wrapper extracts the
    (variable-length) index set on host.
    """
    import numpy as np

    ids = np.asarray(idxs_ds)
    return np.nonzero(ids == np.arange(ids.size))[0].astype(ids.dtype)


def loop_indices(idxs_ds):
    """Indices of cells on (or draining into) a cycle, i.e. ``rank == -1``.

    Equivalent of reference ``core.loop_indices`` (core.py:235-243).
    """
    import numpy as np

    r = np.asarray(rank(jnp.asarray(idxs_ds)))
    ids = np.asarray(idxs_ds)
    return np.nonzero(r == -1)[0].astype(ids.dtype)


def headwater_indices(idxs_ds, mask=None):
    """Indices of cells with no upstream neighbors.

    Equivalent of reference ``core.headwater_indices`` (core.py:246-250).
    """
    import numpy as np

    nup = np.asarray(
        upstream_count(jnp.asarray(idxs_ds), None if mask is None else jnp.asarray(mask))
    )
    ids = np.asarray(idxs_ds)
    return np.nonzero(nup == 0)[0].astype(ids.dtype)


def confluence_indices(idxs_ds, mask=None):
    """Indices of cells with two or more upstream neighbors.

    Equivalent of reference ``core.confluence_indices`` (core.py:253-257).
    """
    import numpy as np

    nup = np.asarray(
        upstream_count(jnp.asarray(idxs_ds), None if mask is None else jnp.asarray(mask))
    )
    ids = np.asarray(idxs_ds)
    return np.nonzero(nup > 1)[0].astype(ids.dtype)


def flwdir_tuples(idxs_ds, mask=None):
    """List of [upstream, downstream] linear-index pairs for valid links.

    Equivalent of reference ``core.flwdir_tuples`` (core.py:260-269):
    one pair per valid (optionally masked) cell, pits pair with themselves.
    """
    import numpy as np

    ids = np.asarray(idxs_ds)
    keep = ids >= 0
    if mask is not None:
        keep = keep & (np.asarray(mask) == 1)
    idx0 = np.nonzero(keep)[0]
    return [np.array([i, ids[i]], dtype=ids.dtype) for i in idx0]


def idxs_seq(idxs_ds, idxs_pit=None):
    """Topological cell ordering, downstream cells first.

    Equivalent of reference ``core.idxs_seq`` (core.py:88-117), which BFSs
    up from the pits; here the same ordering class is derived from the
    device :func:`rank` kernel — a stable argsort of distance-to-pit, so
    every cell appears after its downstream neighbor. Loop / missing cells
    are excluded, matching the reference's unreachable-cell behavior.

    ``idxs_pit`` optionally restricts the ordering to cells draining to
    that pit subset (reference core.py:92 seeds the BFS from the given
    pits). The permutation is a valid topological order, not the
    reference's exact BFS order.
    """
    import numpy as np

    ids = np.asarray(idxs_ds)
    r = np.asarray(rank(jnp.asarray(ids)))
    valid = r >= 0
    if idxs_pit is not None:
        root = np.asarray(roots(jnp.asarray(ids)))
        sel = np.zeros(ids.size, dtype=bool)
        sel[np.asarray(idxs_pit)] = True
        valid = valid & sel[root]
    return np.nonzero(valid)[0][np.argsort(r[valid], kind="stable")].astype(ids.dtype)


def upstream_matrix(idxs_ds_np):
    """(n, d) matrix of upstream cell indices per cell, padded with -1.

    Host (numpy) parity helper for reference ``core.upstream_matrix``
    (core.py:68-84): row i lists the cells draining into i in ascending
    index order; d is the maximum fan-in.
    """
    import numpy as np

    ids = np.asarray(idxs_ds_np)
    n = ids.size
    ar = np.arange(n)
    is_child = (ids >= 0) & (ids != ar)
    children = ar[is_child]
    parents = ids[is_child]
    order = np.argsort(parents, kind="stable")
    children = children[order]
    parents = parents[order]
    counts = np.bincount(parents, minlength=n)
    d = int(counts.max()) if counts.size else 0
    out = np.full((n, max(d, 1)), -1, dtype=ids.dtype)
    group_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(children.size) - group_start[parents]
    out[parents, slot] = children
    return out
