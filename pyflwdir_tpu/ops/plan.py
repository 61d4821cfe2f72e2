"""Euler-tour (DFS interval) accumulation plan.

The doubling scatter-add in :func:`pyflwdir_tpu.ops.graph.accumulate` is
correct everywhere but scatter-bound on TPU. For a *static* graph the
subtree-sum operator has a much faster form: precompute a DFS preorder of
the flow forest once (host, O(n) — the analogue of the reference's cached
``seq``, flwdir.py:164-168), under which every subtree is a contiguous
interval ``[pos[i], pos[i]+size[i])``. Flow accumulation then is::

    c    = cumsum(data[preorder])           # one prefix sum
    accu = c[pos + size - 1] - c[pos - 1]   # two gathers

— all dense HBM-bandwidth ops on TPU, no scatters. The plan arrays live on
device and are reused across calls (like the reference's cached ``seq``).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ["DfsPlan", "build_plan", "accumulate_planned"]


class DfsPlan:
    """Device-resident DFS-interval plan for a fixed flow graph.

    Attributes
    ----------
    preorder : (k,) int32 — tree cells in DFS preorder
    pos : (n,) int32 — position of each cell in preorder, -1 off-tree
    size : (n,) int32 — subtree size (0 off-tree)
    """

    def __init__(self, preorder, pos, size):
        self.preorder = jnp.asarray(preorder, dtype=jnp.int32)
        self.pos = jnp.asarray(pos, dtype=jnp.int32)
        self.size = jnp.asarray(size, dtype=jnp.int32)
        self.n_tree = int(self.preorder.shape[0])


def _dfs_py(idxs_ds):
    """Pure-python DFS preorder fallback (small grids / no native lib)."""
    n = idxs_ds.size
    # children adjacency via counting sort by parent (ascending child index)
    ds = idxs_ds
    is_child = (ds >= 0) & (ds != np.arange(n))
    order = np.argsort(ds[is_child], kind="stable")
    child_nodes = np.where(is_child)[0][order]
    parents = ds[is_child][order]
    starts = np.searchsorted(parents, np.arange(n))
    ends = np.searchsorted(parents, np.arange(n), side="right")
    pos = np.full(n, -1, dtype=np.int64)
    size = np.zeros(n, dtype=np.int64)
    preorder = np.empty(n, dtype=np.int64)
    k = 0
    pits = np.where(ds == np.arange(n))[0]
    for p in pits:
        stack = [(int(p), int(starts[p]))]
        pos[p] = k
        preorder[k] = p
        k += 1
        while stack:
            u, cur = stack[-1]
            if cur < ends[u]:
                stack[-1] = (u, cur + 1)
                v = int(child_nodes[cur])
                pos[v] = k
                preorder[k] = v
                k += 1
                stack.append((v, int(starts[v])))
            else:
                stack.pop()
    size[pos >= 0] = 1
    for j in range(k - 1, -1, -1):
        u = preorder[j]
        d = ds[u]
        if d >= 0 and d != u:
            size[d] += size[u]
    return preorder[:k], pos, size


def build_plan(idxs_ds_np) -> DfsPlan:
    """Build the DFS plan for a graph (native C++ when available)."""
    idxs_ds_np = np.asarray(idxs_ds_np)
    try:
        from ..runtime import _lib  # noqa: PLC2701

        if _lib is not None and hasattr(_lib, "dfs_preorder"):
            import ctypes

            n = idxs_ds_np.size
            ids64 = np.ascontiguousarray(idxs_ds_np, dtype=np.int64)
            preorder = np.empty(n, dtype=np.int64)
            pos = np.empty(n, dtype=np.int64)
            size = np.empty(n, dtype=np.int64)
            _lib.dfs_preorder.restype = ctypes.c_int64
            _lib.dfs_preorder.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            k = _lib.dfs_preorder(
                ids64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                n,
                preorder.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                size.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )
            return DfsPlan(preorder[:k], pos, size)
    except ImportError:
        pass
    return DfsPlan(*_dfs_py(idxs_ds_np))


def accumulate_planned(plan: DfsPlan, data: jnp.ndarray) -> jnp.ndarray:
    """Flow accumulation via the DFS-interval plan (jit-safe).

    ``out[i] = sum(data[j] for j in subtree(i))`` for tree cells; off-tree
    cells return ``data`` unchanged. Matches
    :func:`pyflwdir_tpu.ops.graph.accumulate` without nodata blocking.
    """
    import jax

    if plan.n_tree == 0:
        return data
    # accumulate in the widest available dtype: integer sums are exact in
    # int32/int64; float prefix sums use float64 when x64 is enabled (CPU)
    # to avoid cancellation in the interval differences
    x64 = jax.dtypes.canonicalize_dtype(jnp.float64) == jnp.float64
    if jnp.issubdtype(data.dtype, jnp.integer) or data.dtype == jnp.bool_:
        acc_dtype = jnp.int64 if x64 else jnp.int32
    else:
        acc_dtype = jnp.float64 if x64 else jnp.float32
    g = data[plan.preorder].astype(acc_dtype)
    c = jnp.cumsum(g)
    start = plan.pos
    end = plan.pos + plan.size - 1
    on_tree = plan.pos >= 0
    end_c = c[jnp.clip(end, 0, plan.n_tree - 1)]
    start_c = jnp.where(start > 0, c[jnp.clip(start - 1, 0, plan.n_tree - 1)], 0)
    out = end_c - start_c
    return jnp.where(on_tree, out.astype(data.dtype), data)
