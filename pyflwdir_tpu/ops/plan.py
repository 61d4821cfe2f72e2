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
from jax import lax

__all__ = ["DfsPlan", "build_plan", "accumulate_planned", "accumulate_planned_fast"]


class DfsPlan:
    """Device-resident DFS-interval plan for a fixed flow graph.

    Attributes
    ----------
    preorder : (k,) int32 — tree cells in DFS preorder
    pos : (n,) int32 — position of each cell in preorder, -1 off-tree
    size : (n,) int32 — subtree size (0 off-tree)

    The fast-kernel arrays (``_build_fast``) split the interval-end gather
    ``c[k + size - 1]`` by distance: ~92%% of subtrees end within 128
    positions and are resolved by a per-128-block one-hot matmul over a
    256-wide window (dense, MXU); the rare far ends use a small XLA gather.
    """

    _BLK = 128

    def __init__(self, preorder, pos, size, fast=True):
        # host copies (plan assembly stays on host; device upload lazy —
        # jnp.asarray of host data yields concrete constants, never
        # tracers, so caching on first use is trace-safe)
        self.preorder_np = np.asarray(preorder, dtype=np.int32)
        self.pos_np = np.asarray(pos, dtype=np.int32)
        self.size_np = np.asarray(size, dtype=np.int32)
        self._dev3 = None
        self.n_tree = int(self.preorder_np.shape[0])
        self._fast = self._build_fast() if (self.n_tree and fast) else None

    def _dev(self):
        if self._dev3 is None:
            import jax

            t = (
                jnp.asarray(self.preorder_np),
                jnp.asarray(self.pos_np),
                jnp.asarray(self.size_np),
            )
            if any(isinstance(x, jax.core.Tracer) for x in t):
                return t  # inside a trace: use, but do not cache
            self._dev3 = t
        return self._dev3

    @property
    def preorder(self):
        return self._dev()[0]

    @property
    def pos(self):
        return self._dev()[1]

    @property
    def size(self):
        return self._dev()[2]

    def fast(self):
        return self._fast

    def _build_fast(self):
        blk = self._BLK
        n = int(self.pos_np.shape[0])
        k_np = np.arange(self.n_tree, dtype=np.int64)
        pre_np = self.preorder_np
        d_np = self.size_np[pre_np].astype(np.int64) - 1  # end distance
        npad = ((self.n_tree + blk - 1) // blk) * blk
        pad = npad - self.n_tree
        e_np = np.concatenate([k_np + d_np, np.arange(self.n_tree, npad)])
        d_pad = np.concatenate([d_np, np.zeros(pad, dtype=np.int64)])
        near = d_pad < blk
        win_idx = np.where(near, e_np - (np.arange(npad) // blk) * blk, 0)
        far_k = np.where(~near)[0]
        far_e = e_np[far_k]
        # off-tree cells (missing / loops) keep their input values
        off_tree = np.where(self.pos_np < 0)[0]
        return {
            "npad": npad,
            "near": jnp.asarray(near),
            "win_idx": jnp.asarray(win_idx.astype(np.int32).reshape(-1, blk)),
            "far_k": jnp.asarray(far_k.astype(np.int32)),
            "far_e": jnp.asarray(far_e.astype(np.int32)),
            "off_tree": jnp.asarray(off_tree.astype(np.int32)),
        }


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


def build_plan(idxs_ds_np, fast=True) -> DfsPlan:
    """Build the DFS plan for a graph (native C++ when available).

    ``fast=False`` skips the device-side interval-end tables (used when a
    router-based :mod:`ops.accel` plan will execute the accumulation).
    """
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
            return DfsPlan(preorder[:k], pos, size, fast=fast)
    except ImportError:
        pass
    return DfsPlan(*_dfs_py(idxs_ds_np), fast=fast)


def _acc_dtype(dtype):
    """Widest available accumulation dtype: integer sums are exact in
    int32/int64; float prefix sums use float64 when x64 is enabled (CPU)
    to avoid cancellation in the interval differences."""
    import jax

    x64 = jax.dtypes.canonicalize_dtype(jnp.float64) == jnp.float64
    if jnp.issubdtype(dtype, jnp.integer) or dtype == jnp.bool_:
        return jnp.int64 if x64 else jnp.int32
    return jnp.float64 if x64 else jnp.float32


def _compensated(dtype):
    """True when float input must run the two-float compensated path:
    with x64 unavailable (TPU default) a plain float32 prefix sum loses
    O(eps * running_total) absolute accuracy in the interval differences
    (~1e5 m^2 on continental real-area grids)."""
    import jax

    x64 = jax.dtypes.canonicalize_dtype(jnp.float64) == jnp.float64
    return not x64 and not (
        jnp.issubdtype(dtype, jnp.integer) or dtype == jnp.bool_
    )


def _two_sum(a, b):
    """Knuth error-free transform: a + b = s + err exactly."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _df_add(x, y):
    """Double-float addition of (hi, lo) pairs — quasi-associative with
    ~2^-48 relative error, usable inside ``lax.associative_scan``."""
    hi, e = _two_sum(x[0], y[0])
    lo = e + (x[1] + y[1])
    s = hi + lo
    return s, lo - (s - hi)


def _comp_cumsum(x):
    """Compensated inclusive prefix sum of a float32 vector: returns
    (hi, lo) planes with hi + lo accurate to ~2 ulps of the true sum."""
    zeros = jnp.zeros_like(x)
    return lax.associative_scan(_df_add, (x, zeros))


def _df_diff(end, start):
    """Accurate interval difference of two (hi, lo) prefix-sum samples."""
    d, e = _two_sum(end[0], -start[0])
    return d + (e + (end[1] - start[1]))


def accumulate_planned(plan: DfsPlan, data: jnp.ndarray) -> jnp.ndarray:
    """Flow accumulation via the DFS-interval plan (jit-safe).

    ``out[i] = sum(data[j] for j in subtree(i))`` for tree cells; off-tree
    cells return ``data`` unchanged. Matches
    :func:`pyflwdir_tpu.ops.graph.accumulate` without nodata blocking.
    """
    if plan.n_tree == 0:
        return data
    acc_dtype = _acc_dtype(data.dtype)
    g = data[plan.preorder].astype(acc_dtype)
    start = plan.pos
    end = plan.pos + plan.size - 1
    on_tree = plan.pos >= 0
    e_idx = jnp.clip(end, 0, plan.n_tree - 1)
    s_idx = jnp.clip(start - 1, 0, plan.n_tree - 1)
    s_live = start > 0
    if _compensated(data.dtype):
        c_hi, c_lo = _comp_cumsum(g)
        zero = jnp.zeros((), acc_dtype)
        out = _df_diff(
            (c_hi[e_idx], c_lo[e_idx]),
            (
                jnp.where(s_live, c_hi[s_idx], zero),
                jnp.where(s_live, c_lo[s_idx], zero),
            ),
        )
    else:
        c = jnp.cumsum(g)
        out = c[e_idx] - jnp.where(s_live, c[s_idx], 0)
    return jnp.where(on_tree, out.astype(data.dtype), data)


def accumulate_planned_fast(plan: DfsPlan, data: jnp.ndarray) -> jnp.ndarray:
    """TPU-optimized planned accumulation (jit-safe).

    Same result as :func:`accumulate_planned`, engineered around the TPU's
    slow arbitrary gathers:

    1. permute to preorder via two-operand ``lax.sort`` (bitonic, vector
       units) instead of an XLA gather;
    2. prefix sum;
    3. interval ends: ~92%% of subtrees end within 128 positions — served
       by a per-block one-hot matmul over a 256-wide window (MXU); the
       remaining far ends use one small gather;
    4. interval starts are a plain shift in preorder layout;
    5. permute back via ``lax.sort`` on the preorder keys.
    """
    if plan.n_tree == 0:
        return data
    blk = plan._BLK
    f = plan.fast()
    npad = f["npad"]
    n = data.shape[0]
    acc_dtype = _acc_dtype(data.dtype)

    # 1. cell -> preorder layout via sort by position (off-tree cells sort
    # to the tail with key npad+)
    pos_key = jnp.where(plan.pos >= 0, plan.pos, npad + jnp.arange(n, dtype=jnp.int32))
    _, x_pre_full = lax.sort((pos_key, data.astype(acc_dtype)), num_keys=1)
    x_pre = x_pre_full[: plan.n_tree]
    x_pad = jnp.concatenate(
        [x_pre, jnp.zeros(npad - plan.n_tree, dtype=acc_dtype)]
    )

    # 2. prefix sum over the preorder sequence — two-float compensated
    # planes when float32 is the widest dtype available (TPU)
    comp = _compensated(data.dtype)
    planes = _comp_cumsum(x_pad) if comp else (jnp.cumsum(x_pad),)

    # 3. interval-end values g[k] = c[k + d[k]], per plane (the one-hot
    # matmul is pure selection — exact on each plane separately)
    m = npad // blk
    onehot = (
        f["win_idx"][:, :, None]
        == lax.broadcasted_iota(jnp.int32, (m, blk, 2 * blk), 2)
    ).astype(acc_dtype)

    def ends(c):
        cb = c.reshape(m, blk)
        cwin = jnp.concatenate(
            [cb, jnp.concatenate([cb[1:], cb[:1]], axis=0)], axis=1
        )
        g_near = jnp.einsum(
            "bj,bij->bi",
            cwin,
            onehot,
            preferred_element_type=cwin.dtype,
            # HIGHEST is required for exactness on TPU: the MXU's default
            # bf16 pass rounds the *selected prefix values* (magnitudes up
            # to the global running total) to 8-bit mantissas — measured
            # errors up to 1024 cells on the Rhine before this flag
            precision=lax.Precision.HIGHEST,
        ).ravel()
        g = jnp.where(f["near"], g_near, 0)
        return g.at[f["far_k"]].set(c[f["far_e"]], mode="drop")

    # 4. interval starts: c[k-1] is a shift in this layout
    def starts(c):
        return jnp.concatenate([jnp.zeros(1, dtype=acc_dtype), c[:-1]])

    if comp:
        accu_pad = _df_diff(
            tuple(ends(c) for c in planes), tuple(starts(c) for c in planes)
        )
    else:
        accu_pad = ends(planes[0]) - starts(planes[0])

    # 5. preorder -> cell layout via sort by cell index
    accu_pre = accu_pad[: plan.n_tree]
    keys = jnp.concatenate([plan.preorder, f["off_tree"]])
    vals = jnp.concatenate(
        [accu_pre, data.astype(acc_dtype)[f["off_tree"]]]
    )
    _, out = lax.sort((keys, vals), num_keys=1)
    return out.astype(data.dtype)
