"""River classification and hydraulic depth estimation.

TPU-native equivalents of the reference ``pyflwdir/rivers.py``: the
estuary width-convergence walk (rivers.py:11-50) becomes a path-AND
reduction; the experimental gradually-varied-flow solver (rivers.py:53-101)
keeps its sequential scipy RK45 integration on the host (each node's depth
depends on its downstream node's final depth).
"""

from __future__ import annotations

import logging

import numpy as np

import jax.numpy as jnp

from .ops import graph

logger = logging.getLogger(__name__)

__all__ = ["classify_estuary", "rivdph_gvf"]


def classify_estuary(
    idxs_ds,
    idxs_pit,
    rivdst,
    rivwth,
    elevtn,
    max_elevtn=0,
    min_convergence=1e-2,
):
    """Classify estuaries by river-width convergence.

    Parity: reference ``rivers.classify_estuary`` (rivers.py:11-50): start
    at low-elevation pits; a cell is estuary (1) while the width keeps
    converging moving upstream; the first cell where convergence fails
    marks its downstream cell as the estuary's upstream end (2).

    The sequential sweep telescopes: estuary(i) = seed(root) AND the
    per-edge convergence condition holds for every cell on the path
    root..i — a path-min reduction.
    """
    n = idxs_ds.shape[0]
    ar = jnp.arange(n, dtype=idxs_ds.dtype)
    valid = idxs_ds >= 0
    ds = graph.self_loop(idxs_ds)
    ispit = ds == ar

    seed = jnp.zeros(n, dtype=bool)
    idxs_pit = jnp.asarray(idxs_pit)
    seed = seed.at[idxs_pit].set(jnp.asarray(elevtn)[idxs_pit] <= max_elevtn)

    dx = jnp.asarray(rivdst) - jnp.asarray(rivdst)[ds]
    dw = jnp.asarray(rivwth)[ds] - jnp.asarray(rivwth)
    conv = jnp.where(dx > 0, dw / jnp.where(dx > 0, dx, 1.0), 0.0)
    cond = ((jnp.asarray(rivdst)[ds] == 0) & (dw <= 0)) | ((dx > 0) & (conv > min_convergence))
    cond = cond & valid & ~ispit

    root = graph.reach(idxs_ds, None)
    pathmin = graph.path_reduce(
        idxs_ds, cond.astype(jnp.int32), op="min"
    )  # half-open: includes i, excludes root
    chain = jnp.where(ispit, seed, (pathmin > 0) & seed[root] & valid)
    est = jnp.where(chain, 1, 0).astype(jnp.int8)
    # upstream-end marking: a chain cell whose upstream neighbor fails
    fail = valid & ~ispit & ~cond & chain[ds]
    sentinel = jnp.asarray(n, dtype=idxs_ds.dtype)
    tgt = jnp.where(fail, ds, sentinel)
    failed_below = jnp.zeros(n, dtype=jnp.int32).at[tgt].add(1, mode="drop") > 0
    est = jnp.where(chain & failed_below, 2, est).astype(jnp.int8)
    return est


def rivdph_gvf(
    idxs_ds_np,
    rank_np,
    zs,
    rivdph,
    qbankfull,
    rivdst,
    rivwth,
    manning,
    min_rivslp=1e-5,
    min_rivdph=1,
    eps=1e-1,
    n_iter=2,
):
    """Gradually-varied-flow river depth solver (host, experimental).

    Parity: reference ``rivers.rivdph_gvf`` (rivers.py:53-101): per-node
    RK45 integration of dh/dx from the downstream node's depth, swept
    down- to upstream, repeated ``n_iter`` times with updated bed levels.
    """
    from scipy.integrate import solve_ivp

    def _gvf(x, h, nman, q, s0, w, g=9.81):
        h = max(h[0] if np.ndim(h) else h, eps)
        sf = nman**2 * (q / (w * h)) ** 2 * ((w * h) / (2 * h + w)) ** (-4 / 3)
        fr = q / (w * np.sqrt(g * h))
        dhdx = (s0 - sf) / (1 - fr**2)
        return -dhdx

    valid = rank_np >= 0
    order = np.argsort(rank_np[valid], kind="stable")
    seq = np.where(valid)[0][order]
    rivdph_out = np.asarray(rivdph, dtype=np.float64).copy()
    zb = np.asarray(zs) - rivdph_out
    for _ in range(n_iter):
        for idx in seq:  # down- to upstream
            idx_ds = idxs_ds_np[idx]
            if qbankfull[idx] <= 0 or rivwth[idx] <= 0 or idx == idx_ds:
                continue
            dz = zb[idx] - zb[idx_ds]
            dx = rivdst[idx] - rivdst[idx_ds]
            slp = max(min_rivslp, dz / dx)
            h0 = rivdph_out[idx_ds]
            args = (manning[idx], qbankfull[idx], slp, rivwth[idx])
            sol = solve_ivp(_gvf, [0, dx], [h0], method="RK45", args=args)
            h1 = sol.y[-1][-1]
            if abs((h1 - h0) / dx) > 1 or h1 < 0 or not sol.success:
                logger.warning(sol.message)
            else:
                rivdph_out[idx] = max(min_rivdph, h1)
        zb = np.asarray(zs) - rivdph_out
    return rivdph_out
