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


def _gvf_depth_gradient(h, w, q, nman, s0, eps, g=9.81):
    """Backwater (gradually-varied-flow) depth gradient -dh/dx for a
    rectangular channel, vectorized over nodes.

    Friction slope from Manning's equation with hydraulic radius
    ``wh / (w + 2h)``; denominator from the Froude number. Published GVF
    form (same physics as reference rivers.py:63-70).
    """
    h = np.maximum(h, eps)
    area = w * h
    rad = area / (w + 2.0 * h)
    sf = (nman * q / area) ** 2 * rad ** (-4.0 / 3.0)
    fr2 = (q / (w * np.sqrt(g * h))) ** 2
    return (s0 - sf) / (1.0 - fr2)


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
    n_substeps=16,
):
    """Gradually-varied-flow river depth (host, experimental).

    Behavioral counterpart of reference ``rivers.rivdph_gvf``
    (rivers.py:53-101) with a parallel re-design: each node's depth is the
    downstream-node depth integrated upstream along the reach, so nodes of
    equal rank are independent — the solver sweeps rank levels (not single
    cells) and integrates all nodes of a level at once with fixed-step
    RK4 (``n_substeps`` steps per reach) instead of per-node adaptive
    scipy calls. Updates with |dh/dx| > 1 or negative depth are rejected,
    as in the reference. Repeated ``n_iter`` times with updated bed levels.
    """
    ranks = np.asarray(rank_np)
    ds = np.asarray(idxs_ds_np)
    q = np.asarray(qbankfull, dtype=np.float64)
    w = np.asarray(rivwth, dtype=np.float64)
    x = np.asarray(rivdst, dtype=np.float64)
    nman = np.asarray(manning, dtype=np.float64)
    depth = np.asarray(rivdph, dtype=np.float64).copy()

    live = (ranks >= 1) & (q > 0) & (w > 0) & (ds != np.arange(ds.size))
    max_rank = int(ranks.max()) if ranks.size else 0
    for _ in range(n_iter):
        zbed = np.asarray(zs, dtype=np.float64) - depth
        for r in range(1, max_rank + 1):
            lvl = np.where(live & (ranks == r))[0]
            if lvl.size == 0:
                continue
            dn = ds[lvl]
            dx = x[lvl] - x[dn]
            slp = np.maximum(min_rivslp, (zbed[lvl] - zbed[dn]) / dx)
            h = depth[dn].copy()
            step = dx / n_substeps
            for _k in range(n_substeps):
                # classic RK4 on dh/ds = +gradient (integrating upstream)
                k1 = _gvf_depth_gradient(h, w[lvl], q[lvl], nman[lvl], slp, eps)
                k2 = _gvf_depth_gradient(
                    h + 0.5 * step * k1, w[lvl], q[lvl], nman[lvl], slp, eps
                )
                k3 = _gvf_depth_gradient(
                    h + 0.5 * step * k2, w[lvl], q[lvl], nman[lvl], slp, eps
                )
                k4 = _gvf_depth_gradient(
                    h + step * k3, w[lvl], q[lvl], nman[lvl], slp, eps
                )
                h = h + step / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
            bad = (np.abs((h - depth[dn]) / dx) > 1) | (h < 0) | ~np.isfinite(h)
            if bad.any():
                logger.warning(
                    "gvf: rejecting %d unstable depth updates", int(bad.sum())
                )
            upd = lvl[~bad]
            depth[upd] = np.maximum(min_rivdph, h[~bad])
    return depth
