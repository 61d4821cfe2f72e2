"""Durable on-disk tile plans (build once, load in seconds).

The reference caches its topological order in memory per object
(/root/reference/pyflwdir/flwdir.py:164-168) and re-derives it per
process; at continental scale the analogous :class:`ops.tile_plan.TilePlan`
build costs minutes of host work (per-tile DFS + Euler colorings), which
would otherwise be re-paid by every cold process before a 30 ms sweep can
run.  This module makes the plan a *directory artifact*:

* ``save_tile_plan`` writes every router/mask table as its own ``.npy``
  (plus a JSON manifest), including the downward-transpose tables and the
  coarse-level router plan, so nothing is recomputed on load;
* ``load_tile_plan`` reconstructs the plan with ``mmap``-backed tables —
  metadata loads in milliseconds and table bytes page in lazily on first
  device upload (the upload itself is the same cost the in-memory plan
  pays on its first sweep).

Layout: ``<dir>/plan.json`` + ``<dir>/{tabs,down,cd,coarse}/<name>.npy``.
"""

from __future__ import annotations

import json
import os

import numpy as np

__all__ = ["save_tile_plan", "load_tile_plan", "PLAN_FORMAT"]

PLAN_FORMAT = 1


def _save_arr(root, group, name, arr):
    d = os.path.join(root, group)
    os.makedirs(d, exist_ok=True)
    np.save(os.path.join(d, f"{name}.npy"), np.ascontiguousarray(arr))


def _load_arr(root, group, name, mmap):
    return np.load(
        os.path.join(root, group, f"{name}.npy"),
        mmap_mode="r" if mmap else None,
    )


def save_tile_plan(tp, path, down=True):
    """Serialize a :class:`~pyflwdir_tpu.ops.tile_plan.TilePlan` to a
    directory. With ``down=True`` (default) the downward-transpose tables
    are built (if not already) and included, so a loaded plan serves both
    :meth:`accumulate` and :meth:`accumulate_down` with zero host rebuild.
    """
    from .accel_big import BigAccelPlan

    os.makedirs(path, exist_ok=True)
    if down:
        tp._ensure_down()

    meta = {
        "format": PLAN_FORMAT,
        "kind": "tile_plan",
        "shape": list(tp.shape),
        "tile_rows": int(tp.Y),
        "far_mode": tp.far_mode,
        "b": int(tp.b),
        "R_pad": int(tp.R_pad),
        "E_pad": int(tp.E_pad),
        "F_rows": int(tp.F_rows),
        "has_far": bool(tp.has_far),
        "has_entries": bool(tp.has_entries),
        "n_exit_flat": int(tp.n_exit_flat),
        "coarse_kind": type(tp.coarse).__name__,
        "coarse_m": int(tp._coarse_meta["m"]),
        "coarse_D": int(tp._coarse_meta["D"]),
        "down": bool(down and tp._down is not None),
        "tabs": sorted(tp._tabs_np.keys()),
    }

    for k, v in tp._tabs_np.items():
        _save_arr(path, "tabs", k, v)

    # small per-root metadata (used by the downward build / diagnostics)
    cnt_r, root_end = tp._root_np
    _save_arr(path, "meta", "cnt_r", cnt_r)
    _save_arr(path, "meta", "root_end", root_end)

    # coarse level: DFS + slot maps always; the colored router tables when
    # the coarse solve runs on a BigAccelPlan (so load skips the coloring)
    dfs = tp._coarse_dfs
    _save_arr(path, "coarse", "preorder", dfs.preorder_np)
    _save_arr(path, "coarse", "pos", dfs.pos_np)
    _save_arr(path, "coarse", "size", dfs.size_np)
    _save_arr(path, "coarse", "in_slot", tp._coarse_meta["in_slot"])
    _save_arr(path, "coarse", "out_slot", tp._coarse_meta["out_slot"])
    _save_arr(path, "coarse", "coarse_ds", tp._coarse_ds_np)
    if isinstance(tp.coarse, BigAccelPlan):
        rt = tp.coarse.router_tables()
        meta["coarse_G1"] = int(rt["G1"])
        meta["coarse_routers"] = [
            k for k in ("r_in", "r_far", "r_exp", "r_out") if k in rt
        ]
        for name in meta["coarse_routers"]:
            for i, st in enumerate(rt[name]):
                _save_arr(path, "coarse", f"{name}_{i}", st)
    elif type(tp.coarse).__name__ == "_CoarseRouterSmall":
        rt = tp.coarse.router_tables()
        meta["coarse_G"] = int(rt["G"])
        meta["coarse_n_in"] = int(tp.coarse.n_in)
        meta["coarse_routers"] = [
            k for k in ("r_in", "r_out", "r_far", "r_exp") if k in rt
        ]
        for name in meta["coarse_routers"]:
            for i, st in enumerate(rt[name]):
                _save_arr(path, "coarse", f"{name}_{i}", st)

    if meta["down"]:
        dn = tp._down
        meta["down_tabs"] = sorted(dn["tabs"].keys())
        meta["down_k"] = int(dn["k"])
        meta["down_coarse_router"] = bool(dn.get("coarse_router"))
        for k, v in dn["tabs"].items():
            _save_arr(path, "down", k, v)
        for k, v in dn["cd"].items():
            _save_arr(path, "cd", k, v)
        if meta["down_coarse_router"]:
            rt = tp.coarse.down_router_tables()
            meta["down_coarse_stages"] = len(rt["r_es"])
            for name in ("r_es", "r_dea", "r_deb"):
                for i, st in enumerate(rt[name]):
                    _save_arr(path, "coarse_down", f"{name}_{i}", st)

    with open(os.path.join(path, "plan.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def load_tile_plan(path, mmap=True):
    """Load a :func:`save_tile_plan` directory back into a fully usable
    :class:`~pyflwdir_tpu.ops.tile_plan.TilePlan` (no DFS, no coloring —
    the only remaining cold cost is the first device upload, which every
    plan pays).  With ``mmap=True`` table bytes stay on disk until used.
    """
    from .accel_big import BigAccelPlan
    from .plan import DfsPlan
    from .router import _S
    from .router_big import RouterPlanBig
    from .tile_plan import TilePlan, _CoarseGather

    with open(os.path.join(path, "plan.json")) as f:
        meta = json.load(f)
    if meta.get("kind") != "tile_plan" or meta.get("format") != PLAN_FORMAT:
        raise ValueError(f"{path}: not a tile-plan checkpoint")

    tp = TilePlan.__new__(TilePlan)
    H, W = map(int, meta["shape"])
    th = int(meta["tile_rows"])
    tp.shape = (H, W)
    tp.Y = th
    tp.G = th // _S
    Hp = -(-H // th) * th
    Wp = -(-W // _S) * _S
    tp.pshape = (Hp, Wp)
    nty, ntx = Hp // th, Wp // _S
    tp.grid = (nty, ntx)
    tp.NT = nty * ntx
    tp.far_mode = meta["far_mode"]
    tp.b = int(meta["b"])
    tp.R_pad = int(meta["R_pad"])
    tp.R_rows = max(tp.R_pad // _S, 0)
    tp.E_pad = int(meta["E_pad"])
    tp.E_rows = max(tp.E_pad // _S, 1)
    tp.F_rows = int(meta["F_rows"])
    tp.has_far = bool(meta["has_far"])
    tp.has_entries = bool(meta["has_entries"])
    tp.n_exit_flat = int(meta["n_exit_flat"])

    tp._tabs_np = {k: _load_arr(path, "tabs", k, mmap) for k in meta["tabs"]}
    tp._root_np = (
        np.asarray(_load_arr(path, "meta", "cnt_r", False)),
        np.asarray(_load_arr(path, "meta", "root_end", False)),
    )
    # the raw build intermediates are not persisted; everything derived
    # from them (down tables, coarse plan) is stored instead
    tp._sig_np = None
    tp._far_np = None

    dfs = DfsPlan(
        np.asarray(_load_arr(path, "coarse", "preorder", False)),
        np.asarray(_load_arr(path, "coarse", "pos", False)),
        np.asarray(_load_arr(path, "coarse", "size", False)),
        fast=False,
    )
    in_slot = np.asarray(_load_arr(path, "coarse", "in_slot", False))
    out_slot = np.asarray(_load_arr(path, "coarse", "out_slot", False))
    tp._coarse_dfs = dfs
    tp._coarse_meta = {
        "in_slot": in_slot,
        "out_slot": out_slot,
        "m": int(meta["coarse_m"]),
        "D": int(meta["coarse_D"]),
    }
    tp._coarse_ds_np = np.asarray(_load_arr(path, "coarse", "coarse_ds", False))
    if meta["coarse_kind"] == "BigAccelPlan":
        routers = {"G1": np.int64(meta["coarse_G1"])}
        for name in meta["coarse_routers"]:
            stages = []
            for i in range(7):
                stages.append(
                    np.asarray(_load_arr(path, "coarse", f"{name}_{i}", mmap))
                )
            routers[name] = tuple(stages)
        tp.coarse = BigAccelPlan(
            dfs,
            tp._coarse_ds_np,
            routers=routers,
            in_slot=in_slot,
            out_slot=out_slot,
        )
        if not tp.coarse.ok:
            raise ValueError("loaded coarse graph exceeds router capacity")
    elif meta["coarse_kind"] == "_CoarseRouterSmall":
        from .tile_plan import _CoarseRouterSmall

        routers = {"G": np.int64(meta["coarse_G"])}
        for name in meta["coarse_routers"]:
            routers[name] = tuple(
                np.asarray(_load_arr(path, "coarse", f"{name}_{i}", mmap))
                for i in range(5)
            )
        tp.coarse = _CoarseRouterSmall(
            dfs,
            in_slot,
            out_slot,
            n_in=meta.get("coarse_n_in"),
            routers=routers,
        )
        if not tp.coarse.ok:
            raise ValueError("loaded coarse graph exceeds router capacity")
    else:
        tp.coarse = _CoarseGather(
            dfs, in_slot, out_slot, tp.n_exit_flat, tp.NT * max(tp.E_pad, 1)
        )

    if meta.get("down"):
        use_cr = bool(meta.get("down_coarse_router"))
        if use_cr:
            n_st = int(meta.get("down_coarse_stages", 5))
            if meta["coarse_kind"] == "_CoarseRouterSmall":
                routers = {"G": np.int64(meta["coarse_G"])}
            else:
                routers = {"G1": np.int64(meta["coarse_G1"])}
            for name in ("r_es", "r_dea", "r_deb"):
                routers[name] = tuple(
                    np.asarray(
                        _load_arr(path, "coarse_down", f"{name}_{i}", mmap)
                    )
                    for i in range(n_st)
                )
            tp.coarse.build_down(dfs, routers=routers)
        tp._down = {
            "tabs": {
                k: _load_arr(path, "down", k, mmap) for k in meta["down_tabs"]
            },
            "cd": {
                k: np.asarray(_load_arr(path, "cd", k, False))
                for k in ("pre", "pos", "ends_pre", "e2n", "wmap")
            },
            "coarse_router": use_cr,
            "k": int(meta["down_k"]),
        }
        tp._down_dev = None
    else:
        tp._down = None

    tp._dev = None
    return tp
