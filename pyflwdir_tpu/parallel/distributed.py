"""Multi-host scaffolding: jax.distributed init, global meshes, scaling.

The reference is single-process (SURVEY.md §5); this module adds the
multi-host entry points the TPU runtime needs:

* :func:`init_distributed` — idempotent ``jax.distributed.initialize``
  driven by the standard coordinator env vars (no-op single-process, so
  library code can call it unconditionally);
* :func:`global_mesh` — a 2-D ("ty", "tx") mesh over *all* global devices,
  laid out so the fast ("tx") axis stays within a host (ICI) and the slow
  axis crosses hosts (DCN) — tile halos then ride ICI for the common
  east/west exchanges;
* :func:`scaling_report` — fixed-size (strong-scaling) efficiency of the
  tiled accumulation on 1 vs N devices, the harness behind the north-star
  ">= 80% at N >= 2" target.
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax

from .tiled import make_mesh, tiled_accumulate

__all__ = [
    "init_distributed",
    "global_mesh",
    "scaling_report",
    "scaling_model",
    "weak_scaling_report",
]

_initialized = False


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed from args or env; safe to call twice.

    Uses ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` when args are None. Does nothing when neither args
    nor env indicate a multi-process run (single-host single-process).
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if not coordinator_address or not num_processes or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def global_mesh():
    """2-D ("ty", "tx") mesh over all global devices, host-major.

    Devices of one process stay contiguous along the fast ("tx") axis so
    intra-row halo traffic rides ICI; the "ty" axis crosses processes
    (DCN on multi-host).
    """
    from jax.sharding import Mesh

    devices = sorted(
        jax.devices(), key=lambda d: (d.process_index, getattr(d, "id", 0))
    )
    n = len(devices)
    n_proc = jax.process_count()
    per_proc = n // max(n_proc, 1)
    if n_proc > 1 and per_proc * n_proc == n:
        dev_arr = np.array(devices).reshape(n_proc, per_proc)
        return Mesh(dev_arr, ("ty", "tx"))
    return make_mesh(devices=devices)


def scaling_model(
    tp,
    n_devices,
    hbm_gbps=819.0,
    ici_gbps=45.0,
    overlap_chunks=2,
    cells_scale=1.0,
):
    """Static communication/computation model of one *sharded* tile-plan
    accumulation sweep (``TilePlan.accumulate_sharded``), derived entirely
    from the plan — no wall-clock measurement involved, so it is valid on
    hardware this environment cannot provide.

    Per device and sweep: two streaming Pallas passes over the local tile
    slab (``compute_bytes``), ONE ``all_gather`` of the per-tile exit
    records over ICI (``collective_bytes`` = (n-1)/n of the global exit
    array), and a redundant coarse solve (~n/80 nodes, counted into
    compute). Predicted efficiency = t_compute / (t_compute + t_comm) at
    the given v5e per-chip HBM and per-link ICI rates — an upper-level
    model (no overlap assumed; overlapping the gather with pass A only
    raises it).
    """
    a_keys = tp._keys("a")
    c_keys = tp._keys("c")
    tab = lambda keys: sum(tp._tabs_np[k].nbytes for k in set(keys))
    # cells_scale projects the per-cell account of this plan to a larger
    # grid of the same drainage statistics (bytes/cell and the exit
    # fraction are scale-free; SCALING.json reports both the measured
    # plan's grid and the 67M-cell projection)
    n_cells = tp.pshape[0] * tp.pshape[1] * cells_scale
    bpc = (tab(a_keys) + tab(c_keys)) / (tp.pshape[0] * tp.pshape[1]) + 3 * 4
    compute_bytes = bpc * n_cells / n_devices
    exits_bytes = tp.n_exit_flat * 4 * cells_scale
    collective_bytes = exits_bytes * (n_devices - 1) / max(n_devices, 1)
    t_compute = compute_bytes / (hbm_gbps * 1e9)
    t_comm = collective_bytes / (ici_gbps * 1e9)
    # overlapped pipeline (accumulate_sharded overlap_chunks): pass A is
    # chunked and each chunk's exit gather hides under the remaining
    # chunks' compute — classic 2-stage pipeline bound
    C = max(int(overlap_chunks), 1)
    ta = t_compute / 3  # pass A's share of the per-device sweep bytes
    t_ov = (
        t_compute
        + t_comm
        - min(t_comm, ta) * (1 - 1 / C)  # hidden fraction of the gather
    )
    # hierarchical contraction: only *device-boundary-crossing* flows
    # need the collective (each device pre-contracts its local coarse
    # forest; the mechanism is parallel/tiled.py's constant-round coarse
    # contraction with edge-strip ppermutes). For a ~square 2-D slab of
    # NT/n tiles, the crossing roots live in the slab's perimeter tiles.
    gscale = max(int(round(np.sqrt(cells_scale))), 1)
    nty, ntx = tp.grid[0] * gscale, tp.grid[1] * gscale
    per_dev = max(nty * ntx // n_devices, 1)
    a = max(int(np.sqrt(per_dev * nty / max(ntx, 1))), 1)
    b = max(per_dev // a, 1)
    interior = max(a - 2, 0) * max(b - 2, 0)
    perim_frac = 1.0 - interior / (a * b)
    hier_bytes = exits_bytes * perim_frac * (n_devices - 1) / n_devices
    t_comm_h = hier_bytes / (ici_gbps * 1e9)
    t_h = t_compute + t_comm_h - min(t_comm_h, ta) * (1 - 1 / C)
    return {
        "n_devices": n_devices,
        "bytes_per_cell": bpc,
        "compute_bytes_per_device": compute_bytes,
        "collective_bytes_per_device": collective_bytes,
        "collectives_per_sweep": 1,
        "t_compute_model_s": t_compute,
        "t_comm_model_s": t_comm,
        "predicted_efficiency": t_compute / (t_compute + t_comm),
        "predicted_efficiency_overlap": t_compute / t_ov,
        "predicted_efficiency_hierarchical": t_compute / t_h,
        "hierarchical_collective_bytes": hier_bytes,
        "overlap_chunks": C,
        "assumptions": {
            "hbm_gbps_per_chip": hbm_gbps,
            "ici_gbps_per_link": ici_gbps,
            "overlap": (
                "per-chunk exit gathers hide under the remaining pass-A"
                " chunks (accumulate_sharded overlap_chunks); the"
                " no-overlap column is the lower bound"
            ),
            "hierarchical": (
                "collective carries only device-boundary-crossing exits"
                " (perimeter tiles of ~square 2-D slabs) after each"
                " device pre-contracts its local coarse forest — the"
                " constant-round contraction implemented by"
                " parallel/tiled.py's coarse backend; TilePlan."
                "accumulate_sharded currently ships the full gather"
            ),
        },
    }


def weak_scaling_report(cells_per_device=256 * 256, n_devices_list=None, reps=2):
    """Weak-scaling harness: per-device work held constant while the grid
    grows with the mesh. On the virtual CPU mesh the wall-clock numbers
    validate machinery only (all \"devices\" share host cores); on real
    chips the same harness measures true weak scaling."""
    from pyflwdir_tpu import dem as dem_mod

    if n_devices_list is None:
        n = len(jax.devices())
        n_devices_list = sorted({1, 2, n} - {0})
    out = {}
    for k in n_devices_list:
        mesh = make_mesh(k)
        ty, tx = mesh.devices.shape
        rows = int(np.sqrt(cells_per_device * k / (ty * tx))) * ty
        cols = int(cells_per_device * k / max(rows, 1)) // 128 * 128 or 128
        rng = np.random.RandomState(3)
        z = rng.rand(max(rows, 128), max(cols, 128))
        z += np.add.outer(
            np.linspace(2, 0, z.shape[0]), np.linspace(2, 0, z.shape[1])
        )
        codes = dem_mod.fill_depressions(z)[1]
        data = np.ones(codes.shape, dtype=np.float32)
        tiled_accumulate(codes, data, mesh)  # compile
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            tiled_accumulate(codes, data, mesh)
            best = min(best, time.perf_counter() - t0)
        out[k] = {
            "grid": list(codes.shape),
            "cells_per_device": codes.size / k,
            "t_s": best,
            "cells_per_s_per_device": codes.size / k / best,
        }
    return out


def scaling_report(codes: np.ndarray, n_devices_list=None, reps=3):
    """Strong-scaling efficiency of tiled accumulation on a fixed grid.

    Returns {n_devices: {"t_s", "speedup", "efficiency"}} with efficiency
    = speedup / n relative to the 1-device run.
    """
    if n_devices_list is None:
        n = len(jax.devices())
        n_devices_list = sorted({1, 2, n} & set(range(1, n + 1)))
        n_devices_list = [k for k in (1, 2, 4, n) if k <= n]
        n_devices_list = sorted(set(n_devices_list))
    data = np.ones(codes.shape, dtype=np.float32)
    out = {}
    t1 = None
    for k in n_devices_list:
        mesh = make_mesh(k)
        tiled_accumulate(codes, data, mesh)  # compile
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            tiled_accumulate(codes, data, mesh)
            best = min(best, time.perf_counter() - t0)
        if t1 is None:
            t1 = best
        out[k] = {
            "t_s": best,
            "speedup": t1 / best,
            "efficiency": t1 / best / k,
        }
    return out
