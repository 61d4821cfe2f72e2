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

__all__ = ["init_distributed", "global_mesh", "scaling_report"]

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
