"""One-off micro-bench: old split sweep vs fused A->C sweep at 8192^2.

Reuses bench.py's cached D8 grid; builds the tile plan once (saved to the
bench plan cache so later runs load it in ~1s).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import bench
from bench import big_d8, CACHE, _steady_state_time, _dep

import jax
import jax.numpy as jnp

from pyflwdir_tpu.codecs import d8 as d8c
from pyflwdir_tpu.ops.tile_plan import TilePlan, build_tile_plan, _S

side = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
d8_grid = big_d8(side)
idxs_ds, idxs_pit, n_valid = d8c.from_array(d8_grid)
n_cells = idxs_ds.size

plan_dir = os.path.join(CACHE, f"tileplan_{side}")
if os.path.isdir(plan_dir):
    t0 = time.time()
    tp = TilePlan.load(plan_dir)
    print(f"plan load {time.time() - t0:.1f}s", flush=True)
else:
    t0 = time.time()
    tp = build_tile_plan(idxs_ds, d8_grid.shape, tile_rows=128)
    print(f"plan build {time.time() - t0:.1f}s", flush=True)
    tp.save(plan_dir, down=False)

data = jnp.ones(n_cells, dtype=jnp.int32)
arrs = tp.arrays()


def acc_old(x, arrs):
    H, W = tp.shape
    Hp, Wp = tp.pshape
    cfg = tp._acc_cfg(x.dtype)
    xg = jnp.asarray(x).reshape(H, W).astype(cfg["acc"])
    if (Hp, Wp) != (H, W):
        xg = jnp.pad(xg, ((0, Hp - H), (0, Wp - W)))
    exits = tp._pass_a(xg, arrs, cfg)
    entv = tp.coarse.accumulate(exits.reshape(-1), arrs["coarse"])
    pad = tp.NT * tp.E_rows * _S - entv.shape[0]
    if pad > 0:
        entv = jnp.concatenate([entv, jnp.zeros(pad, entv.dtype)])
    entv = entv.reshape(tp.NT, tp.E_rows, _S)
    out = tp._pass_c(xg, entv, arrs, cfg)
    if (Hp, Wp) != (H, W):
        out = out[:H, :W]
    return out.reshape(-1).astype(x.dtype)


for name, fn in [("fused", lambda x, a: tp.accumulate(x, a)), ("old", acc_old)]:
    out = jax.jit(fn)(data, arrs)
    ps = int(np.asarray(out)[idxs_pit].sum())
    assert ps == n_valid, f"{name}: conservation failed {ps} != {n_valid}"
    t = _steady_state_time(jax, lambda a, d, arrs: fn(_dep(d, a), arrs), data, (data, arrs), 4)
    print(f"{name}: {t * 1e3:.2f} ms  {n_cells / t / 1e6:.0f} Mgp/s", flush=True)
