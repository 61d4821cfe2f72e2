#!/usr/bin/env python
"""Per-component timing of BigAccelPlan.accumulate at 8192^2 on the TPU.

Times each HBM-scale sub-op in isolation (steady-state, loop-differenced
like bench.py) to locate where the wall-time goes:

  r_in / r_out / r_far router applies, the row cumsum, the near-interval
  gather pair, the far distinct-end XLA take, the far group expansion,
  plus microbenchmarks of the primitives (lane_gather_tiled, XLA 128x128
  tile transpose, plain HBM copy) with achieved GB/s.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
from jax import lax

import bench
from pyflwdir_tpu.codecs import d8 as d8c
from pyflwdir_tpu.ops.router import _S
from pyflwdir_tpu.ops.router_big import lane_gather_tiled

SIDE = int(os.environ.get("PYFLWDIR_BENCH_SIDE", "8192"))
HBM = 819e9


def steady(body, init, consts, k=4):
    return bench._steady_state_time(jax, body, init, consts, k)


def report(name, t, nbytes=None):
    gb = f"  {nbytes / t / 1e9:7.0f} GB/s ({nbytes / t / HBM * 100:5.1f}% HBM)" if nbytes else ""
    print(f"{name:34s} {t * 1e3:9.3f} ms{gb}", flush=True)


def main():
    d8_grid = bench.big_d8(SIDE)
    idxs_ds, idxs_pit, n_valid = d8c.from_array(d8_grid)
    plan, dfs = bench.big_plan(idxs_ds, SIDE)
    n_pad = plan.n_pad
    Y = n_pad // _S
    print(f"n_cells={idxs_ds.size} n_pad={n_pad} G1={plan.r_in.G1}")
    if plan.has_far:
        print(
            f"far: F={int(np.asarray(plan.bidx).size)} slots (f_rows={plan.f_rows}), "
            f"D={plan.d_rows * _S} distinct ends (d_rows={plan.d_rows})"
        )

    x2 = jnp.asarray(
        np.random.RandomState(0).randint(0, 100, size=(Y, _S)).astype(np.int32)
    )
    arrs = plan.arrays()

    dep = lambda a, b: jnp.maximum(b, jnp.minimum(a, jnp.zeros((), b.dtype)))

    # --- primitives -------------------------------------------------------
    t = steady(lambda a, b: dep(a, b) + 1, x2, (x2,), 8)
    report("hbm copy-ish (x+1)", t, n_pad * 8)

    idx = arrs["r_in"][0]
    t = steady(lambda a, b, i: lane_gather_tiled(dep(a, b), i), x2, (x2, idx), 8)
    report("lane_gather_tiled (1 pass)", t, n_pad * 9)

    t = steady(
        lambda a, b: dep(a, b)
        .reshape(-1, _S, _S)
        .transpose(0, 2, 1)
        .reshape(Y, _S),
        x2,
        (x2,),
        8,
    )
    report("xla transpose (q,s,l)->(q,l,s)", t, n_pad * 8)

    G1 = plan.r_in.G1
    t = steady(
        lambda a, b: dep(a, b)
        .reshape(G1, _S, _S, _S)
        .transpose(3, 1, 2, 0)
        .reshape(Y, _S),
        x2,
        (x2,),
        8,
    )
    report("xla transpose g1<->s2 (global)", t, n_pad * 8)

    # --- router applies ---------------------------------------------------
    from pyflwdir_tpu.ops.router_big import RouterPlanBig

    def route(name):
        def f(a, b, arrs):
            return RouterPlanBig._chain(dep(a, b), G1, arrs[name], lane_gather_tiled)
        return f

    t = steady(route("r_in"), x2, (x2, arrs), 4)
    report("r_in.apply (7g+6t)", t, n_pad * (7 * 9 + 6 * 8))
    t = steady(route("r_out"), x2, (x2, arrs), 4)
    report("r_out.apply", t, n_pad * (7 * 9 + 6 * 8))
    if plan.has_far:
        t = steady(route("r_far"), x2, (x2, arrs), 4)
        report("r_far.apply", t, n_pad * (7 * 9 + 6 * 8))

    # --- cumsum + interval machinery ---------------------------------------
    t = steady(lambda a, b: plan._cumsum(dep(a, b)), x2, (x2,), 8)
    report("row cumsum + offsets", t, n_pad * 16)

    c = plan._cumsum(x2)

    def gpair(a, b, arrs):
        from pyflwdir_tpu.ops.accel_big import _View

        gn, gp = plan._gather_pair(dep(a, b), _View(arrs))
        return gn - gp

    t = steady(gpair, c, (c, arrs), 4)
    report("near gather pair", t, n_pad * (2 * 9 + 2 * 5))

    def scalar_steady(fn, consts, k=4, nbytes=None, name=""):
        """Steady-state timing with a scalar carry (shape-changing bodies)."""

        def body(s, *cs):
            cc = jnp.maximum(cs[0], jnp.minimum(s, jnp.zeros((), cs[0].dtype)))
            w = fn(cc, *cs[1:])
            return jnp.minimum(jnp.max(w), jnp.zeros((), w.dtype)).astype(
                jnp.int32
            ) + s

        t = steady(body, jnp.zeros((), jnp.int32), consts, k)
        report(name, t, nbytes)

    if plan.has_far:
        scalar_steady(
            lambda cc, u: jnp.take(cc.reshape(-1), u).reshape(-1, _S),
            (c, arrs["uniq_e"]),
            4,
            plan.d_rows * _S * 8,
            "far distinct-end take (XLA)",
        )

        def fexp(cc, arrs):
            from pyflwdir_tpu.ops.accel_big import _View

            a_ = _View(arrs)
            g = jnp.take(cc.reshape(-1), a_.uniq_e).reshape(plan.d_rows, _S)
            g_lo = jnp.take(g, a_.rlo, axis=0)
            g_hi = jnp.take(g, jnp.minimum(a_.rlo + 1, plan.d_rows - 1), axis=0)
            w = jnp.where(
                a_.bidx_hi,
                lane_gather_tiled(g_hi, a_.bidx),
                lane_gather_tiled(g_lo, a_.bidx),
            )
            return w

        scalar_steady(
            fexp, (c, arrs), 4, plan.f_rows * _S * 8, "far take+expand (no route)"
        )

        def fval(a, b, arrs):
            from pyflwdir_tpu.ops.accel_big import _View

            def route(name, v):
                return RouterPlanBig._chain(v, G1, arrs[name], lane_gather_tiled)

            return plan._far_values(dep(a, b), _View(arrs), route)

        t = steady(fval, c, (c, arrs), 4)
        report("far path total (take+exp+route)", t)

    # --- whole accumulate ---------------------------------------------------
    data = jnp.ones(idxs_ds.size, jnp.int32)
    t = steady(lambda a, d, arrs: plan.accumulate(dep(a[: d.size], d), arrs), data, (data, arrs), 4)
    report("accumulate total", t, n_pad * 391)
    print(f"gps={idxs_ds.size / t / 1e6:.0f} Mgp/s")


if __name__ == "__main__":
    main()
