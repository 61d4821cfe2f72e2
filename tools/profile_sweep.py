"""On-TPU steady-state dissection of the tile-plan sweep at 8192^2.

Times each stage of the accumulate / accumulate_down pipelines with the
k-vs-2k fori_loop difference method (host timing noise on this VM is up
to 4x; the loop difference cancels dispatch + transfer). Also records
plan build / down-build / save / load wall times and the entry-tile
census. Writes findings to stdout (run under nohup, poll the log).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

CACHE = "/root/repo/.bench_cache"
SIDE = int(os.environ.get("PROF_SIDE", "8192"))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def big_d8(side):
    os.makedirs(CACHE, exist_ok=True)
    f = os.path.join(CACHE, f"d8_{side}.npy")
    if os.path.exists(f):
        return np.load(f)
    from pyflwdir_tpu import dem as dem_mod

    rng = np.random.RandomState(11)
    z = rng.rand(side, side).astype(np.float32)
    z += np.add.outer(
        np.linspace(4, 0, side), np.linspace(4, 0, side)
    ).astype(np.float32)
    t0 = time.time()
    d8 = dem_mod.fill_depressions(z)[1]
    log(f"priority flood {time.time() - t0:.1f}s")
    np.save(f, d8)
    return d8


def steady_ms(make_step, x0, args, k=6, reps=3):
    """Per-iteration ms of make_step(s, args)'s computation via 2k-k loop
    diff. ``args`` (the plan tables) ride as jit ARGUMENTS — closing over
    device arrays would serialize GBs of constants through the tunnel."""

    def loop(kk):
        @jax.jit
        def f(x, a):
            return lax.fori_loop(0, kk, lambda i, s: make_step(s, a), x)

        return f

    fk, f2k = loop(k), loop(2 * k)
    jax.block_until_ready(fk(x0, args))  # compile+warm
    jax.block_until_ready(f2k(x0, args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fk(x0, args))
        t1 = time.perf_counter()
        jax.block_until_ready(f2k(x0, args))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / k)
    return best * 1e3


def main():
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    d8 = big_d8(SIDE)
    from pyflwdir_tpu.codecs import d8 as d8c

    t0 = time.time()
    idxs_ds, idxs_pit, n_valid = d8c.from_array(d8)
    log(f"parse {time.time() - t0:.1f}s  n_valid={n_valid}")

    from pyflwdir_tpu.ops.tile_plan import TilePlan, build_tile_plan

    plan_dir = os.path.join(CACHE, f"plan_{SIDE}")
    if os.path.exists(os.path.join(plan_dir, "plan.json")):
        t0 = time.time()
        tp = TilePlan.load(plan_dir)
        log(f"plan LOAD {time.time() - t0:.1f}s")
    else:
        os.environ["PYFLWDIR_TILE_PLAN_DEBUG"] = "1"
        t0 = time.time()
        tp = build_tile_plan(idxs_ds, (SIDE, SIDE))
        log(f"plan build {time.time() - t0:.1f}s")
        t0 = time.time()
        tp._ensure_down()
        log(f"down build {time.time() - t0:.1f}s")
        t0 = time.time()
        tp.save(plan_dir)
        log(f"plan SAVE {time.time() - t0:.1f}s")

    # entry census
    m, D = tp._coarse_meta["m"], tp._coarse_meta["D"]
    out_slot = tp._coarse_meta["out_slot"][m:]
    cnt_e = np.bincount(out_slot // tp.E_pad, minlength=tp.NT)
    log(
        f"NT={tp.NT} noent={(cnt_e == 0).sum()} m={m} D={D} "
        f"R_pad={tp.R_pad} E_pad={tp.E_pad} n_exit_flat={tp.n_exit_flat} "
        f"coarse={type(tp.coarse).__name__} far_mode={tp.far_mode}"
    )

    H, W = tp.shape
    Hp, Wp = tp.pshape
    cfg = tp._acc_cfg(jnp.dtype(jnp.int32))
    x = np.ones((Hp, Wp), np.int32)
    xg0 = jnp.asarray(x)

    arrs = tp.arrays()  # uploads tables
    t0 = time.time()
    out = jax.block_until_ready(
        jax.jit(lambda xf, a: tp.accumulate(xf, a))(
            jnp.asarray(np.ones(H * W, np.int32)), arrs
        )
    )
    log(f"first full sweep (incl upload+compile) {time.time() - t0:.1f}s")
    pits = np.asarray(out)[np.asarray(idxs_pit)]
    log(f"conservation: pit sum = {pits.sum()} vs n_valid = {n_valid}")

    z32 = jnp.zeros((), jnp.int32)

    # full sweep
    ms = steady_ms(
        lambda s, a: tp.accumulate(
            (a["xg"] + s).reshape(-1), a["t"]
        ).reshape(Hp, Wp)[0, 0],
        z32,
        {"xg": xg0, "t": arrs},
    )
    mgps = SIDE * SIDE / ms / 1e3
    log(f"STEADY full sweep: {ms:.2f} ms  ({mgps:.0f} Mgp/s)")

    # pass A alone
    ms_a = steady_ms(
        lambda s, a: tp._pass_a(a["xg"] + s, a["t"], cfg)[0, 0, 0],
        z32,
        {"xg": xg0, "t": arrs},
    )
    log(f"STEADY pass A: {ms_a:.2f} ms")

    # coarse alone
    exits = jax.jit(lambda a: tp._pass_a(a["xg"], a["t"], cfg))(
        {"xg": xg0, "t": arrs}
    )
    exf = exits.reshape(-1)
    ms_k = steady_ms(
        lambda s, a: tp.coarse.accumulate(a["xf"] + s, a["c"])[0],
        jnp.zeros((), exf.dtype),
        {"xf": exf, "c": arrs["coarse"]},
    )
    log(f"STEADY coarse: {ms_k:.2f} ms")

    # pass C alone
    entv = jax.jit(lambda a: tp.coarse.accumulate(a["xf"], a["c"]))(
        {"xf": exf, "c": arrs["coarse"]}
    )
    pad = tp.NT * tp.E_rows * 128 - entv.shape[0]
    if pad > 0:
        entv = jnp.concatenate([entv, jnp.zeros(pad, entv.dtype)])
    entv = entv.reshape(tp.NT, tp.E_rows, 128)
    ms_c = steady_ms(
        lambda s, a: tp._pass_c(a["xg"] + s, a["e"], a["t"], cfg)[0, 0],
        z32,
        {"xg": xg0, "e": entv, "t": arrs},
    )
    log(f"STEADY pass C: {ms_c:.2f} ms")

    # tile-ize transpose cost (layout experiment)
    ms_t = steady_ms(
        lambda s, a: tp._tiles_cpu(a["xg"] + s)[0, 0, 0],
        z32,
        {"xg": xg0},
    )
    log(f"STEADY tile-ize transpose: {ms_t:.2f} ms")

    # downward engine
    darrs = tp.down_arrays()
    ms_d = steady_ms(
        lambda s, a: tp.accumulate_down(
            (a["xg"] + s).reshape(-1), a["d"]
        ).reshape(Hp, Wp)[0, 0],
        z32,
        {"xg": xg0, "d": darrs},
    )
    log(f"STEADY down sweep: {ms_d:.2f} ms  ({SIDE*SIDE/ms_d/1e3:.0f} Mgp/s)")
    ms_d1 = steady_ms(
        lambda s, a: tp._pass_down(a["xg"] + s, a["d"], cfg)[0][0, 0],
        z32,
        {"xg": xg0, "d": darrs},
    )
    log(f"STEADY pass D1: {ms_d1:.2f} ms")

    # D2 alone + coarse-down alone
    xd0 = jnp.zeros((tp.NT, tp.R_rows, 128), jnp.int32)
    ms_d2 = steady_ms(
        lambda s, a: tp._pass_down_lite(a["xg"] + s, a["xd"], a["d"], cfg)[
            0, 0
        ],
        z32,
        {"xg": xg0, "xd": xd0, "d": darrs},
    )
    log(f"STEADY pass D2: {ms_d2:.2f} ms")
    if tp._down.get("coarse_router"):
        pk0 = jnp.zeros(tp.NT * tp.E_rows * 128, jnp.int32)
        ms_cd = steady_ms(
            lambda s, a: tp.coarse.accumulate_down(a["pk"] + s, a["cdr"])[0],
            z32,
            {"pk": pk0, "cdr": darrs["cdr"]},
        )
        log(f"STEADY coarse-down (router): {ms_cd:.2f} ms")

    # pass C body dissection: structural variants via cfg surgery
    from pyflwdir_tpu.ops import tile_plan as tpm

    def c_variant(far_mode, has_entries):
        cfg_v = dict(cfg)
        cfg_v["far_mode"] = far_mode
        cfg_v["has_entries"] = has_entries
        return steady_ms(
            lambda s, a: tp._pass_c(a["xg"] + s, a["e"], a["t"], cfg_v)[0, 0],
            z32,
            {"xg": xg0, "e": entv, "t": arrs},
        )

    log(f"DISSECT C full: {ms_c:.2f} ms")
    log(f"DISSECT C no-far: {c_variant(None, True):.2f} ms")
    log(f"DISSECT C no-ent: {c_variant(tp.far_mode, False):.2f} ms")
    log(f"DISSECT C no-far no-ent: {c_variant(None, False):.2f} ms")

    log("done")


if __name__ == "__main__":
    main()
