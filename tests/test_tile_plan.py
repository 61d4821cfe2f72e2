"""Hierarchical tile-local accumulation plan (ops/tile_plan.py).

Correctness of the two-level (per-tile VMEM plan + coarse root graph)
accumulation against the global DFS-interval plan, on DEM-derived D8
grids covering: multi-tile grids, non-tile-multiple shapes (padding),
single-tile grids, G = 2 local routers, missing cells, int exactness and
float tolerance, and the XLA-gather vs router coarse levels.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyflwdir_tpu.codecs import d8 as d8c
from pyflwdir_tpu.ops.plan import accumulate_planned, build_plan
from pyflwdir_tpu.ops.tile_plan import build_tile_plan


def _grid(shape, seed=3, holes=True):
    from pyflwdir_tpu.ops.fill import d8_from_filled, fill_depressions_dev

    H, W = shape
    rng = np.random.RandomState(seed)
    z = rng.rand(H, W).astype(np.float32)
    z += np.add.outer(np.linspace(2, 0, H), np.linspace(2, 0, W)).astype(np.float32)
    d8 = np.array(d8_from_filled(fill_depressions_dev(z)))
    if holes:
        d8[1, 2:5] = 247
    return d8


@pytest.mark.parametrize(
    "shape,tile_rows",
    [
        pytest.param((256, 256), 128, marks=pytest.mark.slow),
        ((300, 200), 128),
        pytest.param((128, 128), 128, marks=pytest.mark.slow),
        pytest.param((512, 384), 256, marks=pytest.mark.slow),
    ],
)
def test_tile_plan_matches_global(shape, tile_rows):
    d8 = _grid(shape)
    idxs_ds, idxs_pit, n_valid = d8c.from_array(d8)
    tp = build_tile_plan(idxs_ds, shape, tile_rows=tile_rows)
    gplan = build_plan(idxs_ds, fast=False)

    # exact integer accumulation
    out = np.asarray(tp.accumulate(jnp.ones(idxs_ds.size, jnp.int32)))
    want = np.asarray(accumulate_planned(gplan, jnp.ones(idxs_ds.size, jnp.int64)))
    assert np.array_equal(out.astype(np.int64), want)
    assert out[idxs_pit].sum() == n_valid

    # float weights vs float64 oracle: per-tile O(eps * magnitude) bound
    rng = np.random.RandomState(7)
    w = rng.rand(idxs_ds.size).astype(np.float32)
    outf = np.asarray(tp.accumulate(jnp.asarray(w)))
    wantf = np.asarray(accumulate_planned(gplan, jnp.asarray(w, jnp.float64)))
    scale = max(np.abs(wantf).max(), 1.0)
    assert np.allclose(outf, wantf, rtol=1e-4, atol=4e-6 * scale)

    # missing cells pass through unchanged
    mv = np.nonzero(idxs_ds < 0)[0]
    assert np.array_equal(outf[mv], w[mv])


@pytest.mark.slow
def test_tile_plan_router_coarse():
    """Force the slot-mode router coarse level (small threshold)."""
    from pyflwdir_tpu.ops import tile_plan as tpm

    d8 = _grid((256, 256), seed=5)
    idxs_ds, idxs_pit, n_valid = d8c.from_array(d8)
    old = tpm._COARSE_ROUTER_MIN
    tpm._COARSE_ROUTER_MIN = 1
    try:
        tp = build_tile_plan(idxs_ds, (256, 256), tile_rows=128)
        assert not isinstance(tp.coarse, tpm._CoarseGather)
        out = np.asarray(tp.accumulate(jnp.ones(idxs_ds.size, jnp.int32)))
        gplan = build_plan(idxs_ds, fast=False)
        want = np.asarray(
            accumulate_planned(gplan, jnp.ones(idxs_ds.size, jnp.int64))
        )
        assert np.array_equal(out.astype(np.int64), want)
    finally:
        tpm._COARSE_ROUTER_MIN = old


def test_tile_plan_weighted_int():
    """Signed integer weights with values crossing the 2^24 f32 ceiling
    (exercises the exact signed-16-bit plane machinery)."""
    d8 = _grid((256, 256), seed=11)
    idxs_ds, _, _ = d8c.from_array(d8)
    rng = np.random.RandomState(13)
    w = rng.randint(-1000, 60000, size=idxs_ds.size).astype(np.int32)
    tp = build_tile_plan(idxs_ds, (256, 256), tile_rows=128)
    out = np.asarray(tp.accumulate(jnp.asarray(w)))
    gplan = build_plan(idxs_ds, fast=False)
    want = np.asarray(accumulate_planned(gplan, jnp.asarray(w, jnp.int64)))
    assert np.array_equal(out.astype(np.int64), want)


@pytest.mark.slow
def test_tile_plan_float32_backend_accuracy():
    """TPU-dtype parity (VERDICT item 7): with x64 disabled the float
    path runs a float32 per-tile prefix sum + compensated coarse level;
    assert the documented O(eps * tile magnitude) bound against the
    float64 oracle."""
    import jax

    d8 = _grid((384, 256), seed=21)
    idxs_ds, idxs_pit, n_valid = d8c.from_array(d8)
    rng = np.random.RandomState(2)
    w = (rng.rand(idxs_ds.size) * 100.0).astype(np.float32)
    gplan = build_plan(idxs_ds, fast=False)
    want = np.asarray(accumulate_planned(gplan, jnp.asarray(w, jnp.float64)))
    with jax.enable_x64(False):
        tp = build_tile_plan(idxs_ds, (384, 256), tile_rows=128)
        out = np.asarray(tp.accumulate(jnp.asarray(w)))
    scale = np.abs(want).max()
    # float32 eps ~ 1.2e-7; tile partial sums bound the error well below
    # a global float32 prefix sum's O(eps * global_total)
    assert np.allclose(out, want, rtol=1e-4, atol=32 * 1.2e-7 * scale)


def test_tile_plan_serpentine_packed_fallback():
    """A single serpentine chain gives every cell the same interval end
    (duplicate depth ~ tile size), overflowing the far-router's b-block
    capacity — the plan must fall back to the packed group-expansion far
    path and stay exact."""
    H, W = 256, 128
    ser = np.zeros((H, W), np.uint8)
    for r in range(H):
        ser[r, :] = 16 if r % 2 else 1
        ser[r, W - 1 if r % 2 == 0 else 0] = 4
    ser[H - 1, W - 1 if (H - 1) % 2 == 0 else 0] = 0
    ids, pit, nv = d8c.from_array(ser)
    tp = build_tile_plan(ids, ser.shape)
    assert tp.far_mode == "packed"
    out = np.asarray(tp.accumulate(jnp.ones(ids.size, jnp.int32)))
    want = np.asarray(
        accumulate_planned(build_plan(ids, fast=False), jnp.ones(ids.size, jnp.int64))
    )
    assert np.array_equal(out.astype(np.int64), want)
    assert out[pit].sum() == nv


def test_tile_plan_far_router_is_default():
    """Dendritic (DEM-derived) networks have shallow duplicate depth and
    must take the router far path (the fast one)."""
    d8 = _grid((384, 256), seed=5)
    ids, _, _ = d8c.from_array(d8)
    tp = build_tile_plan(ids, (384, 256))
    assert tp.far_mode == "router"


def test_native_phase1_matches_numpy():
    """The native per-tile builder (csrc/tile_plan_build.cpp) and the
    whole-grid numpy fallback must produce equivalent plans: identical
    phase-1 intermediates (both DFS the forest with raster-ordered roots
    and children) and equal accumulation results."""
    from pyflwdir_tpu.ops import tile_plan as tpm

    if tpm._native("tile_plan_phase1") is None:
        pytest.skip("native library not built")
    d8 = _grid((300, 200), seed=9)
    ids, pit, nv = d8c.from_array(d8)
    tp_nat = build_tile_plan(ids, d8.shape)

    orig = tpm._native
    tpm._native = lambda name: None
    try:
        tp_np = build_tile_plan(ids, d8.shape)
    finally:
        tpm._native = orig

    x = jnp.asarray(
        (np.arange(ids.size, dtype=np.int64) % 13 + 1).astype(np.int32)
    )
    out_nat = np.asarray(tp_nat.accumulate(x))
    out_np = np.asarray(tp_np.accumulate(x))
    assert np.array_equal(out_nat, out_np)
    ph_nat = tp_nat._phase1_native(_pad_ids(ids, d8.shape, tp_nat))
    ph_np = tp_nat._phase1_numpy(_pad_ids(ids, d8.shape, tp_nat))
    for k in ("sig", "slot", "cnt_on", "cnt_r", "cnt_far", "root_cell",
              "root_end", "far_slot", "far_end", "near_sel", "idx_near",
              "sel_next", "tree_mask", "root_node"):
        assert np.array_equal(
            np.asarray(ph_nat[k]).astype(np.int64),
            np.asarray(ph_np[k]).astype(np.int64),
        ), k


def _pad_ids(ids, shape, tp):
    H, W = shape
    Hp, Wp = tp.pshape
    ids0 = np.asarray(ids, dtype=np.int64).ravel()
    if (Hp, Wp) == (H, W):
        return ids0
    v0 = ids0 >= 0
    src = np.arange(ids0.size, dtype=np.int64)
    new_of = (src // W) * Wp + src % W
    ids_p = np.full(Hp * Wp, -1, dtype=np.int64)
    tgt = np.full(ids0.size, -1, dtype=np.int64)
    tgt[v0] = (ids0[v0] // W) * Wp + ids0[v0] % W
    ids_p[new_of] = tgt
    return ids_p


def test_strahler_tile_plan_matches_host():
    """The log-depth tile-plan Strahler (one child-count stencil + one
    accumulation per level) equals the native host preorder sweep."""
    from pyflwdir_tpu.ops.order import strahler_tile_plan
    from pyflwdir_tpu.ops.plan import build_plan
    from pyflwdir_tpu.runtime import strahler_order as host_strahler

    d8 = _grid((300, 260), seed=12)
    ids, _, _ = d8c.from_array(d8)
    tp = build_tile_plan(ids, d8.shape)
    got = np.asarray(strahler_tile_plan(d8, tp))
    want = host_strahler(
        ids.astype(np.int64), build_plan(ids, fast=False).preorder_np
    ).reshape(d8.shape)
    assert np.array_equal(got, want.astype(np.uint8))


def test_accumulate_down_transpose_identity():
    """accumulate_down is the exact transpose of accumulate:
    <S x, y> == <x, S^T y> for random integer vectors, and the inclusive
    downstream-path sum a[i] = sum of w along i -> pit."""
    d8 = _grid((300, 260), seed=21)
    ids, pit, nv = d8c.from_array(d8)
    tp = build_tile_plan(ids, d8.shape)
    n = ids.size
    rng = np.random.RandomState(5)
    x = rng.randint(0, 9, n).astype(np.int64)
    y = rng.randint(0, 9, n).astype(np.int64)
    valid = ids >= 0
    x[~valid] = 0
    y[~valid] = 0
    Sx = np.asarray(tp.accumulate(jnp.asarray(x))).astype(np.int64)
    STy = np.asarray(tp.accumulate_down(jnp.asarray(y))).astype(np.int64)
    assert np.dot(Sx[valid], y[valid]) == np.dot(x[valid], STy[valid])

    # oracle: follow each cell's chain to the pit
    w = rng.randint(0, 9, n).astype(np.int64)
    w[~valid] = 0
    got = np.asarray(tp.accumulate_down(jnp.asarray(w))).astype(np.int64)
    smp = rng.randint(0, n, 3000)
    for i in smp:
        if ids[i] < 0:
            assert got[i] == w[i]
            continue
        j, acc = i, 0
        while True:
            acc += w[j]
            if ids[j] == j:
                break
            j = ids[j]
        assert got[i] == acc, i


def test_accumulate_down_stream_distance():
    """Downstream distance to pit in cells = accumulate_down of per-cell
    step indicators (pits 0), matching streams.stream_distance."""
    from pyflwdir_tpu import streams as streams_mod

    d8 = _grid((256, 256), seed=8, holes=True)
    ids, pit, nv = d8c.from_array(d8)
    tp = build_tile_plan(ids, d8.shape)
    valid = ids >= 0
    step = (valid & (ids != np.arange(ids.size))).astype(np.int32)
    got = np.asarray(tp.accumulate_down(jnp.asarray(step)))
    want = np.asarray(
        streams_mod.stream_distance(
            jnp.asarray(ids), d8.shape, real_length=False
        )
    ).astype(np.int64)
    got = np.where(valid, got, -9999)
    want = np.where(valid, want, -9999)
    assert np.array_equal(got[valid], want[valid])


def test_raster_downward_api_parity(monkeypatch):
    """stream_distance / hand / basins through the tile-plan downward
    engine equal the small-grid graph kernels (threshold lowered so the
    same grid exercises both paths)."""
    import pyflwdir_tpu

    d8 = _grid((260, 140), seed=31)
    fd = pyflwdir_tpu.from_array(d8, ftype="d8")
    small = {
        "dist": fd.stream_distance(unit="cell"),
        "distm": fd.stream_distance(unit="m"),
        "bas": fd.basins(),
        "strord": fd.stream_order(),
    }
    rng = np.random.RandomState(3)
    drain = np.asarray(fd.upstream_area(unit="cell")) > 50
    small["hand"] = fd.hand(drain, rng.rand(260, 140).astype(np.float32) * 100)

    fd2 = pyflwdir_tpu.from_array(d8, ftype="d8")
    monkeypatch.setattr(type(fd2), "_TILE_PLAN_MIN", 0)
    z = rng.rand(260, 140).astype(np.float32) * 100
    got_dist = fd2.stream_distance(unit="cell")
    assert np.array_equal(got_dist, small["dist"])
    got_distm = fd2.stream_distance(unit="m")
    ok = small["distm"] > 0
    assert np.allclose(got_distm[ok], small["distm"][ok], rtol=1e-4)
    assert np.array_equal(fd2.basins(), small["bas"])
    assert np.array_equal(fd2.stream_order(), small["strord"])
    # hand: same drain/z on both paths
    h_small = fd.hand(drain, z)
    h_big = fd2.hand(drain, z)
    v = h_small != -9999.0
    assert np.array_equal(v, h_big != -9999.0)
    assert np.allclose(h_small[v], h_big[v], atol=1e-3)


def test_raster_fillnodata_up_downward(monkeypatch):
    """fillnodata(direction='up') through the downward engine equals the
    pointer-doubling graph kernel."""
    import pyflwdir_tpu

    d8 = _grid((260, 140), seed=17)
    fd = pyflwdir_tpu.from_array(d8, ftype="d8")
    rng = np.random.RandomState(2)
    data = np.where(
        rng.rand(260, 140) < 0.1, rng.rand(260, 140).astype(np.float32), -9999.0
    ).astype(np.float32)
    want = fd.fillnodata(data, -9999.0, direction="up")
    fd2 = pyflwdir_tpu.from_array(d8, ftype="d8")
    monkeypatch.setattr(type(fd2), "_TILE_PLAN_MIN", 0)
    got = fd2.fillnodata(data, -9999.0, direction="up")
    assert np.allclose(got, want, atol=1e-5)


def test_tile_plan_save_load_roundtrip(tmp_path):
    """Durable plans (ops/plan_io.py): a saved+loaded plan reproduces the
    in-memory plan's accumulate and accumulate_down bitwise, with no
    rebuild of tables (the loaded object has no build intermediates)."""
    from pyflwdir_tpu.ops.tile_plan import TilePlan

    shape = (300, 200)
    d8 = _grid(shape, seed=23)
    idxs_ds, _, _ = d8c.from_array(d8)
    tp = build_tile_plan(idxs_ds, shape)
    w = np.random.RandomState(29).randint(0, 9, idxs_ds.size).astype(np.int32)
    want_up = np.asarray(tp.accumulate(jnp.asarray(w)))
    want_dn = np.asarray(tp.accumulate_down(jnp.asarray(w)))

    tp.save(tmp_path / "plan")
    tp2 = TilePlan.load(tmp_path / "plan")
    assert tp2._sig_np is None  # no raw intermediates persisted
    got_up = np.asarray(tp2.accumulate(jnp.asarray(w)))
    got_dn = np.asarray(tp2.accumulate_down(jnp.asarray(w)))
    assert np.array_equal(got_up, want_up)
    assert np.array_equal(got_dn, want_dn)


def test_tile_plan_save_load_router_coarse(tmp_path):
    """Round-trip with the slot-mode BigAccelPlan coarse level: the saved
    router tables are reused (no re-coloring) and results stay bitwise."""
    from pyflwdir_tpu.ops import tile_plan as tpm
    from pyflwdir_tpu.ops.tile_plan import TilePlan

    d8 = _grid((256, 256), seed=31)
    idxs_ds, _, _ = d8c.from_array(d8)
    old = tpm._COARSE_ROUTER_MIN
    tpm._COARSE_ROUTER_MIN = 1
    try:
        tp = build_tile_plan(idxs_ds, (256, 256))
        assert not isinstance(tp.coarse, tpm._CoarseGather)
        x = jnp.ones(idxs_ds.size, jnp.int32)
        want_up = np.asarray(tp.accumulate(x))
        want_dn = np.asarray(tp.accumulate_down(x))
        tp.save(tmp_path / "plan")
        tp2 = TilePlan.load(tmp_path / "plan")
        assert not isinstance(tp2.coarse, tpm._CoarseGather)
        assert np.array_equal(np.asarray(tp2.accumulate(x)), want_up)
        assert np.array_equal(np.asarray(tp2.accumulate_down(x)), want_dn)
    finally:
        tpm._COARSE_ROUTER_MIN = old


def test_tile_plan_load_without_down(tmp_path):
    """down=False persists a lean upward-only plan; accumulate works and
    accumulate_down raises a clear error instead of silently rebuilding."""
    from pyflwdir_tpu.ops.tile_plan import TilePlan

    shape = (300, 200)
    d8 = _grid(shape, seed=37)
    idxs_ds, _, _ = d8c.from_array(d8)
    tp = build_tile_plan(idxs_ds, shape)
    x = jnp.ones(idxs_ds.size, jnp.int32)
    want = np.asarray(tp.accumulate(x))
    tp.save(tmp_path / "plan", down=False)
    tp2 = TilePlan.load(tmp_path / "plan")
    assert np.array_equal(np.asarray(tp2.accumulate(x)), want)
    with pytest.raises(RuntimeError, match="downward"):
        tp2.accumulate_down(x)


def test_raster_save_load_plans(tmp_path, monkeypatch):
    """FlwdirRaster.save_plans/load_plans: a fresh object with loaded
    plans reproduces uparea and stream_distance bitwise with zero plan
    rebuild (build_tile_plan is forbidden on the loaded object)."""
    import pyflwdir_tpu
    from pyflwdir_tpu.ops import tile_plan as tpm

    d8 = _grid((260, 140), seed=41)
    fd = pyflwdir_tpu.from_array(d8, ftype="d8")
    monkeypatch.setattr(type(fd), "_TILE_PLAN_MIN", 0)
    want_upa = fd.upstream_area("cell")
    want_dist = fd.stream_distance(unit="cell")
    fd.save_plans(tmp_path / "plans")

    fd2 = pyflwdir_tpu.from_array(d8, ftype="d8")
    monkeypatch.setattr(
        tpm.TilePlan,
        "__init__",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("rebuilt!")),
    )
    fd2.load_plans(tmp_path / "plans")
    assert np.array_equal(fd2.upstream_area("cell"), want_upa)
    assert np.array_equal(fd2.stream_distance(unit="cell"), want_dist)

    # shape mismatch is rejected
    d8b = _grid((132, 140), seed=42)
    fd3 = pyflwdir_tpu.from_array(d8b, ftype="d8")
    with pytest.raises(ValueError, match="shape"):
        fd3.load_plans(tmp_path / "plans")


def test_raster_fillnodata_up_bigint_exact(monkeypatch):
    """Integer data with values above 2^24 stays exact on the tile-plan
    fillnodata(direction='up') path (VERDICT r4 weak #7)."""
    import pyflwdir_tpu

    d8 = _grid((260, 140), seed=43)
    fd = pyflwdir_tpu.from_array(d8, ftype="d8")
    rng = np.random.RandomState(3)
    big = (1 << 24) + 3  # not representable in float32
    data = np.where(
        rng.rand(260, 140) < 0.08, big, 0
    ).astype(np.int64)
    want = fd.fillnodata(data, 0, direction="up")
    fd2 = pyflwdir_tpu.from_array(d8, ftype="d8")
    monkeypatch.setattr(type(fd2), "_TILE_PLAN_MIN", 0)
    got = fd2.fillnodata(data, 0, direction="up")
    assert got.dtype == want.dtype
    assert np.array_equal(got, want)


def test_native_down_phase_matches_numpy():
    """The native per-tile downward phase (tp_down_phase) produces the
    same downward tables (bitwise) as the whole-grid numpy fallback."""
    from pyflwdir_tpu.ops import tile_plan as tpm

    if tpm._native("tile_down_phase") is None:
        pytest.skip("native library not built")
    d8 = _grid((300, 260), seed=47)
    ids, _, _ = d8c.from_array(d8)
    tp_nat = build_tile_plan(ids, d8.shape)
    tp_nat._ensure_down()

    orig = tpm._native
    tpm._native = (
        lambda name: None if name == "tile_down_phase" else orig(name)
    )
    try:
        tp_np = build_tile_plan(ids, d8.shape)
        tp_np._ensure_down()
    finally:
        tpm._native = orig
    assert set(tp_nat._down["tabs"]) == set(tp_np._down["tabs"])
    for k in tp_nat._down["tabs"]:
        assert np.array_equal(
            tp_nat._down["tabs"][k], tp_np._down["tabs"][k]
        ), k


def test_tile_plan_small_router_coarse_paths(tmp_path):
    """The single-chunk slot-mode coarse (_CoarseRouterSmall): int
    exactness, compensated float accuracy, save/load round-trip, and
    equality with the chunked BigAccelPlan coarse on the same graph."""
    from pyflwdir_tpu.ops import tile_plan as tpm
    from pyflwdir_tpu.ops.tile_plan import TilePlan

    d8 = _grid((256, 256), seed=53)
    idxs_ds, _, _ = d8c.from_array(d8)
    old_min = tpm._COARSE_ROUTER_MIN
    old_max = tpm._COARSE_SMALL_MAX
    tpm._COARSE_ROUTER_MIN = 1
    try:
        tp_small = build_tile_plan(idxs_ds, (256, 256))
        assert type(tp_small.coarse).__name__ == "_CoarseRouterSmall"
        tpm._COARSE_SMALL_MAX = 0
        tp_big = build_tile_plan(idxs_ds, (256, 256))
        assert type(tp_big.coarse).__name__ == "BigAccelPlan"
    finally:
        tpm._COARSE_ROUTER_MIN = old_min
        tpm._COARSE_SMALL_MAX = old_max

    xi = jnp.ones(idxs_ds.size, jnp.int32)
    got = np.asarray(tp_small.accumulate(xi))
    assert np.array_equal(got, np.asarray(tp_big.accumulate(xi)))
    gplan = build_plan(idxs_ds, fast=False)
    want = np.asarray(accumulate_planned(gplan, jnp.ones(idxs_ds.size, jnp.int64)))
    assert np.array_equal(got.astype(np.int64), want)

    rng = np.random.RandomState(7)
    w = rng.rand(idxs_ds.size).astype(np.float32)
    outf = np.asarray(tp_small.accumulate(jnp.asarray(w, jnp.float32)))
    wantf = np.asarray(accumulate_planned(gplan, jnp.asarray(w, jnp.float64)))
    scale = max(np.abs(wantf).max(), 1.0)
    assert np.allclose(outf, wantf, rtol=1e-4, atol=4e-6 * scale)

    # downward engine through the router coarse-down solve
    want_dn = np.asarray(tp_big.accumulate_down(xi))
    assert tp_small._down is None or tp_small._down.get("coarse_router")
    got_dn = np.asarray(tp_small.accumulate_down(xi))
    assert tp_small._down.get("coarse_router")
    assert np.array_equal(got_dn, want_dn)
    wf = rng.rand(idxs_ds.size).astype(np.float32)
    dn_f = np.asarray(tp_small.accumulate_down(jnp.asarray(wf, jnp.float32)))
    dn_f_big = np.asarray(tp_big.accumulate_down(jnp.asarray(wf, jnp.float32)))
    scale = max(np.abs(dn_f_big).max(), 1.0)
    assert np.allclose(dn_f, dn_f_big, rtol=1e-4, atol=4e-6 * scale)

    tp_small.save(tmp_path / "plan")
    tp2 = TilePlan.load(tmp_path / "plan")
    assert type(tp2.coarse).__name__ == "_CoarseRouterSmall"
    assert tp2._down.get("coarse_router")
    assert np.array_equal(np.asarray(tp2.accumulate(xi)), got)
    assert np.array_equal(np.asarray(tp2.accumulate_down(xi)), want_dn)


def test_accumulate_banded_matches_monolith():
    """Band-streamed accumulation (per-band table slabs + one coarse
    solve) is bitwise equal to the monolithic sweep, both for unit
    weights (device-generated) and a host data raster, incl. the
    overlapped out_cb write path."""
    shape = (300, 260)
    d8 = _grid(shape, seed=59)
    idxs_ds, _, _ = d8c.from_array(d8)
    tp = build_tile_plan(idxs_ds, shape)
    want = np.asarray(
        tp.accumulate(jnp.ones(idxs_ds.size, jnp.int32))
    ).reshape(shape)
    got = tp.accumulate_banded(None, band_tile_rows=1)
    assert np.array_equal(got, want)

    rng = np.random.RandomState(61)
    w = rng.randint(0, 9, shape).astype(np.int32)
    want_w = np.asarray(tp.accumulate(jnp.asarray(w.ravel()))).reshape(shape)
    parts = {}
    tp.accumulate_banded(
        w, band_tile_rows=1, out_cb=lambda b, r0, a: parts.update({r0: a.copy()})
    )
    got_w = np.concatenate([parts[k] for k in sorted(parts)], axis=0)
    assert got_w.shape == shape
    assert np.array_equal(got_w, want_w)


def test_tile_plan_big_router_coarse_down(tmp_path):
    """The chunked (BigAccelPlan) coarse also solves the downward
    continuation with routers: bitwise vs the gather-coarse plan, and
    the save/load round-trip restores it without re-coloring."""
    from pyflwdir_tpu.ops import tile_plan as tpm
    from pyflwdir_tpu.ops.tile_plan import TilePlan

    d8 = _grid((256, 256), seed=67)
    idxs_ds, _, _ = d8c.from_array(d8)
    tp_ref = build_tile_plan(idxs_ds, (256, 256))  # gather coarse
    x = jnp.ones(idxs_ds.size, jnp.int32)
    want_dn = np.asarray(tp_ref.accumulate_down(x))

    old_min, old_max = tpm._COARSE_ROUTER_MIN, tpm._COARSE_SMALL_MAX
    tpm._COARSE_ROUTER_MIN = 1
    tpm._COARSE_SMALL_MAX = 0
    try:
        tp = build_tile_plan(idxs_ds, (256, 256))
        assert type(tp.coarse).__name__ == "BigAccelPlan"
        got_dn = np.asarray(tp.accumulate_down(x))
        assert tp._down.get("coarse_router")
        assert np.array_equal(got_dn, want_dn)
        wf = np.random.RandomState(3).rand(idxs_ds.size).astype(np.float32)
        dn_f = np.asarray(tp.accumulate_down(jnp.asarray(wf)))
        dn_f_ref = np.asarray(tp_ref.accumulate_down(jnp.asarray(wf)))
        scale = max(np.abs(dn_f_ref).max(), 1.0)
        assert np.allclose(dn_f, dn_f_ref, rtol=1e-4, atol=4e-6 * scale)
        tp.save(tmp_path / "plan")
        tp2 = TilePlan.load(tmp_path / "plan")
        assert type(tp2.coarse).__name__ == "BigAccelPlan"
        assert tp2._down.get("coarse_router")
        assert np.array_equal(np.asarray(tp2.accumulate_down(x)), want_dn)
    finally:
        tpm._COARSE_ROUTER_MIN = old_min
        tpm._COARSE_SMALL_MAX = old_max
