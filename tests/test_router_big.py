"""Large-n router + HBM-scale accumulation plan.

Correctness of the 7-stage mixed-radix routing (ops/router_big.py) and the
BigAccelPlan accumulation (ops/accel_big.py) against the DFS-interval
reference path, on the smallest multi-chunk sizes (G1 = 1, 2).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyflwdir_tpu.ops.accel_big import build_big_accel_plan
from pyflwdir_tpu.ops.plan import accumulate_planned, build_plan
from pyflwdir_tpu.ops.router_big import RouterPlanBig
from tests import oracle

_CHUNK = 1 << 21


@pytest.fixture(scope="module")
def big_grid():
    """Synthetic DEM-derived D8 grid just over one router chunk."""
    from pyflwdir_tpu.ops.fill import d8_from_filled, fill_depressions_dev

    rng = np.random.RandomState(17)
    side = 1504  # 2.26M cells -> G1 = 2
    z = rng.rand(side, side).astype(np.float32)
    z += np.add.outer(
        np.linspace(2, 0, side), np.linspace(2, 0, side)
    ).astype(np.float32)
    filled = fill_depressions_dev(z)
    return np.asarray(d8_from_filled(filled))


@pytest.mark.slow
def test_router_big_roundtrip_and_inverse():
    rng = np.random.RandomState(0)
    n = _CHUNK  # G1 = 1
    sigma = rng.permutation(n)
    plan = RouterPlanBig.build(sigma)
    x = rng.rand(n).astype(np.float32)
    y = plan.apply_np(x.reshape(-1, 128)).ravel()
    assert np.array_equal(y, x[sigma])
    back = plan.inverse().apply_np(y.reshape(-1, 128)).ravel()
    assert np.array_equal(back, x)


@pytest.mark.slow
def test_router_big_device_apply():
    rng = np.random.RandomState(2)
    n = _CHUNK
    sigma = rng.permutation(n)
    plan = RouterPlanBig.build(sigma)
    x = rng.rand(n).astype(np.float32)
    y = np.asarray(plan.apply(jnp.asarray(x).reshape(-1, 128))).ravel()
    assert np.array_equal(y, x[sigma])


@pytest.mark.slow
def test_big_accel_matches_planned(big_grid):
    from pyflwdir_tpu.codecs import d8 as d8c

    idxs_ds, idxs_pit, n_valid = d8c.from_array(big_grid)
    dfs = build_plan(idxs_ds, fast=False)
    plan = build_big_accel_plan(idxs_ds, dfs)
    assert plan is not None and plan.n_pad == 2 * _CHUNK

    # exact integer accumulation (int32 internal)
    out = np.asarray(plan.accumulate(jnp.ones(idxs_ds.size, jnp.int32)))
    want = np.asarray(
        accumulate_planned(dfs, jnp.ones(idxs_ds.size, jnp.int64))
    )
    assert np.array_equal(out.astype(np.int64), want)
    assert out[idxs_pit].sum() == n_valid

    # float path with weights
    rng = np.random.RandomState(3)
    w = rng.rand(idxs_ds.size).astype(np.float32)
    outf = np.asarray(plan.accumulate(jnp.asarray(w)))
    wantf = np.asarray(accumulate_planned(dfs, jnp.asarray(w, jnp.float64)))
    valid = idxs_ds >= 0
    assert np.allclose(outf[valid], wantf[valid], rtol=1e-4)

    # cached-router reconstruction path
    from pyflwdir_tpu.ops.accel_big import BigAccelPlan

    plan2 = BigAccelPlan(dfs, idxs_ds, routers=plan.router_tables())
    out2 = np.asarray(plan2.accumulate(jnp.ones(idxs_ds.size, jnp.int32)))
    assert np.array_equal(out2, out)
