"""Graph-engine tests: pointer-doubling kernels vs the sequential oracle.

Covers the invariants of reference tests/test_core.py (rank/pit/loop,
upstream counts, fillnodata) and tests/test_streams_basins.py (accuflux
conservation) on both crafted and reference-derived grids.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyflwdir_tpu.codecs import d8
from pyflwdir_tpu.ops import graph
from tests import oracle


def _parse(d8_grid):
    idxs_ds, idxs_pit, n = d8.from_array(d8_grid)
    return jnp.asarray(idxs_ds), idxs_pit, n


def test_rank_matches_oracle(d8_grid):
    idxs_ds, idxs_pit, _ = _parse(d8_grid)
    got = np.asarray(graph.rank(idxs_ds))
    want = oracle.rank(np.asarray(idxs_ds))
    assert np.array_equal(got, want)
    # invariants: rank[pit] == 0; rank[i] == rank[ds]+1 for valid cells
    ids = np.asarray(idxs_ds)
    valid = (ids >= 0) & (got >= 0)
    nonpit = valid & (ids != np.arange(ids.size))
    assert np.all(got[ids[nonpit]] + 1 == got[nonpit])
    assert np.all(got[idxs_pit] == 0)


def test_rank_detects_loops():
    # 0 -> 1 -> 2 -> 0 cycle plus 3 -> 0 and 4 pit, 5 missing
    idxs_ds = jnp.array([1, 2, 0, 0, 4, -1], dtype=jnp.int32)
    got = np.asarray(graph.rank(idxs_ds))
    assert np.array_equal(got, [-1, -1, -1, -1, 0, -9999])


@pytest.mark.parametrize("cycle_len", [2, 3, 4, 8])
def test_rank_detects_power_of_two_cycles(cycle_len):
    # power-of-two cycles collapse to self-loops under pointer doubling and
    # must not be mistaken for pits
    n = cycle_len + 3
    ids = np.arange(n, dtype=np.int32)
    for i in range(cycle_len):
        ids[i] = (i + 1) % cycle_len
    ids[cycle_len] = 0  # drains into the cycle
    ids[cycle_len + 1] = cycle_len + 2  # chain to pit
    ids[cycle_len + 2] = cycle_len + 2  # pit
    got = np.asarray(graph.rank(jnp.asarray(ids)))
    want = oracle.rank(ids)
    assert np.array_equal(got, want)
    assert np.all(got[: cycle_len + 1] == -1)


def test_roots_and_basins(d8_grid):
    idxs_ds, idxs_pit, _ = _parse(d8_grid)
    root = np.asarray(graph.roots(idxs_ds))
    ids = np.arange(1, idxs_pit.size + 1).astype(np.uint32)
    want = oracle.basins(np.asarray(idxs_ds), idxs_pit, ids)
    lut = np.zeros(int(np.asarray(idxs_ds).size), dtype=np.uint32)
    lut[idxs_pit] = ids
    got = np.where(np.asarray(idxs_ds) >= 0, lut[root], 0)
    assert np.array_equal(got, want)


def test_accumulate_matches_oracle(d8_grid):
    idxs_ds, idxs_pit, n = _parse(d8_grid)
    ids = np.asarray(idxs_ds)
    data = np.ones(ids.size, dtype=np.float64)
    data[ids < 0] = 0.0
    got = np.asarray(graph.accumulate(idxs_ds, jnp.asarray(data)))
    want = oracle.accuflux(ids, data, nodata=-9999)
    assert np.allclose(got[ids >= 0], want[ids >= 0])
    # conservation: sum over pits == number of valid cells
    assert np.isclose(got[idxs_pit].sum(), n)


def test_accumulate_random_weights(d8_grid):
    idxs_ds, _, _ = _parse(d8_grid)
    ids = np.asarray(idxs_ds)
    rng = np.random.RandomState(7)
    data = rng.rand(ids.size)
    got = np.asarray(graph.accumulate(idxs_ds, jnp.asarray(data)))
    want = oracle.accuflux(ids, data.copy(), nodata=-9999)
    assert np.allclose(got[ids >= 0], want[ids >= 0])


def test_accumulate_nodata_blocks(d8_grid):
    idxs_ds, _, _ = _parse(d8_grid)
    ids = np.asarray(idxs_ds)
    rng = np.random.RandomState(3)
    data = np.ones(ids.size, dtype=np.float64)
    # sprinkle nodata on some valid cells
    valid_idx = np.where(ids >= 0)[0]
    block = rng.choice(valid_idx, size=max(1, valid_idx.size // 10), replace=False)
    data[block] = -9999.0
    got = np.asarray(graph.accumulate(idxs_ds, jnp.asarray(data), nodata=-9999.0))
    want = oracle.accuflux(ids, data.copy(), nodata=-9999.0)
    assert np.allclose(got[ids >= 0], want[ids >= 0])


def test_accumulate_downstream(d8_grid):
    idxs_ds, _, _ = _parse(d8_grid)
    ids = np.asarray(idxs_ds)
    rng = np.random.RandomState(11)
    data = rng.rand(ids.size)
    got = np.asarray(graph.accumulate_downstream(idxs_ds, jnp.asarray(data)))
    want = oracle.accuflux_ds(ids, data.copy(), nodata=-9999)
    assert np.allclose(got[ids >= 0], want[ids >= 0])


def test_accumulate_downstream_nodata(d8_grid):
    idxs_ds, _, _ = _parse(d8_grid)
    ids = np.asarray(idxs_ds)
    rng = np.random.RandomState(13)
    data = np.round(rng.rand(ids.size) * 10) + 1.0
    valid_idx = np.where(ids >= 0)[0]
    block = rng.choice(valid_idx, size=max(1, valid_idx.size // 8), replace=False)
    data[block] = -9999.0
    got = np.asarray(
        graph.accumulate_downstream(idxs_ds, jnp.asarray(data), nodata=-9999.0)
    )
    want = oracle.accuflux_ds(ids, data.copy(), nodata=-9999.0)
    assert np.allclose(got[ids >= 0], want[ids >= 0])


def test_upstream_count(d8_grid):
    idxs_ds, _, _ = _parse(d8_grid)
    got = np.asarray(graph.upstream_count(idxs_ds))
    want = oracle.upstream_count(np.asarray(idxs_ds))
    assert np.array_equal(got, want)
    # headwaters have count 0, confluences > 1; d8 max fan-in is 8
    assert got.max() <= 8


def test_main_upstream(d8_grid):
    idxs_ds, _, _ = _parse(d8_grid)
    ids = np.asarray(idxs_ds)
    uparea = np.asarray(graph.accumulate(idxs_ds, jnp.ones(ids.size)))
    got = np.asarray(graph.main_upstream(idxs_ds, jnp.asarray(uparea)))
    want = oracle.main_upstream(ids, uparea)
    assert np.array_equal(got, want)


def test_fillnodata_upstream(d8_grid):
    idxs_ds, idxs_pit, _ = _parse(d8_grid)
    ids = np.asarray(idxs_ds)
    data = np.full(ids.size, -1.0)
    data[idxs_pit] = np.arange(1, idxs_pit.size + 1)
    got = np.asarray(graph.fillnodata_upstream(idxs_ds, jnp.asarray(data), -1.0))
    want = oracle.fillnodata_upstream(ids, data.copy(), -1.0)
    assert np.array_equal(got[ids >= 0], want[ids >= 0])


@pytest.mark.parametrize("how", ["min", "max", "sum"])
def test_fillnodata_downstream(d8_grid, how):
    idxs_ds, _, _ = _parse(d8_grid)
    ids = np.asarray(idxs_ds)
    rng = np.random.RandomState(5)
    data = rng.randint(1, 10, ids.size).astype(np.float64)
    valid_idx = np.where(ids >= 0)[0]
    holes = rng.choice(valid_idx, size=valid_idx.size // 2, replace=False)
    data[holes] = -1.0
    got = np.asarray(
        graph.fillnodata_downstream(idxs_ds, jnp.asarray(data), -1.0, how=how)
    )
    want = oracle.fillnodata_downstream(ids, data.copy(), -1.0, how=how)
    assert np.array_equal(got[ids >= 0], want[ids >= 0])


def test_reach_stops_at_mask(d8_grid):
    idxs_ds, _, _ = _parse(d8_grid)
    ids = np.asarray(idxs_ds)
    uparea = np.asarray(graph.accumulate(idxs_ds, jnp.ones(ids.size)))
    stream = jnp.asarray(uparea >= 5)
    got = np.asarray(graph.reach(idxs_ds, stream))
    # walking oracle
    for i in np.where(ids >= 0)[0][::7]:
        j = i
        while not stream[j] and ids[j] != j:
            j = ids[j]
        assert got[i] == j


def test_path_sum_distance(d8_grid):
    idxs_ds, _, _ = _parse(d8_grid)
    ids = np.asarray(idxs_ds)
    r = oracle.rank(ids)
    w = np.ones(ids.size)
    got = np.asarray(graph.path_sum(idxs_ds, jnp.asarray(w)))
    # path_sum with unit weights == rank for tree cells
    assert np.array_equal(got[r >= 0], r[r >= 0])
