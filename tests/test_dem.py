"""DEM pipeline tests: depression filling, slope, HAND, floodplains,
profile adjustment.

Mirrors the strategy of reference tests/test_dem.py: the Wang & Liu (2006)
worked-example grid for filling (validated against an independent
fixpoint oracle), explicit profile vectors for adjust_elevation, and
rank-as-elevation synthetic oracles for HAND/floodplains.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyflwdir_tpu import dem
from pyflwdir_tpu.codecs import d8 as d8c
from tests import oracle

# input grid of the worked example in Wang & Liu (2006),
# doi:10.1080/13658810500433453 (as used by reference tests/test_dem.py:13-22)
WANG_LIU = np.array(
    [
        [15, 15, 14, 15, 12, 6, 12],
        [14, 13, 10, 12, 15, 17, 15],
        [15, 15, 9, 11, 8, 15, 15],
        [16, 17, 8, 16, 15, 7, 5],
        [19, 18, 19, 18, 17, 15, 14],
    ],
    dtype=np.float32,
)


def _check_d8_consistent(filled, d8_arr, nodata=-9999.0):
    """D8 must be valid, acyclic, and non-increasing on the filled DEM."""
    assert d8c.isvalid(d8_arr)
    idxs_ds, idxs_pit, n = d8c.from_array(d8_arr)
    r = oracle.rank(idxs_ds)
    assert np.all(r[idxs_ds >= 0] >= 0), "loops in filled d8"
    f = filled.ravel()
    valid = idxs_ds >= 0
    nonpit = valid & (idxs_ds != np.arange(idxs_ds.size))
    assert np.all(f[idxs_ds[nonpit]] <= f[nonpit]), "uphill flow"


def test_fill_wang_liu():
    filled, d8_arr = dem.fill_depressions(WANG_LIU)
    want = oracle.fill_oracle(WANG_LIU)
    assert np.allclose(filled, want)
    # the interior depression fills to its pour point elevation (11)
    assert np.all(filled[1:4, 2] == 11)
    _check_d8_consistent(filled, d8_arr)


def test_fill_single_outlet():
    filled, d8_arr = dem.fill_depressions(WANG_LIU, outlets="min")
    # single outlet at the lowest edge cell (value 5 at [3, 6])
    seeds = np.zeros(WANG_LIU.shape, dtype=bool)
    seeds[3, 6] = True
    want = oracle.fill_oracle(WANG_LIU, seeds=seeds)
    assert np.allclose(filled, want)
    idxs_ds, idxs_pit, _ = d8c.from_array(d8_arr)
    # exactly one pit with an outflow value (all flow converges there)
    accu = oracle.accuflux(idxs_ds, np.ones(idxs_ds.size), nodata=-9999)
    assert accu[3 * 7 + 6] == idxs_ds.size


def test_fill_nodata():
    a2 = WANG_LIU.copy()
    a2[3, 5:] = -9999
    filled, d8_arr = dem.fill_depressions(a2)
    assert np.all(d8_arr[3, 5:] == 247)
    want = oracle.fill_oracle(a2)
    assert np.allclose(filled[a2 != -9999], want[a2 != -9999])
    _check_d8_consistent(filled, d8_arr)


def test_fill_max_depth():
    # pour-point depth of the depression is 3 (> 2) -> kept as pit
    filled, d8_arr = dem.fill_depressions(WANG_LIU, max_depth=2)
    assert np.all(filled == WANG_LIU)
    idxs_ds, idxs_pit, _ = d8c.from_array(d8_arr)
    assert idxs_pit.size >= 2  # interior pit + edge outlet(s)


def test_fill_connectivity4():
    filled, d8_arr = dem.fill_depressions(WANG_LIU, connectivity=4)
    want = oracle.fill_oracle(WANG_LIU, connectivity=4)
    assert np.allclose(filled, want)
    # only D4 directions used
    assert np.all(np.isin(np.unique(d8_arr), [0, 1, 4, 16, 64]))


def test_adjust_elevation_profiles():
    # dig: cheaper to lower the bump after the pit
    p_dig = np.array([8.0, 7, 6, 5, 5, 6, 5, 4])
    out = dem._adjust_elevation_profile(p_dig.copy())
    assert np.all(np.diff(out) <= 0)
    assert np.abs(out - p_dig).sum() <= 1.0
    # fill: cheaper to raise the single low cell before the high bump
    p_fill = np.array([8.0, 7, 3, 7, 7, 6, 5, 4])
    out = dem._adjust_elevation_profile(p_fill.copy())
    assert np.all(np.diff(out) <= 0)
    assert np.abs(out - p_fill).sum() <= 4.0
    # already monotone: unchanged
    p_mono = np.array([8.0, 7, 6, 5, 4, 3, 2, 1])
    assert np.allclose(dem._adjust_elevation_profile(p_mono.copy()), p_mono)


def test_adjust_elevation_network(d8_small):
    idxs_ds, _, _ = d8c.from_array(d8_small)
    rng = np.random.RandomState(42)
    elev = rng.rand(idxs_ds.size) * 10
    r = oracle.rank(idxs_ds)
    out = dem.adjust_elevation(idxs_ds, r, elev)
    # downstream monotone everywhere on the tree
    valid = (idxs_ds >= 0) & (r >= 0)
    nonpit = valid & (idxs_ds != np.arange(idxs_ds.size))
    assert np.all(out[idxs_ds[nonpit]] <= out[nonpit] + 1e-12)


def test_hand_and_floodplains(d8_small):
    idxs_ds, idxs_pit, _ = d8c.from_array(d8_small)
    jds = jnp.asarray(idxs_ds)
    r = oracle.rank(idxs_ds).astype(np.float64)
    # use rank as elevation: elevation increases upstream by 1 per cell
    elev = np.where(r >= 0, r, -9999.0)
    accu = oracle.accuflux(idxs_ds, np.ones(idxs_ds.size), nodata=-9999)
    drain = (accu >= 5) & (idxs_ds >= 0)
    hand = np.asarray(
        dem.height_above_nearest_drain(jds, jnp.asarray(drain), jnp.asarray(elev))
    )
    # with rank elevation, hand == distance to nearest drain cell
    for i in np.where((idxs_ds >= 0) & (r >= 0))[0]:
        j, d = i, 0
        while not drain[j] and idxs_ds[j] != j:
            j = idxs_ds[j]
            d += 1
        assert hand[i] == pytest.approx(d if drain[j] else r[i])
    # floodplains: threshold upa**b with b=0 -> cells within dz <= 1 of drain
    fld = np.asarray(
        dem.floodplains(jds, jnp.asarray(elev), jnp.asarray(accu), upa_min=5, b=0.0)
    )
    assert np.all(fld[drain] == 1)
    valid = idxs_ds >= 0
    assert set(np.unique(fld[valid])) <= {0, 1}
    # cells 1 step above a drain (dz = 1 <= 1) are floodplain
    one_up = valid & ~drain & drain[np.where(idxs_ds >= 0, idxs_ds, 0)] & (r >= 0)
    assert np.all(fld[one_up] == 1)


def test_slope_flat_and_plane():
    flat = np.ones((6, 8), dtype=np.float32)
    assert np.allclose(np.asarray(dem.slope(flat)), 0.0)
    # inclined plane dz/dx = 0.5
    x = np.arange(8, dtype=np.float32) * 0.5
    plane = np.tile(x, (6, 1))
    slp = np.asarray(dem.slope(plane))
    assert np.allclose(slp[1:-1, 1:-1], 0.5, atol=1e-6)


def test_dig_4connectivity():
    d8_arr = np.array(
        [[2, 4, 16], [1, 2, 16], [1, 1, 0]], dtype=np.uint8
    )
    idxs_ds, _, _ = d8c.from_array(d8_arr)
    r = oracle.rank(idxs_ds)
    elev = np.array([[5.0, 4, 6], [4, 3, 5], [3, 2, 1]]).ravel()
    out = dem.dig_4connectivity(idxs_ds, r, elev.copy(), (3, 3))
    # for every diagonal link, some adjacent D4 cell is <= the source cell
    ncol = 3
    for i in np.where(idxs_ds >= 0)[0]:
        ds = idxs_ds[i]
        dd = abs(int(i) - int(ds))
        if dd > 1 and dd != ncol:
            d4 = dem._local_d4(int(i), int(ds), ncol)
            assert np.any(out[d4] <= out[i])
