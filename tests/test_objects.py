"""Object API tests: Flwdir / FlwdirRaster surface, caching, IO.

Mirrors reference tests/test_pyflwdir.py and tests/test_flwdir.py.
"""

import os

import numpy as np
import pytest

import pyflwdir_tpu as pf
from tests import oracle


@pytest.fixture()
def flw(d8_small):
    return pf.from_array(d8_small, ftype="d8")


def test_from_array_infer(d8_small):
    flw = pf.from_array(d8_small)
    assert flw.ftype == "d8"
    assert flw.shape == d8_small.shape
    # invalid input
    with pytest.raises(ValueError):
        pf.from_array(np.arange(20).reshape(4, 5).astype(np.float32))
    with pytest.raises(ValueError):
        pf.from_array(d8_small.ravel())  # 1D
    # bad ftype value check
    bad = d8_small.copy()
    bad[2, 2] = 3
    with pytest.raises(ValueError):
        pf.from_array(bad, ftype="d8", check_ftype=True)


def test_roundtrip_to_array(flw, d8_small):
    back = flw.to_array("d8")
    # re-parse gives identical graph
    flw2 = pf.from_array(back, ftype="d8")
    assert np.array_equal(flw.idxs_ds, flw2.idxs_ds)
    # ldd conversion roundtrip
    ldd = flw.to_array("ldd")
    flw3 = pf.from_array(ldd, ftype="ldd")
    assert np.array_equal(flw.idxs_ds, flw3.idxs_ds)


def test_basic_properties(flw, d8_small):
    ids = flw.idxs_ds
    assert flw.isvalid
    assert flw.nnodes == int((d8_small != 247).sum())
    assert np.all(flw.rank.ravel()[flw.idxs_pit] == 0)
    assert np.array_equal(
        np.asarray(flw.mask).reshape(flw.shape), d8_small != 247
    )
    assert flw.ncells == flw.nnodes
    # seq is a valid topological order
    seq = flw.idxs_seq
    pos = np.full(ids.size, -1)
    pos[seq] = np.arange(seq.size)
    nonpit = (ids >= 0) & (ids != np.arange(ids.size))
    assert np.all(pos[ids[nonpit]] < pos[nonpit])


def test_uparea_and_basins(flw):
    upa = flw.upstream_area("cell")
    n = flw.nnodes
    assert upa.ravel()[flw.idxs_pit].sum() == n
    bas = flw.basins()
    assert bas.max() == flw.idxs_pit.size
    # basin sizes equal uparea at pits
    sizes = np.bincount(bas.ravel())[1:]
    order = np.argsort(flw.idxs_pit)
    assert np.array_equal(
        np.sort(sizes), np.sort(upa.ravel()[flw.idxs_pit].astype(sizes.dtype))
    )
    # user ids and validation
    ids = np.arange(1, flw.idxs_pit.size + 1) * 7
    bas2 = flw.basins(ids=ids)
    assert set(np.unique(bas2)) - {0} == set(ids)
    with pytest.raises(ValueError, match="IDs cannot contain a value zero"):
        flw.basins(ids=ids * 0)


def test_stream_order_types(flw):
    sto = flw.stream_order()
    want = oracle.strahler_order(flw.idxs_ds)
    assert np.array_equal(sto.ravel(), want)
    cls = flw.stream_order(type="classic")
    # classic: pits have order 1; order non-decreasing upstream
    assert np.all(cls.ravel()[flw.idxs_pit] == 1)
    ids = flw.idxs_ds
    nonpit = (ids >= 0) & (ids != np.arange(ids.size))
    assert np.all(cls.ravel()[nonpit] >= cls.ravel()[ids[nonpit]])
    with pytest.raises(ValueError):
        flw.stream_order(type="bogus")


def test_accuflux_directions(flw):
    rng = np.random.RandomState(3)
    data = rng.rand(*flw.shape)
    up = flw.accuflux(data, direction="up")
    want = oracle.accuflux(flw.idxs_ds, data.ravel().copy(), nodata=-9999)
    assert np.allclose(up.ravel()[flw.mask], want[flw.mask])
    dn = flw.accuflux(data, direction="down")
    want = oracle.accuflux_ds(flw.idxs_ds, data.ravel().copy(), nodata=-9999)
    assert np.allclose(dn.ravel()[flw.mask], want[flw.mask])
    with pytest.raises(ValueError):
        flw.accuflux(data, direction="sideways")


def test_downstream_upstream_sum(flw):
    data = np.arange(flw.size, dtype=np.float64).reshape(flw.shape)
    dn = flw.downstream(data)
    ids = flw.idxs_ds
    m = flw.mask
    assert np.array_equal(dn.ravel()[m], data.ravel()[ids[m]])
    us = flw.upstream_sum(data)
    # pull check: sum of upstream values
    want = np.zeros(flw.size)
    for i in np.where(m & (ids != np.arange(flw.size)))[0]:
        want[ids[i]] += data.ravel()[i]
    assert np.allclose(us.ravel()[m & (us.ravel() != -9999)], want[m & (us.ravel() != -9999)])


def test_moving_average_median(flw):
    rng = np.random.RandomState(5)
    data = rng.rand(*flw.shape)
    avg = flw.moving_average(data, n=2)
    med = flw.moving_median(data, n=2)
    assert avg.shape == data.shape and med.shape == data.shape
    m = flw.mask.reshape(flw.shape)
    # averages stay within data range
    assert np.all(avg[m] >= data.min() - 1e-9) and np.all(avg[m] <= data.max() + 1e-9)
    assert np.all(med[m] >= data.min() - 1e-9) and np.all(med[m] <= data.max() + 1e-9)


def test_path_snap(flw):
    heads = np.where(np.asarray(flw.n_upstream).ravel() == 0)[0][:5]
    paths, dists = flw.path(idxs=heads)
    for p, head in zip(paths, heads):
        assert p[0] == head
        assert flw.idxs_ds[p[-1]] == p[-1]  # ends at pit
    idxs, d = flw.snap(idxs=heads)
    for p, i in zip(paths, idxs):
        assert p[-1] == i
    # upstream path from pit follows main upstream
    paths_up, _ = flw.path(idxs=flw.idxs_pit[:1], direction="up")
    assert paths_up[0][0] == flw.idxs_pit[0]


def test_pickle_roundtrip(flw, tmp_path):
    fn = os.path.join(tmp_path, "flw.pkl")
    flw.dump(fn)
    flw2 = pf.FlwdirRaster.load(fn)
    assert np.array_equal(flw.idxs_ds, flw2.idxs_ds)
    assert flw2.shape == flw.shape
    assert flw2.ftype == flw.ftype
    assert np.allclose(flw2.transform, flw.transform)


def test_add_pits_repair(flw):
    idx = int(np.where(flw.rank.ravel() > 2)[0][0])
    flw.add_pits(idxs=[idx])
    assert idx in flw.idxs_pit
    assert flw.rank.ravel()[idx] == 0
    # repair_loops on a manually broken graph
    ids = flw.idxs_ds.copy()
    # create a 2-cycle between a cell and its downstream
    nonpit = np.where((ids >= 0) & (ids != np.arange(ids.size)))[0]
    a = int(nonpit[0])
    b = int(ids[a])
    flw._idxs_ds[b] = a
    flw._invalidate()
    assert not flw.isvalid
    flw.repair_loops()
    assert flw.isvalid


def test_transform_and_coords(d8_small):
    tf = pf.utils.transform_from_origin(5.0, 52.0, 0.1, 0.1)
    flw = pf.from_array(d8_small, transform=tf, latlon=True)
    xs, ys = flw.xy(np.array([0, 1]))
    assert ys[0] == pytest.approx(52.0 - 0.05)
    assert xs[1] == pytest.approx(5.0 + 0.15)
    idxs = flw.index(xs, ys)
    assert np.array_equal(idxs, [0, 1])
    # bounds / extent
    w, s, e, n = flw.bounds
    assert (w, n) == (5.0, 52.0)
    assert e == pytest.approx(5.0 + 0.1 * d8_small.shape[1])
    # latlon area grid is positive and latitude-dependent
    area = flw.area
    assert np.all(area > 0)


def test_stream_distance(flw):
    dist = flw.stream_distance(unit="cell")
    r = flw.rank
    assert np.array_equal(dist.ravel()[r.ravel() >= 0], r.ravel()[r.ravel() >= 0])


def test_vectorize_streams(flw):
    feats = flw.streams()
    assert len(feats) > 0
    assert all(f["geometry"]["type"] == "LineString" for f in feats)
    # with strord sampling
    feats2 = flw.streams(strord=flw.stream_order())
    assert "strord" in feats2[0]["properties"]
    feats3 = flw.vectorize()
    assert len(feats3) == int(np.sum(flw.mask))


def test_graph_flwdir_from_dataframe():
    class FakeDF:
        def __init__(self, idx, ds):
            self.index = type("I", (), {"values": idx})()
            self._ds = ds

        def __getitem__(self, k):
            return type("C", (), {"values": self._ds})()

    # simple chain with custom ids: 10 -> 20 -> 30 (pit)
    idx = np.array([10, 20, 30])
    ds = np.array([20, 30, 99])  # 99 absent -> pit
    flw = pf.from_dataframe(FakeDF(idx, ds))
    assert np.array_equal(flw.idxs_ds, [1, 2, 2])
    assert flw.nnodes == 3


def test_sharded_checkpoint_roundtrip(tmp_path, d8_small):
    from pyflwdir_tpu import checkpoint, from_array

    flw = from_array(d8_small, ftype="d8")
    upa = flw.upstream_area(unit="cell")
    checkpoint.save_sharded(
        flw, str(tmp_path / "ckpt"), tile=(6, 5), rasters={"uparea": upa}
    )
    flw2, extra = checkpoint.load_sharded(str(tmp_path / "ckpt"), rasters=["uparea"])
    assert flw2.shape == flw.shape and flw2.ftype == flw.ftype
    assert np.array_equal(np.asarray(flw2.idxs_ds), np.asarray(flw.idxs_ds))
    assert np.array_equal(extra["uparea"], upa)
    # partial (tile-window) load of one raster
    from pyflwdir_tpu.checkpoint import load_raster
    import json as _json

    man = _json.load(open(tmp_path / "ckpt" / "manifest.json"))
    win = load_raster(
        str(tmp_path / "ckpt"), "uparea", man["rasters"]["uparea"],
        tile_slice=(0, 1, 0, 1),
    )
    assert np.array_equal(win, upa[:6, :5])
