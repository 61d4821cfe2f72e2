"""Device iterative depression fill vs the exact host priority-flood."""

import numpy as np
import pytest

from pyflwdir_tpu import dem
from pyflwdir_tpu.codecs import d8 as d8c
from pyflwdir_tpu.ops.fill import d8_from_filled, fill_depressions_dev
from tests import oracle
from tests.test_dem import WANG_LIU


def _check_valid_network(filled, d8_arr):
    assert d8c.isvalid(np.asarray(d8_arr))
    ids, pits, _ = d8c.from_array(np.asarray(d8_arr))
    r = oracle.rank(ids)
    assert np.all(r[ids >= 0] >= 0), "loops"
    f = np.asarray(filled).ravel()
    nonpit = (ids >= 0) & (ids != np.arange(ids.size))
    assert np.all(f[ids[nonpit]] <= f[nonpit] + 1e-6), "uphill flow"


@pytest.mark.parametrize("connectivity", [8, 4])
def test_dev_fill_matches_host(connectivity):
    got = np.asarray(fill_depressions_dev(WANG_LIU, connectivity=connectivity))
    want = dem.fill_depressions(WANG_LIU, connectivity=connectivity)[0]
    assert np.allclose(got, want)


def test_dev_fill_min_outlet_and_nodata():
    got = np.asarray(fill_depressions_dev(WANG_LIU, outlets="min"))
    want = dem.fill_depressions(WANG_LIU, outlets="min")[0]
    assert np.allclose(got, want)
    a2 = WANG_LIU.copy()
    a2[3, 5:] = -9999
    got = np.asarray(fill_depressions_dev(a2))
    want = dem.fill_depressions(a2)[0]
    assert np.allclose(got, want)


def test_dev_fill_random_grids():
    rng = np.random.RandomState(3)
    for t in range(4):
        a = np.round(rng.rand(30, 41) * 40).astype(np.float64)
        a[rng.rand(30, 41) < 0.04] = -9999.0
        got = np.asarray(fill_depressions_dev(a))
        want = dem.fill_depressions(a)[0]
        assert np.allclose(got, want), t


def test_dev_d8_from_filled():
    filled = np.asarray(fill_depressions_dev(WANG_LIU))
    d8_arr = d8_from_filled(filled)
    _check_valid_network(filled, d8_arr)
    # all valid cells drain (no interior flat stuck)
    ids, pits, n = d8c.from_array(np.asarray(d8_arr))
    accu = oracle.accuflux(ids, np.ones(ids.size), nodata=-9999)
    assert accu[pits].sum() == n


def test_dev_d8_random():
    rng = np.random.RandomState(5)
    a = np.round(rng.rand(25, 33) * 30).astype(np.float64)
    filled = np.asarray(fill_depressions_dev(a))
    d8_arr = d8_from_filled(filled)
    _check_valid_network(filled, d8_arr)


def test_dev_fill_max_depth_wang_liu():
    """Depth-capped fill matches the host kernel on the reference's
    worked example (Wang & Liu grid, max_depth=2)."""
    got = np.asarray(fill_depressions_dev(WANG_LIU, max_depth=2))
    want = dem.fill_depressions(WANG_LIU, max_depth=2)[0]
    assert np.allclose(got, want)


def test_dev_fill_elv_max():
    got = np.asarray(fill_depressions_dev(WANG_LIU, elv_max=6.0))
    want = dem.fill_depressions(WANG_LIU, elv_max=6.0)[0]
    assert np.allclose(got, want)


def test_dev_fill_max_depth_invariants():
    """On arbitrary grids the depth cap holds and the surface drains; the
    exact interior-pit choice may differ from the heap-ordered host."""
    rng = np.random.RandomState(4)
    for t in range(3):
        a = np.round(rng.rand(20, 25) * 30).astype(np.float64)
        got = np.asarray(fill_depressions_dev(a, max_depth=3.0))
        assert np.all(got - a < 3.0 + 1e-6), "fill depth exceeds the cap"
        assert np.all(got >= a - 1e-6)
        d8_arr = d8_from_filled(got)
        _check_valid_network(got, d8_arr)


def test_from_dem_device_engine():
    """from_dem(engine="device") produces a valid drainage of the same
    filled surface as the host heap (conservation + surface parity)."""
    import pyflwdir_tpu
    from pyflwdir_tpu.ops.fill import fill_depressions_dev
    from pyflwdir_tpu import dem as dem_mod

    rng = np.random.RandomState(4)
    z = rng.rand(96, 80).astype(np.float32)
    z += np.add.outer(np.linspace(2, 0, 96), np.linspace(2, 0, 80)).astype(
        np.float32
    )
    filled_host = dem_mod.fill_depressions(z)[0]
    filled_dev = np.asarray(fill_depressions_dev(z))
    assert np.allclose(filled_dev, filled_host, atol=1e-5)
    fd = pyflwdir_tpu.from_dem(z, engine="device")
    ua = fd.upstream_area(unit="cell")
    n_valid = int((np.asarray(fd.idxs_ds) >= 0).sum())
    pits = np.asarray(fd.idxs_pit)
    assert int(ua.ravel()[pits].sum()) == n_valid


def test_dev_fill_multigrid_bitwise():
    """The coarse-to-fine seeded erosion fill is bitwise identical to the
    direct fill and to the host priority flood, including nodata holes,
    masked boundaries and capped depth."""
    from pyflwdir_tpu import runtime
    from pyflwdir_tpu.ops.fill import fill_depressions_dev

    rng = np.random.RandomState(71)
    H, W = 197, 243
    z = rng.rand(H, W).astype(np.float32) * 10
    z += np.add.outer(np.linspace(5, 0, H), np.linspace(5, 0, W)).astype(
        np.float32
    )
    # nodata: a hole + an irregular boundary mask
    z[40:60, 50:80] = -9999.0
    yy, xx = np.mgrid[0:H, 0:W]
    z[((yy - H / 2) ** 2 + (xx - W / 2) ** 2) > (0.65 * max(H, W)) ** 2] = (
        -9999.0
    )
    direct = np.asarray(
        fill_depressions_dev(z, nodata=-9999.0, multigrid_min=10**9)
    )
    mg = np.asarray(fill_depressions_dev(z, nodata=-9999.0, multigrid_min=16))
    assert np.array_equal(mg, direct)
    host = runtime.priority_flood(
        z.astype(np.float64), nodata=-9999.0
    )[0].astype(np.float32)
    assert np.array_equal(mg, host)
    # capped depth: outer fixpoint with multigrid inner fills
    mg_cap = np.asarray(
        fill_depressions_dev(z, nodata=-9999.0, max_depth=0.5, multigrid_min=16)
    )
    direct_cap = np.asarray(
        fill_depressions_dev(
            z, nodata=-9999.0, max_depth=0.5, multigrid_min=10**9
        )
    )
    assert np.array_equal(mg_cap, direct_cap)


def test_dev_fill_strip_kernel_interpret():
    """The strip-kernel sweep (Pallas, interpret mode on CPU) reaches the
    identical fixpoint as the XLA scan sweep and the host priority flood,
    including non-multiple shapes (padded with fixed +inf)."""
    from pyflwdir_tpu import runtime
    from pyflwdir_tpu.ops import fill as F

    rng = np.random.RandomState(83)
    H, W = 150, 200  # not multiples of the strip sizes
    z = rng.rand(H, W).astype(np.float32) * 10
    z += np.add.outer(np.linspace(5, 0, H), np.linspace(5, 0, W)).astype(
        np.float32
    )
    z[40:50, 60:80] = -9999.0
    want = np.asarray(F.fill_depressions_dev(z, nodata=-9999.0))
    old = F._FORCE_STRIP
    F._FORCE_STRIP = True
    try:
        got = np.asarray(F.fill_depressions_dev(z, nodata=-9999.0))
    finally:
        F._FORCE_STRIP = old
    assert np.array_equal(got, want)
    host = runtime.priority_flood(z.astype(np.float64), nodata=-9999.0)[0]
    assert np.array_equal(got, host.astype(np.float32))

    # 4-connectivity through the strip kernel too
    F._FORCE_STRIP = True
    try:
        got4 = np.asarray(
            F.fill_depressions_dev(z, nodata=-9999.0, connectivity=4)
        )
    finally:
        F._FORCE_STRIP = old
    want4 = np.asarray(
        F.fill_depressions_dev(z, nodata=-9999.0, connectivity=4)
    )
    assert np.array_equal(got4, want4)


def test_from_dem_auto_dispatch(monkeypatch):
    """engine='auto' picks the device fill above _FROM_DEM_DEV_MIN on an
    accelerator backend and the host heap otherwise."""
    import jax

    import pyflwdir_tpu
    from pyflwdir_tpu import raster as raster_mod
    from pyflwdir_tpu.ops import fill as F

    rng = np.random.RandomState(9)
    z = rng.rand(96, 80).astype(np.float32)
    z += np.add.outer(np.linspace(2, 0, 96), np.linspace(2, 0, 80)).astype(
        np.float32
    )
    calls = {"dev": 0}
    orig = F.fill_depressions_dev

    def spy(*a, **k):
        calls["dev"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(F, "fill_depressions_dev", spy)
    # small grid / cpu backend: host heap
    fd = pyflwdir_tpu.from_dem(z, engine="auto")
    assert calls["dev"] == 0
    # pretend accelerator + tiny threshold: device path
    monkeypatch.setattr(raster_mod, "_accel_backend", lambda: True)
    monkeypatch.setattr(raster_mod, "_FROM_DEM_DEV_MIN", 0)
    fd2 = pyflwdir_tpu.from_dem(z, engine="auto")
    assert calls["dev"] == 1
    ua = fd2.upstream_area(unit="cell")
    n_valid = int((np.asarray(fd2.idxs_ds) >= 0).sum())
    assert int(ua.ravel()[np.asarray(fd2.idxs_pit)].sum()) == n_valid
