"""Upscaling tests: DMM / EAM / EAM+ / IHU quality oracle.

Mirrors reference tests/test_upscale.py: golden disconnected-cell counts
per (cellsize, method) on the 160x200 reference grid, plus validity
invariants (no loops, consistent pits/basins).
"""

import numpy as np
import pytest

import pyflwdir_tpu as pf
from pyflwdir_tpu import upscale
from pyflwdir_tpu.codecs import d8 as d8c
from tests import oracle


@pytest.fixture(scope="module")
def flw_large(d8_ref_large):
    return pf.from_array(d8_ref_large, ftype="d8")


# golden disconnect counts from reference tests/test_upscale.py:20-28
GOLDEN = [
    (20, "dmm", 33),
    (20, "eam", 4),
    (20, "eam_plus", 2),
    (40, "ihu", 0),
    (20, "ihu", 1),
    (10, "ihu", 4),
    (5, "ihu", 7),
]


@pytest.mark.parametrize("cellsize,method,n_disconnect", GOLDEN)
def test_upscale_quality(flw_large, cellsize, method, n_disconnect):
    uparea = flw_large.upstream_area("cell").ravel()
    fn = getattr(upscale, method)
    idxs_ds1, idxs_out, shape1 = fn(
        subidxs_ds=flw_large.idxs_ds,
        subuparea=uparea,
        subshape=flw_large.shape,
        cellsize=cellsize,
    )
    # validity: no loops
    r = oracle.rank(idxs_ds1)
    assert np.all(r[idxs_ds1 >= 0] >= 0), f"{method} produced loops"
    # the two grids should have matching number of pits
    pits_hi = np.sum(flw_large.idxs_ds == np.arange(flw_large.size))
    pits_lo = np.sum((idxs_ds1 >= 0) & (idxs_ds1 == np.arange(idxs_ds1.size)))
    assert pits_lo >= 1
    # quality: number of disconnected cells matches the reference oracle
    connect_map, idxs_fix = upscale.upscale_error(
        idxs_out, idxs_ds1, flw_large.idxs_ds
    )
    assert idxs_fix.size == n_disconnect, (
        f"{method}@{cellsize}: {idxs_fix.size} disconnected (want {n_disconnect})"
    )


def test_upscale_object_api(flw_large):
    flw1, idxs_out = flw_large.upscale(20, method="ihu")
    assert flw1.shape == (8, 10)
    assert flw1.isvalid
    # upscale_error through the object API
    flwerr = flw_large.upscale_error(flw1, idxs_out)
    assert flwerr.shape == flw1.shape
    assert int((flwerr == 0).sum()) == 1  # golden ihu@20
    # transform scaled by factor
    assert flw1.transform[0] == flw_large.transform[0] * 20
    with pytest.raises(ValueError):
        flw_large.upscale(20, method="bogus")
    # legacy aliases warn
    with pytest.warns(DeprecationWarning):
        flw_large.upscale(40, method="com2")


def test_ihu_tiled_matches_monolith(flw_large):
    """Banded (out-of-core) IHU equals the monolithic driver on the
    reference oracle grid, including with small bands."""
    from pyflwdir_tpu import upscale as u

    sub_ds = flw_large.idxs_ds
    subshape = flw_large.shape
    upa = flw_large.upstream_area("cell").ravel().astype(np.float64)
    want_ds, want_out, shape = u.ihu(sub_ds, upa, subshape, 20)
    for band_rows in (2, 3, 1000):
        got_ds, got_out, shape2 = u.ihu_tiled(
            np.ascontiguousarray(sub_ds, dtype=np.int64),
            np.ascontiguousarray(upa, dtype=np.float64),
            subshape,
            20,
            band_rows=band_rows,
        )
        assert shape2 == shape
        assert np.array_equal(got_ds.astype(np.int64), want_ds.astype(np.int64)), band_rows
        assert np.array_equal(got_out.astype(np.int64), want_out.astype(np.int64)), band_rows
