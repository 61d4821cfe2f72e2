"""Codec tests: round trips, validity predicates, cross-ftype identity.

Mirrors the strategy of reference tests/test_core_xx.py:11-68.
"""

import numpy as np
import pytest

from pyflwdir_tpu import codecs
from pyflwdir_tpu.codecs import d8, ldd, nextxy


def test_d8_lut_decode():
    # each code maps back to its (dr, dc) slot in the _ds matrix
    for i, dr in enumerate((-1, 0, 1)):
        for j, dc in enumerate((-1, 0, 1)):
            code = d8._ds[i, j]
            got_dr, got_dc = d8.drdc(np.uint8(code))
            if code == 0:  # pit
                assert (got_dr, got_dc) == (0, 0)
            else:
                assert (got_dr, got_dc) == (dr, dc)


def test_ldd_lut_decode():
    for i, dr in enumerate((-1, 0, 1)):
        for j, dc in enumerate((-1, 0, 1)):
            code = ldd._ds[i, j]
            got_dr, got_dc = ldd.drdc(np.uint8(code))
            if code == 5:  # pit
                assert (got_dr, got_dc) == (0, 0)
            else:
                assert (got_dr, got_dc) == (dr, dc)


@pytest.mark.parametrize("codec", [d8, ldd])
def test_roundtrip(codec, d8_grid):
    flwdir = d8_grid if codec is d8 else codecs.d8_to_ldd(d8_grid)
    assert codec.isvalid(flwdir)
    idxs_ds, idxs_pit, n = codec.from_array(flwdir)
    assert n == int((flwdir != codec._mv).sum())
    # pits point to themselves; missing are -1
    assert np.all(idxs_ds[idxs_pit] == idxs_pit)
    assert np.all(idxs_ds[flwdir.ravel() == codec._mv] == -1)
    back = codec.to_array(idxs_ds, flwdir.shape)
    # cells that flow out of domain / into nodata were converted to pits
    changed = back != flwdir
    assert np.all(codec.ispit(back[changed]) | codec.isnodata(back[changed]))
    # re-parse gives identical graph
    idxs_ds2, idxs_pit2, n2 = codec.from_array(back)
    assert np.array_equal(idxs_ds, idxs_ds2)
    assert np.array_equal(idxs_pit, idxs_pit2)


def test_nextxy_roundtrip(d8_grid):
    idxs_ds, idxs_pit, n = d8.from_array(d8_grid)
    xy = nextxy.to_array(idxs_ds, d8_grid.shape)
    assert nextxy.isvalid(xy)
    idxs_ds2, idxs_pit2, n2 = nextxy.from_array(xy)
    assert np.array_equal(idxs_ds, idxs_ds2)
    assert np.array_equal(idxs_pit, idxs_pit2)
    assert n == n2


def test_cross_ftype(d8_grid):
    # d8 -> ldd -> d8 identity, except 255 pits normalize to 0
    ldd_arr = codecs.d8_to_ldd(d8_grid)
    assert ldd.isvalid(ldd_arr)
    back = codecs.ldd_to_d8(ldd_arr)
    expect = d8_grid.copy()
    expect[expect == 255] = 0
    assert np.array_equal(back, expect)
    # graphs identical
    a, _, _ = d8.from_array(d8_grid)
    b, _, _ = ldd.from_array(ldd_arr)
    assert np.array_equal(a, b)


def test_infer_ftype(d8_small):
    assert codecs.infer_ftype(d8_small) == "d8"
    assert codecs.infer_ftype(codecs.d8_to_ldd(d8_small)) == "ldd"
    idxs_ds, _, _ = d8.from_array(d8_small)
    assert codecs.infer_ftype(nextxy.to_array(idxs_ds, d8_small.shape)) == "nextxy"
    with pytest.raises(ValueError):
        codecs.infer_ftype(np.ones((3, 3), dtype=np.float32))


def test_d8_invalid_values():
    bad = np.full((3, 3), 3, dtype=np.uint8)  # 3 is not a d8 code
    assert not d8.isvalid(bad)
    assert not ldd.isvalid(np.full((3, 3), 13, dtype=np.uint8))


def test_to_array_rejects_non_neighbor():
    idxs_ds = np.array([5, 1, 2, 3, 4, 5], dtype=np.int32)  # 0 -> 5 is not adjacent in 3x2
    with pytest.raises(ValueError):
        d8.to_array(idxs_ds, (2, 3))
