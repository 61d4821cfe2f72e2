"""Multi-device tests: tiled accumulation == monolithic accumulation.

Runs on the virtual 8-device CPU mesh (conftest). This is the
tile-vs-monolith equivalence strategy from SURVEY.md §4.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyflwdir_tpu.codecs import d8 as d8c
from pyflwdir_tpu.ops import graph
from pyflwdir_tpu.ops.stencil import idxs_ds_from_d8
from pyflwdir_tpu.parallel import make_mesh, tiled_accumulate
from tests import oracle


def test_stencil_decode_matches_codec(d8_grid):
    got = np.asarray(idxs_ds_from_d8(jnp.asarray(d8_grid)))
    want, _, _ = d8c.from_array(d8_grid)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_tiled_accumulate_matches_monolith(d8_grid, n_devices):
    mesh = make_mesh(n_devices)
    data = np.ones(d8_grid.shape, dtype=np.float32)
    got = tiled_accumulate(d8_grid, data, mesh)
    idxs_ds, idxs_pit, n = d8c.from_array(d8_grid)
    want = oracle.accuflux(idxs_ds, np.ones(idxs_ds.size), nodata=-9999)
    valid = (idxs_ds >= 0).reshape(d8_grid.shape)
    assert np.allclose(got[valid], want.reshape(d8_grid.shape)[valid])


def test_tiled_accumulate_weights(d8_ref_large):
    mesh = make_mesh(8)
    rng = np.random.RandomState(9)
    data = rng.rand(*d8_ref_large.shape).astype(np.float32)
    got = tiled_accumulate(d8_ref_large, data, mesh)
    idxs_ds, _, _ = d8c.from_array(d8_ref_large)
    want = oracle.accuflux(idxs_ds, data.ravel().astype(np.float64), nodata=-9999)
    valid = (idxs_ds >= 0).reshape(d8_ref_large.shape)
    assert np.allclose(got[valid], want.reshape(d8_ref_large.shape)[valid], rtol=1e-4)


def test_mesh_shapes():
    assert make_mesh(8).devices.shape in [(2, 4)]
    assert make_mesh(4).devices.shape == (2, 2)
    assert make_mesh(2).devices.shape == (1, 2)
