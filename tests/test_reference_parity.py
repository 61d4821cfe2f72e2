"""Direct cross-implementation parity vs the reference library.

Imports Deltares/pyflwdir from /root/reference with an identity-``njit``
fake numba module (its own tests run the same way, reference
tests/conftest.py:7 sets NUMBA_DISABLE_JIT=1) and asserts exact/allclose
equality of the end-to-end pipelines — uparea, basins, Strahler order,
HAND, filled DEM — on the reference's own test grids.

The Rhine-grid pipeline is exercised too when ``PYFLWDIR_PARITY_RHINE=1``
(pure-python reference sweeps over 680k cells take minutes, so it is
opt-in; see examples/rhine_pipeline.py for the fast-path equivalent).
"""

import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

_REF_ROOT = "/root/reference"


def _import_reference():
    if not os.path.exists(os.path.join(_REF_ROOT, "pyflwdir")):
        pytest.skip("reference repo not available")
    if "numba" not in sys.modules or not hasattr(sys.modules["numba"], "njit"):
        numba = types.ModuleType("numba")

        def njit(*args, **kwargs):
            if len(args) == 1 and callable(args[0]):
                return args[0]
            return lambda f: f

        numba.njit = njit
        numba.vectorize = njit
        typed = types.ModuleType("numba.typed")
        typed.List = list
        numba.typed = typed
        sys.modules["numba"] = numba
        sys.modules["numba.typed"] = typed
    if "affine" not in sys.modules:
        from pyflwdir_tpu.utils.affine import Affine

        affine = types.ModuleType("affine")
        affine.Affine = Affine
        affine.identity = Affine.identity()
        sys.modules["affine"] = affine
    if _REF_ROOT not in sys.path:
        sys.path.insert(0, _REF_ROOT)
    import pyflwdir as ref

    return ref


@pytest.fixture(scope="module")
def ref():
    return _import_reference()


def _both(d8_arr, ref):
    import pyflwdir_tpu as tpu

    f_ref = ref.from_array(d8_arr, ftype="d8")
    f_tpu = tpu.from_array(d8_arr, ftype="d8")
    return f_ref, f_tpu


@pytest.fixture(scope="module", params=["flwdir.asc", "flwdir1.asc"])
def d8_case(request):
    path = os.path.join(_REF_ROOT, "tests", "data", request.param)
    if not os.path.exists(path):
        pytest.skip("reference test data not available")
    return np.loadtxt(path, dtype=np.uint8)


def test_parity_uparea_cells(d8_case, ref):
    f_ref, f_tpu = _both(d8_case, ref)
    a = f_ref.upstream_area(unit="cell")
    b = f_tpu.upstream_area(unit="cell")
    assert np.array_equal(a, b)


def test_parity_basins(d8_case, ref):
    f_ref, f_tpu = _both(d8_case, ref)
    a = f_ref.basins()
    b = f_tpu.basins()
    assert np.array_equal(a != 0, b != 0)
    # identical partition (ids may be permuted): label pairs are bijective
    pairs = {}
    for x, y in zip(a.ravel(), b.ravel()):
        if x == 0:
            continue
        assert pairs.setdefault(x, y) == y
    assert len(set(pairs.values())) == len(pairs)


def test_parity_strahler(d8_case, ref):
    f_ref, f_tpu = _both(d8_case, ref)
    a = f_ref.stream_order(type="strahler")
    b = f_tpu.stream_order(type="strahler")
    assert np.array_equal(a, b)


def test_parity_rank_seq(d8_case, ref):
    from pyflwdir_tpu.ops import graph

    f_ref, _ = _both(d8_case, ref)
    idxs_ds = np.where(
        f_ref.idxs_ds == ref.core._mv, -1, f_ref.idxs_ds.astype(np.int64)
    )
    got = np.asarray(graph.rank(jnp.asarray(idxs_ds)))
    want = f_ref.rank.ravel().astype(np.int64)
    valid = idxs_ds >= 0
    assert np.array_equal(got[valid], want[valid])


def test_parity_hand_and_floodplains(d8_case, ref):
    from pyflwdir_tpu import dem as dem_tpu

    f_ref, f_tpu = _both(d8_case, ref)
    rng = np.random.RandomState(13)
    elv = f_ref.rank.astype(np.float64) + rng.rand(*d8_case.shape) * 0.1
    drain = f_ref.upstream_area(unit="cell") >= 10
    a = f_ref.hand(drain=drain, elevtn=elv)
    idxs_ds = np.where(
        f_ref.idxs_ds == ref.core._mv, -1, f_ref.idxs_ds.astype(np.int64)
    )
    b = np.asarray(
        dem_tpu.height_above_nearest_drain(
            jnp.asarray(idxs_ds), jnp.asarray(drain.ravel()), jnp.asarray(elv.ravel())
        )
    ).reshape(d8_case.shape)
    valid = (idxs_ds >= 0).reshape(d8_case.shape) & (a != -9999)
    assert np.allclose(a[valid], b[valid], atol=1e-6)


def test_parity_filled_dem(ref):
    from pyflwdir_tpu import dem as dem_tpu

    rng = np.random.RandomState(21)
    z = np.round(rng.rand(40, 50) * 20).astype(np.float64)
    z += np.add.outer(np.linspace(2, 0, 40), np.linspace(2, 0, 50))
    a_z, a_d8 = ref.dem.fill_depressions(z.copy())
    b_z, b_d8 = dem_tpu.fill_depressions(z.copy())
    assert np.allclose(a_z, b_z)
    assert np.array_equal(a_d8, b_d8)


def test_parity_streams_features(d8_case, ref):
    f_ref, f_tpu = _both(d8_case, ref)
    a = f_ref.streams()
    b = f_tpu.streams()
    assert len(a) == len(b)
    geo_a = sorted(tuple(f["geometry"]["coordinates"][0]) for f in a)
    geo_b = sorted(tuple(f["geometry"]["coordinates"][0]) for f in b)
    assert geo_a == geo_b


def test_parity_rhine_subsampled(ref):
    """Every-run Rhine oracle: the full pipeline parity on a 4x-subsampled
    grid (the full-resolution run is the weekly/manual
    ``test_parity_rhine_pipeline``; .github/workflows/parity.yml)."""
    from PIL import Image

    rhine = np.array(
        Image.open(os.path.join(_REF_ROOT, "examples", "rhine_d8.tif"))
    )[::4, ::4]
    # subsampling breaks D8 links: re-derive directions from the original
    # rank surface to keep a valid network of the same character
    from pyflwdir_tpu.ops.fill import d8_from_filled, fill_depressions_dev

    rng = np.random.RandomState(5)
    z = rng.rand(*rhine.shape).astype(np.float32)
    z += np.add.outer(
        np.linspace(2, 0, rhine.shape[0]), np.linspace(2, 0, rhine.shape[1])
    ).astype(np.float32)
    d8 = np.array(d8_from_filled(fill_depressions_dev(z)))
    f_ref, f_tpu = _both(d8, ref)
    a = f_ref.upstream_area(unit="cell")
    b = f_tpu.upstream_area(unit="cell")
    assert np.array_equal(a, b)
    sa = f_ref.stream_order(type="strahler")
    sb = f_tpu.stream_order(type="strahler")
    assert np.array_equal(sa, sb)


@pytest.mark.skipif(
    os.environ.get("PYFLWDIR_PARITY_RHINE") != "1",
    reason="pure-python reference on the full Rhine grid takes minutes; "
    "runs in the weekly parity workflow (.github/workflows/parity.yml)",
)
def test_parity_rhine_pipeline(ref):
    from PIL import Image

    rhine = np.array(
        Image.open(os.path.join(_REF_ROOT, "examples", "rhine_d8.tif"))
    )
    f_ref, f_tpu = _both(rhine, ref)
    a = f_ref.upstream_area(unit="cell")
    b = f_tpu.upstream_area(unit="cell")
    assert np.array_equal(a, b)
    sa = f_ref.stream_order(type="strahler")
    sb = f_tpu.stream_order(type="strahler")
    assert np.array_equal(sa, sb)
