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


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_tiled_rank_matches_monolith(d8_grid, n_devices):
    from pyflwdir_tpu.parallel import tiled_rank

    mesh = make_mesh(n_devices)
    got = tiled_rank(d8_grid, mesh)
    idxs_ds, _, _ = d8c.from_array(d8_grid)
    want = np.asarray(graph.rank(jnp.asarray(idxs_ds))).reshape(d8_grid.shape)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_tiled_basins_matches_monolith(d8_grid, n_devices):
    from pyflwdir_tpu import basins as basins_mod
    from pyflwdir_tpu.parallel import tiled_basins

    mesh = make_mesh(n_devices)
    idxs_ds, idxs_pit, _ = d8c.from_array(d8_grid)
    got = tiled_basins(d8_grid, idxs_pit, mesh)
    want = np.asarray(
        basins_mod.basins(jnp.asarray(idxs_ds), jnp.asarray(idxs_pit))
    ).reshape(d8_grid.shape)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("n_devices", [4, 8])
def test_tiled_fill_matches_host(n_devices):
    from pyflwdir_tpu import dem as dem_mod
    from pyflwdir_tpu.parallel import tiled_fill

    rng = np.random.RandomState(5)
    z = rng.rand(24, 32)
    z += np.add.outer(np.linspace(1, 0, 24), np.linspace(1, 0, 32))
    z[5:9, 6:11] -= 0.8  # a depression
    z[2, 3] = -9999.0
    mesh = make_mesh(n_devices)
    got = tiled_fill(z, mesh, nodata=-9999.0)
    want = dem_mod.fill_depressions(z, nodata=-9999.0)[0]
    assert np.allclose(got, want)


def test_tiled_convergence_guard_fires():
    """A serpentine path crossing the tile boundary every row needs many
    rounds; with max_rounds too small the guard must raise."""
    from pyflwdir_tpu.parallel import tiled_rank

    nrow, ncol = 16, 16
    d8 = np.zeros((nrow, ncol), dtype=np.uint8)
    # boustrophedon: rows alternate east/west, joined at the ends
    for r in range(nrow):
        d8[r, :] = 1 if r % 2 == 0 else 16  # E / W
        if r % 2 == 0:
            d8[r, -1] = 4  # S at east end
        else:
            d8[r, 0] = 4  # S at west end
    d8[-1, 0 if (nrow - 1) % 2 else ncol - 1] = 0  # pit at the path end
    mesh = make_mesh(2)  # split along columns -> crossings every two rows
    # sanity: converges when unconstrained
    got = tiled_rank(d8, mesh)
    idxs_ds, _, _ = d8c.from_array(d8)
    want = np.asarray(graph.rank(jnp.asarray(idxs_ds))).reshape(d8.shape)
    assert np.array_equal(got, want)
    with pytest.raises(RuntimeError, match="did not converge"):
        tiled_rank(d8, mesh, max_rounds=2)


@pytest.mark.parametrize("n_devices", [4, 8])
def test_tiled_stream_distance_matches_monolith(d8_ref_large, n_devices):
    from pyflwdir_tpu import streams
    from pyflwdir_tpu.parallel import tiled_stream_distance

    mesh = make_mesh(n_devices)
    idxs_ds, _, _ = d8c.from_array(d8_ref_large)
    valid = (idxs_ds >= 0).reshape(d8_ref_large.shape)

    # cells
    got = tiled_stream_distance(d8_ref_large, mesh, real_length=False)
    want = np.asarray(
        streams.stream_distance(
            jnp.asarray(idxs_ds), d8_ref_large.shape, real_length=False
        )
    ).reshape(d8_ref_large.shape)
    assert np.array_equal(got[valid], want[valid])

    # metres (identity transform) + mask variant
    got_m = tiled_stream_distance(d8_ref_large, mesh, real_length=True)
    want_m = np.asarray(
        streams.stream_distance(
            jnp.asarray(idxs_ds), d8_ref_large.shape, real_length=True
        )
    ).reshape(d8_ref_large.shape)
    assert np.allclose(got_m[valid], want_m[valid], rtol=1e-5)

    mask = np.zeros(d8_ref_large.shape, bool)
    mask[::7, ::5] = True
    got_k = tiled_stream_distance(d8_ref_large, mesh, mask=mask, real_length=False)
    want_k = np.asarray(
        streams.stream_distance(
            jnp.asarray(idxs_ds),
            d8_ref_large.shape,
            mask=jnp.asarray(mask.ravel()),
            real_length=False,
        )
    ).reshape(d8_ref_large.shape)
    assert np.array_equal(got_k[valid], want_k[valid])


@pytest.mark.parametrize("n_devices", [4, 8])
def test_tiled_hand_matches_monolith(d8_ref_large, n_devices):
    from pyflwdir_tpu import dem as dem_mod
    from pyflwdir_tpu.parallel import tiled_hand

    mesh = make_mesh(n_devices)
    idxs_ds, _, _ = d8c.from_array(d8_ref_large)
    valid = (idxs_ds >= 0).reshape(d8_ref_large.shape)
    # rank-as-elevation synthetic surface; drains on a sparse lattice
    rank = np.asarray(graph.rank(jnp.asarray(idxs_ds)))
    elevtn = (rank.astype(np.float32) + 1.0).reshape(d8_ref_large.shape)
    drain = np.zeros(d8_ref_large.shape, bool)
    drain[::4, ::6] = True
    drain &= valid

    got = tiled_hand(d8_ref_large, elevtn, drain, mesh)
    want = np.asarray(
        dem_mod.height_above_nearest_drain(
            jnp.asarray(idxs_ds),
            jnp.asarray(drain.ravel()),
            jnp.asarray(elevtn.ravel()),
        )
    ).reshape(d8_ref_large.shape)
    assert np.allclose(got[valid], want[valid], atol=1e-5)


def test_tiled_fill_capped_variants(d8_ref):
    """max_depth / elv_max on the tiled fill match the single-device
    capped fill (same outer-fixpoint semantics)."""
    from pyflwdir_tpu.ops.fill import fill_depressions_dev
    from pyflwdir_tpu.parallel import tiled_fill

    mesh = make_mesh(4)
    rng = np.random.RandomState(3)
    dem = rng.rand(40, 48).astype(np.float32)
    dem += np.add.outer(
        np.linspace(1, 0, 40), np.linspace(1, 0, 48)
    ).astype(np.float32)
    dem[10:14, 12:17] -= 0.8  # a deep depression
    got = tiled_fill(dem, mesh, max_depth=0.3)
    want = np.asarray(fill_depressions_dev(dem, max_depth=0.3))
    assert np.allclose(got, want, atol=1e-6)
    got = tiled_fill(dem, mesh, elv_max=1.5)
    want = np.asarray(fill_depressions_dev(dem, elv_max=1.5))
    assert np.allclose(got, want, atol=1e-6)


@pytest.mark.parametrize(
    "n_devices", [4, pytest.param(8, marks=pytest.mark.slow)]
)
def test_tiled_strahler_matches_native(d8_ref_large, n_devices):
    from pyflwdir_tpu import runtime
    from pyflwdir_tpu.ops.plan import build_plan
    from pyflwdir_tpu.parallel import tiled_strahler

    if not runtime.__all__:
        pytest.skip("native host kernels not built")
    mesh = make_mesh(n_devices)
    idxs_ds, _, _ = d8c.from_array(d8_ref_large)
    pre = build_plan(idxs_ds, fast=False).preorder_np

    got = tiled_strahler(d8_ref_large, mesh)
    want = runtime.strahler_order(idxs_ds, pre).reshape(d8_ref_large.shape)
    valid = (idxs_ds >= 0).reshape(d8_ref_large.shape)
    assert np.array_equal(got[valid], want[valid])

    # masked variant: orders must not cross unmasked cells
    mask = np.ones(d8_ref_large.shape, bool)
    mask[80:84, :] = False
    got_m = tiled_strahler(d8_ref_large, mesh, mask=mask)
    want_m = runtime.strahler_order(
        idxs_ds, pre, mask=mask.ravel()
    ).reshape(d8_ref_large.shape)
    assert np.array_equal(got_m[valid & mask], want_m[valid & mask])
    assert got_m[~mask].max() == 0


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_tiled_accumulate_coarse_vs_iterate(d8_ref_large, n_devices):
    """The hierarchical (constant-round) solve equals the halo fixpoint
    and the monolith."""
    mesh = make_mesh(n_devices)
    rng = np.random.RandomState(4)
    data = rng.rand(*d8_ref_large.shape).astype(np.float32)
    got = tiled_accumulate(d8_ref_large, data, mesh, method="coarse")
    want = tiled_accumulate(d8_ref_large, data, mesh, method="iterate")
    idxs_ds, _, _ = d8c.from_array(d8_ref_large)
    valid = (idxs_ds >= 0).reshape(d8_ref_large.shape)
    assert np.allclose(got[valid], want[valid], rtol=1e-4)


@pytest.mark.slow
def test_tiled_accumulate_plan_matches_monolith(d8_ref_large):
    """method='plan': the sharded TilePlan (per-tile VMEM DFS kernels +
    one all_gather of exit records) matches the monolithic accumulation —
    the multi-device path and the single-chip north-star kernel are the
    same code."""
    mesh = make_mesh(8)
    data = np.ones(d8_ref_large.shape, np.float32)
    got = tiled_accumulate(d8_ref_large, data, mesh, method="plan")
    idxs_ds, _, _ = d8c.from_array(d8_ref_large)
    want = oracle.accuflux(idxs_ds, np.ones(idxs_ds.size), nodata=-9999)
    valid = (idxs_ds >= 0).reshape(d8_ref_large.shape)
    assert np.allclose(got[valid], want.reshape(d8_ref_large.shape)[valid])


@pytest.mark.slow
def test_sharded_plan_int_exact(d8_ref_large):
    """Integer inputs through accumulate_sharded are bitwise-exact vs the
    single-device tile plan."""
    from pyflwdir_tpu.parallel import build_sharded_plan

    mesh = make_mesh(8)
    tp, pshape = build_sharded_plan(d8_ref_large, mesh)
    rng = np.random.RandomState(5)
    w = np.zeros(pshape, np.int32)
    w[: d8_ref_large.shape[0], : d8_ref_large.shape[1]] = rng.randint(
        0, 1000, size=d8_ref_large.shape
    )
    got = np.asarray(tp.accumulate_sharded(jnp.asarray(w.ravel()), mesh))
    want = np.asarray(tp.accumulate(jnp.asarray(w.ravel())))
    assert np.array_equal(got, want)


@pytest.mark.parametrize(
    "n_devices", [2, pytest.param(8, marks=pytest.mark.slow)]
)
def test_sharded_down_matches_single(d8_ref_large, n_devices):
    """accumulate_down_sharded bitwise-matches the single-device downward
    sweep for integer inputs (one all_gather of packed entry values)."""
    from pyflwdir_tpu.codecs import d8 as d8c
    from pyflwdir_tpu.ops.tile_plan import build_tile_plan

    mesh = make_mesh(n_devices)
    d8 = np.asarray(d8_ref_large)
    pr = (-d8.shape[0]) % (128 * n_devices)
    if pr:
        d8 = np.pad(d8, ((0, pr), (0, 0)), constant_values=247)
    pc = (-d8.shape[1]) % 128
    if pc:
        d8 = np.pad(d8, ((0, 0), (0, pc)), constant_values=247)
    ids, pit, nv = d8c.from_array(d8)
    tp = build_tile_plan(ids, d8.shape)
    w = (np.arange(ids.size) % 7 + 1).astype(np.int32)
    w[ids < 0] = 0
    want = np.asarray(tp.accumulate_down(jnp.asarray(w)))
    got = np.asarray(tp.accumulate_down_sharded(jnp.asarray(w), mesh))
    assert np.array_equal(got, want)
