"""Opt-in on-chip parity audit (run with PYFLWDIR_TPU_TESTS=1).

The default suite forces the CPU backend (conftest), which cannot see
device-only numerics: the round-4 audit caught the float accumulate's
interval-end selection einsum running at the MXU's default bf16
precision (errors up to 1024 cells on the Rhine) — invisible to every
CPU test. This file re-runs the audit on the real accelerator:

    PYFLWDIR_TPU_TESTS=1 python -m pytest tests/test_tpu_onchip.py -q -p no:cacheprovider

It must run in a *separate* pytest invocation from the default suite
(conftest pins the platform to CPU for everything in one process); the
module skips itself unless the env var is set AND the backend is an
accelerator.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("PYFLWDIR_TPU_TESTS"),
    reason="on-chip audit is opt-in (PYFLWDIR_TPU_TESTS=1)",
)


@pytest.fixture(scope="module")
def rhine_flw():
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("no accelerator backend available")
    import pyflwdir_tpu as pf

    try:
        from PIL import Image

        d8 = np.array(Image.open("/root/reference/examples/rhine_d8.tif"))
    except Exception:
        pytest.skip("Rhine raster unavailable")
    tf = pf.Affine(1 / 120.0, 0.0, 5.5, 0.0, -1 / 120.0, 52.0)
    return pf.from_array(d8, ftype="d8", transform=tf, latlon=True)


def test_float_accumulate_exact_onchip(rhine_flw):
    """Unit float32 accumulation must equal the exact integer path on the
    accelerator (guards against default-precision MXU contractions)."""
    import jax.numpy as jnp

    flw = rhine_flw
    exact = np.asarray(flw.upstream_area(unit="cell")).ravel()
    got = np.asarray(flw._accumulate_dev(jnp.ones(flw.size, jnp.float32)))
    valid = flw.idxs_ds >= 0
    assert np.array_equal(got[valid], exact[valid].astype(got.dtype))


def test_uparea_monotone_onchip(rhine_flw):
    """Upstream area must be monotone along flow paths on chip (float
    noise above one storage ulp breaks the IHU repair contracts)."""
    flw = rhine_flw
    up = np.asarray(flw.upstream_area(unit="km2")).ravel()
    ids = flw.idxs_ds
    mov = (ids >= 0) & (ids != np.arange(flw.size))
    mov &= (up > 0) & (up[np.where(mov, ids, 0)] > 0)
    assert not np.any(up[ids[mov]] < up[mov] - 0.05)


def test_downward_transpose_identity_onchip(rhine_flw):
    """<S x, y> == <x, S^T y> through the device kernels."""
    import jax.numpy as jnp

    from pyflwdir_tpu.ops.tile_plan import build_tile_plan

    flw = rhine_flw
    tp = build_tile_plan(flw.idxs_ds, flw.shape)
    rng = np.random.RandomState(5)
    x = rng.randint(0, 9, flw.size).astype(np.int32)
    y = rng.randint(0, 9, flw.size).astype(np.int32)
    valid = flw.idxs_ds >= 0
    x[~valid] = 0
    y[~valid] = 0
    Sx = np.asarray(tp.accumulate(jnp.asarray(x))).astype(np.int64)
    STy = np.asarray(tp.accumulate_down(jnp.asarray(y))).astype(np.int64)
    assert np.dot(Sx[valid], y[valid].astype(np.int64)) == np.dot(
        x[valid].astype(np.int64), STy[valid]
    )


def test_upscale_valid_onchip(rhine_flw):
    """IHU / EAM+ upscales built from on-chip uparea stay loop-free."""
    flw = rhine_flw
    uparea = flw.upstream_area(unit="km2")
    for method in ("ihu", "eam_plus"):
        flw1, _ = flw.upscale(10, method=method, uparea=uparea)
        assert flw1.isvalid, method
