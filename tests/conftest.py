"""Test configuration.

Tests run on a virtual 8-device CPU mesh (no TPU needed) with 64-bit
enabled so float64/int64 parity checks against the sequential oracle are
exact. Mirrors the reference's strategy of running kernels in a
debuggable mode under test (reference tests/conftest.py:7 disables numba
JIT; here we keep jit but use the CPU backend).
"""

import os

import jax

# jax may already be imported (axon sitecustomize) but backends initialize
# lazily, so pinning the CPU platform + virtual 8-device mesh here still
# takes effect as long as no computation ran yet.
if os.environ.get("PYFLWDIR_TPU_TESTS"):
    # opt-in on-chip audit (tests/test_tpu_onchip.py): keep the real
    # accelerator backend and its default float32 numerics
    pass
else:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

from tests import oracle

_REF_DATA = "/root/reference/tests/data"


def _d8_from_asc(path):
    return np.loadtxt(path, dtype=np.uint8)


@pytest.fixture(scope="session")
def d8_small():
    """Deterministic 15x12 D8 grid derived from a synthetic DEM."""
    rng = np.random.RandomState(2345)
    dem = rng.rand(15, 12)
    # add a gradient so most flow exits south-east; a few nodata holes
    dem += np.add.outer(np.linspace(1, 0, 15), np.linspace(1, 0, 12))
    d8 = oracle.d8_from_dem_steepest(dem)
    d8[0, 0] = 247
    d8[7, 5] = 247
    return d8


@pytest.fixture(scope="session")
def d8_ref():
    """Reference repo 20x25 test grid (skipped when unavailable)."""
    path = os.path.join(_REF_DATA, "flwdir.asc")
    if not os.path.exists(path):
        pytest.skip("reference test data not available")
    return _d8_from_asc(path)


@pytest.fixture(scope="session")
def d8_ref_large():
    """Reference repo 160x200 test grid (skipped when unavailable)."""
    path = os.path.join(_REF_DATA, "flwdir1.asc")
    if not os.path.exists(path):
        pytest.skip("reference test data not available")
    return _d8_from_asc(path)


@pytest.fixture(scope="session", params=["small", "ref"])
def d8_grid(request, d8_small):
    if request.param == "small":
        return d8_small
    path = os.path.join(_REF_DATA, "flwdir.asc")
    if not os.path.exists(path):
        pytest.skip("reference test data not available")
    return _d8_from_asc(path)
