"""pyflwdir_tpu — TPU-native raster hydrography framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Deltares/pyflwdir: flow-direction parsing (D8/LDD/NEXTXY), flow
accumulation and up/downstream arithmetics, DEM conditioning, basin and
stream-order delineation, HAND/floodplains, flow-direction upscaling,
subgrid statistics and stream vectorization — recast from sequential
topological sweeps into data-parallel pointer-doubling and fixpoint
kernels that scale over TPU device meshes.

Public API parity: reference ``pyflwdir/__init__.py:16-29``.
"""

__version__ = "0.1.0"


def _enable_compile_cache():
    """Persistent XLA compilation cache (analogue of the reference's
    ``@njit(cache=True)`` startup-latency fix, pyflwdir core.py:17 /
    CHANGELOG.rst:18). Graph-plan Pallas kernels compile once per
    machine; subsequent processes load the cached executable. Opt out
    with ``PYFLWDIR_TPU_NO_CACHE=1``."""
    import os

    if os.environ.get("PYFLWDIR_TPU_NO_CACHE"):
        return
    try:
        import jax

        # never clobber a user-configured cache (env var or jax.config)
        if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            return
        if getattr(jax.config, "jax_compilation_cache_dir", None):
            return
        # XLA:CPU AOT artifacts bake codegen-preference pseudo-features
        # (prefer-no-scatter/-gather) that the loader then flags as
        # missing host features on *every* reload — same machine, same
        # config (jaxlib bug). Persistent caching is a TPU startup-latency
        # fix; skip it entirely for CPU-pinned processes (tests, the
        # multichip dryrun) instead of spamming stderr.
        platforms = getattr(jax.config, "jax_platforms", None) or os.environ.get(
            "JAX_PLATFORMS"
        )
        if platforms and set(platforms.split(",")) <= {"cpu"}:
            return
        # key the cache directory by platform + host machine so AOT
        # artifacts never load across incompatible machine types (XLA:CPU
        # embeds the compile host's vector features in its executables)
        import hashlib
        import platform

        machine = f"{platform.system()}-{platform.machine()}".lower()
        cpu = "cpu"
        try:
            # the CPU feature flags are what XLA:CPU AOT artifacts bake in
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith(("flags", "Features")):
                        cpu = line
                        break
        except OSError:
            cpu = platform.processor() or "cpu"
        # XLA:CPU also bakes codegen *preferences* (e.g. prefer-no-scatter)
        # into its AOT machine features; those vary with the configured
        # platform set and XLA flags, not the hardware — key them too so a
        # TPU-attached process and a pure-CPU process never share a dir
        cfg = "|".join(
            (
                jax.__version__,
                os.environ.get("JAX_PLATFORMS", ""),
                os.environ.get("XLA_FLAGS", ""),
            )
        )
        key = (
            f"{machine}-{hashlib.md5(cpu.encode()).hexdigest()[:8]}"
            f"-{hashlib.md5(cfg.encode()).hexdigest()[:8]}"
        )
        cache_dir = os.environ.get(
            "PYFLWDIR_TPU_CACHE_DIR",
            os.path.join(
                os.environ.get(
                    "XDG_CACHE_HOME", os.path.join(os.path.expanduser("~"), ".cache")
                ),
                "pyflwdir_tpu",
                "jax",
                key,
            ),
        )
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


_enable_compile_cache()

from . import (
    arithmetics,
    basins,
    checkpoint,
    codecs,
    dem,
    gis_utils,
    gridtools,
    ops,
    parallel,
    regions,
    rivers,
    streams,
    subgrid,
    upscale,
    utils,
)
from .codecs import FTYPES, d8_to_ldd, ldd_to_d8, read_nextxy
from .dem import fill_depressions, slope
from .flwdir import Flwdir, from_dataframe
from .gridtools import spread2d
from .raster import FlwdirRaster, from_array, from_dem
from .utils import Affine
from .utils.geodesy import (
    affine_to_coords,
    area_grid,
    coords_to_idxs,
    idxs_to_coords,
)

__all__ = [
    "Flwdir",
    "FlwdirRaster",
    "from_array",
    "from_dem",
    "from_dataframe",
    "read_nextxy",
    "d8_to_ldd",
    "ldd_to_d8",
    "fill_depressions",
    "slope",
    "spread2d",
    "area_grid",
    "affine_to_coords",
    "idxs_to_coords",
    "coords_to_idxs",
    "Affine",
    "FTYPES",
    "codecs",
    "ops",
    "utils",
    "streams",
    "basins",
    "dem",
    "upscale",
    "subgrid",
    "arithmetics",
    "rivers",
    "regions",
    "gridtools",
    "gis_utils",
    "checkpoint",
    "parallel",
    "__version__",
]
