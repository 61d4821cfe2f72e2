"""Multi-device domain-decomposition runtime (mesh, tiled kernels)."""

from .tiled import (
    make_mesh,
    pad_to_tiles,
    build_sharded_plan,
    tiled_accumulate,
    tiled_basins,
    tiled_fill,
    tiled_hand,
    tiled_rank,
    tiled_stream_distance,
    tiled_strahler,
)

__all__ = [
    "make_mesh",
    "pad_to_tiles",
    "build_sharded_plan",
    "tiled_accumulate",
    "tiled_basins",
    "tiled_fill",
    "tiled_hand",
    "tiled_rank",
    "tiled_stream_distance",
    "tiled_strahler",
]
