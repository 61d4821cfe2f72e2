"""Multi-device domain-decomposition runtime (mesh, tiled kernels)."""

from .tiled import make_mesh, pad_to_tiles, tiled_accumulate

__all__ = ["make_mesh", "pad_to_tiles", "tiled_accumulate"]
