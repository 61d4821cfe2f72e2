"""Raster-local (stencil) kernels: jittable D8 decode and local pointers.

For raster grids the flow graph is a 3x3 stencil: every cell's downstream
cell is one of its 8 neighbors. These helpers decode D8/LDD code rasters
to pointer arrays entirely on device (LUT gathers — the jnp counterpart of
the host codecs in :mod:`pyflwdir_tpu.codecs`), which keeps the full
pipeline (codes -> graph -> accumulation) inside one jit and makes the
tile-local graphs of the multi-device engine derivable in-shard.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..codecs import d8 as d8c
from ..codecs import ldd as lddc

__all__ = ["decode_d8", "decode_ldd", "local_pointers"]

_DR_D8 = jnp.asarray(d8c._DR_LUT.astype(np.int32))
_DC_D8 = jnp.asarray(d8c._DC_LUT.astype(np.int32))
_DR_LDD = jnp.asarray(lddc._DR_LUT.astype(np.int32))
_DC_LDD = jnp.asarray(lddc._DC_LUT.astype(np.int32))


def decode_d8(codes: jnp.ndarray):
    """(dr, dc, valid) for a 2-D D8 code raster (jit-safe LUT gather)."""
    codes = codes.astype(jnp.uint8)
    idx = codes.astype(jnp.int32)
    return _DR_D8[idx], _DC_D8[idx], codes != d8c._mv


def decode_ldd(codes: jnp.ndarray):
    """(dr, dc, valid) for a 2-D LDD code raster (jit-safe LUT gather)."""
    codes = codes.astype(jnp.uint8)
    idx = codes.astype(jnp.int32)
    return _DR_LDD[idx], _DC_LDD[idx], codes != lddc._mv


def idxs_ds_from_d8(codes: jnp.ndarray) -> jnp.ndarray:
    """2-D D8 code raster -> flat next-downstream indices (jit-safe).

    Device counterpart of ``codecs.d8.from_array`` (same pit/missing
    conventions: out-of-domain or nodata-downstream cells become pits,
    missing cells -1).
    """
    nrow, ncol = codes.shape
    dr, dc, valid = decode_d8(codes)
    r = jnp.arange(nrow, dtype=jnp.int32)[:, None]
    c = jnp.arange(ncol, dtype=jnp.int32)[None, :]
    r_ds = r + dr
    c_ds = c + dc
    pit = (dr == 0) & (dc == 0)
    outside = (r_ds < 0) | (r_ds >= nrow) | (c_ds < 0) | (c_ds >= ncol)
    r_cl = jnp.clip(r_ds, 0, nrow - 1)
    c_cl = jnp.clip(c_ds, 0, ncol - 1)
    ds_nodata = ~valid[r_cl, c_cl]
    to_pit = pit | outside | ds_nodata
    self_idx = (r * ncol + c).astype(jnp.int32)
    ds_idx = (r_cl * ncol + c_cl).astype(jnp.int32)
    out = jnp.where(to_pit, self_idx, ds_idx)
    return jnp.where(valid, out, -1).ravel()


def local_pointers(codes: jnp.ndarray):
    """Tile-local pointers for the multi-device engine (jit-safe).

    Returns ``(local_ds, exit_dr, exit_dc, valid)`` for a (th, tw) tile of
    D8 codes: ``local_ds`` is the flat within-tile downstream index with
    tile-leaving cells pointing at themselves (local roots); ``exit_dr/dc``
    are the step the flow takes out of the tile (0 where it stays inside).
    Cells at the *global* grid edge parse as pits upstream (from_array) so
    halo flows off the mesh are zero by construction.
    """
    th, tw = codes.shape
    dr, dc, valid = decode_d8(codes)
    r = jnp.arange(th, dtype=jnp.int32)[:, None]
    c = jnp.arange(tw, dtype=jnp.int32)[None, :]
    r_ds = r + dr
    c_ds = c + dc
    inside = (r_ds >= 0) & (r_ds < th) & (c_ds >= 0) & (c_ds < tw)
    self_idx = (r * tw + c).astype(jnp.int32)
    r_cl = jnp.clip(r_ds, 0, th - 1)
    c_cl = jnp.clip(c_ds, 0, tw - 1)
    tgt = (r_cl * tw + c_cl).astype(jnp.int32)
    # in-tile flows into nodata cells become pits (codecs.d8.from_array parity)
    tgt_valid = valid[r_cl, c_cl]
    local_ds = jnp.where(valid & inside & tgt_valid, tgt, self_idx)
    is_exit = valid & ~inside & ~((dr == 0) & (dc == 0))
    exit_dr = jnp.where(is_exit, dr, 0)
    exit_dc = jnp.where(is_exit, dc, 0)
    return local_ds.ravel(), exit_dr, exit_dc, valid
