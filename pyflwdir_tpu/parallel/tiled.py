"""Multi-device tiled flow accumulation: shard_map + ICI halo exchange.

The reference is a single-address-space library (SURVEY.md §2b); this
module adds the domain-decomposition runtime it lacks: the (nrow, ncol)
raster is sharded into 2-D tiles over a device ``Mesh``, each device
accumulates its tile-local flow with the pointer-doubling engine, and
cross-tile flows ride the interconnect as 8-neighborhood halo exchanges
(two-phase ``ppermute``: rows then columns, so corner flows route through
two hops). Outer fixpoint: tiles re-inject received boundary flows and
re-propagate until a global ``psum`` of in-flight flow reaches zero —
rounds equal the number of tile crossings of the longest flow path.

All collectives are XLA primitives (``ppermute``/``psum``) over mesh axes
``("ty", "tx")`` — on a real pod slice they map onto ICI neighbors.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.graph import _subtree_reduce
from ..ops.stencil import local_pointers

__all__ = ["make_mesh", "tiled_accumulate", "pad_to_tiles"]


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """2-D ("ty", "tx") device mesh, as square as n allows."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    ty = int(np.floor(np.sqrt(n)))
    while n % ty:
        ty -= 1
    tx = n // ty
    dev_arr = np.array(devices).reshape(ty, tx)
    return Mesh(dev_arr, ("ty", "tx"))


def pad_to_tiles(arr: np.ndarray, mesh: Mesh, fill):
    """Pad a 2-D array so both dims divide by the mesh tiling."""
    ty, tx = mesh.devices.shape
    nrow, ncol = arr.shape
    pr = (-nrow) % ty
    pc = (-ncol) % tx
    if pr or pc:
        arr = np.pad(arr, ((0, pr), (0, pc)), constant_values=fill)
    return arr


def _local_accumulate(local_ds, data_flat):
    """Tile-local subtree sums (doubling on the cut graph)."""
    n = local_ds.shape[0]
    ar = jnp.arange(n, dtype=local_ds.dtype)
    active = local_ds != ar
    sentinel = jnp.asarray(n, dtype=local_ds.dtype)
    ptr = jnp.where(active, local_ds, sentinel)
    return _subtree_reduce(ptr, data_flat, "add")


def _exchange_halo(out_pad, ty_axis="ty", tx_axis="tx"):
    """Two-phase 8-neighbor halo exchange of a (th+2, tw+2) buffer.

    Returns the received contributions as a (th, tw) interior array.
    Phase 1 ships the top/bottom halo rows (full width, corners included)
    along ``ty``; phase 2 ships the left/right halo columns of the updated
    buffer along ``tx`` — corner values route via two hops. Mesh-boundary
    wraparound is harmless: flows off the global grid are zero by
    construction (edge cells parse as pits).
    """
    nty = lax.axis_size(ty_axis)
    ntx = lax.axis_size(tx_axis)
    # perm (src, dst): dst receives src's value
    up = [(i, (i - 1) % nty) for i in range(nty)]
    down = [(i, (i + 1) % nty) for i in range(nty)]
    left = [(i, (i - 1) % ntx) for i in range(ntx)]
    right = [(i, (i + 1) % ntx) for i in range(ntx)]

    # phase 1: rows. my top halo row (contributions to the tile above)
    # ships up; I receive the below tile's top halo, which targets my
    # bottom interior row — kept in the padded frame so halo-column
    # entries (corner flows) continue to phase 2.
    recv_from_below = lax.ppermute(out_pad[0:1, :], ty_axis, up)
    recv_from_above = lax.ppermute(out_pad[-1:, :], ty_axis, down)
    buf = out_pad.at[0:1, :].set(0.0).at[-1:, :].set(0.0)
    buf = buf.at[-2:-1, :].add(recv_from_below)
    buf = buf.at[1:2, :].add(recv_from_above)
    # phase 2: columns of the updated buffer (routes corners via 2 hops)
    recv_from_right = lax.ppermute(buf[:, 0:1], tx_axis, left)
    recv_from_left = lax.ppermute(buf[:, -1:], tx_axis, right)
    buf = buf.at[:, 0:1].set(0.0).at[:, -1:].set(0.0)
    buf = buf.at[:, -2:-1].add(recv_from_right)
    buf = buf.at[:, 1:2].add(recv_from_left)
    return buf[1:-1, 1:-1]


def _tile_step(codes, data, max_rounds):
    """Per-shard body: local accumulate + iterated cross-tile injection."""
    th, tw = codes.shape
    local_ds, exit_dr, exit_dc, valid = local_pointers(codes)
    # cells whose raw code points off the global grid are pits after
    # parsing (codecs.d8.from_array) — kill their exits so the flow stays
    # put instead of riding the cyclic ppermute around the mesh
    ti = lax.axis_index("ty")
    tj = lax.axis_index("tx")
    nty = lax.axis_size("ty")
    ntx = lax.axis_size("tx")
    r = jnp.arange(th, dtype=jnp.int32)[:, None]
    c = jnp.arange(tw, dtype=jnp.int32)[None, :]
    off_grid = (
        ((ti == 0) & (r == 0) & (exit_dr < 0))
        | ((ti == nty - 1) & (r == th - 1) & (exit_dr > 0))
        | ((tj == 0) & (c == 0) & (exit_dc < 0))
        | ((tj == ntx - 1) & (c == tw - 1) & (exit_dc > 0))
    )
    exit_dr = jnp.where(off_grid, 0, exit_dr)
    exit_dc = jnp.where(off_grid, 0, exit_dc)
    dflat = jnp.where(valid.ravel(), data.ravel(), 0).astype(data.dtype)
    accu = _local_accumulate(local_ds, dflat)

    def out_buffer(flow2d):
        """Scatter exit flows into the padded (th+2, tw+2) frame."""
        r = jnp.arange(th, dtype=jnp.int32)[:, None]
        c = jnp.arange(tw, dtype=jnp.int32)[None, :]
        tgt_r = r + 1 + exit_dr
        tgt_c = c + 1 + exit_dc
        is_exit = (exit_dr != 0) | (exit_dc != 0)
        flat = (tgt_r * (tw + 2) + tgt_c).ravel()
        flat = jnp.where(is_exit.ravel(), flat, (th + 2) * (tw + 2))
        buf = (
            jnp.zeros((th + 2) * (tw + 2) + 1, dtype=flow2d.dtype)
            .at[flat]
            .add(jnp.where(is_exit.ravel(), flow2d.ravel(), 0), mode="drop")
        )
        return buf[:-1].reshape(th + 2, tw + 2)

    is_exit = (exit_dr != 0) | (exit_dc != 0)

    def cond(state):
        i, total, inject_flow = state
        pending = lax.psum(
            lax.psum(jnp.sum(jnp.abs(jnp.where(is_exit, inject_flow, 0))), "ty"),
            "tx",
        )
        return (i < max_rounds) & (pending > 0)

    def body(state):
        i, total, inject_flow = state
        # ship boundary flows to the 8 neighbors
        received = _exchange_halo(out_buffer(inject_flow))
        # propagate the received injections down the local tile
        inj = jnp.where(valid, received, 0).astype(data.dtype)
        inj_acc = _local_accumulate(local_ds, inj.ravel())
        total = total + inj_acc
        return i + 1, total, inj_acc.reshape(th, tw)

    state = (0, accu, accu.reshape(th, tw))
    _, total, _ = lax.while_loop(cond, body, state)
    return jnp.where(valid, total.reshape(th, tw), data)


def tiled_accumulate(
    codes: np.ndarray,
    data: np.ndarray,
    mesh: Mesh,
    max_rounds: int | None = None,
):
    """Flow accumulation of ``data`` over a D8 code raster, sharded over
    ``mesh``. Returns the dense accumulation grid (same shape as input).

    Matches :func:`pyflwdir_tpu.ops.graph.accumulate` on the parsed graph
    (no-nodata case); the input is padded to the mesh tiling.
    """
    ty, tx = mesh.devices.shape
    nrow0, ncol0 = codes.shape
    codes_p = pad_to_tiles(np.asarray(codes), mesh, fill=247)
    data_p = pad_to_tiles(np.asarray(data, dtype=np.float32), mesh, fill=0.0)
    if max_rounds is None:
        # worst case: a path can cross tile boundaries many times; bound by
        # the number of cells on the longest possible path across tiles
        max_rounds = 4 * (ty + tx)

    sharding = NamedSharding(mesh, P("ty", "tx"))
    codes_d = jax.device_put(jnp.asarray(codes_p), sharding)
    data_d = jax.device_put(jnp.asarray(data_p), sharding)

    fn = jax.jit(
        jax.shard_map(
            partial(_tile_step, max_rounds=max_rounds),
            mesh=mesh,
            in_specs=(P("ty", "tx"), P("ty", "tx")),
            out_specs=P("ty", "tx"),
        )
    )
    out = fn(codes_d, data_d)
    return np.asarray(out)[:nrow0, :ncol0]
