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

from ..ops.graph import _subtree_reduce, path_sum, reach
from ..ops.stencil import local_pointers

__all__ = [
    "make_mesh",
    "build_sharded_plan",
    "pad_to_tiles",
    "tiled_accumulate",
    "tiled_rank",
    "tiled_basins",
    "tiled_fill",
    "tiled_stream_distance",
    "tiled_hand",
    "tiled_strahler",
]


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

    # comm/compute overlap: every ppermute operand is a pure edge-strip
    # slice — no full-frame copy sits between the data and the
    # collective, so XLA can issue the row-phase sends immediately and
    # overlap the interior merge with the column phase.
    # phase 1: rows. my top halo row (contributions to the tile above)
    # ships up; I receive the below tile's top halo, which targets my
    # bottom interior row; halo-column entries (corner flows) continue
    # to phase 2 through the (th+2, 1) column operands.
    rb = lax.ppermute(out_pad[0:1, :], ty_axis, up)  # from below
    ra = lax.ppermute(out_pad[-1:, :], ty_axis, down)  # from above

    def col(c, rb_c, ra_c):
        c = c.at[0:1, :].set(0.0).at[-1:, :].set(0.0)
        return c.at[-2:-1, :].add(rb_c).at[1:2, :].add(ra_c)

    # phase 2: halo columns with shipped rows zeroed and received row
    # pieces folded in (corners ride the second hop)
    rr = lax.ppermute(
        col(out_pad[:, 0:1], rb[:, 0:1], ra[:, 0:1]), tx_axis, left
    )  # from right
    rl = lax.ppermute(
        col(out_pad[:, -1:], rb[:, -1:], ra[:, -1:]), tx_axis, right
    )  # from left
    interior = out_pad[1:-1, 1:-1]
    interior = interior.at[-1:, :].add(rb[:, 1:-1]).at[0:1, :].add(ra[:, 1:-1])
    return interior.at[:, -1:].add(rr[1:-1, :]).at[:, 0:1].add(rl[1:-1, :])


def _gather_halo(v2d, fill):
    """(th+2, tw+2) buffer of ``v2d`` framed by the 8 neighbors' edge
    values (corners via two hops); mesh-boundary halo entries get ``fill``.
    """
    th, tw = v2d.shape
    nty = lax.axis_size("ty")
    ntx = lax.axis_size("tx")
    ti = lax.axis_index("ty")
    tj = lax.axis_index("tx")
    up = [(i, (i - 1) % nty) for i in range(nty)]
    down = [(i, (i + 1) % nty) for i in range(nty)]
    left = [(i, (i - 1) % ntx) for i in range(ntx)]
    right = [(i, (i + 1) % ntx) for i in range(ntx)]

    fillv = jnp.asarray(fill, v2d.dtype)
    # overlap-friendly: ppermute operands are pure edge-strip slices of
    # ``v2d`` (rows) or small (th+2, 1) columns (built from the received
    # rows' corner elements) — the full halo frame assembles only after
    # the collectives, so sends can issue before any full-tile copy.
    from_above = lax.ppermute(v2d[-1:, :], "ty", down)
    from_below = lax.ppermute(v2d[0:1, :], "ty", up)
    row_top = jnp.where(ti == 0, fillv, from_above)  # my top halo row
    row_bot = jnp.where(ti == nty - 1, fillv, from_below)

    def col(j0, j1):  # (th+2, 1) edge column incl row-halo corners
        return jnp.concatenate(
            [row_top[:, j0:j1], v2d[:, j0:j1], row_bot[:, j0:j1]], axis=0
        )

    from_left = lax.ppermute(col(-1, None), "tx", right)
    from_right = lax.ppermute(col(0, 1), "tx", left)
    col_l = jnp.where(tj == 0, fillv, from_left)
    col_r = jnp.where(tj == ntx - 1, fillv, from_right)
    mid = jnp.concatenate([row_top, v2d, row_bot], axis=0)
    return jnp.concatenate([col_l, mid, col_r], axis=1)


def _kill_off_grid_exits(exit_dr, exit_dc, th, tw):
    """Zero the exit steps of cells whose flow leaves the global grid
    (they parse as pits in codecs.d8.from_array)."""
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
    return jnp.where(off_grid, 0, exit_dr), jnp.where(off_grid, 0, exit_dc)


def _psum2(x):
    return lax.psum(lax.psum(x, "ty"), "tx")


def _fixpoint_step(codes, seed, mode, max_rounds):
    """Per-shard body of the cross-tile pointer fixpoint (rank / labels).

    Each cell's value depends only on its *local terminal* (the last
    in-tile cell on its path, precomputed once by tile-local pointer
    doubling) plus the value just across the tile boundary; rounds
    exchange boundary values until a global fixpoint — one round per
    tile crossing of the longest path.
    """
    th, tw = codes.shape
    local_ds, exit_dr, exit_dc, valid = local_pointers(codes)
    exit_dr, exit_dc = _kill_off_grid_exits(exit_dr, exit_dc, th, tw)
    vflat = valid.ravel()

    term = reach(local_ds, None)
    dist = path_sum(local_ds, jnp.ones(th * tw, jnp.int32))
    true_root = local_ds[term] == term  # genuine pit/exit (not a cycle)
    t_dr = exit_dr.ravel()[term]
    t_dc = exit_dc.ravel()[term]
    leaves = (t_dr != 0) | (t_dc != 0)
    pit_term = vflat & true_root & ~leaves
    exit_term = vflat & true_root & leaves
    term_r = term // tw + 1 + t_dr
    term_c = term % tw + 1 + t_dc

    if mode == "rank":
        v0 = jnp.where(pit_term, dist, -1).astype(jnp.int32)
        unset = jnp.asarray(-1, jnp.int32)
    else:
        v0 = jnp.where(pit_term, seed.ravel()[term], 0).astype(jnp.int32)
        unset = jnp.asarray(0, jnp.int32)

    def body(state):
        i, v, _ = state
        halo = _gather_halo(v.reshape(th, tw), unset)
        tv = halo[term_r, term_c]
        if mode == "rank":
            v_new = jnp.where(exit_term & (v < 0) & (tv >= 0), dist + 1 + tv, v)
        else:
            v_new = jnp.where(exit_term & (v == 0) & (tv > 0), tv, v)
        v_new = v_new.astype(jnp.int32)
        changed = _psum2(jnp.sum(v_new != v, dtype=jnp.int32))
        return i + 1, v_new, changed

    def cond(state):
        i, _, changed = state
        return (i < max_rounds) & (changed > 0)

    _, v, changed = lax.while_loop(cond, body, (0, v0, jnp.asarray(1, jnp.int32)))
    if mode == "rank":
        v = jnp.where(vflat, v, -9999)
    stalled = (changed > 0).astype(jnp.int32).reshape(1, 1)
    return v.reshape(th, tw), stalled


_UNSET = -1e30  # float carry sentinel (below any physical value)


def _carry_step(codes, seed, w, cut, mode, max_rounds):
    """Per-shard body for float cross-tile carries.

    mode "dist": additive path length to the nearest absorbing cell (pit
    or ``cut``) with per-cell step weights ``w`` (w[i] = length of the
    step i -> ds(i)). mode "flabel": value of ``seed`` at the nearest
    downstream ``cut`` cell (label propagation with a float payload, the
    HAND pattern). Cells that never reach an absorber keep ``_UNSET``.
    """
    th, tw = codes.shape
    n = th * tw
    local_ds, exit_dr, exit_dc, valid = local_pointers(codes)
    exit_dr, exit_dc = _kill_off_grid_exits(exit_dr, exit_dc, th, tw)
    ar = jnp.arange(n, dtype=local_ds.dtype)
    vflat = valid.ravel()
    if cut is not None:
        cutf = cut.ravel() & vflat
        local_ds = jnp.where(cutf, ar, local_ds)
        exit_dr = jnp.where(cut, 0, exit_dr)
        exit_dc = jnp.where(cut, 0, exit_dc)
    else:
        cutf = jnp.zeros(n, bool)

    term = reach(local_ds, None)
    true_root = local_ds[term] == term
    t_dr = exit_dr.ravel()[term]
    t_dc = exit_dc.ravel()[term]
    leaves = (t_dr != 0) | (t_dc != 0)
    absorb = vflat & true_root & ~leaves
    exit_term = vflat & true_root & leaves
    term_r = term // tw + 1 + t_dr
    term_c = term % tw + 1 + t_dc

    unset = jnp.asarray(_UNSET, jnp.float32)
    zero = jnp.asarray(0, jnp.float32)
    if mode == "dist":
        wflat = jnp.where(vflat, w.ravel().astype(jnp.float32), zero)
        pw = path_sum(local_ds, wflat).astype(jnp.float32)
        wcross = jnp.where(exit_term, wflat[term], zero)
        v0 = jnp.where(absorb, pw, unset)
    else:
        # seed value at the absorbing terminal (cut cell, else pit — the
        # same fallback as graph.reach(stop) in the monolithic kernels)
        sflat = seed.ravel().astype(jnp.float32)
        v0 = jnp.where(absorb, sflat[term], unset)

    def body(state):
        i, v, _ = state
        halo = _gather_halo(v.reshape(th, tw), unset)
        tv = halo[term_r, term_c]
        live = exit_term & (v == unset) & (tv != unset)
        if mode == "dist":
            v_new = jnp.where(live, pw + wcross + tv, v)
        else:
            v_new = jnp.where(live, tv, v)
        changed = _psum2(jnp.sum(v_new != v, dtype=jnp.int32))
        return i + 1, v_new, changed

    def cond(state):
        i, _, changed = state
        return (i < max_rounds) & (changed > 0)

    _, v, changed = lax.while_loop(cond, body, (0, v0, jnp.asarray(1, jnp.int32)))
    stalled = (changed > 0).astype(jnp.int32).reshape(1, 1)
    return v.reshape(th, tw), stalled


def tiled_stream_distance(
    codes: np.ndarray,
    mesh: Mesh,
    mask: np.ndarray | None = None,
    real_length: bool = True,
    latlon: bool = False,
    transform=None,
    max_rounds: int | None = None,
):
    """Downstream distance to the outlet (or to ``mask``) over a D8 code
    raster sharded over ``mesh``.

    Matches :func:`pyflwdir_tpu.streams.stream_distance` (reference
    streams.py:272-315): per-cell path length to the nearest pit or
    masked cell, metric (``real_length``) or in cells;
    unreachable/missing cells -9999.
    """
    from ..codecs import d8 as d8c
    from ..utils import geodesy
    from ..utils.affine import IDENTITY

    nrow0, ncol0 = codes.shape
    codes_p = pad_to_tiles(np.asarray(codes), mesh, fill=247)
    if real_length:
        idxs_ds0, _, _ = d8c.from_array(np.asarray(codes))
        w0 = geodesy.distance_grid(
            np.asarray(idxs_ds0),
            (nrow0, ncol0),
            latlon=latlon,
            transform=IDENTITY if transform is None else transform,
        )
        w = pad_to_tiles(
            np.asarray(w0, np.float32).reshape(nrow0, ncol0), mesh, fill=0.0
        )
    else:
        step = (d8c._DR_LUT[codes_p] != 0) | (d8c._DC_LUT[codes_p] != 0)
        w = step.astype(np.float32)
    cut_p = None
    if mask is not None:
        cut_p = pad_to_tiles(np.asarray(mask, bool), mesh, fill=False)
    if max_rounds is None:
        max_rounds = int(codes_p.size)

    def step(codes_t, w_t, *rest):
        cut_t = rest[0] if rest else None
        return _carry_step(codes_t, None, w_t, cut_t, "dist", max_rounds)

    arrays = (codes_p, w) + ((cut_p,) if cut_p is not None else ())
    out, stalled = _run_sharded(mesh, step, *arrays)
    _check_converged(stalled, "stream distance")
    out = np.asarray(out)[:nrow0, :ncol0]
    bad = out == _UNSET
    if real_length:
        return np.where(bad, -9999.0, out).astype(np.float32)
    return np.where(bad, -9999, np.rint(out)).astype(np.int32)


def tiled_hand(
    codes: np.ndarray,
    elevtn: np.ndarray,
    drain: np.ndarray,
    mesh: Mesh,
    nodata: float = -9999.0,
    max_rounds: int | None = None,
):
    """Height above the nearest downstream drain cell, sharded over
    ``mesh``.

    Matches reference ``dem.height_above_nearest_drain`` (dem.py:299-330):
    ``hand[i] = elevtn[i] - elevtn[drain_cell(i)]`` telescoped along the
    flow path; cells that never reach a drain get ``nodata``.
    """
    nrow0, ncol0 = codes.shape
    codes_p = pad_to_tiles(np.asarray(codes), mesh, fill=247)
    elev_p = pad_to_tiles(np.asarray(elevtn, np.float32), mesh, fill=0.0)
    drain_p = pad_to_tiles(np.asarray(drain, bool), mesh, fill=False)
    if max_rounds is None:
        max_rounds = int(codes_p.size)

    def step(codes_t, elev_t, drain_t):
        return _carry_step(codes_t, elev_t, None, drain_t, "flabel", max_rounds)

    zdrain, stalled = _run_sharded(mesh, step, codes_p, elev_p, drain_p)
    _check_converged(stalled, "hand")
    zdrain = np.asarray(zdrain)[:nrow0, :ncol0]
    hand = np.asarray(elevtn, np.float64) - zdrain
    return np.where(zdrain == _UNSET, nodata, hand)


def _run_sharded(mesh, fn, *arrays, n_out=2):
    specs = tuple(P("ty", "tx") for _ in arrays)
    out_specs = tuple(P("ty", "tx") for _ in range(n_out))
    f = jax.jit(
        jax.shard_map(fn, mesh=mesh, in_specs=specs, out_specs=out_specs)
    )
    sharding = NamedSharding(mesh, P("ty", "tx"))
    return f(*(jax.device_put(jnp.asarray(a), sharding) for a in arrays))


def _check_converged(stalled, what):
    if int(np.asarray(stalled).sum()) > 0:
        raise RuntimeError(
            f"tiled {what} did not converge within max_rounds — raise "
            "max_rounds, or the network has cross-tile cycles"
        )


def tiled_rank(codes: np.ndarray, mesh: Mesh, max_rounds: int | None = None):
    """Distance-to-pit over a D8 code raster sharded over ``mesh``.

    Matches :func:`pyflwdir_tpu.ops.graph.rank` (loops -1, missing -9999).
    Raises if the cross-tile fixpoint hits ``max_rounds`` while still
    changing.
    """
    nrow0, ncol0 = codes.shape
    codes_p = pad_to_tiles(np.asarray(codes), mesh, fill=247)
    if max_rounds is None:
        max_rounds = int(codes_p.size)  # backstop; loop exits at fixpoint
    out, stalled = _run_sharded(
        mesh,
        partial(_fixpoint_step, seed=None, mode="rank", max_rounds=max_rounds),
        codes_p,
    )
    _check_converged(stalled, "rank")
    return np.asarray(out)[:nrow0, :ncol0]


def tiled_basins(
    codes: np.ndarray,
    idxs_pit: np.ndarray,
    mesh: Mesh,
    ids: np.ndarray | None = None,
    max_rounds: int | None = None,
):
    """Basin labels over a D8 code raster sharded over ``mesh``.

    Matches :func:`pyflwdir_tpu.basins.basins`: pits seeded with 1-based
    ``ids`` (or their ordinal), every cell labeled with its outlet's id,
    cells not reaching a seeded pit 0.
    """
    nrow0, ncol0 = codes.shape
    codes_p = pad_to_tiles(np.asarray(codes), mesh, fill=247)
    seed = np.zeros(codes_p.shape, dtype=np.int32)
    if ids is None:
        ids = np.arange(1, np.atleast_1d(idxs_pit).size + 1, dtype=np.int32)
    rr, cc = np.unravel_index(np.atleast_1d(idxs_pit), (nrow0, ncol0))
    seed[rr, cc] = ids
    if max_rounds is None:
        max_rounds = int(codes_p.size)
    def step(codes, seed):
        return _fixpoint_step(codes, seed, mode="label", max_rounds=max_rounds)

    out, stalled = _run_sharded(mesh, step, codes_p, seed)
    _check_converged(stalled, "basins")
    return np.asarray(out)[:nrow0, :ncol0]


def _tile_step_coarse(codes, data, K):
    """Per-shard body of the hierarchical (constant-round) accumulation.

    The cross-tile pointer contraction of SURVEY hard-part 4: instead of
    iterating halo rounds once per tile crossing of the longest path,
    each shard computes its local-root subtree sums, one halo exchange
    publishes the coarse slot of every boundary cell's local root, one
    ``all_gather`` ships the (small, <= K per tile) exit records to every
    device, the coarse root graph is solved redundantly with tile-local
    pointer doubling, and a single local injection pass finishes. Two
    collectives total, independent of path length.
    """
    th, tw = codes.shape
    n = th * tw
    local_ds, exit_dr, exit_dc, valid = local_pointers(codes)
    exit_dr, exit_dc = _kill_off_grid_exits(exit_dr, exit_dc, th, tw)
    dflat = jnp.where(valid.ravel(), data.ravel(), 0).astype(data.dtype)
    accu_local = _local_accumulate(local_ds, dflat)

    ar = jnp.arange(n, dtype=local_ds.dtype)
    is_exit_cell = ((exit_dr != 0) | (exit_dc != 0)).ravel() & valid.ravel()
    term = reach(local_ds, None)

    # compact the exit cells into K slots (index order)
    keys = jnp.where(is_exit_cell, ar, n + ar)
    order = jnp.argsort(keys)
    exit_cells = order[:K]                       # cell idx per slot (or junk)
    slot_valid = is_exit_cell[exit_cells]
    slot_of_cell = (
        jnp.full(n, -1, jnp.int32)
        .at[exit_cells]
        .set(jnp.where(slot_valid, jnp.arange(K, dtype=jnp.int32), -1))
    )

    nty, ntx = lax.axis_size("ty"), lax.axis_size("tx")
    ti, tj = lax.axis_index("ty"), lax.axis_index("tx")
    my_lin = ti * ntx + tj
    # coarse slot of each cell's local root (-1 if pit-rooted), globalized
    root_slot = slot_of_cell[term]
    gslot_map = jnp.where(
        root_slot >= 0, my_lin * K + root_slot, -1
    ).astype(jnp.int32)
    halo = _gather_halo(gslot_map.reshape(th, tw), jnp.asarray(-1, jnp.int32))

    # per-slot records
    er = exit_cells // tw
    ec = exit_cells % tw
    sdr = exit_dr.ravel()[exit_cells]
    sdc = exit_dc.ravel()[exit_cells]
    parent = halo[er + 1 + sdr, ec + 1 + sdc]     # gslot of entry's root
    gself = my_lin * K + jnp.arange(K, dtype=jnp.int32)
    parent = jnp.where(slot_valid & (parent >= 0), parent, gself)
    sval = jnp.where(slot_valid, accu_local[exit_cells], 0).astype(data.dtype)
    # global entry coordinates -> destination tile + local flat index
    gr = ti * th + er + sdr
    gc = tj * tw + ec + sdc
    dest = (gr // th) * ntx + gc // tw
    entry_flat = (gr % th) * tw + gc % tw
    dest = jnp.where(slot_valid, dest, -1).astype(jnp.int32)

    def gather2(x):
        g = lax.all_gather(lax.all_gather(x, "tx"), "ty")
        return g.reshape((nty * ntx * K,) + x.shape[1:])

    g_parent = gather2(parent)
    g_s = gather2(sval)
    g_dest = gather2(dest)
    g_entry = gather2(entry_flat)

    # replicated coarse solve: subtree sums over the exit-root forest
    m = nty * ntx * K
    arm = jnp.arange(m, dtype=g_parent.dtype)
    active = g_parent != arm
    ptr = jnp.where(active, g_parent, m)
    A = _subtree_reduce(ptr, g_s, "add")

    # inject the incoming totals at my entry cells and finish locally
    mine = g_dest == my_lin
    inj = (
        jnp.zeros(n, data.dtype)
        .at[g_entry]
        .add(jnp.where(mine, A, 0), mode="drop")
    )
    inj_acc = _local_accumulate(local_ds, jnp.where(valid.ravel(), inj, 0))
    total = accu_local + inj_acc
    overflow = jnp.sum(
        (slot_of_cell < 0) & is_exit_cell, dtype=jnp.int32
    ).reshape(1, 1)
    return jnp.where(valid, total.reshape(th, tw), data), overflow


def _tile_step(codes, data, max_rounds):
    """Per-shard body: local accumulate + iterated cross-tile injection."""
    th, tw = codes.shape
    local_ds, exit_dr, exit_dc, valid = local_pointers(codes)
    # cells whose raw code points off the global grid are pits after
    # parsing (codecs.d8.from_array) — kill their exits so the flow stays
    # put instead of riding the cyclic ppermute around the mesh
    exit_dr, exit_dc = _kill_off_grid_exits(exit_dr, exit_dc, th, tw)
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

    def pending_of(inject_flow):
        return _psum2(jnp.sum(jnp.abs(jnp.where(is_exit, inject_flow, 0))))

    def cond(state):
        i, total, inject_flow = state
        return (i < max_rounds) & (pending_of(inject_flow) > 0)

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
    _, total, inject_flow = lax.while_loop(cond, body, state)
    stalled = (pending_of(inject_flow) > 0).astype(jnp.int32).reshape(1, 1)
    return jnp.where(valid, total.reshape(th, tw), data), stalled


def tiled_accumulate(
    codes: np.ndarray,
    data: np.ndarray,
    mesh: Mesh,
    max_rounds: int | None = None,
    method: str = "coarse",
):
    """Flow accumulation of ``data`` over a D8 code raster, sharded over
    ``mesh``. Returns the dense accumulation grid (same shape as input).

    Matches :func:`pyflwdir_tpu.ops.graph.accumulate` on the parsed graph
    (no-nodata case); the input is padded to the mesh tiling.

    ``method="plan"`` shards a hierarchical
    :class:`~pyflwdir_tpu.ops.tile_plan.TilePlan` over the mesh — the
    same per-tile VMEM DFS-interval kernels as the single-chip
    north-star path, one ``all_gather`` of exit records total (build the
    plan once via :func:`build_sharded_plan` to amortize it across
    calls); ``method="coarse"`` (default) solves cross-tile flow
    hierarchically on the pointer-doubling engine — two collectives
    regardless of path length (:func:`_tile_step_coarse`);
    ``method="iterate"`` is the halo-exchange fixpoint (one ppermute
    round per tile crossing of the longest path).
    """
    nrow0, ncol0 = codes.shape

    if method == "plan":
        tp, pshape = build_sharded_plan(codes, mesh)
        data_p = np.zeros(pshape, dtype=np.float32)
        data_p[:nrow0, :ncol0] = np.asarray(data, dtype=np.float32)
        out = tp.accumulate_sharded(jnp.asarray(data_p.ravel()), mesh)
        return np.asarray(out).reshape(pshape)[:nrow0, :ncol0]

    codes_p = pad_to_tiles(np.asarray(codes), mesh, fill=247)
    data_p = pad_to_tiles(np.asarray(data, dtype=np.float32), mesh, fill=0.0)

    if method == "coarse":
        ty, tx = mesh.devices.shape
        th, tw = codes_p.shape[0] // ty, codes_p.shape[1] // tx
        K = 2 * (th + tw)
        out, overflow = _run_sharded(
            mesh, partial(_tile_step_coarse, K=K), codes_p, data_p
        )
        if int(np.asarray(overflow).sum()) > 0:
            raise RuntimeError("tiled accumulation: exit cells exceed K slots")
        return np.asarray(out)[:nrow0, :ncol0]

    if max_rounds is None:
        # a serpentine path can cross a tile boundary on every step, so
        # the only safe a-priori bound is the cell count; the fixpoint
        # exits as soon as no flow is in flight (psum of pending == 0)
        max_rounds = int(codes_p.size)

    out, stalled = _run_sharded(
        mesh, partial(_tile_step, max_rounds=max_rounds), codes_p, data_p
    )
    _check_converged(stalled, "accumulation")
    return np.asarray(out)[:nrow0, :ncol0]


def build_sharded_plan(codes: np.ndarray, mesh: Mesh, tile_rows: int = 128):
    """Build a :class:`~pyflwdir_tpu.ops.tile_plan.TilePlan` whose tile
    grid splits evenly over ``mesh`` (whole tile-row slabs per device,
    row-major over the flattened mesh axes). Returns ``(plan, pshape)``
    where ``pshape`` is the padded grid shape the plan operates on."""
    from ..codecs import d8 as d8c
    from ..ops.tile_plan import build_tile_plan

    ndev = int(mesh.devices.size)
    pr = (-codes.shape[0]) % (tile_rows * ndev)
    pc = (-codes.shape[1]) % 128
    codes_p = np.pad(np.asarray(codes), ((0, pr), (0, pc)), constant_values=247)
    idxs_ds, _, _ = d8c.from_array(codes_p)
    return build_tile_plan(idxs_ds, codes_p.shape, tile_rows=tile_rows), codes_p.shape


def _child_counts(codes, member):
    """Per-cell count of upstream D8 neighbors inside ``member`` (host
    numpy 3x3 stencil: 8 shifted adds)."""
    from ..codecs import d8 as d8c

    dr = d8c._DR_LUT[codes]
    dc = d8c._DC_LUT[codes]
    nrow, ncol = codes.shape
    cnt = np.zeros((nrow, ncol), dtype=np.int8)
    for sr in (-1, 0, 1):
        for sc in (-1, 0, 1):
            if sr == 0 and sc == 0:
                continue
            src = member & (dr == sr) & (dc == sc)
            r0, r1 = max(sr, 0), nrow + min(sr, 0)
            c0, c1 = max(sc, 0), ncol + min(sc, 0)
            cnt[r0:r1, c0:c1] += src[r0 - sr : r1 - sr, c0 - sc : c1 - sc]
    return cnt


def tiled_strahler(
    codes: np.ndarray,
    mesh: Mesh,
    mask: np.ndarray | None = None,
    max_order: int = 32,
    max_rounds: int | None = None,
):
    """Strahler stream order over a D8 code raster sharded over ``mesh``.

    Log-depth formulation (instead of the O(n)-round scatter fixpoint of
    ``ops.order.strahler``): ``order(c) >= s`` iff c's subtree contains a
    cell with two upstream branches of order ``>= s-1``, and that set is
    the downstream closure of the level's confluence generators — one
    child-count stencil plus one tiled accumulation per order level
    (max Strahler order <= log2(#headwaters), ~12 for real networks).
    Matches reference ``streams.strahler_order`` (streams.py:229-269)
    incl. its mask semantics (cells outside ``mask`` are 0 and invisible).
    """
    from ..codecs import d8 as d8c

    codes = np.asarray(codes)
    valid = (
        (d8c._DR_LUT[codes] != 0)
        | (d8c._DC_LUT[codes] != 0)
        | np.isin(codes, d8c._pv)
    )
    if mask is not None:
        # orders must not propagate through cells outside the mask
        # (reference skips them entirely): cut the network there
        member = valid & np.asarray(mask, bool)
        codes = np.where(member, codes, np.uint8(d8c._mv))
    else:
        member = valid
    order = member.astype(np.uint8)
    for _ in range(1, max_order):
        gen = _child_counts(codes, member) >= 2
        if not gen.any():
            break
        accu = tiled_accumulate(
            codes, gen.astype(np.float32), mesh, max_rounds=max_rounds
        )
        member = (np.asarray(accu) >= 0.5) & member
        order += member.astype(np.uint8)
    return order


def tiled_fill(
    dem: np.ndarray,
    mesh: Mesh,
    nodata=-9999.0,
    outlets="edge",
    idxs_pit=None,
    connectivity=8,
    max_rounds: int | None = None,
    max_depth: float = -1.0,
    elv_max: float | None = None,
):
    """Depression filling over a DEM sharded over ``mesh``.

    Morphological reconstruction by erosion (the device fill of
    :mod:`pyflwdir_tpu.ops.fill`) with per-round 8-neighbor halo exchange:
    each round runs one local down+up sweep pair against the neighbors'
    current surface and iterates to the global fixpoint. Matches the host
    priority-flood surface (max_depth < 0 semantics). ``max_depth >= 0``
    caps the fill depth with the same outer fixpoint as
    ``fill_depressions_dev`` (depth-exceeding cells become interior pits
    and the fill reruns with them seeded); ``elv_max`` restricts the edge
    seeds.
    """
    from ..dem import get_edge
    from ..ops.fill import _sweep

    dem = np.asarray(dem)
    nrow0, ncol0 = dem.shape
    nan = isinstance(nodata, float) and np.isnan(nodata)
    bad = np.isnan(dem) if nan else dem == nodata
    struct = np.ones((3, 3), dtype=bool)
    if connectivity == 4:
        struct[0, 0] = struct[-1, -1] = struct[0, -1] = struct[-1, 0] = False
    if idxs_pit is not None:
        seeds = np.zeros(dem.shape, bool)
        seeds.flat[np.atleast_1d(idxs_pit)] = True
    else:
        seeds = get_edge(~bad, structure=struct)
        if elv_max is not None:
            seeds = np.logical_and(seeds, dem <= elv_max)
            if not np.any(seeds):
                raise ValueError("No initial outlet cells found.")
        if outlets == "min":
            zb = np.where(seeds, dem, np.inf).astype(np.float32)
            i = np.unravel_index(np.argmin(zb), dem.shape)
            seeds = np.zeros(dem.shape, bool)
            seeds[i] = True

    dem_eff = np.where(bad, np.inf, dem).astype(np.float32)
    dem_p = pad_to_tiles(dem_eff, mesh, fill=np.inf)
    bad_p = pad_to_tiles(bad, mesh, fill=True)
    if max_rounds is None:
        max_rounds = int(np.sum(mesh.devices.shape) * 16 + 64)
    conn8 = connectivity == 8

    def step(dem_t, seeds_t, bad_t):
        th, tw = dem_t.shape
        fixed = seeds_t | bad_t
        w0 = jnp.where(seeds_t, dem_t, jnp.inf)

        def one_round(w):
            halo = _gather_halo(w, jnp.inf)
            dem_pad = jnp.pad(dem_t, 1, constant_values=jnp.inf)
            fix_pad = jnp.pad(fixed, 1, constant_values=True)
            # halo cells act as fixed boundary conditions at the
            # neighbors' current surface
            wp = halo.at[1:-1, 1:-1].set(w)
            dem_pad = dem_pad.at[0, :].set(halo[0, :]).at[-1, :].set(halo[-1, :])
            dem_pad = dem_pad.at[:, 0].set(halo[:, 0]).at[:, -1].set(halo[:, -1])
            w1 = _sweep(wp, dem_pad, fix_pad, conn8, down=True)
            w2 = _sweep(w1, dem_pad, fix_pad, conn8, down=False)
            return w2[1:-1, 1:-1]

        def body(state):
            i, w, _ = state
            w_new = one_round(w)
            changed = _psum2(jnp.sum(w_new != w, dtype=jnp.int32))
            return i + 1, w_new, changed

        def cond(state):
            i, _, changed = state
            return (i < max_rounds) & (changed > 0)

        _, w, changed = lax.while_loop(
            cond, body, (0, w0, jnp.asarray(1, jnp.int32))
        )
        filled = jnp.where(bad_t, nodata, w)
        return filled, (changed > 0).astype(jnp.int32).reshape(1, 1)

    def fill_once(seeds_now):
        seeds_p = pad_to_tiles(seeds_now, mesh, fill=False)
        out, stalled = _run_sharded(mesh, step, dem_p, seeds_p, bad_p)
        _check_converged(stalled, "fill")
        return np.asarray(out)[:nrow0, :ncol0]

    filled = fill_once(seeds)
    if max_depth is not None and max_depth >= 0:
        # outer fixpoint (fill_depressions_dev semantics): cells whose
        # fill reaches max_depth stay at their own elevation and become
        # interior pits; rerun with them seeded until none remain
        for _ in range(int(max_rounds)):
            deep = (
                ~seeds & ~bad & ((filled - dem) >= max_depth)
            )
            if not deep.any():
                break
            seeds = seeds | deep
            filled = fill_once(seeds)
    return filled.astype(dem.dtype)
