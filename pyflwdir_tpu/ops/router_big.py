"""Large-n static-permutation router: 7-stage mixed-radix routing.

:class:`pyflwdir_tpu.ops.router.RouterPlan` routes permutations of up to
128^3 = 2,097,152 elements as a fully-VMEM-resident 5-stage chain. This
module lifts the cap to 128^4 ≈ 268M elements by adding one more axis to
the Benes-style decomposition: the flat index is viewed as a 4-D grid
``(G1, S2, S, L)`` with ``L = S = S2 = 128`` and ``G1 = n / 2^21 <= 128``,
and any permutation factors into seven per-axis stages

    L - S - S2 - G1 - S2 - S - L

where every stage permutes one axis independently within each fiber of the
remaining axes (Hall's theorem applied three times; the per-level stage
assignments are 128-edge-colorings of the source->destination multigraphs,
computed by the native Euler-split colorer,
csrc/host_kernels.cpp::bipartite_color).

At these sizes the array cannot live in VMEM. On TPU the chain executes as
**five fused Pallas kernels + one tiled middle gather + two XLA
transposes** (7 HBM round trips total): each fused kernel reads one
VMEM-sized tile, performs its lane gathers with the 128x128 layout
rotations done *in VMEM* (no HBM transpose traffic), and writes once.
Stage tables are int8 and pre-reshaped at plan-build time into the tile
layout each kernel consumes, so a full permutation moves ~63 bytes/element
(7 x (4 read + 4 write) + 7 x 1 index) — every pass streaming and
bandwidth-bound; no XLA gather/scatter/sort anywhere. Off-TPU the chain
falls back to seven XLA take_along_axis passes + six transposes.

The reference has no analogue: it scales by a single sequential sweep
(pyflwdir core.py:88-117); this router is what lets one TPU chip replay
that sweep's data movement at HBM bandwidth for continental grids.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .router import _S, bipartite_color

__all__ = ["RouterPlanBig", "lane_gather_tiled"]

_TILE = _S * _S          # elements per (s, l) slice
_CHUNK = _TILE * _S      # elements per g1 slice (= small-router capacity)


def _on_tpu():
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def lane_gather_tiled(x2, idx, block_rows=256):
    """``out[r, j] = x2[r, idx[r, j]]`` for arrays too large for one VMEM
    kernel: a Pallas grid over row blocks (XLA take_along_axis elsewhere).
    The source row width may exceed the index width (e.g. row-pair
    gathers); the output has ``idx``'s shape."""
    if not _on_tpu():
        return jnp.take_along_axis(x2, idx.astype(jnp.int32), axis=1)
    from jax.experimental import pallas as pl

    rows, src_w = x2.shape
    out_w = idx.shape[1]
    blk = min(block_rows, rows)
    pad = (-rows) % blk
    if pad or blk % 8:
        # Mosaic needs block rows divisible by 8 (or the full array): pad
        # odd-sized inputs (only the small far-expansion arrays hit this)
        blk = min(block_rows, rows + (-rows) % 8)
        pad = (-rows) % blk
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        idx = jnp.pad(idx, ((0, pad), (0, 0)))
    grid = ((rows + pad) // blk,)

    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(
            x_ref[:], i_ref[:].astype(jnp.int32), axis=1
        )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows + pad, out_w), x2.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, src_w), lambda i: (i, 0)),
            pl.BlockSpec((blk, out_w), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((blk, out_w), lambda i: (i, 0)),
    )(x2, idx)
    return out[:rows] if pad else out


def _ta3(v, idx):
    """Batched lane gather: out[..., r, j] = v[..., r, idx[..., r, j]]
    (Mosaic supports 2-D gathers only: flatten the batch dims)."""
    out = jnp.take_along_axis(
        v.reshape(-1, v.shape[-1]),
        idx.reshape(-1, idx.shape[-1]).astype(jnp.int32),
        axis=-1,
    )
    return out.reshape(idx.shape)


_FUSE_B = 8    # q-slices per F-kernel grid step (8 * 64 KiB = 512 KiB)
_FUSE_BM = 32  # c2-slices per middle-kernel grid step


def _f_kernels(G1, dtype, kind):
    """pallas_call plumbing for one fused pass; returns (grid, specs, body).

    Tile geometry (S = 128, B = _FUSE_B, M = _FUSE_BM); all 128x128 layout
    rotations happen in VMEM between the lane gathers:

      f1 : grid (G1, S/B); in (1,B,S,S) of (G1,S2,S,L) contiguous;
           ta(i1): l->c; xpose; ta(i2): s->c2; out (1,B,S,S) -> A[g1,s2,c,c2]
      f2 : grid (G1, S/B); in (1,S,B,S) of A (512B rows);
           xpose -> (c,c2,s2); ta(i3): s2->c3; out (1,B,S,S) -> B[g1,c,c2,c3]
      mid: grid (S, S/M);   in (G1,1,M,S) of B (16 KiB rows);
           xpose -> (c2,c3,g1); ta(i4): g1s->g1d (fibers lane-packed when
           G1 | 128); xpose back; out (G1,1,M,S) -> B2 (same layout)
      f2p: grid (G1, S/B); in (1,B,S,S) of B2 contiguous;
           ta(i5): c3->s2; xpose; out (1,B,S,S) -> E[g1,c,s2,c2]
      f1p: grid (G1, S/B); in (1,S,B,S) of E (512B rows);
           ta(i6): c2->sd; xpose; ta(i7): c->ld; out (1,B,S,S) -> (Y, S)
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, B, M = _S, _FUSE_B, _FUSE_BM
    vm = pltpu.VMEM
    slab = pl.BlockSpec((1, B, S, S), lambda g, b: (g, b, 0, 0), memory_space=vm)
    swath = pl.BlockSpec((1, S, B, S), lambda g, b: (g, 0, b, 0), memory_space=vm)

    if kind == "f1":
        def body(x_ref, i1_ref, i2_ref, o_ref):
            v = _ta3(x_ref[0], i1_ref[0])          # (b, s, c)
            o_ref[0] = _ta3(v.transpose(0, 2, 1), i2_ref[0])
        return (G1, S // B), [slab, slab, slab], slab, body

    if kind == "f2":
        def body(x_ref, i3_ref, o_ref):
            v = x_ref[0].transpose(1, 2, 0)        # (c, c2, s2)
            o_ref[0] = _ta3(v, i3_ref[0])          # (c, c2, c3)
        return (G1, S // B), [swath, slab], slab, body

    if kind == "mid":
        gblk = pl.BlockSpec(
            (G1, 1, M, S), lambda c, b: (0, c, b, 0), memory_space=vm
        )

        def body(x_ref, i4_ref, o_ref):
            v = x_ref[:, 0]                        # (g1, c2, c3)
            v = v.transpose(1, 2, 0)               # (c2, c3, g1)
            v = _ta3(v, i4_ref[0])                 # gather g1 on lanes
            o_ref[:, 0] = v.transpose(2, 0, 1)
        i4spec = pl.BlockSpec(
            (1, M, S, G1), lambda c, b: (c, b, 0, 0), memory_space=vm
        )
        return (S, S // M), [gblk, i4spec], gblk, body

    if kind == "f2p":
        def body(x_ref, i5_ref, o_ref):
            v = _ta3(x_ref[0], i5_ref[0])          # (c, c2, s2)
            o_ref[0] = v.transpose(0, 2, 1)        # (c, s2, c2)
        return (G1, S // B), [slab, slab], slab, body

    # f1p
    def body(x_ref, i6_ref, i7_ref, o_ref):
        v = x_ref[0].transpose(1, 0, 2)            # (s2, c, c2)
        v = _ta3(v, i6_ref[0])                     # (s2, c, sd)
        o_ref[0] = _ta3(v.transpose(0, 2, 1), i7_ref[0])
    return (G1, S // B), [swath, slab, slab], slab, body


def _fused_pass(v, tabs, kind):
    """One fused router pass (one HBM round trip) on the 4-D view ``v``."""
    import jax.experimental.pallas as pl

    grid, in_specs, out_spec, body = _f_kernels(v.shape[0], v.dtype, kind)
    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
    )(v, *tabs)


class RouterPlanBig:
    """Precomputed 7-stage routing of one static permutation on
    ``G1 * 2^21`` elements (``apply`` computes
    ``out.ravel()[p] == x.ravel()[sigma[p]]``)."""

    def __init__(self, G1, stages):
        self.G1 = int(G1)
        # host copies; device upload lazy and cached outside traces
        self._np = [np.asarray(a) for a in stages]
        self._dev = None
        self._dev_tpu = None
        self._np_tpu = None

    @property
    def stages(self):
        if self._dev is None:
            arrs = tuple(jnp.asarray(a) for a in self._np)
            if any(isinstance(a, jax.core.Tracer) for a in arrs):
                return arrs
            self._dev = arrs
        return self._dev

    @staticmethod
    def build(sigma) -> "RouterPlanBig":
        sigma = np.ascontiguousarray(sigma, dtype=np.int64)
        n = sigma.size
        if n % _CHUNK != 0:
            raise ValueError("sigma length must be a multiple of 2^21")
        G1 = n // _CHUNK
        if G1 > _S:
            raise ValueError(f"big router supports up to {_S * _CHUNK} elements")
        S = _S
        Y = n // S  # rows

        dest = np.arange(n, dtype=np.int64)
        src = sigma
        ld, yd = dest % S, dest // S
        ls, ys = src % S, src // S

        # level 0: route between rows; color c = intermediate lane
        c = bipartite_color(ys, yd, Y, Y, S).astype(np.int64)
        i1 = np.zeros((Y, S), dtype=np.int8)
        i1[ys, c] = ls
        i7 = np.zeros((Y, S), dtype=np.int8)
        i7[yd, ld] = c

        # level 1: rows decompose (q, s), q = g1*S2 + s2; per lane class c
        # color the q-multigraph; c2 = intermediate s position
        Q = Y // S
        qs, ss = ys // S, ys % S
        qd, sd = yd // S, yd % S
        c2 = bipartite_color(c * Q + qs, c * Q + qd, S * Q, S * Q, S)
        c2 = c2.astype(np.int64)
        i2 = np.zeros((Y, S), dtype=np.int8)
        i2[qs * S + c, c2] = ss
        i6 = np.zeros((Y, S), dtype=np.int8)
        i6[qd * S + c, sd] = c2

        # level 2: q decomposes (g1, s2); per (c, c2) fiber color the
        # g1-multigraph; c3 = intermediate s2 position
        g1s, s2s = qs // S, qs % S
        g1d, s2d = qd // S, qd % S
        fib = c * S + c2
        c3 = bipartite_color(fib * G1 + g1s, fib * G1 + g1d,
                             S * S * G1, S * S * G1, S)
        c3 = c3.astype(np.int64)
        i3 = np.zeros((Y, S), dtype=np.int8)
        i3[(g1s * S + c2) * S + c, c3] = s2s
        i5 = np.zeros((Y, S), dtype=np.int8)
        i5[(g1d * S + c2) * S + c, s2d] = c3

        # level 3 core: true gather along g1 per (c3, c2, c) fiber
        i4 = np.zeros((_TILE * S, G1), dtype=np.int8)
        i4[(c3 * S + c2) * S + c, g1d] = g1s.astype(np.int8)

        return RouterPlanBig(G1, (i1, i2, i3, i4, i5, i6, i7))

    def inverse(self) -> "RouterPlanBig":
        """Router for the inverse permutation, derived without coloring.

        The 7-stage schedule is palindromic (every inter-stage transpose is
        an involution), so routing sigma^{-1} is the same chain run with
        the per-row-inverted stage tables in reverse order.
        """
        def inv(t):
            t = np.asarray(t)
            out = np.zeros_like(t)
            r = np.arange(t.shape[0])[:, None]
            j = np.broadcast_to(np.arange(t.shape[1]), t.shape)
            out[r, t.astype(np.int64)] = j.astype(t.dtype)
            return out

        i1, i2, i3, i4, i5, i6, i7 = self._np
        return RouterPlanBig(
            self.G1,
            (inv(i7), inv(i6), inv(i5), inv(i4), inv(i3), inv(i2), inv(i1)),
        )

    # -- fused TPU execution ------------------------------------------------
    #
    # Five fused Pallas kernels = 5 HBM round trips (vs 13 for the naive
    # chain): f1 -> f2 -> mid -> f2p -> f1p, see :func:`_f_kernels`. All
    # layout rotations (including bringing the chunk axis onto lanes for
    # the middle stage) happen in VMEM; no HBM transpose traffic at all.
    # Stage tables are pre-reshaped (`tpu_stages`) into the tile layout of
    # the kernel that consumes them, so every kernel reads its blocks
    # contiguously or in >=512-byte rows.

    def tpu_stages(self):
        """Stage tables reordered for the fused TPU chain (device pytree).

        Returns ``(i1, i2, i3r, i4p, i5r, i6, i7)`` where the 4-D tables are
        laid out per-tile and the middle table packs ``128 // G1`` fibers
        per 128-lane row when G1 divides 128.
        """
        if self._dev_tpu is None:
            arrs = tuple(jnp.asarray(a) for a in self._tpu_stages_np())
            if any(isinstance(a, jax.core.Tracer) for a in arrs):
                return arrs
            self._dev_tpu = arrs
        return self._dev_tpu

    def _tpu_stages_np(self):
        if self._np_tpu is None:
            S, G1 = _S, self.G1
            i1, i2, i3, i4, i5, i6, i7 = self._np
            r = lambda t: t.reshape(G1, S, S, S)
            # i3/i5 rows are (g1, c2, c); kernels tile rows (c2) per (g1, c)
            i3r = r(i3).transpose(0, 2, 1, 3).copy()
            i5r = r(i5).transpose(0, 2, 1, 3).copy()
            # i4 rows are (c3, c2, c) with g1 lanes; mid tiles (c2, c3, g1)
            # per c
            i4p = np.ascontiguousarray(
                i4.reshape(S, S, S, G1).transpose(2, 1, 0, 3)
            )
            self._np_tpu = (r(i1), r(i2), i3r, i4p, i5r, r(i6), r(i7))
        return self._np_tpu

    @staticmethod
    def _chain_fused(x2, G1, st):
        """The fused 5-round-trip TPU chain (st = ``tpu_stages()``)."""
        S = _S
        i1, i2, i3r, i4p, i5r, i6, i7 = st
        v = x2.reshape(G1, S, S, S)
        a = _fused_pass(v, (i1, i2), "f1")       # A  (G1, S2, C, C2)
        bv = _fused_pass(a, (i3r,), "f2")        # B  (G1, C, C2, C3)
        b2 = _fused_pass(bv, (i4p,), "mid")      # B2 (G1, C, C2, C3)
        e = _fused_pass(b2, (i5r,), "f2p")       # E  (G1, C, S2, C2)
        out = _fused_pass(e, (i6, i7), "f1p")    # (G1, S2, S, L)
        return out.reshape(-1, S)

    # -- reference execution (CPU fallback / numpy simulation) ---------------
    @staticmethod
    def _chain(v, G1, st, ta):
        """Seven per-axis gathers with HBM transposes between layouts.

        Position tracking of an element with source (g1s, s2s, ss, ls) and
        destination (g1d, s2d, sd, ld); after stage k it sits at:
          1 -> (g1s, s2s, ss, c)     2 -> (g1s, s2s, c2, c)
          3 -> (g1s, c3,  c2, c)     4 -> (g1d, c3,  c2, c)
          5 -> (g1d, s2d, c2, c)     6 -> (g1d, s2d, sd, c)
          7 -> (g1d, s2d, sd, ld)
        """
        S = _S
        i1, i2, i3, i4, i5, i6, i7 = st
        Q = G1 * S
        v = ta(v.reshape(Q * S, S), i1)                 # lanes
        v = v.reshape(Q, S, S).transpose(0, 2, 1)       # (q, l, s)
        v = ta(v.reshape(Q * S, S), i2)                 # s axis
        v = v.reshape(G1, S, S, S).transpose(0, 3, 2, 1)  # (g1, sp, l, s2)
        v = ta(v.reshape(Q * S, S), i3)                 # s2 axis
        v = v.reshape(G1, S, S, S).transpose(3, 1, 2, 0)  # (s2p, sp, l, g1)
        v = ta(v.reshape(S * S * S, G1), i4)            # g1 axis
        v = v.reshape(S, S, S, G1).transpose(3, 1, 2, 0)  # (g1, sp, l, s2p)
        v = ta(v.reshape(Q * S, S), i5)                 # s2 axis back
        v = v.reshape(G1, S, S, S).transpose(0, 3, 2, 1)  # (g1, s2, l, sp)
        v = ta(v.reshape(Q * S, S), i6)                 # s axis back
        v = v.reshape(G1, S, S, S).transpose(0, 1, 3, 2)  # (g1, s2, s, l)
        return ta(v.reshape(Q * S, S), i7)              # lanes

    def apply(self, x2):
        """Apply the permutation to ``x2`` of shape (n/128, 128): five fused
        Pallas passes on TPU; seven XLA take_along_axis passes elsewhere."""
        if _on_tpu():
            return RouterPlanBig._chain_fused(x2, self.G1, self.tpu_stages())
        return RouterPlanBig._chain(x2, self.G1, self.stages, lane_gather_tiled)

    def apply_np(self, x):
        """NumPy simulation of :meth:`apply` (tests / plan validation)."""

        def ta(v, idx):
            return np.take_along_axis(v, np.asarray(idx, np.int64), axis=1)

        out = RouterPlanBig._chain(np.asarray(x), self.G1, self._np, ta)
        return out.reshape(self.G1 * _S * _S, _S)
