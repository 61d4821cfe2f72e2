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

At these sizes the array cannot live in VMEM, so the chain executes as
seven tiled Pallas lane-gather passes (grid over row blocks) interleaved
with XLA HBM transposes — every pass is a streaming, bandwidth-bound op;
no XLA gather/scatter/sort anywhere.

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


class RouterPlanBig:
    """Precomputed 7-stage routing of one static permutation on
    ``G1 * 2^21`` elements (``apply`` computes
    ``out.ravel()[p] == x.ravel()[sigma[p]]``)."""

    def __init__(self, G1, stages):
        self.G1 = int(G1)
        # host copies; device upload lazy and cached outside traces
        self._np = [np.asarray(a) for a in stages]
        self._dev = None

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

    # -- execution --------------------------------------------------------
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
        """Apply the permutation to ``x2`` of shape (n/128, 128): seven
        tiled Pallas lane-gather passes + six XLA transposes."""
        return RouterPlanBig._chain(x2, self.G1, self.stages, lane_gather_tiled)

    def apply_np(self, x):
        """NumPy simulation of :meth:`apply` (tests / plan validation)."""

        def ta(v, idx):
            return np.take_along_axis(v, np.asarray(idx, np.int64), axis=1)

        out = RouterPlanBig._chain(np.asarray(x), self.G1, self._np, ta)
        return out.reshape(self.G1 * _S * _S, _S)
