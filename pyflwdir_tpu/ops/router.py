"""Static-permutation router: arbitrary n-element permutations at
near-HBM-bandwidth on TPU.

Every graph sweep in this framework reduces to *static* data movements
(the flow graph is fixed while many data arrays stream through it), but
XLA's general gather/scatter/sort lower to element-at-a-time loops on TPU
(~100 Mel/s measured on v5e — 1000x slower than a copy). The one fast
reshuffle primitive the hardware does have is the VPU dynamic-gather along
lanes (``jnp.take_along_axis(x, idx, axis=-1)`` with idx < 128, lowered by
Mosaic to a single hardware op per vreg).

This module turns any static permutation into a short sequence of such
lane gathers plus layout transposes, using a two-level Birkhoff/Hall
routing decomposition:

* view the n elements as a 3-D grid ``(G, S=128, L=128)`` (flat index
  ``g*16384 + s*128 + l``), padded up to a multiple of 16384;
* any permutation factors into 5 per-axis stages ``L - S - G - S - L``
  where each stage independently permutes one axis within every fiber
  (proved by applying Hall's theorem twice); the stage assignments come
  from 128-edge-colorings of the (src row -> dst row) multigraphs,
  computed host-side by recursive Euler splitting
  (``csrc/host_kernels.cpp::bipartite_color``);
* each stage executes as one lane ``take_along_axis`` (Pallas kernel on
  TPU) sandwiched between cheap XLA transposes that rotate the target
  axis onto lanes. Index arrays are stored as int8 (all values < 128)
  and widened in-kernel, so a full permutation moves ~2.4 bytes of plan
  per element.

The reference has no analogue of this machinery: it relies on a cached
topological order and sequential sweeps (pyflwdir core.py:88-117,
flwdir.py:164-168); the router is what replaces "iterate in seq order"
on a vector machine.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["RouterPlan", "bipartite_color"]

_S = 128  # lanes per row / colors per level


# ---------------------------------------------------------------------------
# host-side: bipartite edge coloring (C++ with pure-python fallback)
# ---------------------------------------------------------------------------
def _bipartite_color_py(u, v, nL, nR, deg):
    """Pure-python Euler-split coloring (small inputs / no native lib)."""
    E = u.size
    levels = int(deg).bit_length() - 1
    grp = np.zeros(E, dtype=np.int64)
    for lev in range(levels):
        ngrp = 1 << lev
        nkey = (nL + nR) * ngrp
        key_u = u * ngrp + grp
        key_v = (nL + v) * ngrp + grp
        cnt = np.zeros(nkey + 1, dtype=np.int64)
        np.add.at(cnt, key_u + 1, 1)
        np.add.at(cnt, key_v + 1, 1)
        np.cumsum(cnt, out=cnt)
        cur = cnt[:-1].copy()
        inc = np.empty(2 * E, dtype=np.int64)
        for e in range(E):  # stable fill
            inc[cur[key_u[e]]] = e
            cur[key_u[e]] += 1
            inc[cur[key_v[e]]] = e
            cur[key_v[e]] += 1
        cur = cnt[:-1].copy()
        used = np.zeros(E, dtype=bool)
        for e0 in range(E):
            if used[e0]:
                continue
            g = grp[e0]
            w = u[e0]  # vertex id in [0, nL+nR): right side offset by nL
            while True:
                key = w * ngrp + g
                c = cur[key]
                while c < cnt[key + 1] and used[inc[c]]:
                    c += 1
                cur[key] = c
                if c >= cnt[key + 1]:
                    break
                e = inc[c]
                used[e] = True
                if w < nL:
                    grp[e] = grp[e] * 2
                    w = nL + v[e]
                else:
                    grp[e] = grp[e] * 2 + 1
                    w = u[e]
    return grp.astype(np.int32)


def bipartite_color(u, v, nL, nR, deg):
    """Color a deg-regular bipartite multigraph with ``deg`` colors.

    deg must be a power of two; returns int32 colors in [0, deg).
    """
    u = np.ascontiguousarray(u, dtype=np.int64)
    v = np.ascontiguousarray(v, dtype=np.int64)
    try:
        from ..runtime import _lib
    except ImportError:
        _lib = None
    if _lib is not None and hasattr(_lib, "bipartite_color"):
        import ctypes

        _lib.bipartite_color.restype = None
        _lib.bipartite_color.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        out = np.empty(u.size, dtype=np.int32)
        _lib.bipartite_color(
            u.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            u.size,
            int(nL),
            int(nR),
            int(deg),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out
    return _bipartite_color_py(u, v, int(nL), int(nR), int(deg))


# ---------------------------------------------------------------------------
# device-side: lane take_along_axis (Pallas on TPU, XLA elsewhere)
# ---------------------------------------------------------------------------
def _on_tpu():
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=())
def _ta_xla(x2, idx8):
    return jnp.take_along_axis(x2, idx8.astype(jnp.int32), axis=1)


def _ta(x2, idx8):
    """out[r, j] = x2[r, idx8[r, j]] — lane gather, idx values < lane width."""
    if not _on_tpu():
        return jnp.take_along_axis(x2, idx8.astype(jnp.int32), axis=1)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(
            x_ref[:], i_ref[:].astype(jnp.int32), axis=1
        )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x2, idx8)


class RouterPlan:
    """Precomputed 5-stage routing of one static permutation.

    ``apply(x2)`` computes ``out.ravel()[p] == x2.ravel()[sigma[p]]`` for a
    fixed gather map ``sigma`` (a bijection on [G*16384)). Plan arrays are
    int8 device constants; apply is jit-safe and traces to 5 lane gathers
    + 6 transposes.
    """

    def __init__(self, G, i1, iS1, iGp, iS2, i3):
        self.G = int(G)
        # host copies (plan construction / numpy simulation) ...
        self.i1_np = np.asarray(i1, dtype=np.int8)
        self.iS1_np = np.asarray(iS1, dtype=np.int8)
        self.iGp_np = np.asarray(iGp, dtype=np.int8)
        self.iS2_np = np.asarray(iS2, dtype=np.int8)
        self.i3_np = np.asarray(i3, dtype=np.int8)
        self._dev = None

    @property
    def _device_arrays(self):
        """Device-resident int8 stage indices (uploaded once, outside any
        trace — caching a tracer-wrapped constant would leak it)."""
        if self._dev is None:
            import jax.core

            arrs = tuple(
                jnp.asarray(a)
                for a in (
                    self.i1_np,
                    self.iS1_np,
                    self.iGp_np,
                    self.iS2_np,
                    self.i3_np,
                )
            )
            if any(isinstance(a, jax.core.Tracer) for a in arrs):
                return arrs  # inside a trace: use, but do not cache
            self._dev = arrs
        return self._dev

    @property
    def i1(self):
        return self._device_arrays[0]

    @property
    def iS1(self):
        return self._device_arrays[1]

    @property
    def iGp(self):
        return self._device_arrays[2]

    @property
    def iS2(self):
        return self._device_arrays[3]

    @property
    def i3(self):
        return self._device_arrays[4]

    # -- construction --------------------------------------------------
    @staticmethod
    def build(sigma) -> "RouterPlan":
        sigma = np.ascontiguousarray(sigma, dtype=np.int64)
        n = sigma.size
        if n % (_S * _S) != 0:
            raise ValueError("sigma length must be a multiple of 16384")
        G = n // (_S * _S)
        if G > _S:
            raise ValueError(f"router supports up to {_S * _S * _S} elements")
        Y = G * _S

        dest = np.arange(n, dtype=np.int64)
        src = sigma
        ld, yd = dest % _S, dest // _S
        ls, ys = src % _S, src // _S

        # top level: route between rows; color = intermediate lane
        c = bipartite_color(ys, yd, Y, Y, _S).astype(np.int64)
        i1 = np.zeros((Y, _S), dtype=np.int8)
        i1[ys, c] = ls
        i3 = np.zeros((Y, _S), dtype=np.int8)
        i3[yd, ld] = c

        # second level: within each lane column c, route rows (g, s)
        gs, ss = ys // _S, ys % _S
        gd, sd = yd // _S, yd % _S
        c2 = bipartite_color(c * G + gs, c * G + gd, _S * G, _S * G, _S)
        c2 = c2.astype(np.int64)
        iS1 = np.zeros((Y, _S), dtype=np.int8)
        iS1[gs * _S + c, c2] = ss
        iS2 = np.zeros((Y, _S), dtype=np.int8)
        iS2[gd * _S + c, sd] = c2

        # G stage on (S*L, G) fibers (Mosaic dynamic-gather handles any
        # minor width; no lane packing needed)
        fib = c2 * _S + c  # fiber row in the (s, l) -> lanes=g layout
        iG = np.zeros((_S * _S, G), dtype=np.int8)
        iG[fib, gd] = gs.astype(np.int8)
        return RouterPlan(G, i1, iS1, iG, iS2, i3)

    def inverse(self) -> "RouterPlan":
        """Router for the inverse permutation, derived without coloring.

        The 5-stage schedule ``L-S-G-S-L`` is palindromic and every
        inter-stage transpose is an involution, so routing ``sigma^{-1}``
        is the same chain run with the per-row-inverted stage tables in
        reverse order (same derivation as
        :meth:`pyflwdir_tpu.ops.router_big.RouterPlanBig.inverse`).
        """

        def inv(t):
            t = np.asarray(t)
            out = np.zeros_like(t)
            r = np.arange(t.shape[0])[:, None]
            j = np.broadcast_to(np.arange(t.shape[1]), t.shape)
            out[r, t.astype(np.int64)] = j.astype(t.dtype)
            return out

        return RouterPlan(
            self.G,
            inv(self.i3_np),
            inv(self.iS2_np),
            inv(self.iGp_np),
            inv(self.iS1_np),
            inv(self.i1_np),
        )

    # -- execution ------------------------------------------------------
    @staticmethod
    def _chain(v, G, i1, iS1, iG, iS2, i3, ta):
        """The 5-stage routing chain in terms of a lane-gather ``ta``."""
        S = _S
        v = ta(v.reshape(G * S, S), i1)  # (g, s, l): lane perm
        v = v.reshape(G, S, S).transpose(0, 2, 1)
        v = ta(v.reshape(G * S, S), iS1)  # (g, l, s): s perm
        v = v.reshape(G, S, S).transpose(2, 1, 0)
        v = ta(v.reshape(S * S, G), iG)  # (s, l, g): g perm
        v = v.reshape(S, S, G).transpose(2, 1, 0)
        v = ta(v.reshape(G * S, S), iS2)  # (g, l, s): s perm
        v = v.reshape(G, S, S).transpose(0, 2, 1)
        return ta(v.reshape(G * S, S), i3)  # (g, s, l): lane perm

    def apply(self, x2):
        """Apply the permutation to ``x2`` of shape (G*128, 128).

        On TPU the whole 5-gather/4-transpose chain fuses into one Pallas
        kernel (one HBM round trip); elsewhere it runs as XLA ops.
        """
        G = self.G
        i1, iS1, iG, iS2, i3 = self._device_arrays
        if not _on_tpu():
            def ta(v, idx):
                return jnp.take_along_axis(v, idx.astype(jnp.int32), axis=1)

            return RouterPlan._chain(x2, G, i1, iS1, iG, iS2, i3, ta)

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kernel(x_ref, i1r, iS1r, iGr, iS2r, i3r, o_ref):
            def ta(v, idx):
                return jnp.take_along_axis(v, idx.astype(jnp.int32), axis=1)

            o_ref[:] = RouterPlan._chain(
                x_ref[:], G, i1r[:], iS1r[:], iGr[:], iS2r[:], i3r[:], ta
            )

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x2, i1, iS1, iG, iS2, i3)

    def apply_np(self, x):
        """NumPy simulation of :meth:`apply` (tests / reference)."""

        def ta(v, idx):
            return np.take_along_axis(v, np.asarray(idx, np.int64), axis=1)

        v = np.asarray(x)
        return RouterPlan._chain(
            v,
            self.G,
            self.i1_np,
            self.iS1_np,
            self.iGp_np,
            self.iS2_np,
            self.i3_np,
            ta,
        ).reshape(self.G * _S, _S)
