"""Conversion between D8 and LDD flow-direction codes.

LUT-based equivalent of the reference's dict-remap
``/root/reference/pyflwdir/core_conversion.py:11-28`` — a single 256-entry
table gather instead of a per-cell ``np.vectorize`` dict lookup.
"""

from __future__ import annotations

import numpy as np

from . import d8 as core_d8
from . import ldd as core_ldd

__all__ = ["d8_to_ldd", "ldd_to_d8"]

# build 256-entry remap tables; unknown codes map to nodata
_D8_TO_LDD = np.full(256, core_ldd._mv, dtype=np.uint8)
for _k, _v in zip(core_d8._ds.ravel(), core_ldd._ds.ravel()):
    _D8_TO_LDD[_k] = _v
_D8_TO_LDD[core_d8._pv[1]] = core_ldd._pv  # 255 (land pit) -> 5
_D8_TO_LDD[core_d8._mv] = core_ldd._mv

_LDD_TO_D8 = np.full(256, core_d8._mv, dtype=np.uint8)
for _k, _v in zip(core_ldd._ds.ravel(), core_d8._ds.ravel()):
    _LDD_TO_D8[_k] = _v
_LDD_TO_D8[core_ldd._pv] = core_d8._pv[0]  # 5 -> 0
_LDD_TO_D8[core_ldd._mv] = core_d8._mv


def d8_to_ldd(flwdir):
    """Return ldd based on d8 array. Parity: core_conversion.py:11-18."""
    return _D8_TO_LDD[np.asarray(flwdir, dtype=np.uint8)]


def ldd_to_d8(flwdir):
    """Return d8 based on ldd array. Parity: core_conversion.py:21-28."""
    return _LDD_TO_D8[np.asarray(flwdir, dtype=np.uint8)]
