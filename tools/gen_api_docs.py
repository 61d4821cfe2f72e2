#!/usr/bin/env python
"""Generate docs/api.md from the package docstrings.

Walks the public surface (``pyflwdir_tpu.__all__``, the Flwdir /
FlwdirRaster classes, and the algorithm modules) and emits one markdown
reference page with signatures and docstrings. Run from the repo root:

    python tools/gen_api_docs.py
"""

import inspect
import os
import sys
import textwrap

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

MODULES = [
    "streams",
    "basins",
    "dem",
    "upscale",
    "subgrid",
    "arithmetics",
    "rivers",
    "regions",
    "gridtools",
    "checkpoint",
    "parallel",
]


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def _doc(obj, indent=""):
    doc = inspect.getdoc(obj)
    if not doc:
        return ""
    return textwrap.indent(doc, indent)


def _emit_callable(out, name, obj, level="###"):
    out.append(f"{level} `{name}{_sig(obj)}`\n")
    d = _doc(obj)
    if d:
        out.append(d + "\n")


def _emit_class(out, cls):
    out.append(f"## class `{cls.__name__}`\n")
    d = _doc(cls)
    if d:
        out.append(d + "\n")
    members = []
    for name, obj in sorted(vars(cls).items()):
        if name.startswith("_"):
            continue
        if isinstance(obj, property):
            members.append((name, obj.fget, True))
        elif callable(obj):
            members.append((name, obj, False))
    for name, obj, is_prop in members:
        tag = " *(property)*" if is_prop else ""
        out.append(f"### `{cls.__name__}.{name}{'' if is_prop else _sig(obj)}`{tag}\n")
        d = _doc(obj)
        if d:
            out.append(d + "\n")


def main():
    import pyflwdir_tpu as pf

    out = [
        "# pyflwdir_tpu API reference\n",
        "*Generated from docstrings by `tools/gen_api_docs.py` — do not "
        "edit by hand.*\n",
        _doc(pf) + "\n",
        "# Top-level functions\n",
    ]
    for name in [
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
    ]:
        _emit_callable(out, name, getattr(pf, name), level="##")

    _emit_class(out, pf.Flwdir)
    _emit_class(out, pf.FlwdirRaster)

    for modname in MODULES:
        mod = getattr(pf, modname)
        out.append(f"# module `pyflwdir_tpu.{modname}`\n")
        d = _doc(mod)
        if d:
            out.append(d + "\n")
        names = getattr(mod, "__all__", None) or [
            n for n in sorted(vars(mod)) if not n.startswith("_")
        ]
        for name in names:
            obj = getattr(mod, name, None)
            if inspect.isclass(obj):
                _emit_class(out, obj)
            elif callable(obj):
                _emit_callable(out, f"{modname}.{name}", obj)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "docs", "api.md"
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {os.path.abspath(path)} ({len(out)} sections)")


if __name__ == "__main__":
    main()
