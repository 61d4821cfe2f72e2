#!/usr/bin/env python
"""Tracing and network-arithmetic walkthrough (script form of the
reference's examples/tracing.ipynb + parts of flwdir.ipynb):

    flow paths from seed points -> snap to the stream network ->
    up/downstream value fills -> windowed moving average along the main
    stem -> rendered map (examples/output/tracing.png)

Run: python examples/tracing.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

DATA = "/root/reference/examples"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")


def main():
    from PIL import Image

    import pyflwdir_tpu as pf

    os.makedirs(OUT, exist_ok=True)
    d8 = np.array(Image.open(os.path.join(DATA, "rhine_d8.tif")))
    transform = pf.Affine(1 / 120.0, 0.0, 5.5, 0.0, -1 / 120.0, 52.0)
    flw = pf.from_array(d8, ftype="d8", transform=transform, latlon=True)
    uparea = flw.upstream_area(unit="km2")
    strahler = flw.stream_order(type="strahler")

    # 1. trace flow paths downstream from a few headwater seeds
    xy = ([8.92, 8.2, 7.3], [50.28, 49.1, 47.4])
    paths, dists = flw.path(xy=xy, unit="m")
    print(f"  {len(paths)} flow paths, lengths "
          f"{[round(d / 1e3, 1) for d in dists]} km")

    # 2. snap the same seeds to the stream network (strahler >= 7)
    idxs_snap, snap_dist = flw.snap(xy=xy, mask=strahler >= 7, unit="m")
    print(f"  snapped to order>=7 streams within "
          f"{[round(d / 1e3, 1) for d in np.atleast_1d(snap_dist)]} km")

    # 3. downstream fill: propagate basin-outlet ids upstream, then carry
    # uparea values downstream of the snapped points
    basins = flw.basins()
    stream_mask = strahler >= 5
    smoothed = flw.moving_average(uparea, n=5, restrict_strord=True,
                                  strord=strahler)
    print(f"  main-stem moving average computed "
          f"(max {np.nanmax(np.asarray(smoothed)):,.0f} km2)")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 8), constrained_layout=True)
    bg = np.where(np.asarray(stream_mask), np.asarray(strahler, float), np.nan)
    ax.imshow(np.asarray(basins) % 7, cmap="Pastel2", alpha=0.6)
    ax.imshow(bg, cmap="Blues", vmin=0, vmax=10)
    for p in paths:
        rr, cc = np.unravel_index(np.asarray(p), d8.shape)
        ax.plot(cc, rr, "r-", lw=1.2)
    rr, cc = np.unravel_index(np.asarray(idxs_snap), d8.shape)
    ax.plot(cc, rr, "k*", ms=10)
    ax.set_title("flow paths (red), snapped outlets (*), streams, basins")
    ax.axis("off")
    fig.savefig(os.path.join(OUT, "tracing.png"), dpi=120)
    print(f"wrote {os.path.join(OUT, 'tracing.png')}")


if __name__ == "__main__":
    main()
