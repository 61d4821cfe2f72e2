#!/usr/bin/env python
"""Flow-direction upscaling walkthrough (script form of the reference's
examples/upscaling.ipynb):

    parse Rhine D8 at 30" -> IHU upscale x10 and x20 -> upscale error
    cells -> subgrid (unit-catchment) river length & slope -> rendered
    comparison maps (examples/output/upscaling.png)

Methods: 'ihu' (Iterative Hydrography Upscaling, the reference's
flagship; Eilander et al. 2021), 'eam_plus', 'eam', 'dmm' — all through
the public FlwdirRaster.upscale API.

Run: python examples/upscaling.py
"""

import os
import sys
import time

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

    results = {}
    for method in ["ihu", "eam_plus", "dmm"]:
        t0 = time.time()
        flw_lr, idxs_out = flw.upscale(10, method=method, uparea=uparea)
        err = flw.upscale_error(flw_lr, idxs_out)
        n_bad = int((np.asarray(err) == 0).sum())
        results[method] = (flw_lr, idxs_out, n_bad)
        print(f"  {method:<9s} x10: {n_bad:4d} disconnected cells "
              f"({time.time() - t0:5.1f}s)")

    # subgrid river statistics on the IHU grid: per unit catchment the
    # channel length and slope sampled from the high-res network
    flw_lr, idxs_out, _ = results["ihu"]
    t0 = time.time()
    rivlen = flw.subgrid_rivlen(idxs_out, direction="down")
    elv = np.array(Image.open(os.path.join(DATA, "rhine_elv0.tif")))
    rivslp = flw.subgrid_rivslp(idxs_out, elv, length=1000)
    print(f"  subgrid rivlen/rivslp on x10 grid ({time.time() - t0:5.1f}s)")

    uparea_lr = flw_lr.upstream_area(unit="km2")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 5), constrained_layout=True)
    for ax, (title, grid) in zip(
        axes,
        [
            ("30\" upstream area [km2]", np.asarray(uparea)),
            ("5' IHU upstream area [km2]", np.asarray(uparea_lr)),
            ("5' subgrid river length [m]", np.asarray(rivlen)),
        ],
    ):
        g = np.where(grid > 0, grid, np.nan)
        im = ax.imshow(np.log10(np.maximum(g, 1e-6)), cmap="viridis")
        ax.set_title(title)
        ax.axis("off")
        fig.colorbar(im, ax=ax, shrink=0.7)
    fig.savefig(os.path.join(OUT, "upscaling.png"), dpi=120)
    print(f"wrote {os.path.join(OUT, 'upscaling.png')}")

    np.savez_compressed(
        os.path.join(OUT, "upscaling_outputs.npz"),
        uparea_lr=np.asarray(uparea_lr, np.float32),
        rivlen=np.asarray(rivlen, np.float32),
        rivslp=np.asarray(rivslp, np.float32),
    )


if __name__ == "__main__":
    main()
