"""Rhine end-to-end walkthrough — generates the figures for docs/rhine.md.

Mirrors the reference's flwdir notebook (reference docs/flwdir.ipynb):
parse the D8 raster, derive upstream area / stream order / basins /
stream distance / HAND, and render each as a map figure committed under
docs/img/. Every derived layer here runs through the TPU-native kernels
(fused router accumulation, downward-transpose sweeps) behind the same
object API the reference exposes.

Run: ``python examples/rhine_walkthrough.py`` (figures land in docs/img).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib import colors

import pyflwdir_tpu

IMG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs",
    "img",
)
REF = "/root/reference/examples"


def load():
    from PIL import Image

    d8 = np.array(Image.open(os.path.join(REF, "rhine_d8.tif")))
    elv = np.array(Image.open(os.path.join(REF, "rhine_elv0.tif")))
    return d8, elv


def fig(name, data, cmap, label, norm=None, categorical=False):
    f, ax = plt.subplots(figsize=(7, 5), dpi=110)
    masked = np.ma.masked_less_equal(data, -9999) if not categorical else (
        np.ma.masked_equal(data, 0)
    )
    im = ax.imshow(masked, cmap=cmap, norm=norm, interpolation="nearest")
    if not categorical:
        cb = f.colorbar(im, ax=ax, shrink=0.85)
        cb.set_label(label)
    ax.set_title(label)
    ax.set_xticks([])
    ax.set_yticks([])
    for s in ax.spines.values():
        s.set_visible(False)
    f.tight_layout()
    out = os.path.join(IMG, name)
    f.savefig(out)
    plt.close(f)
    print(f"wrote {out}")


def main():
    os.makedirs(IMG, exist_ok=True)
    d8, elv = load()
    flw = pyflwdir_tpu.from_array(d8, ftype="d8")

    # upstream area (log-scaled sequential: one hue, light -> dark)
    upa = flw.upstream_area("cell").astype(np.float64)
    fig(
        "rhine_uparea.png",
        np.where(upa > 0, upa, np.nan),
        "Blues",
        "upstream area (cells)",
        norm=colors.LogNorm(vmin=1, vmax=np.nanmax(upa)),
    )

    # Strahler stream order (ordinal magnitude: sequential single hue)
    sto = flw.stream_order().astype(np.int32)
    sto_m = np.where(upa.reshape(sto.shape) >= 100, sto, 0)
    fig(
        "rhine_strahler.png",
        np.ma.masked_equal(sto_m, 0),
        plt.get_cmap("PuBu", int(sto.max())),
        "Strahler order (cells with >=100 upstream)",
        categorical=False,
    )

    # subbasins split at stream-order changes (the Rhine raster is one
    # basin; the subdivision is what the reference notebook shows).
    # Segmentation labels: hashed into 20 distinct colors — identity of
    # *adjacent* patches only, not a series palette.
    sub, _ = flw.subbasins_streamorder(min_sto=7)
    sub = np.asarray(sub).astype(np.int64)
    rng = np.random.RandomState(5)
    perm = rng.permutation(997)
    lab = np.where(sub > 0, perm[sub % 997] % 20, -1).astype(float)
    fig(
        "rhine_basins.png",
        np.ma.masked_less(lab, 0),
        plt.get_cmap("tab20", 20),
        "subbasins at stream-order >= 7 confluences",
        categorical=True,
    )

    # stream distance (sequential, one hue)
    dist = flw.stream_distance(unit="cell").astype(np.float64)
    fig(
        "rhine_distance.png",
        np.where(dist >= 0, dist, np.nan),
        "Greens",
        "distance to outlet (cells)",
    )

    # HAND (height above nearest drain; sequential one hue, clipped)
    drain = upa.reshape(d8.shape) >= 1000
    hand = flw.hand(drain, elv)
    fig(
        "rhine_hand.png",
        np.clip(np.where(hand >= 0, hand, np.nan), 0, 150),
        "Oranges",
        "height above nearest drain (m, clipped at 150)",
    )

    # upscaled (IHU) network at 20x for the subgrid story
    flw_up, idxs_out = flw.upscale(20, method="ihu")
    upa20 = flw_up.upstream_area("cell").astype(np.float64)
    fig(
        "rhine_ihu20.png",
        np.where(upa20 > 0, upa20, np.nan),
        "Blues",
        "IHU-upscaled (20x) upstream area (cells)",
        norm=colors.LogNorm(vmin=1, vmax=np.nanmax(upa20)),
    )
    print("all figures written")


if __name__ == "__main__":
    main()
