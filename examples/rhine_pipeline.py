#!/usr/bin/env python
"""End-to-end Rhine walkthrough (script form of the reference's
examples/flwdir.ipynb + from_dem.ipynb):

    DEM -> depression filling -> flow directions -> upstream area ->
    basins / Pfafstetter subbasins -> Strahler order -> HAND /
    floodplains -> IHU upscaling -> stream vectorization (GeoJSON)

Inputs are the reference repo's demo rasters (read with PIL — no
rasterio dependency); outputs land in examples/output/. Every step runs
through the public pyflwdir_tpu API on whatever JAX backend is active
(TPU when available).

Run: python examples/rhine_pipeline.py [--quick]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

DATA = "/root/reference/examples"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "output")


def log(step, t0):
    print(f"  {step:<42s} {time.time() - t0:6.2f}s", flush=True)


def main():
    from PIL import Image

    import pyflwdir_tpu as pf

    os.makedirs(OUT, exist_ok=True)
    quick = "--quick" in sys.argv

    # 1. elevation + flow directions. from_dem fills depressions (native
    # Wang & Liu priority flood) and derives D8 (reference from_dem.ipynb)
    t0 = time.time()
    elevtn = np.array(Image.open(os.path.join(DATA, "rhine_elv0.tif")))
    transform = pf.Affine(1 / 120.0, 0.0, 5.5, 0.0, -1 / 120.0, 52.0)
    flw_dem = pf.from_dem(elevtn, nodata=-9999.0, transform=transform, latlon=True)
    log("from_dem (fill + D8 derivation)", t0)

    # ... or parse the published D8 raster directly
    t0 = time.time()
    d8 = np.array(Image.open(os.path.join(DATA, "rhine_d8.tif")))
    flw = pf.from_array(d8, ftype="d8", transform=transform, latlon=True)
    log("from_array (D8 parse)", t0)

    # 2. upstream area (km2; latlon-aware cell areas) — the north-star
    # kernel: router-plan accumulation on device
    t0 = time.time()
    uparea = flw.upstream_area(unit="km2")
    log("upstream_area", t0)

    # 3. basins + Pfafstetter subbasins
    t0 = time.time()
    basins = flw.basins()
    pfaf, _ = flw.subbasins_pfafstetter(depth=2)
    log("basins + pfafstetter", t0)

    # 4. stream orders
    t0 = time.time()
    strahler = flw.stream_order(type="strahler")
    log("strahler order", t0)

    # 5. HAND + floodplains off the filled DEM
    t0 = time.time()
    elv_fill = np.asarray(flw_dem._elevtn) if hasattr(flw_dem, "_elevtn") else elevtn
    hand = flw.hand(drain=uparea > 100.0, elevtn=elv_fill)
    fldpln = flw.floodplains(elevtn=elv_fill, uparea=uparea, upa_min=100.0)
    log("HAND + floodplains", t0)

    # 6. IHU upscaling x10 (30" -> 5') with validity check
    t0 = time.time()
    flw_lr, idxs_out = flw.upscale(10, method="ihu")
    err = flw.upscale_error(flw_lr, idxs_out)
    bad = int((np.asarray(err) == 0).sum())
    log(f"IHU upscale x10 ({bad} disconnected cells)", t0)

    # 7. vectorize the stream network (strahler >= 6) to GeoJSON
    t0 = time.time()
    feats = flw.streams(mask=strahler >= (4 if quick else 6), strord=strahler)
    with open(os.path.join(OUT, "rhine_streams.geojson"), "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f, default=float)
    log(f"vectorize ({len(feats)} stream segments)", t0)

    # save the gridded outputs
    np.savez_compressed(
        os.path.join(OUT, "rhine_outputs.npz"),
        uparea=np.asarray(uparea, dtype=np.float32),
        basins=np.asarray(basins, dtype=np.uint32),
        pfafstetter=np.asarray(pfaf, dtype=np.int32),
        strahler=np.asarray(strahler, dtype=np.uint8),
        hand=np.asarray(hand, dtype=np.float32),
        floodplains=np.asarray(fldpln, dtype=np.int8),
    )
    print(f"outputs written to {OUT}")

    # sanity: mass conservation of the accumulation
    cell_acc = flw.upstream_area(unit="cell")
    assert cell_acc.max() <= flw.nnodes
    print(f"largest catchment: {uparea.max():,.0f} km2 "
          f"({int(cell_acc.max())} cells of {flw.nnodes})")


if __name__ == "__main__":
    main()
