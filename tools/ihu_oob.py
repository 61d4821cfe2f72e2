#!/usr/bin/env python
"""Out-of-core IHU upscaling at continental scale (BASELINE config 4).

Consumes the artifacts of ``tools/pipeline_oob.py`` (the band-parsed
downstream-pointer memmap and the tiled ``uparea`` output) and runs the
banded IHU (``pyflwdir_tpu.upscale.ihu_tiled``) on the 16384^2 (268M
pixel) synthetic mosaic: 3"-style pixels to a cellsize-x upscale with
bounded resident memory — the highres rasters stay disk-backed memmaps,
only one lowres-row band (+halo) is materialized at a time, and the
repair rounds touch the memmaps with paged random access.

    python tools/pipeline_oob.py            # once: pointers + uparea
    python tools/ihu_oob.py [--cellsize 20]
"""

import argparse
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=16384)
    ap.add_argument("--cellsize", type=int, default=20)
    ap.add_argument("--scratch", default="/tmp/oob_scratch")
    ap.add_argument("--uparea", default="/tmp/oob_out/uparea")
    ap.add_argument("--band-rows", type=int, default=32)
    args = ap.parse_args()

    from pyflwdir_tpu import upscale

    side = args.side
    ids_path = os.path.join(args.scratch, "idxs_ds.npy")
    if not os.path.exists(ids_path):
        raise SystemExit("run tools/pipeline_oob.py first (pointer memmap)")
    ids = np.load(ids_path, mmap_mode="r")

    # uparea tiles -> one float64 memmap (band-wise copy, bounded RAM)
    upa_path = os.path.join(args.scratch, "uparea_f64.npy")
    if not os.path.exists(upa_path):
        upa = np.lib.format.open_memmap(
            upa_path, mode="w+", dtype=np.float64, shape=(side * side,)
        )
        tiles = sorted(os.listdir(args.uparea))
        t0 = time.time()
        for f in tiles:
            ri, ci = (int(x[1:]) for x in f[:-4].split("_"))
            t = np.load(os.path.join(args.uparea, f))
            tr, tc = t.shape
            r0, c0 = ri * 4096, ci * 4096
            for rr in range(tr):
                row0 = (r0 + rr) * side + c0
                upa[row0 : row0 + tc] = t[rr]
        upa.flush()
        print(f"[ihu-oob] uparea memmap built {time.time() - t0:.1f}s", flush=True)
    upa = np.load(upa_path, mmap_mode="r")

    t0 = time.time()
    idxs_ds1, idxs_out, shape1 = upscale.ihu_tiled(
        ids, upa, (side, side), args.cellsize, band_rows=args.band_rows
    )
    t = time.time() - t0
    print(
        f"[ihu-oob] ihu {side}^2 -> {shape1} in {t:.1f}s "
        f"rss={_rss_gb():.1f}GB",
        flush=True,
    )
    connect_map, idxs_fix = upscale.upscale_error(idxs_out, idxs_ds1, ids)
    n_cells = int((idxs_ds1 >= 0).sum())
    print(
        f"[ihu-oob] {n_cells} lowres cells, {idxs_fix.size} disconnected "
        f"({idxs_fix.size / max(n_cells, 1) * 100:.3f}%) rss={_rss_gb():.1f}GB",
        flush=True,
    )


if __name__ == "__main__":
    main()
