#!/usr/bin/env python
"""Out-of-core flow-accumulation pipeline (BASELINE config-5 skeleton).

Streams a tiled directory checkpoint (pyflwdir_tpu.checkpoint format)
through the hierarchical tile plan without ever materializing the full
grid in host RAM as ordinary arrays:

1. **band parse** — the D8 ``codes`` raster is read tile-band by
   tile-band (one row of checkpoint tiles + a 1-row halo) and decoded to
   global downstream indices with the native LUT parser; the int64
   pointer array is written to a disk-backed ``np.memmap``.
2. **plan build** — ``build_tile_plan`` consumes the memmap directly:
   the native per-tile DFS streams through it with OS paging, so the
   pointer raster never needs to be resident at once. (The plan's int8
   tables do live in RAM — ~15 B/cell; for grids beyond RAM they shard
   over hosts with ``parallel.build_sharded_plan`` + ``tile_slice``.)
3. **accumulate** — unit weights are generated on device (no host data
   array); arbitrary companion rasters can stream the same way.
4. **band write-back** — the result is fetched band by band from the
   device and written straight back as checkpoint tiles.

Run as a script for a 16384^2 (268M cell) demonstration against the
bench's cached synthetic D8:

    python tools/pipeline_oob.py [--side 16384]

and it reports wall time per phase plus the peak host RSS.
"""

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def band_parse_to_memmap(ckpt_dir, name, meta, scratch):
    """Stream-parse the tiled D8 raster to a global int64 pointer memmap."""
    from pyflwdir_tpu.checkpoint import load_raster
    from pyflwdir_tpu.runtime import flw_from_array_lut
    from pyflwdir_tpu.codecs import d8 as d8c

    H, W = meta["shape"]
    tr, tc = meta["tile"]
    nr = -(-H // tr)
    ids = np.lib.format.open_memmap(
        os.path.join(scratch, "idxs_ds.npy"),
        mode="w+",
        dtype=np.int64,
        shape=(H * W,),
    )
    n_valid = 0
    for ri in range(nr):
        r0, r1 = ri * tr, min((ri + 1) * tr, H)
        h0 = max(r0 - 1, 0)
        h1 = min(r1 + 1, H)
        # assemble the band + halo rows from this and neighbor tile rows
        rows = [load_raster(ckpt_dir, name, meta, tile_slice=(ri, ri + 1, 0, -(-W // tc)))]
        band = rows[0]
        if h0 < r0:
            prev = load_raster(
                ckpt_dir, name, meta, tile_slice=(ri - 1, ri, 0, -(-W // tc))
            )[-1:]
            band = np.concatenate([prev, band], axis=0)
        if h1 > r1:
            nxt = load_raster(
                ckpt_dir, name, meta, tile_slice=(ri + 1, ri + 2, 0, -(-W // tc))
            )[:1]
            band = np.concatenate([band, nxt], axis=0)
        bids, _, _ = flw_from_array_lut(band, d8c._DR_LUT, d8c._DC_LUT, d8c._mv)
        bids = bids.reshape(band.shape)
        lo = r0 - h0  # interior offset within the band
        inner = bids[lo : lo + (r1 - r0)].astype(np.int64)
        off = np.int64(h0) * W
        inner = np.where(inner >= 0, inner + off, -1)
        # halo-edge artifacts: interior cells flagged pit by the band
        # parser because their target row was the band edge are re-decoded
        # (only possible in the first/last interior row, where the true
        # halo row was present — so the parse is already exact)
        ids[r0 * W : r1 * W] = inner.ravel()
        n_valid += int((inner >= 0).sum())
    ids.flush()
    return ids, n_valid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=16384)
    ap.add_argument("--ckpt", default=None, help="existing checkpoint dir")
    ap.add_argument("--out", default="/tmp/oob_out")
    ap.add_argument("--scratch", default="/tmp/oob_scratch")
    ap.add_argument(
        "--hbm-table-gb",
        type=float,
        default=9.0,
        help="switch to banded accumulate above this plan-table size",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pyflwdir_tpu.checkpoint import save_raster
    from pyflwdir_tpu.ops.tile_plan import build_tile_plan

    os.makedirs(args.scratch, exist_ok=True)
    os.makedirs(args.out, exist_ok=True)

    if args.ckpt is None:
        # build a demo checkpoint from the bench's cached synthetic D8
        cache = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "pyflwdir_tpu", "bench", f"d8_{args.side}.npy",
        )
        if not os.path.exists(cache):
            raise SystemExit(f"no cached D8 at {cache}; run bench.py first")
        args.ckpt = os.path.join(args.scratch, "ckpt")
        if not os.path.exists(os.path.join(args.ckpt, "manifest.json")):
            d8 = np.load(cache, mmap_mode="r")
            os.makedirs(args.ckpt, exist_ok=True)
            meta = save_raster(args.ckpt, "codes", d8, tile=(4096, 4096))
            json.dump(
                {"rasters": {"codes": meta}},
                open(os.path.join(args.ckpt, "manifest.json"), "w"),
            )
    manifest = json.load(open(os.path.join(args.ckpt, "manifest.json")))
    meta = manifest["rasters"]["codes"]
    H, W = meta["shape"]
    print(f"[oob] grid {H}x{W} ({H * W / 1e6:.0f}M cells)", flush=True)

    t0 = time.time()
    ids, n_valid = band_parse_to_memmap(args.ckpt, "codes", meta, args.scratch)
    print(
        f"[oob] band parse {time.time() - t0:.1f}s rss={_rss_gb():.1f}GB",
        flush=True,
    )

    t0 = time.time()
    tp = build_tile_plan(ids, (H, W), tile_rows=128)
    print(
        f"[oob] plan build {time.time() - t0:.1f}s rss={_rss_gb():.1f}GB",
        flush=True,
    )

    tab_gb = sum(v.nbytes for v in tp._tabs_np.values()) / 1e9
    tr, tc = meta["tile"]
    os.makedirs(os.path.join(args.out, "uparea"), exist_ok=True)
    if tab_gb > args.hbm_table_gb:
        # >=1G-cell grids: the plan's device tables exceed HBM — stream
        # bands of tile-rows (per-band table slabs; one coarse solve; the
        # fetch of band k overlaps band k+1's upload+compute) and write
        # each fetched band straight to checkpoint tiles
        print(
            f"[oob] tables {tab_gb:.1f}GB > {args.hbm_table_gb}GB: banded"
            " accumulate + overlapped write-back",
            flush=True,
        )
        nty = tp.grid[0]
        band_ty = max(
            1, int(args.hbm_table_gb / 4 / (tab_gb / nty))
        )  # ~1/4 budget per band slab
        stats = {"pit_sum": 0}
        t0 = time.time()

        def write_band(b, r0, band):
            bids = ids[r0 * W : (r0 + band.shape[0]) * W]
            ar = np.arange(r0 * W, r0 * W + bids.size, dtype=np.int64)
            stats["pit_sum"] += int(band.ravel()[(bids == ar)].sum())
            for ci in range(-(-W // tc)):
                np.save(
                    os.path.join(args.out, "uparea", f"r{r0}_c{ci}.npy"),
                    band[:, ci * tc : (ci + 1) * tc],
                )

        tp.accumulate_banded(None, band_tile_rows=band_ty, out_cb=write_band)
        print(
            f"[oob] banded accumulate+write-back {time.time() - t0:.1f}s"
            f" (bands of {band_ty} tile-rows) rss={_rss_gb():.1f}GB",
            flush=True,
        )
        pit_sum = stats["pit_sum"]
    else:
        t0 = time.time()
        arrs = tp.arrays()
        data = jnp.ones(H * W, jnp.int32)  # generated on device
        out = jax.jit(lambda x, a: tp.accumulate(x, a))(data, arrs)
        out.block_until_ready()
        print(
            f"[oob] accumulate {time.time() - t0:.1f}s rss={_rss_gb():.1f}GB",
            flush=True,
        )

        # band write-back: fetch + save one tile row at a time
        t0 = time.time()
        out2 = out.reshape(H, W)
        pit_sum = 0
        for ri in range(-(-H // tr)):
            band = np.asarray(out2[ri * tr : (ri + 1) * tr])
            bids = ids[ri * tr * W : min((ri + 1) * tr, H) * W]
            ar = np.arange(ri * tr * W, ri * tr * W + bids.size, dtype=np.int64)
            pit_sum += int(band.ravel()[(bids == ar)].sum())
            for ci in range(-(-W // tc)):
                np.save(
                    os.path.join(args.out, "uparea", f"r{ri}_c{ci}.npy"),
                    band[:, ci * tc : (ci + 1) * tc],
                )
        print(
            f"[oob] write-back {time.time() - t0:.1f}s rss={_rss_gb():.1f}GB",
            flush=True,
        )
    assert pit_sum == n_valid, f"conservation: {pit_sum} != {n_valid}"
    print(f"[oob] conservation OK (pit sum == {n_valid})", flush=True)


if __name__ == "__main__":
    main()
