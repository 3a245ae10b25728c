"""Mosaic-family throughput at SRTM-1 native grain: a 2x2 mosaic of
3601^2 tiles through the cross-tile ops, against the per-tile ops on
the same four tiles — measuring what the halo/border machinery costs
on top of the kernels it wraps (the scale claim to evidence: strips,
border rows and the solve are perimeter-sized, so the mosaic closure
should cost ~the per-tile op plus one extra pass where the algorithm
needs one).

Usage: python tools/mosaic_bench.py [--cores N] [--size S] [--runs R]
Writes BENCH/mosaic_srtm1.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def build_rows(size: int, nx: int = 2, ny: int = 2):
    from hgt2osm2_spark.kernels import codecs
    from hgt2osm2_spark.ops.mosaic import tile_id
    from hgt2osm2_spark.sources import synthetic

    g = synthetic.mosaic_heightfield(nx, ny, size, seed=7)
    rows = []
    lat0, lon0 = 47, 8
    for r in range(ny):
        for c in range(nx):
            tile = g[r * (size - 1): r * (size - 1) + size,
                     c * (size - 1): c * (size - 1) + size]
            img = tile_id(lat0 + (ny - 1 - r), lon0 + c, "0")
            rows.append({
                "image_id": img, "bytes": codecs.encode(tile, "hgt"),
                "w": size, "h": size, "fmt": "hgt",
                "caption": f"bench {img}", "phash": 0,
            })
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--size", type=int, default=3601)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--min-acc", type=int, default=500)
    args = ap.parse_args()

    import pandas as pd

    from hgt2osm2_spark.ops import mosaic, terrain
    from hgt2osm2_spark.session import get_spark
    from hgt2osm2_spark.sources import synthetic

    spark = get_spark("mosaic_bench", cores=args.cores,
                      shuffle_partitions=args.cores * 2)
    rows = build_rows(args.size)
    tiles = spark.createDataFrame(pd.DataFrame(rows), synthetic.TILES_SCHEMA)
    tiles = tiles.repartition(4, "image_id").cache()
    tiles.count()

    jobs = {
        # (mosaic op, per-tile counterpart) pairs
        "flow_acc": (
            lambda: mosaic.mosaic_flow_accumulation(tiles).count(),
            lambda: terrain.flow_accumulation(tiles).count(),
        ),
        "terrain": (
            lambda: mosaic.mosaic_terrain_cells(tiles).count(),
            lambda: terrain.morphometry_cells(tiles).count(),
        ),
        "hillshade": (
            lambda: mosaic.mosaic_hillshade_cells(tiles).count(),
            lambda: terrain.hillshade_cells(tiles).count(),
        ),
        "flow_length": (
            lambda: mosaic.mosaic_flow_length(tiles).count(),
            lambda: terrain.flow_path_length(tiles).count(),
        ),
        "stream_order": (
            lambda: mosaic.mosaic_stream_order(tiles, args.min_acc).count(),
            lambda: terrain.stream_order(tiles, args.min_acc).count(),
        ),
    }

    def best_of(fn):
        ts = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            n = fn()
            ts.append(time.monotonic() - t0)
        return round(min(ts), 3), ts, n

    out = {"size": args.size, "tiles": 4, "cores": args.cores,
           "runs": args.runs, "min_acc": args.min_acc, "jobs": {}}
    for name, (mfn, pfn) in jobs.items():
        mt, mts, mn = best_of(mfn)
        pt, pts, pn = best_of(pfn)
        out["jobs"][name] = {
            "mosaic_s": mt, "mosaic_samples": [round(t, 3) for t in mts],
            "per_tile_s": pt, "per_tile_samples": [round(t, 3) for t in pts],
            "overhead_x": round(mt / pt, 3) if pt else None,
            "mosaic_rows": mn, "per_tile_rows": pn,
        }
        print(f"{name}: mosaic {mt}s vs per-tile {pt}s "
              f"({out['jobs'][name]['overhead_x']}x), "
              f"rows {mn} vs {pn}", flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "mosaic_srtm1.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
