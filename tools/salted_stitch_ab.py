"""Salted-vs-plain stitch A/B on a deliberately skewed workload.

The latency-tail scenario VERDICT r5 #6 describes: FEWER hot
(tile, level) groups than cores. Two 1201^2 tiles whose left half is a
checkerboard around one elevation level put ~all segments of each tile
into ONE stitch group; plain stitch_polylines serializes each group in
one task while salted_stitch_polylines spreads it over row bands.
Records wall for both (warmup + best-of-2) plus the hot-group segment
histogram into BENCH/SALTED_STITCH_AB.md.

Usage: python tools/salted_stitch_ab.py  (~3 min; nothing else running)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("AB_TILE_SIZE", "1201"))
CORES = int(os.environ.get("AB_CORES", "8"))
N_TILES = int(os.environ.get("AB_TILES", "2"))


def skewed_rows():
    from hgt2osm2_spark.kernels import codecs

    rows = []
    for t in range(N_TILES):
        yy, xx = np.mgrid[0:N, 0:N]
        grid = np.zeros((N, N), np.float64)
        left = xx < N // 2
        grid[left] = 100.0 + 4.0 * (((xx + yy) % 2)[left] * 2 - 1)
        grid[~left] = 5.0 + 55.0 * (yy[~left] / (N - 1))
        g16 = np.rint(grid).astype(np.int16)
        rows.append({
            "image_id": f"n{40 + t:02d}e000_0", "bytes": codecs.encode(g16, "hgt"),
            "w": N, "h": N, "fmt": "hgt",
            "caption": f"skewed {t}", "phash": 0,
        })
    return rows


def best_of(fn, reps=2):
    samples = []
    for _ in range(reps + 1):
        t0 = time.time()
        fn()
        samples.append(round(time.time() - t0, 3))
    return min(samples[1:]), samples


def main() -> None:
    from pyspark.sql import functions as F

    from hgt2osm2_spark.ops import contours
    from hgt2osm2_spark.session import get_spark

    spark = get_spark("salted-ab", cores=CORES, shuffle_partitions=CORES * 2)
    seg = contours.extract_contour_segments(
        spark.createDataFrame(skewed_rows()).repartition(N_TILES)
    ).cache()
    hist = (seg.groupBy("image_id", "level").count()
            .orderBy(F.desc("count")).limit(4).collect())
    total = seg.count()  # materializes the cache outside the timed window

    plain_sec, plain_samples = best_of(
        lambda: contours.stitch_polylines(seg, CORES * 2).count())
    band_h = max((N - 1) // (2 * CORES), 64)
    salted_sec, salted_samples = best_of(
        lambda: contours.salted_stitch_polylines(seg, band_h, CORES * 2).count())
    # decomposition (r7): the bare grouping-shuffle floor both variants
    # share, measured as the same exchange with a trivial agg
    shuffle_sec, _sh = best_of(
        lambda: seg.withColumn("band", (F.col("row_y") / band_h).cast("int"))
        .groupBy("image_id", "level", "band").count().count())

    rec = {
        "metric": "salted_vs_plain_stitch_wall_sec",
        "tile_size": N, "n_tiles": N_TILES, "cores": CORES,
        "total_segments": total,
        "hot_groups": [
            {"image_id": r["image_id"], "level": r["level"], "n": r["count"]}
            for r in hist
        ],
        "plain_sec": plain_sec, "plain_samples": plain_samples,
        "salted_sec": salted_sec, "salted_samples": salted_samples,
        "band_h": band_h,
        "shuffle_floor_sec": shuffle_sec,
        "speedup": round(plain_sec / max(salted_sec, 1e-9), 2),
    }
    print(json.dumps(rec))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/SALTED_STITCH_AB.md", "w") as f:
        f.write(
            "# Salted vs plain stitch — skewed-workload A/B (r7)\n\n"
            f"{N_TILES} tiles x {N}^2, local[{CORES}]; each tile's left half is a\n"
            "checkerboard around ONE level, so nearly all of a tile's segments\n"
            "land in one (image_id, level) stitch group — the VERDICT r5 #6\n"
            "latency-tail scenario (fewer hot groups than cores). Input\n"
            "materialized (cache+count) outside the timed window; warmup +\n"
            "best-of-2 per variant.\n\n"
            f"Hot groups (top 4 of the segment histogram): "
            f"{json.dumps(rec['hot_groups'])}; total segments {total:,}.\n\n"
            "| variant | wall (s) | samples |\n|---|---|---|\n"
            f"| plain `stitch_polylines` (1 task per hot group) | {plain_sec} | {plain_samples} |\n"
            f"| `salted_stitch_polylines` (band_h={band_h}) | {salted_sec} | {salted_samples} |\n\n"
            f"**Speedup {rec['speedup']}x** (r6: 1.44x; the r7 stage-1 fix\n"
            "replaced the per-chain canonicalize/dict/tolist tail — 3x the\n"
            "cost of the C stitch on a hot band — with the vectorized\n"
            "_canonical_batch over flat chain arrays). Decomposition: the\n"
            f"grouping-shuffle floor both variants share is {shuffle_sec} s —\n"
            "NOT the bound; the r6 'bounded by the shared segment shuffle'\n"
            "claim is retracted by measurement. The salted path's contract is\n"
            "the canonical polyline SET (driver-gated, golden `salted_stitch`);\n"
            "reference-order parity consumers keep the plain path, whose group\n"
            "is bounded by one tile.\n\n"
            "Reproduce: `python tools/salted_stitch_ab.py`.\n"
        )
    with open("BENCH/salted_stitch_ab.json", "w") as f:
        json.dump(rec, f, indent=2)
    print("wrote BENCH/SALTED_STITCH_AB.md, BENCH/salted_stitch_ab.json")
    spark.stop()


if __name__ == "__main__":
    main()
