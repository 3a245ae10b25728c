"""Resumable checkpoint pipeline (S11/J7): kill-and-resume semantics.

Invariants:
 - a resumed run recomputes ONLY tiles missing from the lineage table;
 - stage data for committed tiles is never rewritten (partition
   overwrite is scoped to the tiles computed in that run);
 - the resumed store's nodes/ways equal a fresh single-shot
   (non-checkpointed) pipeline run bit-for-bit — possible because ID
   bases are tile-keyed (W1/Q5);
 - lineage carries per-partition metrics (n_rows, max_id) matching the
   actual stage outputs (the S11 LastID recovery analogue).
"""

import pytest

from hgt2osm2_spark.config import ContourOptions
from hgt2osm2_spark.plans import checkpoint
from hgt2osm2_spark.plans.pipeline import run_contour_pipeline
from hgt2osm2_spark.sources.synthetic import tiles_df

OPT = ContourOptions()


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


@pytest.fixture(scope="module")
def tiles(spark):
    return tiles_df(spark, n_tiles=4, size=21, seed=7).cache()


def test_kill_and_resume_matches_single_shot(spark, tiles, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ckpt"))

    # run 1: killed after the polylines stage
    r1 = checkpoint.run_checkpointed(spark, tiles, root, OPT, stop_after="polylines")
    assert r1.computed["segments"] == 4
    assert r1.computed["polylines"] == 4
    lin = r1.store.lineage()
    assert lin.filter("stage = 'segments'").count() == 4
    assert lin.filter("stage = 'nodes'").count() == 0

    # run 2: resume to completion — early stages must not recompute
    r2 = checkpoint.run_checkpointed(spark, tiles, root, OPT)
    assert r2.computed["segments"] == 0
    assert r2.computed["polylines"] == 0
    assert r2.computed["nodes"] == 4
    assert r2.computed["ways"] == 4

    # exactly one lineage row per (stage, tile); no tile was redone
    lin = r2.store.lineage()
    dup = (
        lin.groupBy("stage", "image_id").count().filter("count > 1").count()
    )
    assert dup == 0
    assert lin.count() == 5 * 4

    # equality vs the single-shot pipeline
    fresh = run_contour_pipeline(tiles, OPT)
    node_cols = ["image_id", "node_id", "level", "poly_ord", "lat", "lon"]
    way_cols = ["image_id", "way_id", "level", "poly_ord", "ele", "contour"]
    assert _sorted_rows(r2.nodes(), node_cols) == _sorted_rows(fresh.nodes, node_cols)
    assert _sorted_rows(r2.ways(), way_cols) == _sorted_rows(fresh.ways, way_cols)


def test_new_tiles_only_incremental(spark, tiles, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ckpt_inc"))
    two_ids = [r["image_id"] for r in tiles.select("image_id").orderBy("image_id").limit(2).collect()]
    first_two = tiles.filter(tiles.image_id.isin(two_ids))

    r1 = checkpoint.run_checkpointed(spark, first_two, root, OPT)
    assert r1.computed["segments"] == 2

    # growing the input only processes the delta (J7 anti-join)
    r2 = checkpoint.run_checkpointed(spark, tiles, root, OPT)
    assert r2.computed == {s: 2 for s in checkpoint.STAGES}
    assert r2.nodes().select("image_id").distinct().count() == 4


def test_partition_pruning_on_stage_store(spark, tiles, tmp_path_factory):
    """The stage store is partitioned by image_id — a tile-keyed read
    must prune to one partition (the Iceberg partition-pruning analogue
    the resume path relies on)."""
    root = str(tmp_path_factory.mktemp("ckpt_p"))
    r = checkpoint.run_checkpointed(spark, tiles, root, OPT, stop_after="segments")
    one = tiles.select("image_id").orderBy("image_id").first()["image_id"]
    df = r.store.load_stage("segments").filter(f"image_id = '{one}'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(image_id" in plan and one in plan
    assert df.select("image_id").distinct().count() == 1


def test_lineage_metrics_match_outputs(spark, tiles, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ckpt_m"))
    r = checkpoint.run_checkpointed(spark, tiles, root, OPT)

    lin = r.store.lineage().filter("stage = 'nodes'")
    actual = r.nodes().groupBy("image_id").count()
    joined = lin.join(actual, "image_id").collect()
    assert len(joined) == 4
    for row in joined:
        assert row["n_rows"] == row["count"]

    # last-ID recovery (S11): max recorded ID == true max node/way id
    last = {r_["image_id"]: r_["last_id"] for r_ in r.store.last_ids().collect()}
    from pyspark.sql import functions as F

    mx_nodes = {
        r_["image_id"]: r_["m"]
        for r_ in r.nodes().groupBy("image_id").agg(F.max("node_id").alias("m")).collect()
    }
    mx_ways = {
        r_["image_id"]: r_["m"]
        for r_ in r.ways().groupBy("image_id").agg(F.max("way_id").alias("m")).collect()
    }
    for tid in mx_nodes:
        assert last[tid] == max(mx_nodes[tid], mx_ways.get(tid, 0))


def test_empty_tile_gets_lineage_and_never_recomputes(spark, tmp_path_factory):
    """A flat tile that produces ZERO contour rows still gets n_rows=0
    lineage rows at every stage, so resume skips it (zero-recompute
    invariant; the reference writes an output file even for empty tiles,
    Program.cs:402-427)."""
    import numpy as np
    import pandas as pd

    from hgt2osm2_spark.config import ContourOptions
    from hgt2osm2_spark.kernels import codecs
    from hgt2osm2_spark.plans import checkpoint
    from hgt2osm2_spark.sources.synthetic import TILES_SCHEMA, make_tile_row

    # constant 105 m: with MinorDistance=20 and fake=-0.5 no level is
    # crossed and no flat-triangle level is hit -> zero segments
    flat = np.full((17, 17), 105, dtype=np.int16)
    rows = [
        {
            "image_id": "n47e005_0", "bytes": codecs.encode(flat, "hgt"),
            "w": 17, "h": 17, "fmt": "hgt",
            "caption": "flat tile", "phash": codecs.phash64(flat),
        },
        make_tile_row(1, 17),
    ]
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=TILES_SCHEMA)
    root = str(tmp_path_factory.mktemp("ckpt_empty"))

    r1 = checkpoint.run_checkpointed(spark, tiles, root, ContourOptions())
    lin = r1.store.lineage().toPandas()
    flat_rows = lin[lin.image_id == "n47e005_0"]
    assert set(flat_rows.stage) == set(checkpoint.STAGES)
    assert (flat_rows.n_rows == 0).all()

    r2 = checkpoint.run_checkpointed(spark, tiles, root, ContourOptions())
    assert all(v == 0 for v in r2.computed.values()), r2.computed
