"""S10/U1 merge-union, A6 closed-ring metric, A8 approx distinct."""

from pyspark.sql import functions as F

from hgt2osm2_spark.config import ContourOptions
from hgt2osm2_spark.plans.pipeline import run_contour_pipeline
from hgt2osm2_spark.sinks.osm_xml import merged_xml
from hgt2osm2_spark.sources.synthetic import tiles_df

OPT = ContourOptions()
SF_DIR = "/root/testdata/sf0.001"


def test_merged_xml_union_and_bounds(spark):
    tiles = tiles_df(spark, n_tiles=3, size=17, seed=3).cache()
    res = run_contour_pipeline(tiles, OPT)
    xml = merged_xml(res.nodes, res.ways)

    # one <bounds> from the global extents (A7)
    assert xml.count("<bounds") == 1
    b = res.nodes.agg(F.min("lat"), F.max("lon")).collect()[0]
    assert f"minlat='{b[0]:.15g}'" in xml

    # union: every tile's nodes and ways present, IDs disjoint by
    # tile-keyed bases (U1/W1)
    n_nodes = res.nodes.count()
    n_ways = res.ways.count()
    assert xml.count("<node ") == n_nodes
    assert xml.count("<way ") == n_ways
    assert res.nodes.select("node_id").distinct().count() == n_nodes
    # nodes stream first, ways after (two-section output, S5/S10)
    assert xml.rindex("<node ") < xml.index("<way ")


def test_closed_ring_metric(spark):
    tiles = tiles_df(spark, n_tiles=3, size=21, seed=7)
    res = run_contour_pipeline(tiles, OPT)
    m = {r["image_id"]: r["closed_polylines"] for r in res.metrics.collect()}
    truth = {
        r["image_id"]: r["n"]
        for r in res.post.filter("kept AND closed")
        .groupBy("image_id").agg(F.count("*").alias("n")).collect()
    }
    for tid, n in truth.items():
        assert m[tid] == n
    assert sum(m.values()) > 0  # synthetic bumps do produce rings


def test_approx_count_distinct_close(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_partkey").alias("n")).collect()[0]["n"]
    approx = li.select(F.approx_count_distinct("l_partkey", 0.02).alias("n")).collect()[0]["n"]
    assert abs(approx - exact) / exact < 0.05


def test_distributed_merge_bytematches_collect_path(spark, tmp_path):
    """S10 scale path: ordered distributed two-section write + storage
    concat must byte-match the collect-based golden helper on multi-tile
    input — with no driver materialization of nodes/ways."""
    import gzip

    from hgt2osm2_spark.config import ContourOptions
    from hgt2osm2_spark.plans.pipeline import run_contour_pipeline
    from hgt2osm2_spark.sinks import osm_xml
    from hgt2osm2_spark.sources.synthetic import tiles_df

    tiles = tiles_df(spark, n_tiles=3, size=21, seed=11)
    res = run_contour_pipeline(tiles, ContourOptions(), shuffle_partitions=8)
    golden = osm_xml.merged_xml(res.nodes, res.ways).encode()

    out = str(tmp_path / "merged.osm")
    osm_xml.write_merged_distributed(res.nodes, res.ways, out)
    assert open(out, "rb").read() == golden

    outgz = str(tmp_path / "merged.osm.gz")
    osm_xml.write_merged_distributed(res.nodes, res.ways, outgz, gz=True)
    assert gzip.open(outgz, "rb").read() == golden
