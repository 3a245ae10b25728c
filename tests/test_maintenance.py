"""ops/maintenance.py — small-file compaction (Iceberg
rewrite_data_files analogue over plain parquet).

Contracts under test:
  * file count shrinks to ~ceil(bytes/target) and rows are preserved
    exactly (count + full content set equality);
  * the swap is atomic-by-construction: a failed rewrite leaves the
    source directory intact (simulated by a schema-readable but
    rename-blocked target is not possible portably, so we instead
    verify the staged-out rollback path via a missing tmp dir);
  * stats listing excludes _SUCCESS / hidden files.
"""

import os
import tempfile

from pyspark.sql import functions as F

from hgt2osm2_spark.ops import maintenance

SF_DIR = "/root/testdata/sf0.001"


def test_compaction_preserves_rows_and_shrinks_files(spark):
    src = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    work = tempfile.mkdtemp(prefix="maint_") + "/orders"
    compacted, stats = maintenance.compacted_copy(
        spark, src, work, fragment_files=48, target_file_mb=128
    )

    assert stats["before"]["n_files"] == 48
    # everything at sf0.001 fits one 128 MB target file
    assert stats["after"]["n_files"] == stats["target_files"] == 1
    assert stats["n_rows"] == src.count()

    # content equality, not just counts: anti-joins empty both ways
    cols = src.columns
    assert compacted.join(src, cols, "left_anti").count() == 0
    assert src.join(compacted, cols, "left_anti").count() == 0

    # no stray staging dirs left behind
    parent = os.path.dirname(work)
    leftovers = [d for d in os.listdir(parent) if "__compact" in d]
    assert leftovers == []


def test_file_stats_excludes_markers(spark):
    src = spark.range(100).withColumn("v", F.col("id") * 2)
    work = tempfile.mkdtemp(prefix="maint_stats_") + "/t"
    src.repartition(4).write.parquet(work)

    st = maintenance.table_file_stats(spark, work)
    assert st["n_files"] == 4  # _SUCCESS excluded
    assert st["total_bytes"] > 0
    assert 0 < st["min_bytes"] <= st["max_bytes"]


def test_compaction_respects_target_grain(spark):
    # force >1 output file by shrinking the target below the data size
    src = spark.range(200_000).withColumn(
        "pad", F.sha2(F.col("id").cast("string"), 256)
    )
    work = tempfile.mkdtemp(prefix="maint_grain_") + "/t"
    src.repartition(32).write.parquet(work)
    before = maintenance.table_file_stats(spark, work)
    target_mb = 1
    stats = maintenance.compact_parquet(spark, work, target_file_mb=target_mb)
    want = -(-before["total_bytes"] // (target_mb * 1024 * 1024))
    assert stats["target_files"] == want
    assert stats["after"]["n_files"] == want
    assert spark.read.parquet(work).count() == 200_000


def test_merge_upsert_semantics(spark):
    import pandas as pd

    table = spark.createDataFrame(pd.DataFrame({
        "k": [1, 2, 3], "v": ["a", "b", "c"], "ver": [10, 10, 10],
    }))
    updates = spark.createDataFrame(pd.DataFrame({
        # k=2 newer (wins), k=3 older (loses), k=4 new (insert),
        # k=5 duplicated within updates (newest wins)
        "k": [2, 3, 4, 5, 5],
        "v": ["B", "C-old", "d", "e1", "e2"],
        "ver": [20, 5, 10, 11, 12],
    }))
    got = {
        r.k: (r.v, r.ver)
        for r in maintenance.merge_upsert(table, updates, ["k"], "ver").collect()
    }
    assert got == {1: ("a", 10), 2: ("B", 20), 3: ("c", 10),
                   4: ("d", 10), 5: ("e2", 12)}


def test_merge_upsert_tie_prefers_update(spark):
    import pandas as pd

    table = spark.createDataFrame(pd.DataFrame({"k": [1], "v": ["old"], "ver": [10]}))
    updates = spark.createDataFrame(pd.DataFrame({"k": [1], "v": ["new"], "ver": [10]}))
    row = maintenance.merge_upsert(table, updates, ["k"], "ver").collect()[0]
    assert row.v == "new"


def test_upsert_parquet_in_place(spark):
    import pandas as pd

    work = tempfile.mkdtemp(prefix="maint_upsert_") + "/t"
    spark.createDataFrame(pd.DataFrame({
        "k": range(100), "v": ["x"] * 100, "ver": [1] * 100,
    })).write.parquet(work)
    updates = spark.createDataFrame(pd.DataFrame({
        "k": [5, 200], "v": ["upd", "ins"], "ver": [2, 1],
    }))
    stats = maintenance.upsert_parquet(spark, work, updates, ["k"], "ver")
    assert stats["n_rows"] == 101
    after = {r.k: r.v for r in spark.read.parquet(work).collect()}
    assert after[5] == "upd" and after[200] == "ins" and after[6] == "x"
    parent = os.path.dirname(work)
    assert [d for d in os.listdir(parent) if "__upsert" in d] == []


def test_iceberg_configs_shape():
    """Config-only Iceberg support (no jar in this sandbox): the
    session helper must emit the exact catalog keys a real cluster
    needs, with no typo'd prefixes."""
    from hgt2osm2_spark.session import iceberg_configs

    c = iceberg_configs(catalog="ice", warehouse="/w", catalog_impl="hadoop")
    assert c["spark.sql.catalog.ice"] == "org.apache.iceberg.spark.SparkCatalog"
    assert c["spark.sql.catalog.ice.type"] == "hadoop"
    assert c["spark.sql.catalog.ice.warehouse"] == "/w"
    assert "IcebergSparkSessionExtensions" in c["spark.sql.extensions"]


def test_partitioned_table_compaction(spark):
    """Regression: flat compact on a Hive-partitioned dir must REFUSE
    (it would flatten the layout); compact_partitioned rewrites leaf by
    leaf, preserving partition dirs and all rows."""
    import pandas as pd
    import pytest

    work = tempfile.mkdtemp(prefix="maint_part_") + "/t"
    df = spark.createDataFrame(pd.DataFrame({
        "k": range(1000), "part": [i % 3 for i in range(1000)],
    }))
    df.repartition(8).write.partitionBy("part").parquet(work)

    st = maintenance.table_file_stats(spark, work)
    assert st["n_subdirs"] == 3 and st["n_files"] > 3  # recursive listing
    with pytest.raises(ValueError, match="partitioned"):
        maintenance.compact_parquet(spark, work)

    res = maintenance.compact_partitioned(spark, work, target_file_mb=128)
    assert res["n_leaves"] == 3
    assert res["n_files_after"] == 3  # one file per leaf
    assert res["n_rows"] == 1000
    out = spark.read.parquet(work)
    assert out.count() == 1000
    assert out.select("part").distinct().count() == 3  # layout intact


def test_merge_upsert_map_columns_and_tie_determinism(spark):
    """Unorderable (map) payload columns are excluded from the tiebreak
    (the op must not fail analysis on them), while same-key same-version
    duplicates on orderable columns resolve deterministically."""
    import pandas as pd
    from pyspark.sql import functions as F, types as T

    from hgt2osm2_spark.ops import maintenance

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType()),
        T.StructField("payload", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ])
    base = spark.createDataFrame(
        [(1, 1, "old", {"a": "1"})], schema=schema
    )
    ups = spark.createDataFrame(
        [(1, 5, "beta", {"x": "1"}), (1, 5, "alpha", {"y": "2"})], schema=schema
    )
    outs = set()
    for _ in range(3):
        row = maintenance.merge_upsert(base, ups, ["k"], "v").collect()[0]
        outs.add(row["payload"])
    # descending string tiebreak -> 'beta' wins every run
    assert outs == {"beta"}
