"""Bucketed co-located join (SURVEY §4.2): pre-bucketing both sides on
the join key removes the shuffle from the join plan entirely — the
strategy the engine prescribes for repeated tile/cell-keyed joins at
fleet scale (Iceberg: write.distribution-mode=hash + bucket transform).
"""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    # default session warehouse (spark-warehouse/, gitignored)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
    )
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")
    )
    yield spark.table("orders_b"), spark.table("lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    orders_b, li_b = bucketed
    # force a sort-merge join (broadcast would trivially avoid the
    # shuffle and prove nothing about bucketing)
    j = li_b.hint("merge").join(orders_b, li_b.l_orderkey == orders_b.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count("*").alias("n"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    # the join itself consumes bucketed scans: no shuffle before it
    import re

    join_section = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # count exchanges: only the final single-key aggregate may shuffle
    n_exchange = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchange <= 1, plan

    # and the result matches the unbucketed join
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    want = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority").agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, want.collect()))
