"""ops/sampling.py — deterministic sample / split / cap / strata.

The load-bearing property everywhere is REPRODUCIBILITY: the kept set
must not depend on partitioning, task order, or run count — that is
what df.sample() cannot promise and what keeps eval splits stable
across re-ingests of a 100 TB corpus.
"""

from pyspark.sql import functions as F

from hgt2osm2_spark.ops import sampling

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_sample_rate_and_partition_invariance(spark):
    docs = _docs(spark).cache()
    n = docs.count()
    kept = sampling.deterministic_sample(docs, "doc_id", 0.2)
    ids1 = {r.doc_id for r in kept.select("doc_id").collect()}
    # rate honored within sampling tolerance
    assert abs(len(ids1) / n - 0.2) < 0.1
    # identical set under a different partitioning and a re-run
    ids2 = {
        r.doc_id
        for r in sampling.deterministic_sample(
            docs.repartition(13, "lang"), "doc_id", 0.2
        ).select("doc_id").collect()
    }
    assert ids1 == ids2


def test_sample_bucket_nesting(spark):
    """rate 0.05 sample is a subset of the rate 0.2 sample (high-bits
    bucketing nests) — lets a pipeline grow a sample without resampling
    already-processed rows."""
    docs = _docs(spark).cache()
    small = {r.doc_id for r in sampling.deterministic_sample(
        docs, "doc_id", 0.05, portable=True).select("doc_id").collect()}
    large = {r.doc_id for r in sampling.deterministic_sample(
        docs, "doc_id", 0.2, portable=True).select("doc_id").collect()}
    assert small <= large
    assert len(small) < len(large)


def test_split_stability_when_val_added(spark):
    """Adding a val split must carve it out of TRAIN only — no row ever
    migrates in or out of test (eval contamination guard)."""
    docs = _docs(spark).cache()

    def ids_of(df, name):
        return {r.doc_id for r in df.where(F.col("split") == name)
                .select("doc_id").collect()}

    base = sampling.train_test_split(docs, "doc_id", test_rate=0.1)
    with_val = sampling.train_test_split(
        docs, "doc_id", test_rate=0.1, val_rate=0.05
    )
    assert ids_of(base, "test") == ids_of(with_val, "test")
    assert ids_of(with_val, "val") <= ids_of(base, "train")
    # the three splits partition the table
    assert with_val.count() == docs.count()
    assert with_val.groupBy("split").count().count() == 3


def test_cap_per_group_exact_and_deterministic(spark):
    docs = _docs(spark).cache()
    capped = sampling.cap_per_group(
        docs, "source", [F.col("n_chars").desc(), F.col("doc_id")], k=7
    ).cache()
    per = {r.source: r["count"] for r in capped.groupBy("source").count().collect()}
    full = {r.source: r["count"] for r in docs.groupBy("source").count().collect()}
    for src, n_full in full.items():
        assert per[src] == min(7, n_full)
    # kept rows are exactly the top-k by the declared order
    one = sorted(per)[0]
    kept = sorted(
        (r.n_chars, r.doc_id)
        for r in capped.where(F.col("source") == one).collect()
    )
    want = sorted(
        (r.n_chars, r.doc_id)
        for r in docs.where(F.col("source") == one)
        .orderBy(F.col("n_chars").desc(), "doc_id").limit(7).collect()
    )
    assert kept == want


def test_stratified_rates(spark):
    docs = _docs(spark).cache()
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    keep_all, keep_some = langs[0], langs[1]
    out = sampling.stratified_sample(
        docs, "lang", "doc_id", {keep_all: 1.0, keep_some: 0.25},
        default_rate=0.0,
    ).cache()
    got = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    full = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    assert got[keep_all] == full[keep_all]
    assert 0 < got.get(keep_some, 0) < full[keep_some]
    assert set(got) == {keep_all, keep_some}  # default 0 drops the rest


def test_sample_filter_is_narrow(spark):
    """No shuffle in the sampled scan: the plan must be scan->filter
    (narrow), since reproducible sampling is supposed to be free at
    100 TB."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = sampling.deterministic_sample(docs, "doc_id", 0.1)
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in s


def test_pack_sequences_contiguous_and_shard_invariant(spark):
    """The packed stream must be gapless (doc i+1 starts where doc i
    ended) and byte-identical regardless of shard count — shard
    boundaries are an execution detail, never a semantic one."""
    docs = _docs(spark).withColumn(
        "n_tokens", (F.length("text") / 5 + 1).cast("int")
    ).select("doc_id", "n_tokens").cache()

    packed = sampling.pack_sequences(docs, "n_tokens", seq_len=128, n_shards=8)
    rows = sorted(packed.collect(), key=lambda r: r.doc_id)
    pos = 0
    for r in rows:
        assert r.tok_start == pos
        assert r.tok_end == pos + r.n_tokens
        assert r.seq_first == r.tok_start // 128
        assert r.seq_last == (r.tok_end - 1) // 128
        pos = r.tok_end

    again = sampling.pack_sequences(
        docs.repartition(3), "n_tokens", seq_len=128, n_shards=2
    )
    assert sorted(
        (r.doc_id, r.tok_start, r.seq_first, r.seq_last) for r in again.collect()
    ) == [(r.doc_id, r.tok_start, r.seq_first, r.seq_last) for r in rows]


def test_pack_sequences_window_is_sharded(spark):
    """The prefix-sum window must be partitioned (parallel) — a global
    unpartitioned Window would serialize 100 TB through one task."""
    docs = _docs(spark).withColumn("n_tokens", F.lit(10)).select("doc_id", "n_tokens")
    plan = sampling.pack_sequences(docs, "n_tokens", seq_len=64)
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in s


def test_default_hash_bucket_nesting(spark):
    """Regression: the xxhash64 (default) path must honor the nesting
    contract like the portable path — a finer grain's bucket k nests
    inside k//10 of the coarser grain."""
    docs = _docs(spark).cache()
    coarse = {
        r.doc_id: r.b
        for r in docs.select(
            "doc_id",
            sampling.hash_bucket(F.col("doc_id"), 100).alias("b"),
        ).collect()
    }
    fine = {
        r.doc_id: r.b
        for r in docs.select(
            "doc_id",
            sampling.hash_bucket(F.col("doc_id"), 1000).alias("b"),
        ).collect()
    }
    assert all(fine[k] // 10 == coarse[k] for k in coarse)
    small = {r.doc_id for r in sampling.deterministic_sample(docs, "doc_id", 0.05)
             .select("doc_id").collect()}
    large = {r.doc_id for r in sampling.deterministic_sample(docs, "doc_id", 0.2)
             .select("doc_id").collect()}
    assert small <= large
