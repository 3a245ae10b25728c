"""Deterministic sampling / splitting / capping for training-data
pipelines — pure JVM column expressions, no UDFs, no randomness.

Reproducibility is the contract: re-running the pipeline on the same
table yields the same sample, split, and caps, independent of
partitioning, task order, or cluster size — which `df.sample()` (seeded
per-task) does NOT guarantee. Everything keys off a deterministic hash
of a stable id column.

Two hash flavors:
  * xxhash64 (default) — Spark-native, well mixed; the production
    choice at 10^12 rows.
  * portable31 — a 31-bit LCG + xor-fold + LCG chain using only
    (* + % >> xor), reproducible bit-for-bit in any SQL engine (the
    driver oracle recomputes it in DuckDB). Uniform to ~1% per mill
    on sequential keys; not cryptographic.

At 100 TB all three ops are scale-safe: sample/split are narrow maps
(no shuffle); cap_per_group is a windowed top-k that Spark executes
with partial per-partition limits (WindowGroupLimit) before the single
shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

_M31 = 2_147_483_648  # 2^31


def portable31(key: Column) -> Column:
    """31-bit portable mix of an integer column: LCG -> xor-fold ->
    LCG. All intermediates fit int64, so no ANSI overflow on Spark and
    identical arithmetic in DuckDB/any SQL engine. The sign bit is
    masked up front (`%` preserves sign in both Spark and DuckDB, so a
    signed id like an xxhash64-derived key would otherwise produce
    NEGATIVE buckets — kept unconditionally by `b < threshold` filters
    regardless of rate)."""
    key = key.bitwiseAND(F.lit(0x7FFFFFFFFFFFFFFF))
    h1 = ((key % 1_000_003) * 69_069 + 1) % _M31
    h2 = h1.bitwiseXOR(F.shiftright(h1, 15))
    return (h2 * 69_069 + 7) % _M31


def hash_bucket(key: Column, n_buckets: int, portable: bool = False) -> Column:
    """Deterministic bucket in [0, n_buckets) from an id column.
    High-bits projection, so bucket boundaries are stable as n_buckets
    changes grain (bucket k at 10n nests inside bucket k//10 at n)."""
    if portable:
        return (portable31(key) * n_buckets / _M31).cast("long")
    # xxhash64: take the top 31 bits and project exactly like the
    # portable path — floor(floor(k*10n/M)/10) == floor(k*n/M), so
    # buckets NEST across grains (modulo would not); h31 * n_buckets
    # stays within int64 for any n_buckets <= 2^32
    h31 = F.shiftright(F.xxhash64(key).bitwiseAND(F.lit(0x7FFFFFFFFFFFFFFF)), 32)
    return (h31 * n_buckets / _M31).cast("long")


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float,
    n_buckets: int = 1_000_000, portable: bool = False,
) -> DataFrame:
    """Keep ~rate of rows, chosen by id hash — reproducible across
    runs, partitionings, and engines (portable=True). A narrow map:
    the filter pushes to the scan, no shuffle."""
    b = hash_bucket(F.col(key_col), n_buckets, portable)
    return df.where(b < int(round(rate * n_buckets)))


def train_test_split(
    df: DataFrame, key_col: str, test_rate: float = 0.1,
    val_rate: float = 0.0, n_buckets: int = 1_000_000,
    portable: bool = False,
) -> DataFrame:
    """Adds a `split` column ('train' / 'val' / 'test') keyed by id
    hash. Stable: a row never migrates between splits across runs or
    engines, the property that keeps eval sets uncontaminated when the
    corpus is re-ingested."""
    b = hash_bucket(F.col(key_col), n_buckets, portable)
    t = int(round(test_rate * n_buckets))
    v = t + int(round(val_rate * n_buckets))
    return df.withColumn(
        "split",
        F.when(b < t, F.lit("test"))
        .when(b < v, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def cap_per_group(
    df: DataFrame, group_col: str, order_cols: list, k: int,
) -> DataFrame:
    """Keep at most k rows per group, by a deterministic order — the
    C4/RefinedWeb 'domain capping' op (bound any one source's share of
    the corpus). order_cols must be a total order (include a unique id
    as tie-break) or the cap is nondeterministic."""
    w = W.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def stratified_sample(
    df: DataFrame, strata_col: str, key_col: str, rates: dict,
    default_rate: float = 0.0, n_buckets: int = 1_000_000,
    portable: bool = False,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    keep 10% of English, all of Basque). rates maps stratum value ->
    keep rate; unlisted strata get default_rate. Narrow map, and the
    stratum thresholds broadcast as a literal CASE — no join."""
    b = hash_bucket(F.col(key_col), n_buckets, portable)
    thresh = F.lit(int(round(default_rate * n_buckets)))
    expr = None
    for value, rate in sorted(rates.items()):
        lim = F.lit(int(round(rate * n_buckets)))
        cond = F.col(strata_col) == value
        expr = F.when(cond, lim) if expr is None else expr.when(cond, lim)
    thresh = expr.otherwise(thresh) if expr is not None else thresh
    return df.where(b < thresh)


def pack_sequences(
    df: DataFrame, tokens_col: str, seq_len: int,
    order_cols: list | None = None, id_col: str = "doc_id",
    n_shards: int | None = None,
) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing: documents are laid
    end-to-end in a deterministic order and cut into fixed seq_len
    training sequences; each doc gets its span [tok_start, tok_end)
    in the global token stream plus seq_first/seq_last, the chunk ids
    the span crosses. A doc spanning a boundary appears in consecutive
    sequences — standard pretraining semantics (attention masking
    handles the seam downstream).

    A global prefix sum computed the naive way (W.orderBy with no
    partition key) funnels every row through ONE task. Instead: the
    two-pass distributed cumsum —
      1. repartitionByRange on the order key (shard i holds keys
         entirely below shard i+1),
      2. per-shard token totals -> driver (n_shards scalars, bounded),
         prefix-summed into per-shard base offsets,
      3. per-shard window cumsum + broadcast base.
    Every shard's window runs in parallel. The ranged frame is
    MATERIALIZED once (localCheckpoint) before the totals job:
    RangePartitioner samples with a per-RDD seed, so re-executing the
    range shuffle in a second job could draw DIFFERENT boundaries,
    mismatching spark_partition_id between the totals job and the
    output job and silently corrupting base offsets. Checkpointing
    pins one boundary draw for both jobs — and, unlike plain persist,
    a lost block FAILS the job rather than recomputing with fresh
    boundaries. Results are then independent of where the sampled
    boundaries land, so packing stays byte-deterministic across runs
    and cluster sizes. (On a real cluster with executor churn, swap
    localCheckpoint for a reliable `df.checkpoint()` to an HDFS/object
    checkpoint dir — same contract, fault-tolerant blocks.)
    """
    order = order_cols or [F.col(id_col)]
    spark = df.sparkSession
    n_shards = int(
        n_shards or spark.conf.get("spark.sql.shuffle.partitions")
    )
    ranged = (
        df.repartitionByRange(n_shards, *order)
        .withColumn("_shard", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = ranged.groupBy("_shard").agg(
        F.sum(tokens_col).alias("_tok")
    ).collect()
    bases, acc = {}, 0
    for r in sorted(totals, key=lambda r: r._shard):
        bases[r._shard] = acc
        acc += int(r._tok)
    base_map = F.create_map(
        *[F.lit(v) for kv in bases.items() for v in kv]
    )
    w = W.partitionBy("_shard").orderBy(*order).rowsBetween(
        W.unboundedPreceding, -1
    )
    tok_start = (
        base_map[F.col("_shard")]
        + F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    ).cast("long")
    return (
        ranged.withColumn("tok_start", tok_start)
        .withColumn(
            "tok_end", (F.col("tok_start") + F.col(tokens_col)).cast("long")
        )
        .withColumn("seq_first", F.floor(F.col("tok_start") / seq_len))
        .withColumn("seq_last", F.floor((F.col("tok_end") - 1) / seq_len))
        .drop("_shard")
    )
