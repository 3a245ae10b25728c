"""Skew handling: salted two-stage aggregation + salted repartition.

The north rule calls for "tile boundaries and join keys driving explicit
repartition/salting to kill skew". Two tools:

 - ``salted_agg``: for aggregations whose merge is associative, split
   each hot group across ``n_salt`` sub-groups (partial agg), then merge
   (final agg). Spark's built-in hash agg already does map-side partial
   aggregation for native functions; the salt stage matters when the
   per-group work is NOT partially aggregatable (collect/apply-style),
   and for demonstrating the pattern the fleet uses on hot (tile, level)
   keys.
 - ``salted_repartition``: explicit repartition on (keys + salt) before
   an Arrow stage, bounding any single task's share of a hot key.

Contour-pipeline context: per-(tile, level) segment counts are heavily
skewed (mountain tiles, mid-range levels — SURVEY.md §4.2). The exact
stitcher is order-sensitive so its groups cannot be salted without a
boundary merge pass; skew there is bounded instead by the fused
per-tile path (a group is never bigger than one tile). Salting applies
to the mergeable stages: metrics, histograms, dedup counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_repartition(df: DataFrame, n_partitions: int, *keys: str, n_salt: int = 16,
                       salt_src: str | Column | None = None) -> DataFrame:
    """Repartition on (keys..., salt) so one hot key spreads over
    ``n_salt`` partitions. salt_src: any stable column/expr to derive
    the salt from (defaults to a hash of all columns)."""
    src = F.col(salt_src) if isinstance(salt_src, str) else salt_src
    h = F.hash(*[F.col(c) for c in df.columns]) if src is None else F.hash(src)
    d = df.withColumn("_salt", F.pmod(h, F.lit(n_salt)))
    return d.repartition(n_partitions, *keys, "_salt").drop("_salt")


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salt: int = 16,
    salt_src: str | Column | None = None,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    partial_aggs: aggregates over (group_cols + salt); their output
    column names are the inputs of final_aggs, which merge per
    group_cols. Example:
        partial: [F.count('*').alias('n'), F.sum('v').alias('s')]
        final:   [F.sum('n').alias('n'),  F.sum('s').alias('s')]
    """
    src = F.col(salt_src) if isinstance(salt_src, str) else salt_src
    h = F.hash(*[F.col(c) for c in df.columns]) if src is None else F.hash(src)
    d = df.withColumn("_salt", F.pmod(h, F.lit(n_salt)))
    part = d.groupBy(*group_cols, "_salt").agg(*partial_aggs)
    return part.groupBy(*group_cols).agg(*final_aggs)
