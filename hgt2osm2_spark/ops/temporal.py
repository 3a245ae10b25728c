"""Temporal joins: as-of (backward) join — J6 family.

Spark has no native ASOF JOIN; the scale-correct formulation is the
union-marker pattern: tag both sides, sort each key's rows by event
time inside ONE window, and carry the right side's attributes forward
with last(ignorenulls). One shuffle on the key, no range explosion, no
per-row Python — at 100 TB this is a single sort-based window over the
union, which AQE sizes like any other exchange. (The alternative —
range join + per-left-row argmax — shuffles candidate PAIRS and
explodes on hot keys.)

Semantics == DuckDB ASOF JOIN (backward, inclusive): each left row
matches the right row with the largest right_ts <= left_ts for the
same key; no candidate -> nulls (left join). Right-side duplicates at
the same (key, ts) must be pre-deduplicated by the caller for
determinism (as any ASOF consumer must).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Backward as-of join: left rows + the latest right row at or
    before their timestamp, per key. Returns all left columns plus
    ``value_cols`` from the right (null when nothing precedes)."""
    lcols = left.columns
    l = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    for c in value_cols:
        l = l.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    r = (
        right.select(key, F.col(right_ts).alias("_ts"), *value_cols)
        .withColumn("_side", F.lit(0))
    )
    for c in lcols:
        if c not in (key,):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.unionByName(r.select(l.columns))

    # right rows sort BEFORE left rows at equal _ts -> inclusive match
    w = (
        W.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = u.select(
        *lcols,
        "_side",
        *[F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
          .over(w).alias(f"_asof_{c}") for c in value_cols],
    )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    for c in value_cols:
        out = out.withColumnRenamed(f"_asof_{c}", c)
    return out
