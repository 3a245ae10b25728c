"""Table maintenance: small-file compaction + file-level stats.

At 10^12 rows the write path continuously produces small files
(per-trigger streaming commits, per-tile artifact batches, skewed
dynamic partitions); scan throughput then dies on open/seek overhead
long before bandwidth. This is the Iceberg `rewrite_data_files`
maintenance action re-expressed over plain parquet directories (the
sandbox has no Iceberg runtime jar; the commit-semantics analogue
lives in plans/checkpoint.py's dynamic partition overwrite).

  table_file_stats   file count / bytes via the Hadoop FS API (driver
                     metadata listing only — no data scan)
  compact_parquet    read -> repartition to ceil(bytes/target) ->
                     write-temp + atomic swap; returns before/after
                     stats. Row-preservation is the caller-checkable
                     contract (the q_compaction query fingerprints the
                     compacted output against the source oracle).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def table_file_stats(spark: SparkSession, path: str) -> dict:
    """{n_files, total_bytes, min_bytes, max_bytes, n_subdirs} over the
    data files of a parquet directory, RECURSIVE (Hive-partitioned
    layouts keep data in lat=X/ leaf dirs; a top-level-only listing
    would report 0 files and mis-plan any rewrite). Driver-side
    metadata listing only — no data scan; _SUCCESS / hidden files and
    hidden dirs excluded."""
    fs, p, _ = _fs(spark, path)
    sizes = []
    n_subdirs = 0

    def walk(d):
        nonlocal n_subdirs
        for st in fs.listStatus(d):
            name = st.getPath().getName()
            if name.startswith(("_", ".")):
                continue
            if st.isFile():
                sizes.append(int(st.getLen()))
            else:
                n_subdirs += 1
                walk(st.getPath())

    walk(p)
    return {
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "min_bytes": min(sizes) if sizes else 0,
        "max_bytes": max(sizes) if sizes else 0,
        "n_subdirs": n_subdirs,
    }


def _atomic_swap(spark: SparkSession, path: str, tag: str, write_tmp) -> None:
    """Land a rewrite of `path` via tmp-write + two renames; on a
    failed swap-in the original is restored AND the tmp copy removed
    (a leaked tmp is a full duplicate of the table). `write_tmp(tmp)`
    performs the write."""
    tmp = path.rstrip("/") + f".__{tag}_tmp"
    old = path.rstrip("/") + f".__{tag}_old"
    write_tmp(tmp)
    fs, p_src, jvm = _fs(spark, path)
    p_tmp = jvm.org.apache.hadoop.fs.Path(tmp)
    p_old = jvm.org.apache.hadoop.fs.Path(old)
    if fs.exists(p_old):
        fs.delete(p_old, True)
    if not fs.rename(p_src, p_old):
        fs.delete(p_tmp, True)
        raise IOError(f"{tag}: could not stage out {path}")
    if not fs.rename(p_tmp, p_src):
        fs.rename(p_old, p_src)  # roll back
        fs.delete(p_tmp, True)
        raise IOError(f"{tag}: could not swap in rewrite for {path}")
    fs.delete(p_old, True)


def compact_parquet(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> dict:
    """Rewrite a parquet directory into ~target-sized files, in place.

    The rewrite lands in `<path>.__compact_tmp` first and swaps in via
    two renames, so a failed rewrite never corrupts the source (rename
    is atomic per directory on HDFS-like stores; on S3-like stores the
    Iceberg snapshot commit plays this role). Returns before/after
    file stats plus the row count moved."""
    before = table_file_stats(spark, path)
    if before["n_subdirs"]:
        raise ValueError(
            f"compact_parquet: {path} is partitioned ({before['n_subdirs']} "
            "subdirs) — a flat rewrite would destroy the partition layout "
            "and funnel the table through one write grain; use "
            "compact_partitioned (per-leaf rewrite) instead"
        )
    df = spark.read.parquet(path)
    n_rows = df.count()
    n_out = max(1, math.ceil(before["total_bytes"] / (target_file_mb * 1024 * 1024)))
    # repartition (not coalesce): coalesce would chain the upstream scan
    # into as few tasks as output files, serializing the read; a real
    # rewrite wants parallel read + exchange into the output grain
    _atomic_swap(
        spark, path, "compact",
        lambda tmp: df.repartition(n_out).write.mode("overwrite").parquet(tmp),
    )
    after = table_file_stats(spark, path)
    return {"before": before, "after": after, "n_rows": n_rows,
            "target_files": n_out}


def compact_partitioned(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> dict:
    """Compact a Hive-partitioned table LEAF BY LEAF, preserving the
    directory layout (the Iceberg rewrite_data_files per-partition bin
    behavior). Each leaf swaps atomically and independently, so a crash
    mid-way leaves every partition either old or fully compacted —
    never mixed. The driver loop is metadata-only; each leaf's rewrite
    is a parallel cluster job (at fleet scale, run leaves concurrently
    from a thread pool — each touches disjoint paths)."""
    fs, p, _ = _fs(spark, path)

    leaves = []

    def find_leaves(d):
        subdirs = [st.getPath() for st in fs.listStatus(d)
                   if not st.isFile()
                   and not st.getPath().getName().startswith(("_", "."))]
        if subdirs:
            for sd in subdirs:
                find_leaves(sd)
        else:
            leaves.append(d.toString())

    find_leaves(p)
    results = {}
    for leaf in leaves:
        results[leaf] = compact_parquet(spark, leaf, target_file_mb)
    return {
        "n_leaves": len(leaves),
        "n_files_before": sum(r["before"]["n_files"] for r in results.values()),
        "n_files_after": sum(r["after"]["n_files"] for r in results.values()),
        "n_rows": sum(r["n_rows"] for r in results.values()),
        "leaves": results,
    }


def compacted_copy(
    spark: SparkSession, src_df: DataFrame, work_dir: str,
    fragment_files: int, target_file_mb: int = 128,
) -> tuple[DataFrame, dict]:
    """Test/demo helper: write `src_df` as `fragment_files` small files
    under work_dir, compact in place, and return (compacted DataFrame,
    stats). Exercises the full rewrite + swap path."""
    src_df.repartition(fragment_files).write.mode("overwrite").parquet(work_dir)
    stats = compact_parquet(spark, work_dir, target_file_mb)
    return spark.read.parquet(work_dir), stats


def merge_upsert(table, updates, key_cols, version_col):
    """Keep-latest MERGE (the Iceberg `MERGE INTO ... WHEN MATCHED
    UPDATE / WHEN NOT MATCHED INSERT` shape, keyed): union the update
    set onto the table and keep, per key, the single row with the
    highest (version, is_update) — updates win version ties, and
    duplicate keys WITHIN the update set resolve to the newest too.

    One shuffle (the per-key window); no join. At 10^12 rows with a
    partitioned table the same expression runs per storage partition
    under dynamic partition overwrite (plans/checkpoint.py) so only
    touched partitions rewrite."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    cols = table.columns
    if set(cols) != set(updates.columns):
        raise ValueError(
            f"merge_upsert: schema mismatch {cols} vs {updates.columns}"
        )
    tagged = table.select(*cols).withColumn("_upd", F.lit(0)).unionByName(
        updates.select(*cols).withColumn("_upd", F.lit(1))
    )
    # (version, _upd) alone is not a total order: two update rows with
    # the same key AND version would tie and row_number would pick one
    # nondeterministically (ADVICE r3). The remaining ORDERABLE payload
    # columns (sorted by name, descending) complete the order, so
    # same-key same-version duplicates resolve to the same survivor
    # every run. Map columns are not orderable in Spark and are left
    # out of the tiebreak — rows identical on every orderable column
    # but differing only inside a map still tie (document, don't fail).
    from pyspark.sql import types as _T

    def _orderable(dt) -> bool:
        if isinstance(dt, _T.MapType):
            return False
        if isinstance(dt, _T.ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, _T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    dtypes = {f.name: f.dataType for f in table.schema.fields}
    tiebreak = [
        F.col(c).desc()
        for c in sorted(cols)
        if c not in set(key_cols) and c != version_col and _orderable(dtypes[c])
    ]
    w = W.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(), F.col("_upd").desc(), *tiebreak
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_upd")
    )


def upsert_parquet(
    spark: SparkSession, path: str, updates: DataFrame,
    key_cols: list, version_col: str,
) -> dict:
    """merge_upsert applied in place to a parquet directory, landing
    through the same tmp-write + atomic two-rename swap as
    compact_parquet (a failed merge never corrupts the table)."""
    table = spark.read.parquet(path)
    merged = merge_upsert(table, updates, key_cols, version_col)
    _atomic_swap(
        spark, path, "upsert",
        lambda tmp: merged.write.mode("overwrite").parquet(tmp),
    )
    return {"n_rows": spark.read.parquet(path).count()}
