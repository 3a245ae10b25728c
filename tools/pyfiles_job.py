"""spark-submit --py-files smoke job (VERDICT r3 item #8).

Run by the gate query `pyfiles_contour` as

    spark-submit --master local[4] \
        --py-files dist/hgt2osm2_spark.zip tools/pyfiles_job.py OUT_DIR

from a NEUTRAL working directory, so every `hgt2osm2_spark` import in
this process (driver) and in the Python workers (executors) resolves
from the zip artifact — the north rule's packaging path, end to end.
The job regenerates the standard 6-tile synthetic input (seed 42, the
contour_nodes gate input) and writes the full contour node stream to
OUT_DIR as parquet; the calling query reads it back and the driver
hash-compares it against the contour_nodes golden.
"""

import sys

from pyspark.sql import SparkSession


def main() -> None:
    out_dir = sys.argv[1]
    spark = (
        SparkSession.builder.appName("pyfiles-smoke")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    import hgt2osm2_spark
    assert "hgt2osm2_spark.zip" in hgt2osm2_spark.__file__, (
        f"package must load from the --py-files zip, got {hgt2osm2_spark.__file__}"
    )
    from hgt2osm2_spark.config import ContourOptions
    from hgt2osm2_spark.plans.pipeline import run_contour_pipeline
    from hgt2osm2_spark.sources.synthetic import tiles_df

    tiles = tiles_df(spark, n_tiles=6, size=33, seed=42)
    res = run_contour_pipeline(tiles, ContourOptions(), shuffle_partitions=8)
    res.nodes.write.mode("overwrite").parquet(out_dir)
    spark.stop()


if __name__ == "__main__":
    main()
