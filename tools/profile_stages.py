"""Per-stage wall-clock breakdown of the headline job at one core count.

Usage: python tools/profile_stages.py <cores> [n_tiles] [size]
Caches each stage before timing the next, so each number isolates one
stage's cost (kernel, window+explode, PIP join).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_tiles = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 201

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from hgt2osm2_spark.config import ContourOptions
    from hgt2osm2_spark.ops import spatial
    from hgt2osm2_spark.plans.pipeline import run_contour_pipeline
    from hgt2osm2_spark.session import get_spark
    from hgt2osm2_spark.sources import synthetic

    spark = get_spark("profile", cores=cores, shuffle_partitions=cores * 2)
    polys = entrymod._pip_polygons_df(spark)

    # warm-up
    run_contour_pipeline(synthetic.tiles_df(spark, n_tiles=8, size=33), ContourOptions()).nodes.count()

    t = {}
    t0 = time.time()
    tiles = synthetic.tiles_df(spark, n_tiles=n_tiles, size=size, partitions=max(n_tiles, cores * 2)).cache()
    tiles.count()
    t["gen"] = time.time() - t0

    res = run_contour_pipeline(tiles, ContourOptions(), shuffle_partitions=cores * 2)
    t0 = time.time()
    post = res.post.cache()
    n_post = post.count()
    t["kernel(post)"] = time.time() - t0

    from hgt2osm2_spark.ops import ids as ids_ops

    t0 = time.time()
    assigned = ids_ops.assign_ids(post.filter("kept"), ContourOptions())
    nodes = ids_ops.nodes_df(assigned).cache()
    n_nodes = nodes.count()
    t["ids+explode(nodes)"] = time.time() - t0

    t0 = time.time()
    pts = nodes.select(F.concat_ws("/", "image_id", "node_id").alias("q_id"), "lat", "lon")
    n_pip = spatial.pip_join(pts, polys, res=6).count()
    t["pip_join"] = time.time() - t0

    total = sum(t.values())
    print({k: round(v, 2) for k, v in t.items()},
          {"cores": cores, "post_rows": n_post, "nodes": n_nodes, "pip": n_pip,
           "total": round(total, 2)})
    spark.stop()


if __name__ == "__main__":
    main()
