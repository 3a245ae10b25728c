"""Elevation lookup over closed contour rings — raster -> vector -> query.

The natural end-use of the contour toolkit (north-star "raster<->vector
toolkit"): given the kept, CLOSED post-production polylines, answer
"what elevation band is point p in?" by point-in-polygon against the
contour rings. On terrain without depressions, nested contour rings at
levels l1 < l2 < ... enclose monotonically higher ground, so the
innermost enclosing ring's level — max(level) over enclosing rings — is
the lower bound of the point's elevation band (the reference's contour
semantics: a level-l isoline separates ground below l from ground at or
above l, ContourProcessor2.cs contour definition; we answer queries the
reference's OSM output consumers would run).

Scale shape: rings go through the same cell-cover candidate machinery
as ops.spatial.pip_join (broadcast cover + codegen'd exact ray cast) in
the shared degree frame (K6: lat = tile_lat + y/(h-1), lon = tile_lon +
x/(w-1) — the cross_tile convention), so queries against a planet's
worth of tiles stay an equi-join on cells; per-point aggregation is a
partial-aggregated groupBy on q_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..cache import scope as _cache_scope

from .ids import with_tile_key
from . import spatial

#: caches created by the previous call; released on the next call so a
#: long-lived session never accumulates executor storage
_CACHES = _cache_scope("elevation")


def closed_ring_polygons(post_kept: DataFrame) -> DataFrame:
    """Kept CLOSED polylines -> (poly_id, level, xs, ys) rings in
    degree space, ready for pip_join's polygon side."""
    d = with_tile_key(post_kept.where(F.col("closed")))
    return d.select(
        F.concat_ws("/", "image_id", "level", "poly_ord").alias("poly_id"),
        "level",
        F.transform("xs", lambda x: F.col("tile_lon") + x / (F.col("grid_w") - 1)).alias("xs"),
        F.transform("ys", lambda y: F.col("tile_lat") + y / (F.col("grid_h") - 1)).alias("ys"),
    )


def elevation_at_points(
    points: DataFrame,
    post_kept: DataFrame,
    res: int = 6,
    broadcast_rings: bool = True,
) -> DataFrame:
    """points(q_id, lat, lon) x kept post polylines ->
    (q_id, n_rings, band_level) for every point inside at least one
    closed ring: n_rings = how many rings enclose it (nesting depth),
    band_level = max enclosed level (the innermost band's lower bound).

    Points outside every ring are NOT emitted (their band is the tile
    base level, derivable from decode_stats; emitting only hits keeps
    the join semi-join-shaped at scale).

    The rings frame is cached (released on the NEXT call, the knn_join
    pattern): pip_join's max-ring-size driver agg and the join
    candidates would otherwise re-run the whole upstream contour
    pipeline per action. The ring's level rides in poly_id
    (image/level/ord), so no third lineage is needed to recover it."""
    _CACHES.release()
    rings = closed_ring_polygons(post_kept).cache()
    _CACHES.hold(rings)
    # broadcast_rings=False is the planet-scale path: a 10^12-tile
    # store's rings are not broadcast-small, so the cell-cover join
    # shuffles on cell instead (pip_join handles both)
    hits = spatial.pip_join(points, rings, res=res,
                            broadcast_polygons=broadcast_rings)
    level = F.split(F.col("poly_id"), "/").getItem(1).cast("int")
    return (
        hits.withColumn("level", level)
        .groupBy("q_id")
        .agg(
            F.count("*").alias("n_rings"),
            F.max("level").alias("band_level"),
        )
    )
