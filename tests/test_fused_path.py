"""Fused (single-map) contour path == staged (shuffled) path, bit-for-bit."""

from hgt2osm2_spark.config import ContourOptions
from hgt2osm2_spark.plans.pipeline import run_contour_pipeline
from hgt2osm2_spark.sources.synthetic import tiles_df

OPT = ContourOptions()


def _rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_fused_equals_staged(spark):
    tiles = tiles_df(spark, n_tiles=5, size=25, seed=11).cache()
    fused = run_contour_pipeline(tiles, OPT, fused=True)
    staged = run_contour_pipeline(tiles, OPT, fused=False, shuffle_partitions=8)

    node_cols = ["image_id", "node_id", "level", "poly_ord", "lat", "lon"]
    way_cols = ["image_id", "way_id", "level", "poly_ord", "ele", "node_refs"]
    assert _rows(fused.nodes, node_cols) == _rows(staged.nodes, node_cols)
    assert _rows(fused.ways, way_cols) == _rows(staged.ways, way_cols)

    m_cols = ["image_id", "removed_polylines", "unnecessary_points",
              "douglas_peucker_points", "polylines", "points"]
    assert _rows(fused.metrics, m_cols) == _rows(staged.metrics, m_cols)


def test_fused_tile_nodes_equals_pipeline(spark):
    """Window-free per-tile ID assignment == window formulation."""
    from hgt2osm2_spark.ops import contours

    tiles = tiles_df(spark, n_tiles=4, size=21, seed=13).cache()
    direct = contours.fused_tile_nodes(tiles, OPT)
    via_windows = run_contour_pipeline(tiles, OPT).nodes
    cols = ["image_id", "node_id", "level", "poly_ord", "lat", "lon"]
    assert _rows(direct, cols) == _rows(via_windows, cols)
