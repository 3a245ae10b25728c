"""ShowPoints/ShowAreas decorations (ContourProcessor2.cs:2062-2134)."""

from hgt2osm2_spark.ops import decorations
from hgt2osm2_spark.sources.synthetic import tiles_df


def test_show_points_box(spark):
    tiles = tiles_df(spark, n_tiles=2, size=9, seed=3)
    pts = decorations.show_points(tiles, 40.0, 0.0, 0.5, 0.5).collect()
    assert pts
    for r in pts:
        assert 40.0 <= r["lat"] <= 40.5 and 0.0 <= r["lon"] <= 0.5
        assert r["contour"] == "elevationpoint"
    # IDs unique and sequential per tile
    by_tile = {}
    for r in pts:
        by_tile.setdefault(r["image_id"], []).append(r["node_id"])
    for ids in by_tile.values():
        assert sorted(ids) == list(range(min(ids), min(ids) + len(ids)))


def test_show_areas_rectangles(spark):
    tiles = tiles_df(spark, n_tiles=1, size=9, seed=3)
    nodes, ways = decorations.show_areas(tiles, 40.0, 0.0, 0.3, 0.3)
    n = nodes.collect()
    w = ways.collect()
    assert n and w
    node_ids = {r["node_id"] for r in n}
    assert len(node_ids) == len(n)  # PointStore dedup -> unique corners
    for r in w:
        refs = r["node_refs"]
        assert len(refs) == 5 and refs[0] == refs[-1]  # closed rectangle
        assert set(refs) <= node_ids
        assert r["contour"] == "elevationarea"
    # shared corners: fewer nodes than 4x cells
    assert len(n) < 4 * len(w)


def test_decoration_id_bands_disjoint(spark):
    """ShowPoints, ShowAreas corner nodes, and ShowAreas ways emitted for
    the SAME tile must never share IDs (distinct sub-offsets within the
    decoration band)."""
    tiles = tiles_df(spark, n_tiles=1, size=9, seed=3)
    pts = decorations.show_points(tiles, 40.0, 0.0, 0.5, 0.5).collect()
    nodes, ways = decorations.show_areas(tiles, 40.0, 0.0, 0.5, 0.5)
    n, w = nodes.collect(), ways.collect()
    p_ids = {r["node_id"] for r in pts}
    an_ids = {r["node_id"] for r in n}
    aw_ids = {r["way_id"] for r in w}
    assert p_ids and an_ids and aw_ids
    assert not (p_ids & an_ids)
    assert not (p_ids & aw_ids)
    assert not (an_ids & aw_ids)
    # way refs resolve within the corner-node band
    for r in w:
        assert set(r["node_refs"]) <= an_ids
