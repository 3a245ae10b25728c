"""F1/F2 crop semantics (bug-compatible stats), K11 point store,
S8 debug render."""

import numpy as np

from hgt2osm2_spark.kernels import codecs
from hgt2osm2_spark.ops import crop
from hgt2osm2_spark.sources.synthetic import tiles_df


def test_crop_grid_masks_and_stats():
    grid = np.arange(1, 26, dtype=np.int16).reshape(5, 5)
    out, stats = crop.crop_grid(grid, 1, 1, 3, 3)
    assert (out[0, :] == codecs.NOVALUE).all()
    assert (out[:, 4] == codecs.NOVALUE).all()
    assert out[2, 2] == grid[2, 2]
    assert stats["kept"] == 9
    assert stats["not_valid"] == 25 - 9
    assert stats["minimum"] == int(grid[1:4, 1:4].min())
    assert stats["maximum"] == int(grid[1:4, 1:4].max())


def test_crop_grid_all_invalid_quirk():
    grid = np.full((3, 3), 7, dtype=np.int16)
    out, stats = crop.crop_grid(grid, 5, 5, 6, 6)  # window misses grid
    # reference scans Maximum over ALL samples -> NoValue; Minimum keeps
    # its Int16.MaxValue init (HGTReader.cs:245-254)
    assert stats["maximum"] == codecs.NOVALUE
    assert stats["minimum"] == 32767
    assert stats["not_valid"] == 9


def test_degree_window_truncation():
    # HGTReader.cs:266-273: (int)(f * Columns), NOT Columns-1
    win = crop.degree_window_to_index(2, 51, 10, 10, 2.25, 51.25, 2.75, 51.75)
    assert win == (2, 2, 7, 7)
    # clamped outside box covers everything
    assert crop.degree_window_to_index(2, 51, 10, 10, 0.0, 0.0, 90.0, 90.0) == (0, 0, 10, 10)


def test_crop_tiles_roundtrip(spark):
    tiles = tiles_df(spark, n_tiles=3, size=17, seed=3)
    out = crop.crop_tiles(tiles, 0.25, 40.25, 0.75, 43.75)
    rows = out.collect()
    assert len(rows) == 3
    for r in rows:
        grid = codecs.decode(bytes(r["bytes"]), r["fmt"], r["w"], r["h"])
        valid = grid != codecs.NOVALUE
        assert int((~valid).sum()) == r["not_valid"]
        assert codecs.phash64(grid) == r["phash"]  # row invariant re-holds


def test_point_store_first_wins(spark):
    import pandas as pd

    from hgt2osm2_spark.ops import ids as ids_ops

    df = spark.createDataFrame(
        pd.DataFrame(
            {"x": [1.0, 2.0, 1.0, 3.0], "y": [1.0, 1.0, 1.0, 2.0], "ord": [10, 20, 30, 5]}
        )
    )
    out = {(r["x"], r["y"], r["ord"]): r["pseudo_id"]
           for r in ids_ops.point_store_ids(df, ord_col="ord").collect()}
    # insertion order by ord: (3,2) first -> -1, (1,1) -> -2, (2,1) -> -3
    assert out[(3.0, 2.0, 5)] == -1
    assert out[(1.0, 1.0, 10)] == -2 and out[(1.0, 1.0, 30)] == -2
    assert out[(2.0, 1.0, 20)] == -3


def test_debug_render(spark):
    from hgt2osm2_spark.config import ContourOptions
    from hgt2osm2_spark.plans.pipeline import run_contour_pipeline
    from hgt2osm2_spark.sinks import debug_png

    tiles = tiles_df(spark, n_tiles=2, size=17, seed=3)
    post = run_contour_pipeline(tiles, ContourOptions()).post.filter("kept")
    out = debug_png.render_polylines(post, width=64).collect()
    assert len(out) == 2
    assert all(bytes(r["payload"])[:8] == b"\x89PNG\r\n\x1a\n" for r in out)


def test_point_store_per_tile_scale_path(spark):
    """Partitioned PointStore: same first-wins dense-negative semantics
    as the global variant, but windowed per tile (no single-task global
    sort). Per tile, the id sequence must equal the global variant run
    on that tile alone."""
    import pandas as pd

    from hgt2osm2_spark.ops import ids as ids_ops

    rows = []
    for t, n in (("n40e000_0", 7), ("n41e002_0", 5)):
        for i in range(n):
            # duplicates: every other point repeats the previous one
            xi = (i // 2) * 1.5
            rows.append({"image_id": t, "x": xi, "y": xi * 2, "p_id": i})
    df = spark.createDataFrame(pd.DataFrame(rows))

    out = ids_ops.point_store_ids_per_tile(df, ord_col="p_id").toPandas()
    for t, grp in out.groupby("image_id"):
        solo = ids_ops.point_store_ids(
            df.filter(df.image_id == t).select("x", "y", "p_id"), ord_col="p_id"
        ).toPandas()
        got = grp.sort_values("p_id").pseudo_id.tolist()
        want = solo.sort_values("p_id").pseudo_id.tolist()
        assert got == want
        # dense negative ids starting at -1 per tile
        assert set(grp.pseudo_id) == set(range(-1, -1 - grp.pseudo_id.nunique(), -1))
