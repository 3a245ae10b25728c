"""Raster tile pyramid: 2x overview levels (the slippy-map / COG
overview op every tiling engine ships; reference analogue: the per-tile
raster render path, Program.cs:242-265, which a real deployment would
serve at multiple zooms).

Level l+1 halves level l: parent (x, y) aggregates children
(2x..2x+1, 2y..2y+1). Parent rule: any NOVALUE child poisons the
parent (matches ops/multimodal.resize_tiles); otherwise the parent is
floor(mean(children)) — floor, not round-half-even, because it is the
one mean the engine AND any ANSI-SQL oracle compute bit-identically
(FLOOR(SUM/COUNT) — no tie-breaking mode to mismatch).

Everything is pure JVM column arithmetic: one hash-aggregate shuffle
per level on (image_id, x>>1, y>>1). At 10^12 cells the level-l
aggregation is embarrassingly parallel per tile and each level is 4x
smaller than the last, so the whole pyramid costs ~4/3 of one pass
over level 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..kernels import codecs


def explode_cells(tiles: DataFrame) -> DataFrame:
    """tiles (input_hint schema) -> per-cell rows
    (image_id, x, y, value) via one Arrow decode pass."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parts = []
            for img, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                grid = codecs.decode(bytes(data), fmt, int(w), int(h))
                gh, gw = grid.shape
                ys, xs = np.mgrid[0:gh, 0:gw]
                parts.append(pd.DataFrame({
                    "image_id": img,
                    "x": xs.ravel().astype(np.int32),
                    "y": ys.ravel().astype(np.int32),
                    "value": grid.ravel().astype(np.int32),
                }))
            yield pd.concat(parts, ignore_index=True) if parts else pd.DataFrame(
                {"image_id": [], "x": [], "y": [], "value": []}
            )

    return tiles.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        gen, schema="image_id string, x int, y int, value int"
    )


def pyramid_level_up(cells: DataFrame) -> DataFrame:
    """One halving step: (image_id, x, y, value) -> the next coarser
    level. Pure JVM: shift-right coordinates, hash aggregate, NOVALUE
    poisoning, floor-of-mean."""
    nv = int(codecs.NOVALUE)
    return (
        cells.groupBy(
            "image_id",
            F.shiftright("x", 1).alias("x"),
            F.shiftright("y", 1).alias("y"),
        )
        .agg(
            F.max((F.col("value") == nv).cast("int")).alias("_bad"),
            F.sum("value").alias("_s"),
            F.count("*").alias("_n"),
        )
        .select(
            "image_id", "x", "y",
            F.when(F.col("_bad") == 1, F.lit(nv))
            .otherwise(F.floor(F.col("_s") / F.col("_n")).cast("int"))
            .alias("value"),
        )
    )


def build_pyramid(cells: DataFrame, levels: int) -> DataFrame:
    """Level-0 cells -> union of levels 1..levels, tagged with a
    `level` column (level 0 is the input, not repeated in the output)."""
    if levels < 1:
        raise ValueError(f"build_pyramid: levels must be >= 1, got {levels}")
    out = None
    cur = cells
    for lvl in range(1, levels + 1):
        cur = pyramid_level_up(cur)
        tagged = cur.withColumn("level", F.lit(lvl))
        out = tagged if out is None else out.unionByName(tagged)
    return out
