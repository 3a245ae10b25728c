"""End-to-end contour pipeline: tiles table -> nodes/ways/metrics.

Spark mapping of the reference's CreateIsohypsen flow
(/root/reference/ContourProcessor2.cs:1451-1624, SURVEY.md §3.1):

  tiles --mapInPandas--> segments --shuffle(image_id,level)-->
  polylines --mapInPandas--> post-production --windows--> IDs -->
  nodes / ways DataFrames (+ per-tile metrics)

Each stage returns a DataFrame so callers can persist/checkpoint any
intermediate (see plans/checkpoint.py for the resumable variant).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..config import ContourOptions
from ..ops import contours, ids


@dataclass
class ContourResult:
    segments: DataFrame | None
    polylines: DataFrame | None
    post: DataFrame
    assigned: DataFrame
    nodes: DataFrame
    ways: DataFrame
    metrics: DataFrame


def run_contour_pipeline(
    tiles: DataFrame,
    opt: ContourOptions | None = None,
    strict_reference: bool = True,
    shuffle_partitions: int | None = None,
    fused: bool = True,
) -> ContourResult:
    """fused=True (default): stages 1-5 run as one narrow map per tile
    (contours.extract_stitch_post_fused) — zero shuffles before ID
    assignment; right grain when #tiles >> #cores (the 10^12 design
    point). fused=False: staged variant with a per-(tile,level) shuffle
    for intra-tile parallelism + stage-level checkpointing."""
    opt = opt or ContourOptions()
    dims = tiles.select("image_id", "w", "h")

    if fused:
        segments = polylines = None
        post = contours.extract_stitch_post_fused(tiles, opt, strict_reference)
    else:
        segments = contours.extract_contour_segments(tiles, opt)
        polylines = contours.stitch_polylines(segments, shuffle_partitions)
        post = contours.postprocess_polylines(polylines, dims, opt, strict_reference)
    metrics = contours.postprocess_metrics(post)

    kept = post.filter("kept")
    assigned = ids.assign_ids(kept, opt)
    nodes = ids.nodes_df(assigned)
    ways = ids.ways_df(assigned, opt)
    return ContourResult(segments, polylines, post, assigned, nodes, ways, metrics)
