"""hgt2osm2_spark — a PySpark-native spatial-join + tiling engine.

From-scratch re-imagination of the capabilities of FSofTlpz/Hgt2Osm2
(reference at /root/reference, C#, GPL-3): HGT elevation rasters ->
OSM contour-line vectors, rebuilt as a general raster<->vector toolkit
over a table of image+caption pairs, expressed Spark-first
(DataFrame/SQL + Arrow-vectorized UDFs, no per-row Python).

Layout:
  kernels/    pure NumPy/Python kernels (marching triangles, stitching,
              Douglas-Peucker, codecs) — no Spark imports, unit-testable
  sources/    synthetic tiles generator, decode (mapInArrow)
  ops/        Spark operators: contours, spatial joins, dedup, text,
              similarity, multimodal
  sinks/      OSM XML, ArcInfo ASCII grid, merge/union
  plans/      end-to-end pipeline + checkpoint/lineage/resume
  streaming/  optional Structured Streaming ingestion wrapper
"""

__version__ = "0.1.0"

NOVALUE = -32768  # sentinel for missing raster samples (HGTReader.cs:100)
