"""Spatial layer: cell index, point-in-polygon join, kNN join (J3/J4/K12).

These are the north_rule operators absent from the reference (contours
are produced, not queried there — SURVEY.md §2.3). The cell index is a
quantized lat/lon grid with Morton-style packing — same role as an
H3/S2 cell (prefilter + partition/salt key); implemented as pure Spark
column expressions so encoding is JVM-side and codegen'd, no UDF.

Cell id layout (int64): res << 48 | ix << 24 | iy, where
ix = floor((lon+180) * 2^res), iy = floor((lat+90) * 2^res).
res <= 16 keeps both indices under 2^24.

Join strategies:
  PIP : polygons -> covering cells (explode, JVM-side) -> equi-join on
        cell -> exact ray-crossing test in an Arrow-vectorized UDF.
        Polygon side is broadcast when small.
  kNN : query cell k-ring expand (explode) -> equi-join on cell ->
        planar squared distance -> Window row_number() <= k. Callers
        grow k until the ring radius covers the k-th distance
        (knn_join handles the growth loop).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W, functions as F, types as T


# ------------------------------------------------------------- cell index

def cell_expr(lat: Column, lon: Column, res: int) -> Column:
    """Cell id as a JVM-side column expression (K12)."""
    cpd = float(2**res)
    ix = F.floor((lon + F.lit(180.0)) * F.lit(cpd)).cast("long")
    iy = F.floor((lat + F.lit(90.0)) * F.lit(cpd)).cast("long")
    return (
        F.shiftleft(F.lit(int(res)).cast("long"), 48)
        .bitwiseOR(F.shiftleft(ix, 24))
        .bitwiseOR(iy)
    )


def cell_ranges_expr(min_lat, min_lon, max_lat, max_lon, res: int):
    """(ix_lo, ix_hi, iy_lo, iy_hi) column exprs for a bbox cover."""
    cpd = float(2**res)
    return (
        F.floor((min_lon + F.lit(180.0)) * F.lit(cpd)).cast("long"),
        F.floor((max_lon + F.lit(180.0)) * F.lit(cpd)).cast("long"),
        F.floor((min_lat + F.lit(90.0)) * F.lit(cpd)).cast("long"),
        F.floor((max_lat + F.lit(90.0)) * F.lit(cpd)).cast("long"),
    )


def _pack(ix: Column, iy: Column, res: int) -> Column:
    return (
        F.shiftleft(F.lit(int(res)).cast("long"), 48)
        .bitwiseOR(F.shiftleft(ix, 24))
        .bitwiseOR(iy)
    )


def with_k_ring(df: DataFrame, lat: str, lon: str, res: int, k: int,
                out: str = "cell") -> DataFrame:
    """Explode each row into its (2k+1)^2 neighborhood cells via
    sequence+explode (bounded codegen for any k, unlike a literal array)."""
    cpd = float(2**res)
    ix = F.floor((F.col(lon) + F.lit(180.0)) * F.lit(cpd)).cast("long")
    iy = F.floor((F.col(lat) + F.lit(90.0)) * F.lit(cpd)).cast("long")
    return (
        df.withColumn("_ix", ix)
        .withColumn("_iy", iy)
        .withColumn("_dx", F.explode(F.sequence(F.lit(-k), F.lit(k))))
        .withColumn("_dy", F.explode(F.sequence(F.lit(-k), F.lit(k))))
        .withColumn(out, _pack(F.col("_ix") + F.col("_dx"), F.col("_iy") + F.col("_dy"), res))
        .drop("_ix", "_iy", "_dx", "_dy")
    )


# ------------------------------------------------------------- polygons

def polygon_cover_cells(polygons: DataFrame, res: int) -> DataFrame:
    """polygons(poly_id, xs array<double>, ys array<double>) ->
    (poly_id, cell) covering the polygon bbox. Pure column ops
    (sequence + explode) — a safe superset; the exact test runs after
    the equi-join. xs=lon, ys=lat."""
    ix_lo, ix_hi, iy_lo, iy_hi = cell_ranges_expr(
        F.array_min("ys"), F.array_min("xs"), F.array_max("ys"), F.array_max("xs"), res
    )
    d = (
        polygons.withColumn("_ix", F.explode(F.sequence(ix_lo, ix_hi)))
        .withColumn("_iy", F.explode(F.sequence(iy_lo, iy_hi)))
        .withColumn("cell", _pack(F.col("_ix"), F.col("_iy"), res))
    )
    return d.select("poly_id", "cell", "xs", "ys")


# ------------------------------------------------------------- exact PIP

def _ray_crossings(px: np.ndarray, py: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Even-odd rule, vectorized over points for one ring."""
    inside = np.zeros(px.shape, dtype=bool)
    n = len(xs)
    j = n - 1
    for i in range(n):
        xi, yi, xj, yj = xs[i], ys[i], xs[j], ys[j]
        cond = (yi > py) != (yj > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (xj - xi) * (py - yi) / (yj - yi) + xi
        inside ^= cond & (px < xint)
        j = i
    return inside


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    res: int = 6,
    broadcast_polygons: bool = True,
    repartition: int | None = None,
) -> DataFrame:
    """points(q_id, lat, lon) x polygons(poly_id, xs, ys) ->
    (q_id, poly_id, lat, lon). Cell prefilter + exact ray-crossing."""
    cover = polygon_cover_cells(polygons, res)
    if broadcast_polygons:
        cover = F.broadcast(cover)
    pts = points.withColumn("cell", cell_expr(F.col("lat"), F.col("lon"), res))
    if repartition:
        pts = pts.repartition(repartition, "cell")
    cand = pts.join(cover, "cell", "inner")

    @F.pandas_udf(T.BooleanType())
    def exact_pip(pid: pd.Series, px: pd.Series, py: pd.Series, xs: pd.Series, ys: pd.Series) -> pd.Series:
        out = np.zeros(len(px), dtype=bool)
        if len(px) == 0:
            return pd.Series(out)
        pxv = px.to_numpy()
        pyv = py.to_numpy()
        # rings repeat per batch — vectorize the ray cast over the points
        # of each polygon group
        pid = pid.reset_index(drop=True)
        xs_l = xs.tolist()
        ys_l = ys.tolist()
        for _, idx in pid.groupby(pid).groups.items():
            ii = np.asarray(idx)
            ring_x = np.asarray(xs_l[ii[0]], dtype=np.float64)
            ring_y = np.asarray(ys_l[ii[0]], dtype=np.float64)
            out[ii] = _ray_crossings(pxv[ii], pyv[ii], ring_x, ring_y)
        return pd.Series(out)

    hit = cand.filter(exact_pip(F.col("poly_id"), F.col("lon"), F.col("lat"), F.col("xs"), F.col("ys")))
    return hit.select("q_id", "poly_id", "lat", "lon")


# ------------------------------------------------------------- kNN join

#: caches created by the previous knn_join call; released on the next
#: call (or via release_caches) so a long-lived session never
#: accumulates executor storage. A caller that lazily re-materializes
#: an OLD knn result after a new call recomputes instead of reading
#: cache — correct, just slower.
_LIVE_CACHES: list[DataFrame] = []

#: telemetry of the most recent knn_join call — settled vs fallback
#: query counts, so a skewed dataset can't silently degrade to the
#: broadcast-scan fallback ("no silent caps").
LAST_KNN_METRICS: dict = {}


def release_caches() -> None:
    while _LIVE_CACHES:
        df = _LIVE_CACHES.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int = 5,
    res: int = 6,
    ring: int | None = None,
    max_ring: int = 8,
    metrics_sink=None,
) -> DataFrame:
    """queries(q_id, lat, lon) x points(p_id, lat, lon) -> top-k nearest
    (planar squared degree distance, deterministic p_id tiebreak).

    Two-phase exact kNN: one (2*ring+1)^2 cell-neighborhood join pass
    settles every query whose k-th neighbor is *provably* inside the
    ring (k hits and max distance <= ring cell width); the rest fall
    back to a broadcast exhaustive pass. Exactness: a hit at distance d
    can only be missed by pass 1 if d > ring_width, which the guard
    rules out — then pass 2 is exhaustive. max_ring is kept for API
    compatibility (the fallback replaces ring growth; growth rebuilt
    its full lineage every iteration and serialized on driver syncs).

    Telemetry: settled/fallback query counts land in LAST_KNN_METRICS
    and, when given, ``metrics_sink(dict)`` — the lineage/metrics hook."""
    release_caches()
    pts = points.select(
        F.col("p_id"), F.col("lat").alias("p_lat"), F.col("lon").alias("p_lon")
    ).withColumn("cell", cell_expr(F.col("p_lat"), F.col("p_lon"), res)).cache()

    cell_w = 1.0 / (2**res)
    if ring is None:
        # density-adaptive ring: expected k-NN radius for a roughly
        # uniform point set is r ~ sqrt((k+1) * area / (pi * n)); pick
        # the smallest ring whose guard covers it so pass 1 settles the
        # bulk instead of dumping everything into the fallback. One
        # tiny agg job — worth it: the fallback is a cross join.
        import math

        stats = pts.agg(
            F.count("*").alias("n"),
            F.min("p_lat").alias("lat0"), F.max("p_lat").alias("lat1"),
            F.min("p_lon").alias("lon0"), F.max("p_lon").alias("lon1"),
        ).collect()[0]
        area = max((stats["lat1"] - stats["lat0"]) * (stats["lon1"] - stats["lon0"]), 1e-12)
        r_est = math.sqrt((k + 1) * area / (math.pi * max(stats["n"], 1)))
        ring = min(max(int(math.ceil(1.5 * r_est / cell_w)), 1), max_ring)
    out_cols = ["q_id", "p_id", "dist2", "rnk"]
    d2 = (
        (F.col("lat") - F.col("p_lat")) * (F.col("lat") - F.col("p_lat"))
        + (F.col("lon") - F.col("p_lon")) * (F.col("lon") - F.col("p_lon"))
    )  # plain multiplication, not pow(): bit-identical to the IEEE oracle

    def topk_of(cand: DataFrame) -> DataFrame:
        w = W.partitionBy("q_id").orderBy(F.col("dist2").asc(), F.col("p_id").asc())
        return cand.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)

    # pass 1 — one ring-join pass; cache so the settled/unsettled split
    # doesn't recompute the join (the old geometric-growth loop rebuilt
    # its whole lineage every iteration: O(rings^2) work + driver sync
    # per ring)
    cand1 = (
        with_k_ring(queries.select("q_id", "lat", "lon"), "lat", "lon", res, ring)
        .join(pts, "cell", "inner")
        .withColumn("dist2", d2)
        # the same point can appear via several ring cells of one query
        .dropDuplicates(["q_id", "p_id"])
    )
    # a query is settled when it has k hits and the k-th distance is
    # covered by the ring (no closer point can live outside it). The
    # check rides the SAME q_id partitioning as the ranking window —
    # no extra shuffle for a groupBy + semi-join round trip.
    guard = (ring * cell_w) ** 2
    wq = W.partitionBy("q_id")
    topk1 = (
        topk_of(cand1)
        .withColumn("_n", F.count("*").over(wq))
        .withColumn("_maxd", F.max("dist2").over(wq))
        .withColumn("_settled", (F.col("_n") == k) & (F.col("_maxd") <= F.lit(guard)))
        .cache()
    )
    _LIVE_CACHES.extend([pts, topk1])
    settled = topk1.filter("_settled").select(out_cols)

    # telemetry — ONE job: left-join the (small) query side against the
    # cached settled ids and count both sides; also gates the fallback
    # (replaces the old remaining.isEmpty() job)
    trow = (
        queries.select("q_id").distinct()
        .join(
            topk1.filter("_settled").select("q_id").distinct()
            .withColumn("_s", F.lit(1)),
            "q_id", "left",
        )
        .agg(F.count("*").alias("n_total"), F.sum("_s").alias("n_settled"))
        .collect()[0]
    )
    n_total = int(trow["n_total"])
    n_settled = int(trow["n_settled"] or 0)
    n_fallback = n_total - n_settled
    LAST_KNN_METRICS.clear()
    LAST_KNN_METRICS.update(
        {"ring": int(ring), "res": int(res), "k": int(k),
         "n_queries": int(n_total), "n_settled": int(n_settled),
         "n_fallback": int(n_fallback)}
    )
    if metrics_sink is not None:
        metrics_sink(dict(LAST_KNN_METRICS))

    if n_fallback == 0:
        return settled

    # pass 2 — exhaustive fallback for the stragglers only (sparse
    # regions / ring misses). Queries are the small side: broadcast
    # them against all points; at scale this is a tiny tail.
    settled_ids = topk1.filter("_settled").select("q_id")
    remaining = queries.select("q_id", "lat", "lon").join(settled_ids, "q_id", "left_anti")
    fb = topk_of(
        F.broadcast(remaining).crossJoin(pts.drop("cell")).withColumn("dist2", d2)
    ).select(out_cols)
    return settled.unionByName(fb)
