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
        cell -> exact ray-crossing test as an UNROLLED codegen
        expression (r5; numpy fallback for >64-vertex rings).
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

from ..cache import scope as _cache_scope


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
    sequence+explode (bounded codegen for any k, unlike a literal array).

    The cell array is ``array_distinct``-ed BEFORE the explode: distinct
    (dx, dy) offsets normally pack to distinct ids, but near the domain
    edge (ix+dx < 0) two offsets can collide in the packed id — deduping
    locally here (narrow op, no shuffle) is what lets knn_join join each
    (query, point) pair at most once without a shuffled dropDuplicates
    over the whole candidate set."""
    cpd = float(2**res)
    ix = F.floor((F.col(lon) + F.lit(180.0)) * F.lit(cpd)).cast("long")
    iy = F.floor((F.col(lat) + F.lit(90.0)) * F.lit(cpd)).cast("long")
    offsets = F.sequence(F.lit(-k), F.lit(k))
    cells = F.flatten(
        F.transform(
            offsets,
            lambda dx: F.transform(
                offsets, lambda dy: _pack(F.col("_ix") + dx, F.col("_iy") + dy, res)
            ),
        )
    )
    return (
        df.withColumn("_ix", ix)
        .withColumn("_iy", iy)
        .withColumn(out, F.explode(F.array_distinct(cells)))
        .drop("_ix", "_iy")
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

#: rings at or below this length get the unrolled codegen ray cast in
#: pip_join; longer rings use the batched numpy fallback
_PIP_UNROLL_MAX = 64

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
    return pip_hits(
        points, polygons, res=res, broadcast_polygons=broadcast_polygons,
        repartition=repartition,
    ).select("q_id", "poly_id", "lat", "lon")


def pip_hits(
    points: DataFrame,
    polygons: DataFrame,
    res: int = 6,
    broadcast_polygons: bool = True,
    repartition: int | None = None,
) -> DataFrame:
    """pip_join's engine, keeping EVERY point-side column on the hit
    rows (plus poly_id) — the reusable core for consumers that carry a
    payload through the containment test (zonal_stats carries the cell
    value; pip_join projects down to the classic 4-column shape).

    r8 (ADVICE r7 #4): the join's internal columns use collision-safe
    __pip_* names, so a point-side payload named cell/xs/ys passes
    through untouched; only lat/lon (the probe coordinates, part of
    the contract) and poly_id (the output label) are reserved — a
    points frame already carrying poly_id or a __pip_* column raises
    instead of silently corrupting output."""
    reserved = {"poly_id"} | {c for c in points.columns
                              if c.startswith("__pip_")}
    clash = reserved & set(points.columns)
    if clash:
        raise ValueError(
            f"pip_hits: points frame carries reserved column(s) {sorted(clash)}"
        )
    cover = polygon_cover_cells(polygons, res).select(
        F.col("cell").alias("__pip_cell"),
        "poly_id",
        F.col("xs").alias("__pip_xs"),
        F.col("ys").alias("__pip_ys"),
    )
    if broadcast_polygons:
        cover = F.broadcast(cover)
    pts = points.withColumn(
        "__pip_cell", cell_expr(F.col("lat"), F.col("lon"), res))
    if repartition:
        pts = pts.repartition(repartition, "__pip_cell")
    cand = pts.join(cover, "__pip_cell", "inner")

    # exact even-odd ray cast as a PURE JVM expression (r5): same IEEE
    # arithmetic as the numpy twin (_ray_crossings, kept below as the
    # test oracle) — no ArrowEvalPython, no per-candidate ring-array
    # transfer to Python. Edge (i, j=i-1 mod n): crossing iff
    # (yi>py) != (yj>py) AND px < (xj-xi)*(py-yi)/(yj-yi)+xi;
    # XOR-accumulated. The division can only produce inf/NaN when
    # yi == yj, where the first conjunct is already false, so the
    # predicate is never null.
    #
    # Polygons are broadcast-small by contract, so one tiny driver agg
    # reads the max ring length and the XOR chain is UNROLLED to that
    # depth as plain CaseWhen/element_at expressions — whole-stage
    # codegen applies (higher-order aggregate() lambdas run
    # INTERPRETED, ~3x slower here; the fold also trips a Catalyst
    # pushdown bug where lambda-captured outer attributes go untracked
    # and the filter lands on the wrong join side). Rings longer than
    # _PIP_UNROLL_MAX fall back to the vectorized numpy ray cast via a
    # pandas UDF.
    max_n = polygons.agg(F.max(F.size("xs"))).first()[0] or 0
    if max_n == 0:
        # empty polygon side: no ring can contain anything; short-circuit
        # before the unrolled loop (which would otherwise build no
        # predicate and pass None to filter)
        hit = cand.filter(F.lit(False))
    elif max_n <= _PIP_UNROLL_MAX:
        px, py = F.col("lon"), F.col("lat")
        n = F.size("__pip_xs")
        inside = None
        for i in range(max_n):
            j1 = (n - 1) + 1 if i == 0 else F.lit(i)  # 1-based index of j
            xi = F.element_at(F.col("__pip_xs"), i + 1)
            yi = F.element_at(F.col("__pip_ys"), i + 1)
            xj = F.element_at(F.col("__pip_xs"), j1)
            yj = F.element_at(F.col("__pip_ys"), j1)
            cross = F.when(
                F.lit(i) < n,
                ((yi > py) != (yj > py))
                & (px < (xj - xi) * (py - yi) / (yj - yi) + xi),
            ).otherwise(F.lit(False))
            inside = cross if inside is None else (inside != cross)
        hit = cand.filter(inside)
    else:
        @F.pandas_udf(T.BooleanType())
        def exact_pip(px: pd.Series, py: pd.Series, xs: pd.Series, ys: pd.Series) -> pd.Series:
            out = np.zeros(len(px), dtype=bool)
            pxv, pyv = px.to_numpy(), py.to_numpy()
            for k, (rx, ry) in enumerate(zip(xs, ys)):
                out[k] = _ray_crossings(
                    pxv[k:k + 1], pyv[k:k + 1],
                    np.asarray(rx, np.float64), np.asarray(ry, np.float64),
                )[0]
            return pd.Series(out)

        hit = cand.filter(exact_pip(
            F.col("lon"), F.col("lat"),
            F.col("__pip_xs"), F.col("__pip_ys")))
    return hit.drop("__pip_cell", "__pip_xs", "__pip_ys")


# ------------------------------------------------------------- kNN join

#: caches created by the previous knn_join call; released on the next
#: call (or via cache.release_all) so a long-lived session never
#: accumulates executor storage. A caller that lazily re-materializes
#: an OLD knn result after a new call recomputes instead of reading
#: cache — correct, just slower.
_CACHES = _cache_scope("knn")

#: telemetry of the most recent knn_join call — settled vs fallback
#: query counts, so a skewed dataset can't silently degrade to the
#: broadcast-scan fallback ("no silent caps").
LAST_KNN_METRICS: dict = {}


#: per-key memo of {n, lat0, lat1, lon0, lon1, n_queries} — the local
#: analogue of reading a precomputed point-density row from the lineage
#: metrics table (plans/checkpoint.py): repeat runs over the same
#: dataset skip the ring-sizing stats job and the query-count job
#: entirely (VERDICT r2 "What's wrong" #2).
_KNN_STATS_MEMO: dict[str, dict] = {}


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int = 5,
    res: int = 6,
    ring: int | None = None,
    max_ring: int = 8,
    metrics_sink=None,
    stats: dict | None = None,
    stats_key: str | None = None,
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
    and, when given, ``metrics_sink(dict)`` — the lineage/metrics hook.

    Repeat-run fast path: pass ``stats`` (point count + bbox, optionally
    n_queries) or ``stats_key`` (memoized per key after the first call —
    the local stand-in for the lineage metrics table) and the ring-sizing
    stats job over the (large) point side is skipped. The hint sizes the
    ring ONLY: the pass-2 gate and telemetry are always derived from the
    data (cached settled markers + an anti-join count over the small
    query side), so a stale hint can never drop unsettled queries."""
    _CACHES.release()
    # pts is NOT cached: in the common all-settled case it is scanned
    # exactly once (pass-1 join); caching 100 TB of points to maybe
    # serve a rare fallback re-scan is the wrong trade at scale and was
    # measurably the wrong trade at sf0.1 too (cache write + storage
    # eviction per call). The fallback tail recomputes the narrow
    # select+cell projection instead.
    pts = points.select(
        F.col("p_id"), F.col("lat").alias("p_lat"), F.col("lon").alias("p_lon")
    ).withColumn("cell", cell_expr(F.col("p_lat"), F.col("p_lon"), res))

    if stats is None and stats_key is not None:
        stats = _KNN_STATS_MEMO.get(stats_key)
    cell_w = 1.0 / (2**res)
    if ring is None:
        # density-adaptive ring: expected k-NN radius for a roughly
        # uniform point set is r ~ sqrt((k+1) * area / (pi * n)); pick
        # the smallest ring whose guard covers it so pass 1 settles the
        # bulk instead of dumping everything into the fallback. One
        # tiny agg job on the first run; hinted/memoized runs skip it.
        import math

        if stats is None or "n" not in stats:
            row = pts.agg(
                F.count("*").alias("n"),
                F.min("p_lat").alias("lat0"), F.max("p_lat").alias("lat1"),
                F.min("p_lon").alias("lon0"), F.max("p_lon").alias("lon1"),
            ).collect()[0]
            stats = dict(stats or {}, **{c: row[c] for c in ("n", "lat0", "lat1", "lon0", "lon1")})
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
    # per ring). (q_id, p_id) pairs are unique by construction: a point
    # lives in exactly one cell and with_k_ring dedupes ring cells
    # locally — no shuffled dropDuplicates over the candidate set.
    # the ring-expanded query side is broadcast: the (large) point side
    # then never shuffles for this join — only the candidate rows move
    # in the later q_id window shuffle. At scale with a big query side,
    # callers repartition both sides by cell instead (bucketed layout).
    cand1 = (
        F.broadcast(with_k_ring(queries.select("q_id", "lat", "lon"), "lat", "lon", res, ring))
        .join(pts, "cell", "inner")
        .withColumn("dist2", d2)
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
    _CACHES.hold(topk1)
    settled = topk1.filter("_settled").select(out_cols)

    # fallback gate + telemetry — both DATA-DERIVED (ADVICE r3: the
    # n_queries hint must never gate pass 2 — a stale memo in a
    # long-lived session, e.g. after the query set grows under the same
    # stats_key, could make n_total <= n_settled and silently drop
    # unsettled queries). The hint now feeds ring sizing only. Two tiny
    # jobs, both over cached/small data: settled count off the CACHED
    # topk1 (rnk==1 marks each settled query exactly once) and the
    # unsettled count via anti-join of the (small, broadcastable) query
    # side against the cached settled ids.
    n_settled = topk1.filter("_settled AND rnk = 1").count()
    settled_ids = topk1.filter("_settled").select("q_id")
    remaining = queries.select("q_id", "lat", "lon").join(
        F.broadcast(settled_ids), "q_id", "left_anti"
    )
    n_fallback = remaining.count()
    n_total = n_settled + n_fallback
    if stats_key is not None:
        _KNN_STATS_MEMO[stats_key] = dict(stats or {}, n_queries=n_total)
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
    fb = topk_of(
        F.broadcast(remaining).crossJoin(pts.drop("cell")).withColumn("dist2", d2)
    ).select(out_cols)
    return settled.unionByName(fb)


# --------------------------------------------------- z-order layout

def zorder_key(ix: Column, iy: Column, bits: int = 16) -> Column:
    """Morton/Z-order interleave of two non-negative integer columns —
    the Iceberg/Delta Z-ORDER clustering transform, as a pure JVM column
    expression (no UDF, fully codegen'd; `bits` additive terms, linear
    in `bits`, no combinatorial expansion).

    Writing a table range-partitioned + sorted by this key co-locates
    spatially-near rows in the same files, so min/max file statistics
    prune 2-D bbox predicates — the storage-layout half of data
    skipping that cell_expr's read-side predicates exploit.

    `bits` must cover the full coordinate range — high bits beyond it
    are DROPPED, aliasing far-apart locations onto one key. For the
    res-quantized globe that is res+9 bits for lon (360*2^res values);
    zorder_layout computes this itself."""
    if not 1 <= bits <= 31:
        raise ValueError(f"zorder_key: bits must be in [1, 31], got {bits}")
    x = ix.cast("long")
    y = iy.cast("long")
    key = F.lit(0).cast("long")
    for b in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b)
        )
    return key


def zorder_layout(
    df: DataFrame,
    lat: str = "lat",
    lon: str = "lon",
    res: int = 10,
    n_files: int | None = None,
    bits: int | None = None,
) -> DataFrame:
    """Rewrite `df` into Z-order-clustered layout: grid-quantize
    (lat,lon) at `res`, interleave to a Morton key, range-partition into
    `n_files` output units and sort within each.  The returned frame
    written as-is produces files whose (lat,lon) min/max footprints are
    compact squares instead of full-extent stripes — the write-side
    complement of the read-side cell pruning.

    bits defaults to res+9, the width that covers the full quantized
    globe (lon: 360*2^res values needs ceil(log2(360))+res = 9+res
    bits) — a narrower width would silently alias far-apart longitudes
    onto one key and defeat the skipping."""
    if bits is None:
        bits = res + 9
    cpd = float(2**res)
    ixc = F.floor((F.col(lon) + F.lit(180.0)) * F.lit(cpd)).cast("long")
    iyc = F.floor((F.col(lat) + F.lit(90.0)) * F.lit(cpd)).cast("long")
    keyed = df.withColumn("_zkey", zorder_key(ixc, iyc, bits))
    parts = n_files or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return (
        keyed.repartitionByRange(int(parts), "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )


# ------------------------------------------------- geodesic distance

EARTH_RADIUS_KM = 6371.0088  # IUGG mean radius


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km — pure JVM trig expression (K4
    family). The engine's join kernels stay planar-degree on purpose
    (reference-faithful, ContourProcessor2 works in tile-local degree
    space); this is the true-distance scalar a general toolkit needs
    for high-latitude or cross-tile measurement, where planar degrees
    distort by cos(lat)."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rl1) * F.cos(rl2) * F.sin(dlon) * F.sin(dlon)
    )
    # near-antipodal points push `a` to 1+4e-16 in float64; unclamped,
    # asin(sqrt(a)) is NaN — clamp to the asin domain
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(F.least(a, F.lit(1.0))))
