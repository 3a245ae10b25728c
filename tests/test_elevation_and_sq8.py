"""Round-6 operators: elevation-at-points (raster -> vector -> query)
and symmetric-SQ8 quantized search."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hgt2osm2_spark.config import ContourOptions
from hgt2osm2_spark.ops import elevation, quantized_search
from hgt2osm2_spark.ops.spatial import _ray_crossings
from hgt2osm2_spark.plans.pipeline import run_contour_pipeline
from hgt2osm2_spark.sources.synthetic import tiles_df
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def post_kept(spark):
    tiles = tiles_df(spark, n_tiles=6, size=33)
    res = run_contour_pipeline(tiles, ContourOptions(), shuffle_partitions=8,
                               band_rows=None)
    return res.post.filter("kept").cache()


def _sample_points(spark, rings_rows, per_ring=3):
    """Deterministic probes: ring centroids (likely inside) plus a
    fixed off-grid offset point per ring (arbitrary coverage)."""
    pts = []
    for i, r in enumerate(rings_rows):
        xs, ys = np.asarray(r["xs"]), np.asarray(r["ys"])
        pts.append((f"c{i}", float(ys.mean()), float(xs.mean())))
        pts.append((f"o{i}", float(ys.min() - 0.01), float(xs.min() - 0.01)))
    return spark.createDataFrame(pts, "q_id string, lat double, lon double")


def test_elevation_at_points_matches_bruteforce(spark, post_kept):
    rings = elevation.closed_ring_polygons(post_kept)
    rows = rings.collect()
    assert rows, "fixture must produce closed rings"
    pts = _sample_points(spark, rows)
    got = {r["q_id"]: (r["n_rings"], r["band_level"])
           for r in elevation.elevation_at_points(pts, post_kept).collect()}

    want = {}
    for p in pts.collect():
        enclosing = [
            r["level"] for r in rows
            if _ray_crossings(np.array([p["lon"]]), np.array([p["lat"]]),
                              np.asarray(r["xs"]), np.asarray(r["ys"]))[0]
        ]
        if enclosing:
            want[p["q_id"]] = (len(enclosing), max(enclosing))
    assert got == want and len(want) > 0


def test_elevation_handles_no_closed_rings(spark, post_kept):
    none = post_kept.filter(F.lit(False))
    pts = spark.createDataFrame([("q", 0.5, 0.5)],
                                "q_id string, lat double, lon double")
    assert elevation.elevation_at_points(pts, none).count() == 0


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _np_codes(x):
    m = np.abs(x).max()
    if m == 0:
        return np.zeros_like(x, dtype=np.int64)
    return np.clip(np.floor(x * 127.0 / m + 0.5), -127, 127).astype(np.int64)


def test_sq8_search_matches_numpy_twin(spark, embs):
    sub = embs.limit(120).cache()
    got = [(r["q_id"], r["p_id"], r["rnk"], r["dot"])
           for r in quantized_search.ann_int8_search(sub, n_queries=4, k=5)
           .orderBy("q_id", "rnk").collect()]

    src = {r["vec_id"]: np.asarray(r["embedding"], np.float64)
           for r in sub.collect()}
    codes = {vid: _np_codes(v) for vid, v in src.items()}
    want = []
    for qid in sorted(src)[:4]:
        scored = sorted(
            ((int(codes[qid] @ codes[pid]), pid) for pid in src if pid != qid),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        want.extend((qid, pid, rnk + 1, dot)
                    for rnk, (dot, pid) in enumerate(scored))
    assert got == want and len(got) == 20


def test_sq8_partition_invariance_and_recall(spark, embs):
    sub = embs.limit(200)
    a = set(map(tuple, quantized_search.ann_int8_search(sub, 4, 5).collect()))
    b = set(map(tuple, quantized_search.ann_int8_search(
        sub.repartition(13), 4, 5).collect()))
    assert a == b and len(a) == 20

    # sanity vs exact cosine: SQ8 top-5 overlaps exact top-5 (the
    # compressed tier is an approximation, not noise)
    src = {r["vec_id"]: np.asarray(r["embedding"], np.float64)
           for r in sub.collect()}
    overlap = 0
    for qid in sorted(src)[:4]:
        qv = src[qid]
        exact = sorted(
            ((float(qv @ src[p]) / (np.linalg.norm(qv) * np.linalg.norm(src[p])), p)
             for p in src if p != qid),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        exact_ids = {p for _s, p in exact}
        sq8_ids = {p for (q, p, _r, _d) in a if q == qid}
        overlap += len(exact_ids & sq8_ids)
    assert overlap >= 8  # >= 40% mean recall@5 on the fixture
