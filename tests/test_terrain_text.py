"""Tests for the r7 trio: Horn terrain derivatives (ops/terrain.py)
and the two text-hygiene ops (decontaminate, repetition_stats in
ops/text.py). Each op gets (a) a scalar/hand-computed twin check and
(b) a plan-shape assertion matching its documented scale story."""

import math

import numpy as np
import pandas as pd
import pytest

from hgt2osm2_spark.kernels import codecs
from hgt2osm2_spark.ops import terrain, text

NV = int(codecs.NOVALUE)


def _horn_scalar(grid):
    """Pure-Python per-cell twin of terrain.horn_grid: nested loops,
    no numpy arithmetic beyond indexing."""
    h, w = grid.shape
    out = []
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            nb = [int(grid[y + dy, x + dx])
                  for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
            if NV in nb:
                continue
            a, b, c, d, _e, f, g, hh, i = nb
            ndx = (c + 2 * f + i) - (a + 2 * d + g)
            ndy = (g + 2 * hh + i) - (a + 2 * b + c)
            out.append((y, x, ndx, ndy))
    return out


def _aspect_scalar(ndx, ndy):
    """atan2-based octant twin: sector k = floor(theta/45deg) with
    theta measured from +x through +y in [0, 360)."""
    if ndx == 0 and ndy == 0:
        return -1
    theta = math.degrees(math.atan2(ndy, ndx)) % 360.0
    return int(theta // 45.0) % 8


def test_horn_grid_matches_scalar_twin():
    rng = np.random.default_rng(7)
    grid = rng.integers(-500, 4000, size=(17, 13)).astype(np.int16)
    # sprinkle NOVALUE so the 3x3 poisoning path is exercised
    grid[3, 4] = NV
    grid[10, 0] = NV
    grid[16, 12] = NV
    ys, xs, ndx, ndy = terrain.horn_grid(grid)
    got = sorted(zip(ys.tolist(), xs.tolist(), ndx.tolist(), ndy.tolist()))
    want = sorted(_horn_scalar(grid))
    assert got == want and len(got) > 50
    # NOVALUE at (3,4) suppresses all 9 cells whose 3x3 touches it
    suppressed = {(y, x) for y in (2, 3, 4) for x in (3, 4, 5)}
    emitted = {(y, x) for y, x, _, _ in got}
    assert suppressed.isdisjoint(emitted)


def test_aspect_octant_matches_atan2_twin():
    vals = [-7, -3, -1, 0, 1, 2, 5]
    ndx = np.array([x for x in vals for _ in vals], dtype=np.int64)
    ndy = np.array([y for _ in vals for y in vals], dtype=np.int64)
    got = terrain.aspect_octant(ndx, ndy)
    for x, y, o in zip(ndx.tolist(), ndy.tolist(), got.tolist()):
        assert o == _aspect_scalar(x, y), (x, y, o)
    # exact boundary cases: 45-degree multiples land in the half-open
    # sector that STARTS there
    assert terrain.aspect_octant(np.array([3]), np.array([3]))[0] == 1
    assert terrain.aspect_octant(np.array([0]), np.array([3]))[0] == 2
    assert terrain.aspect_octant(np.array([-3]), np.array([3]))[0] == 3
    assert terrain.aspect_octant(np.array([-3]), np.array([0]))[0] == 4
    assert terrain.aspect_octant(np.array([-3]), np.array([-3]))[0] == 5
    assert terrain.aspect_octant(np.array([0]), np.array([-3]))[0] == 6
    assert terrain.aspect_octant(np.array([3]), np.array([-3]))[0] == 7
    assert terrain.aspect_octant(np.array([3]), np.array([0]))[0] == 0


def test_terrain_cells_spark_equals_twin_and_no_exchange(spark):
    import __spark_entry__ as entry

    tiles = entry._synth_tiles(spark, n_tiles=4, size=21)
    df = terrain.terrain_cells(tiles)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # one narrow Arrow pass

    rows = df.collect()
    # rebuild the twin from the decoded tiles
    want = []
    for r in tiles.select("image_id", "bytes", "w", "h", "fmt").collect():
        grid = codecs.decode(bytes(r.bytes), r.fmt, r.w, r.h)
        for y, x, ndx, ndy in _horn_scalar(grid):
            want.append((r.image_id, x, y, ndx, ndy, ndx * ndx + ndy * ndy,
                         ndx / 8.0, ndy / 8.0, _aspect_scalar(ndx, ndy)))
    got = sorted((r.image_id, r.x, r.y, r.ndx, r.ndy, r.slope_q,
                  r.dzdx, r.dzdy, r.aspect_oct) for r in rows)
    assert got == sorted(want) and len(got) > 100


def test_hillshade_matches_scalar_twin():
    rng = np.random.default_rng(11)
    grid = rng.integers(0, 2000, size=(9, 9)).astype(np.int16)
    grid[4, 4] = NV
    out = terrain.hillshade_grid(grid, azimuth_deg=315.0, altitude_deg=45.0)
    assert out.shape == (7, 7) and out.dtype == np.uint8
    zen = math.radians(45.0)
    az = math.radians(360.0 - 315.0 + 90.0)
    for y, x, ndx, ndy in _horn_scalar(grid):
        dzdx, dzdy = ndx / 8.0, ndy / 8.0
        slope = math.atan(math.hypot(dzdx, dzdy))
        aspect = math.atan2(-dzdy, dzdx)
        shade = (math.cos(zen) * math.cos(slope)
                 + math.sin(zen) * math.sin(slope) * math.cos(az - aspect))
        want = int(np.rint(255.0 * min(max(shade, 0.0), 1.0)))
        assert out[y - 1, x - 1] == want
    # poisoned neighborhoods render 0
    for y in (3, 4, 5):
        for x in (3, 4, 5):
            assert out[y - 1, x - 1] == 0


@pytest.fixture
def docs_df(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox sat still all day long"),
        (3, "completely different words appear in this one here"),
        (4, "  the   quick  brown fox jumps high "),  # messy whitespace
        (5, "tiny doc"),                               # < n tokens
        (6, "THE QUICK BROWN FOX jumps over whatever else"),  # case
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_decontaminate_semantics(spark, docs_df):
    bench = docs_df.filter("doc_id = 1")
    train = docs_df.filter("doc_id <> 1")
    out = {r.doc_id: r for r in
           text.decontaminate(train, bench, n=4).collect()}
    assert set(out) == {2, 3, 4, 5, 6}
    # doc 2 shares exactly the 4-gram "the quick brown fox"
    assert out[2].n_hits == 1 and out[2].n_hit_grams == 1
    assert out[2].contaminated
    # doc 3 shares nothing
    assert out[3].n_hits == 0 and not out[3].contaminated
    assert out[3].n_ngrams == 8 - 3
    # messy whitespace normalizes: doc 4 shares "the quick brown fox"
    # and "quick brown fox jumps"
    assert out[4].n_hits == 2 and out[4].contaminated
    # < n tokens: zero grams, clean
    assert out[5].n_ngrams == 0 and not out[5].contaminated
    # lowercasing: doc 6 hits despite uppercase
    assert out[6].contaminated


def test_decontaminate_plan_broadcasts_benchmark(spark, docs_df):
    bench = docs_df.filter("doc_id = 1")
    train = docs_df.filter("doc_id <> 1")
    plan = (text.decontaminate(train, bench, n=4)
            ._jdf.queryExecution().executedPlan().toString())
    # the gram join must be broadcast (no corpus-side gram shuffle)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_decontaminate_broadcast_hits_opt_out(spark, docs_df):
    """r8 (VERDICT r7 #5): the broadcast_hits=False branch shipped in
    b90230d untested. Pin (a) value parity with the default path and
    (b) the plan shape: the hit-aggregate join-back takes a shuffle
    join instead of a broadcast when opted out."""
    bench = docs_df.filter("doc_id = 1")
    train = docs_df.filter("doc_id <> 1")
    a = sorted(
        text.decontaminate(train, bench, n=4).collect(),
        key=lambda r: r.doc_id)
    b = sorted(
        text.decontaminate(train, bench, n=4, broadcast_hits=False).collect(),
        key=lambda r: r.doc_id)
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # plan shape: at toy sizes the optimizer's size estimate broadcasts
    # ANY un-hinted join below autoBroadcastJoinThreshold, hiding the
    # difference the flag exists for — disable the threshold so the
    # plan shows what each path pins at scale: with the flag the hit
    # join-back is a hinted broadcast regardless of estimates; opted
    # out it becomes a shuffle join
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan_b = (
            text.decontaminate(train, bench, n=4)
            ._jdf.queryExecution().executedPlan().toString())
        plan_nb = (
            text.decontaminate(train, bench, n=4, broadcast_hits=False)
            ._jdf.queryExecution().executedPlan().toString())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    # default path: BOTH the benchmark-gram join and the hit join-back
    # are hinted broadcasts — no shuffle join anywhere
    assert "BroadcastHashJoin" in plan_b
    assert "SortMergeJoin" not in plan_b and "ShuffledHashJoin" not in plan_b
    # opt-out: the bench-gram broadcast hint survives, the hit
    # join-back takes a shuffle join
    assert "BroadcastHashJoin" in plan_nb
    assert ("SortMergeJoin" in plan_nb) or ("ShuffledHashJoin" in plan_nb)


def test_repetition_stats_semantics(spark):
    rows = [
        (1, "a b a b a b"),        # bigrams: ab x3, ba x2 -> all 5 dup
        (2, "u v w x y"),           # 4 distinct bigrams, none repeated
        (3, "solo"),                # < 2 tokens -> zero everything
        (4, ""),                    # empty
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = {r.doc_id: r for r in text.repetition_stats(df, n=2).collect()}
    assert out[1].n_ngrams == 5 and out[1].n_dup_occ == 5
    assert out[1].top_gram_occ == 3
    assert out[1].dup_frac == 1.0 and out[1].top_frac == 3 / 5
    assert out[2].n_ngrams == 4 and out[2].n_dup_occ == 0
    assert out[2].dup_frac == 0.0 and out[2].top_frac == 1 / 4
    for d in (3, 4):
        assert out[d].n_ngrams == 0 and out[d].dup_frac == 0.0


def test_repetition_stats_no_joins_in_agg_path(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["a b c"]}))
    plan = (text.repetition_stats(df, n=2)
            ._jdf.queryExecution().executedPlan().toString())
    # two hash aggregates + the left-join back to the doc base; no
    # sort-merge, no cartesian
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2


def _d8_scalar(grid):
    """Pure-Python D8 twin: per-cell loop over the 8 neighbors in code
    order, ranking by drop/distance with exact rational comparison."""
    h, w = grid.shape
    out = []
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            nbs = [(int(grid[y + dy, x + dx]), c, card)
                   for c, dx, dy, card in terrain.D8_NEIGHBORS]
            if NV == int(grid[y, x]) or any(v == NV for v, _, _ in nbs):
                continue
            e = int(grid[y, x])
            best, code = 0, 0
            for v, c, card in nbs:
                drop = e - v
                score = (2 if card else 1) * drop * drop if drop > 0 else 0
                if score > best:
                    best, code = score, c
            out.append((y, x, code, best))
    return out


def test_d8_grid_matches_scalar_twin():
    rng = np.random.default_rng(3)
    grid = rng.integers(-100, 3000, size=(15, 11)).astype(np.int16)
    grid[5, 5] = NV
    ys, xs, d8, drop2x = terrain.d8_grid(grid)
    got = sorted(zip(ys.tolist(), xs.tolist(), d8.tolist(), drop2x.tolist()))
    assert got == sorted(_d8_scalar(grid)) and len(got) > 50


def test_d8_semantics_handcrafted():
    # center 10; E neighbor 8 (drop 2, cardinal: score 8);
    # SE neighbor 7 (drop 3, diagonal: score 9) -> SE wins (code 2)
    g = np.array([
        [10, 10, 10],
        [10, 10, 8],
        [10, 10, 7],
    ], dtype=np.int16)
    ys, xs, d8, s = terrain.d8_grid(g)
    assert list(zip(ys, xs, d8, s)) == [(1, 1, 2, 9)]
    # exact tie: E drop 2 (score 8) vs SE drop 2*sqrt2-worth? craft a
    # true tie: E drop 1 (score 2) vs S drop 1 (score 2) -> E (code 1)
    g2 = np.array([
        [5, 5, 5],
        [5, 5, 4],
        [5, 4, 5],
    ], dtype=np.int16)
    _, _, d8_2, s2 = terrain.d8_grid(g2)
    assert d8_2[0] == 1 and s2[0] == 2
    # pit: all neighbors higher -> d8 0, score 0
    g3 = np.full((3, 3), 9, dtype=np.int16); g3[1, 1] = 1
    _, _, d8_3, s3 = terrain.d8_grid(g3)
    assert d8_3[0] == 0 and s3[0] == 0
    # flat: all equal -> d8 0
    g4 = np.full((3, 3), 7, dtype=np.int16)
    _, _, d8_4, s4 = terrain.d8_grid(g4)
    assert d8_4[0] == 0 and s4[0] == 0


def test_flow_direction_spark_equals_twin_no_exchange(spark):
    import __spark_entry__ as entry
    from hgt2osm2_spark.kernels import codecs as k

    tiles = entry._synth_tiles(spark, n_tiles=3, size=17)
    df = terrain.flow_direction(tiles)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = sorted((r.image_id, r.y, r.x, r.d8, r.drop2x) for r in df.collect())
    want = []
    for r in tiles.select("image_id", "bytes", "w", "h", "fmt").collect():
        grid = k.decode(bytes(r.bytes), r.fmt, r.w, r.h)
        want += [(r.image_id, y, x, c, s) for y, x, c, s in _d8_scalar(grid)]
    assert got == sorted(want) and len(got) > 100


def test_zonal_stats_handcrafted(spark):
    """One synthetic 'tile' worth of cells placed directly in degree
    space against one unit-square-ish zone: exact count/min/max/sum
    and the IEEE mean."""
    import pandas as pd

    from hgt2osm2_spark.ops import zonal

    # 5x5 cells across [0,1]x[40,41]; zone covers lon [0.2,0.8],
    # lat [40.2, 40.8] strictly -> interior cells at 0.25/0.5/0.75
    rows = []
    v = 0
    for y in range(5):
        for x in range(5):
            v += 3
            rows.append({"image_id": "t", "x": x, "y": y, "value": v,
                         "lon": x / 4.0, "lat": 40.0 + (4 - y) / 4.0})
    cells = spark.createDataFrame(pd.DataFrame(rows))
    polys = spark.createDataFrame(pd.DataFrame([{
        "poly_id": "z",
        "xs": [0.2, 0.8, 0.8, 0.2], "ys": [40.2, 40.2, 40.8, 40.8],
    }]))
    out = zonal.zonal_stats(cells, polys).collect()
    assert len(out) == 1
    r = out[0]
    inside = [row["value"] for row in rows
              if 0.2 < row["lon"] < 0.8 and 40.2 < row["lat"] < 40.8]
    assert r.n_cells == len(inside) == 9
    assert r.min_val == min(inside) and r.max_val == max(inside)
    assert r.sum_val == sum(inside)
    assert r.mean_val == sum(inside) / len(inside)


def test_zonal_stats_novalue_excluded_and_plan(spark):
    import __spark_entry__ as entry
    from hgt2osm2_spark.ops import zonal

    tiles = entry._synth_tiles(spark, n_tiles=6, size=33)
    cells = zonal.cells_geo(tiles)
    polys = entry._pip_polygons_df(spark)
    df = zonal.zonal_stats(cells, polys, res=entry.CELL_RES)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan       # cover cells broadcast
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan     # ray cast is unrolled JVM
    rows = {r.poly_id: r for r in df.collect()}
    assert rows  # the 6-tile strip hits polyA/polyC
    # NOVALUE exclusion: no zone's min can be the nodata sentinel even
    # though the gate tiles contain real NOVALUE cells
    for r in rows.values():
        assert r.n_cells > 0 and r.min_val > NV


def test_pip_join_shape_unchanged_after_refactor(spark):
    """pip_hits is pip_join's engine; pip_join's public 4-column
    contract must be byte-identical to before the refactor."""
    import pandas as pd

    from hgt2osm2_spark.ops import spatial

    pts = spark.createDataFrame(pd.DataFrame({
        "q_id": ["a", "b", "c"],
        "lat": [40.5, 43.0, 40.9],
        "lon": [0.9, 0.1, 1.2],
        "payload": [10, 20, 30],
    }))
    polys = spark.createDataFrame(pd.DataFrame([{
        "poly_id": "z", "xs": [0.5, 1.5, 1.5, 0.5],
        "ys": [40.2, 40.2, 41.2, 41.2]}]))
    j = spatial.pip_join(pts, polys)
    assert j.columns == ["q_id", "poly_id", "lat", "lon"]
    assert {r.q_id for r in j.collect()} == {"a", "c"}
    h = spatial.pip_hits(pts, polys)
    assert "payload" in h.columns and "xs" not in h.columns
    assert {(r.q_id, r.payload) for r in h.collect()} == {("a", 10), ("c", 30)}


def _flowacc_scalar(grid):
    """Brute-force twin: follow each valid cell's D8 path step by step
    (no topological machinery) to count pass-throughs and find the
    terminal cell."""
    d8 = {(y, x): (c, s) for y, x, c, s in _d8_scalar(grid)}
    delta = {c: (dx, dy) for c, dx, dy, _ in terrain.D8_NEIGHBORS}
    acc = {k: 0 for k in d8}
    outlet = {}
    for start in d8:
        cur = start
        while True:
            acc[cur] += 1
            c, _ = d8[cur]
            if c == 0:
                break
            dx, dy = delta[c]
            nxt = (cur[0] + dy, cur[1] + dx)
            if nxt not in d8:
                break
            cur = nxt
        outlet[start] = cur
    return sorted((y, x, acc[(y, x)], outlet[(y, x)][0], outlet[(y, x)][1])
                  for (y, x) in d8)


def test_flow_accumulate_grid_matches_bruteforce_twin():
    rng = np.random.default_rng(5)
    grid = rng.integers(0, 500, size=(14, 12)).astype(np.int16)
    grid[7, 3] = NV
    ys, xs, acc, oy, ox = terrain.flow_accumulate_grid(grid)
    got = sorted(zip(ys.tolist(), xs.tolist(), acc.tolist(),
                     oy.tolist(), ox.tolist()))
    want = _flowacc_scalar(grid)
    assert got == want and len(got) > 50
    # conservation: total acc == total path length; every outlet is a
    # terminal (its own outlet)
    outs = {(y, x) for _, _, _, y, x in got}
    rows = {(y, x): (a, (o_y, o_x)) for y, x, a, o_y, o_x in got}
    for o in outs:
        assert rows[o][1] == o


def test_flow_accumulation_handcrafted():
    # 5x5 monotone ramp falling to the east: every interior cell flows
    # E (code 1); acc grows 1,2,3 along each row; outlet = easternmost
    # interior cell of the row
    g = np.array([[100 - 10 * x for x in range(5)]] * 5, dtype=np.int16)
    ys, xs, acc, oy, ox = terrain.flow_accumulate_grid(g)
    got = {(y, x): (a, o_y, o_x) for y, x, a, o_y, o_x
           in zip(ys, xs, acc, oy, ox)}
    for y in (1, 2, 3):
        assert got[(y, 1)] == (1, y, 3)
        assert got[(y, 2)] == (2, y, 3)
        assert got[(y, 3)] == (3, y, 3)  # terminal: target leaves universe


def test_flow_accumulation_spark_equals_twin_no_exchange(spark):
    import __spark_entry__ as entry
    from hgt2osm2_spark.kernels import codecs as k

    tiles = entry._synth_tiles(spark, n_tiles=3, size=17)
    df = terrain.flow_accumulation(tiles)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = sorted((r.image_id, r.y, r.x, r.acc, r.outlet_y, r.outlet_x)
                 for r in df.collect())
    want = []
    for r in tiles.select("image_id", "bytes", "w", "h", "fmt").collect():
        grid = k.decode(bytes(r.bytes), r.fmt, r.w, r.h)
        want += [(r.image_id, y, x, a, o_y, o_x)
                 for y, x, a, o_y, o_x in _flowacc_scalar(grid)]
    assert got == sorted(want) and len(got) > 100


def test_pii_scrub_semantics(spark):
    rows = [
        (1, "write to alice.smith+x@sub.example.co today"),
        (2, "server at 192.168.1.254 and 10.0.0.1 rebooted"),
        (3, "call +1 (555) 010-1234 now"),
        (4, "bob@x.io or 8.8.8.8 or +44 20 7946 0958"),
        (5, "nothing sensitive here at all"),
        (6, "not-an-ip 999.999 and short @ sign alone"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = {r.doc_id: r for r in text.pii_scrub(df).collect()}
    assert out[1].n_emails == 1 and out[1].clean_text == "write to [EMAIL] today"
    assert out[2].n_ipv4 == 2 and out[2].clean_text == \
        "server at [IP] and [IP] rebooted"
    assert out[3].n_phones == 1 and out[3].clean_text == "call [PHONE] now"
    assert (out[4].n_emails, out[4].n_ipv4, out[4].n_phones) == (1, 1, 1)
    assert out[4].n_pii == 3
    assert out[4].clean_text == "[EMAIL] or [IP] or [PHONE]"
    assert out[5].n_pii == 0 and out[5].clean_text == rows[4][1]
    assert out[6].n_pii == 0


def test_pii_scrub_plan_pure_jvm(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["x"]}))
    plan = (text.pii_scrub(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_pii_patterns_match_duckdb_re2(spark):
    """The cross-engine contract itself: for a pile of adversarial
    strings, Spark's Java regex and DuckDB's RE2 must produce the SAME
    counts and replacements for all three patterns."""
    import duckdb

    cases = [
        "a@b.co", "a@b.c", "x.y-z_9%+q@mail.sub-domain.org!",
        "1.2.3.4", "01.002.3.255 end", "1.2.3.4.5", "256.1.1.1",
        "+1 (555) 010-1234", "call 5550101234 now", "12-34",
        "mix a@b.io 1.2.3.4 +1 (555) 010-9999 tail",
        "@@ 1..2 +()",
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(cases)), "text": cases}))
    got = {r.doc_id: r for r in text.pii_scrub(df).collect()}
    con = duckdb.connect()
    for i, t in enumerate(cases):
        em, ip, ph = con.execute(
            "SELECT len(regexp_extract_all(?, ?)),"
            " len(regexp_extract_all(?, ?)),"
            " len(regexp_extract_all(?, ?))",
            [t, text.PII_EMAIL, t, text.PII_IPV4, t, text.PII_PHONE],
        ).fetchone()
        clean = con.execute(
            "SELECT regexp_replace(regexp_replace(regexp_replace("
            "?, ?, '[EMAIL]', 'g'), ?, '[IP]', 'g'), ?, '[PHONE]', 'g')",
            [t, text.PII_EMAIL, text.PII_IPV4, text.PII_PHONE],
        ).fetchone()[0]
        r = got[i]
        assert (r.n_emails, r.n_ipv4, r.n_phones) == (em, ip, ph), (i, t)
        assert r.clean_text == clean, (i, t, r.clean_text, clean)


def test_basin_stats_consistency(spark):
    """Cross-operator invariants: (a) each basin's n_cells equals the
    flow accumulation at its outlet cell; (b) basins partition the D8
    universe; (c) per-basin z aggregates match a pandas recomputation
    from basin_cells."""
    import __spark_entry__ as entry

    tiles = entry._synth_tiles(spark, n_tiles=3, size=17)
    basins = {(r.image_id, r.outlet_x, r.outlet_y): r
              for r in terrain.basin_stats(tiles).collect()}
    acc = {(r.image_id, r.x, r.y): r.acc
           for r in terrain.flow_accumulation(tiles).collect()}
    assert sum(r.n_cells for r in basins.values()) == len(acc)
    for (img, ox, oy), r in basins.items():
        assert acc[(img, ox, oy)] == r.n_cells, (img, ox, oy)
    cells = terrain.basin_cells(tiles).toPandas()
    g = cells.groupby(["image_id", "outlet_x", "outlet_y"])["z"]
    for (img, ox, oy), zs in g:
        r = basins[(img, ox, oy)]
        assert (r.min_z, r.max_z, r.sum_z) == \
            (zs.min(), zs.max(), zs.sum())
        assert r.mean_z == int(zs.sum()) / len(zs)


def test_basin_stats_plan_one_exchange(spark):
    import __spark_entry__ as entry

    df = terrain.basin_stats(entry._synth_tiles(spark, n_tiles=2, size=9))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly one shuffle: the partial->final agg on the outlet key
    assert plan.count("Exchange") == 1
    assert "partial" in plan
