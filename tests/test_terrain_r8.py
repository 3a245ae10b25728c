"""Tests for the late-r8 terrain trio: second-order morphometry
(TPI/TRI/roughness/curvature numerators), downstream flow-path length
(pointer doubling), and Strahler stream order (worklist-Kahn with a
(max, count-at-max) combiner). Each op gets (a) a scalar or
independent-mechanism twin check on random grids with NOVALUE holes,
(b) a hand-computed semantics check, and (c) the one-narrow-Arrow-pass
plan pin (no Exchange) on the Spark surface."""

import numpy as np
import pytest

from hgt2osm2_spark.kernels import codecs
from hgt2osm2_spark.ops import terrain

NV = int(codecs.NOVALUE)


def _morph_scalar(grid):
    """Pure-Python per-cell twin of terrain.morph_grid."""
    h, w = grid.shape
    out = []
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            nb = [int(grid[y + dy, x + dx])
                  for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
            if NV in nb:
                continue
            a, b, c, d, e, f, g, hh, i = nb
            others = [a, b, c, d, f, g, hh, i]
            out.append((
                y, x,
                8 * e - sum(others),
                sum(abs(v - e) for v in others),
                max(nb) - min(nb),
                d + f - 2 * e,
                b + hh - 2 * e,
                (a + i) - (c + g),
            ))
    return out


def _flowlen_scalar(grid):
    """Per-cell scalar walk twin of terrain.flow_length_grid: follow
    the D8 pointer one step at a time, counting cardinal/diagonal
    edges — O(n * path) vs the engine's O(n log path) doubling."""
    ys, xs, d8, _ = terrain.d8_grid(grid)
    t = terrain.d8_targets(ys, xs, d8, grid.shape)
    card = np.isin(d8, terrain._D8_CARDINAL)
    out = []
    for i in range(len(ys)):
        s = nc = 0
        j = i
        while t[j] >= 0:
            s += 1
            nc += int(card[j])
            j = int(t[j])
        out.append((int(ys[i]), int(xs[i]), s, nc, s - nc))
    return out


def _strahler_fold(grid, min_acc):
    """Explicit-stack post-order fold twin of terrain.stream_order_grid
    (the golden-twin mechanism): recursive Strahler over the reversed
    stream adjacency."""
    ys, xs, acc, _, _ = terrain.flow_accumulate_grid(grid)
    ys2, xs2, d8, _ = terrain.d8_grid(grid)
    t = terrain.d8_targets(ys2, xs2, d8, grid.shape)
    stream = acc >= min_acc
    up = {}
    for i in np.flatnonzero(stream):
        ti = t[i]
        if ti >= 0 and stream[ti]:
            up.setdefault(int(ti), []).append(int(i))
    order = {}
    for root in np.flatnonzero(stream):
        stack = [(int(root), False)]
        while stack:
            node, expanded = stack.pop()
            if node in order:
                continue
            kids = up.get(node, [])
            pend = [k for k in kids if k not in order]
            if not expanded and pend:
                stack.append((node, True))
                stack.extend((k, False) for k in pend)
            else:
                if not kids:
                    order[node] = 1
                else:
                    os_ = sorted(order[k] for k in kids)
                    m = os_[-1]
                    order[node] = m + 1 if len(os_) >= 2 and os_[-2] == m else m
    return {
        (int(ys[i]), int(xs[i])): (int(acc[i]), order[int(i)])
        for i in np.flatnonzero(stream)
    }


def _noisy_grid(seed, shape=(21, 19), holes=6):
    rng = np.random.default_rng(seed)
    g = (np.cumsum(rng.integers(-4, 5, shape), axis=0)
         + np.cumsum(rng.integers(-3, 4, shape), axis=1)).astype(np.int16)
    g += 200
    g[rng.integers(0, shape[0], holes), rng.integers(0, shape[1], holes)] = NV
    return g


# ---------------------------------------------------------------- morphometry

def test_morph_grid_matches_scalar_twin():
    for seed in (1, 2, 3):
        g = _noisy_grid(seed)
        got = sorted(zip(*(a.tolist() for a in terrain.morph_grid(g))))
        assert got == sorted(_morph_scalar(g)) and len(got) > 100


def test_morph_handcrafted():
    # 3x3 island: a=1 b=2 c=3 / d=4 e=5 f=6 / g=7 h=8 i=9
    g = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], dtype=np.int16)
    ys, xs, tpi8, tri, rough, zxx, zyy, ixy4 = terrain.morph_grid(g)
    assert list(zip(ys, xs)) == [(1, 1)]
    assert tpi8[0] == 8 * 5 - (1 + 2 + 3 + 4 + 6 + 7 + 8 + 9)  # 0
    assert tri[0] == 4 + 3 + 2 + 1 + 1 + 2 + 3 + 4  # 20
    assert rough[0] == 8
    assert zxx[0] == 4 + 6 - 10 == 0
    assert zyy[0] == 2 + 8 - 10 == 0
    assert ixy4[0] == (1 + 9) - (3 + 7) == 0
    # break the symmetry: raise the NE corner
    g2 = g.copy()
    g2[0, 2] = 13  # c
    _, _, tpi8b, trib, roughb, zxxb, zyyb, ixy4b = terrain.morph_grid(g2)
    assert tpi8b[0] == -10 and trib[0] == 26 and roughb[0] == 12
    assert zyyb[0] == 0 and ixy4b[0] == (1 + 9) - (13 + 7) == -10


def test_morph_novalue_suppression():
    g = _noisy_grid(9)
    g[10, 9] = NV
    got = {(y, x) for y, x in zip(*terrain.morph_grid(g)[:2])}
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            assert (10 + dy, 9 + dx) not in got


def test_morphometry_cells_spark_no_exchange(spark):
    import __spark_entry__ as entry

    df = terrain.morphometry_cells(entry._synth_tiles(spark, n_tiles=3, size=17))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "MapInPandas" in plan
    rows = df.collect()
    assert len(rows) > 300
    k = codecs
    tiles = entry._synth_tiles(spark, n_tiles=3, size=17).collect()
    want = []
    for r in tiles:
        grid = k.decode(bytes(r.bytes), r.fmt, r.w, r.h)
        want += [(r.image_id, y, x, *rest) for y, x, *rest in _morph_scalar(grid)]
    got = sorted((r.image_id, r.y, r.x, r.tpi8, r.tri, r.rough,
                  r.zxx, r.zyy, r.ixy4) for r in rows)
    assert got == sorted(want)


# ---------------------------------------------------------------- flow length

def test_flow_length_matches_scalar_walk():
    for seed in (4, 5, 6):
        g = _noisy_grid(seed)
        ys, xs, steps, nc, nd = terrain.flow_length_grid(g)
        got = sorted(zip(ys.tolist(), xs.tolist(), steps.tolist(),
                         nc.tolist(), nd.tolist()))
        assert got == sorted(_flowlen_scalar(g)) and len(got) > 100


def test_flow_length_consistency():
    g = _noisy_grid(7)
    ys, xs, steps, nc, nd = terrain.flow_length_grid(g)
    assert (steps == nc + nd).all()
    assert (steps >= 0).all()
    # terminals (d8 == 0 or target outside universe) have zero length
    ys2, xs2, d8, _ = terrain.d8_grid(g)
    t = terrain.d8_targets(ys2, xs2, d8, g.shape)
    assert (steps[t < 0] == 0).all()
    assert (steps[t >= 0] > 0).all()
    # a cell's length is exactly its target's plus one step
    has = t >= 0
    assert (steps[has] == steps[t[has]] + 1).all()


def test_flow_length_handcrafted_ramp():
    # monotone east-falling ramp: interior cell (y, x) walks east to
    # x = 3, all cardinal steps
    g = np.array([[100 - 10 * x for x in range(5)]] * 5, dtype=np.int16)
    ys, xs, steps, nc, nd = terrain.flow_length_grid(g)
    got = {(y, x): (s, c, d) for y, x, s, c, d
           in zip(ys, xs, steps, nc, nd)}
    for y in (1, 2, 3):
        assert got[(y, 1)] == (2, 2, 0)
        assert got[(y, 2)] == (1, 1, 0)
        assert got[(y, 3)] == (0, 0, 0)


def test_flow_path_length_spark_no_exchange(spark):
    import __spark_entry__ as entry

    df = terrain.flow_path_length(entry._synth_tiles(spark, n_tiles=2, size=17))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "MapInPandas" in plan
    assert df.count() > 200


# --------------------------------------------------------------- stream order

def test_stream_order_matches_postorder_fold():
    for seed in (8, 9, 10):
        g = _noisy_grid(seed, shape=(25, 23))
        ys, xs, acc, order = terrain.stream_order_grid(g, 3)
        got = {(int(y), int(x)): (int(a), int(o))
               for y, x, a, o in zip(ys, xs, acc, order)}
        assert got == _strahler_fold(g, 3) and len(got) > 20


def test_stream_mask_closed_under_descent():
    # acc is nondecreasing along flow, so a stream cell's in-universe
    # target is always a stream cell — the property stream_order_grid
    # relies on to skip edge clipping
    for seed in (11, 12):
        g = _noisy_grid(seed)
        ys, xs, acc, _, _ = terrain.flow_accumulate_grid(g)
        ys2, xs2, d8, _ = terrain.d8_grid(g)
        t = terrain.d8_targets(ys2, xs2, d8, g.shape)
        for thr in (2, 5, 9):
            stream = acc >= thr
            src = np.flatnonzero(stream & (t >= 0))
            assert stream[t[src]].all()


def test_stream_order_handcrafted_confluence():
    # Two parallel channels merging: carve a V of descending values
    # into a high plateau so two order-1 streams join into an order-2
    # reach. Plateau 1000; channel cells descend toward the junction
    # at (4, 4) then run east.
    g = np.full((9, 9), 1000, dtype=np.int16)
    # north arm: (1,1) -> (2,2) -> (3,3) diagonal
    for i, z in ((1, 400), (2, 300), (3, 200)):
        g[i, i] = z
    # south arm: (7,1) -> (6,2) -> (5,3)
    for (y, x), z in (((7, 1), 400), ((6, 2), 300), ((5, 3), 200)):
        g[y, x] = z
    # junction + outflow east
    g[4, 4] = 100
    g[4, 5], g[4, 6], g[4, 7] = 90, 80, 70
    ys, xs, acc, order = terrain.stream_order_grid(g, 3)
    got = {(y, x): o for y, x, o in zip(ys, xs, order)}
    # the junction drains both arms (acc >= 8) and must be order 2
    assert got[(4, 4)] == 2
    assert got[(4, 5)] == 2 and got[(4, 6)] == 2
    # the arm tails just above the junction are order 1 (acc 3)
    assert got.get((3, 3), 1) == 1 and got.get((5, 3), 1) == 1


def test_stream_order_spark_no_exchange(spark):
    import __spark_entry__ as entry

    df = terrain.stream_order(entry._synth_tiles(spark, n_tiles=3, size=17),
                              min_acc=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "MapInPandas" in plan
    rows = df.collect()
    assert len(rows) > 30 and max(r.sorder for r in rows) >= 2
    # engine equals the fold twin through the full Spark surface
    k = codecs
    tiles = entry._synth_tiles(spark, n_tiles=3, size=17).collect()
    want = []
    for r in tiles:
        grid = k.decode(bytes(r.bytes), r.fmt, r.w, r.h)
        want += [(r.image_id, y, x, a, o)
                 for (y, x), (a, o) in sorted(_strahler_fold(grid, 4).items())]
    got = sorted((r.image_id, r.y, r.x, r.acc, r.sorder) for r in rows)
    assert got == sorted(want)


# ------------------------------------------------------- fill_sinks (r8)

def test_fill_sinks_spark_matches_golden(spark):
    """The full Spark surface over the crater gate tiles equals the
    make_golden scalar-heapq twin, and the plan stays one narrow
    Arrow pass."""
    import os

    import pandas as pd

    from hgt2osm2_spark.sources import synthetic

    df = terrain.fill_sinks(synthetic.crater_tiles_df(spark, 6, 33))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "MapInPandas" in plan
    got = sorted((r.image_id, r.x, r.y, r.z, r.zfill) for r in df.collect())
    gpath = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "golden", "fill_cells.parquet")
    g = pd.read_parquet(gpath)
    want = sorted(zip(g.image_id, g.x, g.y, g.z, g.zfill))
    assert got == want
    # the crater tiles exercise the fill for real: hundreds of raised
    # cells, not a near-no-op surface
    n_raised = sum(1 for _, _, _, z, zf in got if zf > z)
    assert n_raised > 300


def test_filled_flow_eps0_semantics(spark):
    """eps = 0 fill semantics, asserted exactly: a filled crater
    becomes a FLAT at spill level, and the engine's D8 treats flat
    cells as terminals — so the deep convergent pit (one outlet
    draining the whole bowl) is replaced by many small flat terminals.
    (Routing ACROSS flats is the separate flat-resolution op.)"""
    from hgt2osm2_spark.sources import synthetic

    tiles = synthetic.crater_tiles_df(spark, 6, 33)
    unfilled = terrain.flow_accumulation(tiles)
    filled = terrain.filled_flow_accumulation(tiles)
    assert filled.count() == unfilled.count()  # same valid universe
    # the crater-bottom mega-basins vanish: the unfilled run's deepest
    # outlets capture big upstream areas; after filling no outlet BELOW
    # its tile's spill level survives
    zf = {(r.image_id, r.x, r.y): (r.z, r.zfill)
          for r in terrain.fill_sinks(tiles).collect()}
    raised = {k for k, (z, w) in zf.items() if w > z}
    big_unfilled = {
        (r.image_id, r.outlet_x, r.outlet_y)
        for r in unfilled.groupBy("image_id", "outlet_x", "outlet_y")
        .count().filter("count >= 30").collect()
    }
    big_filled = {
        (r.image_id, r.outlet_x, r.outlet_y)
        for r in filled.groupBy("image_id", "outlet_x", "outlet_y")
        .count().filter("count >= 30").collect()
    }
    # raised crater bottoms captured >= 30-cell basins before filling;
    # after filling none of those below-spill cells drains anything
    big_raised_before = {k for k in big_unfilled
                         if (k[0], k[1], k[2]) in raised}
    assert big_raised_before, "gate craters must capture real basins"
    assert not (big_raised_before & big_filled)


# --------------------------------------------- flat_routed_flow (r8)

def test_routed_flow_crosses_crater():
    """Hand case: a notched crater on a plateau. Unrouted (eps=0)
    leaves every bowl cell a flat terminal; routing drains the whole
    bowl across the flat — zero flat terminals remain inside."""
    g = np.full((11, 11), 100, dtype=np.int16)
    g[3:8, 3:8] = 60
    g[5, 5] = 20
    g[0:11, 0] = 50
    filled = terrain.fill_grid(g).astype(np.int16)
    ys, xs, _acc, oy, ox = terrain.routed_flow_grid(filled)
    raised = filled > g
    n_flat_term = sum(
        1 for y, x, yy, xx in zip(ys, xs, oy, ox)
        if (yy, xx) == (y, x) and raised[y, x]
    )
    assert n_flat_term == 0
    # every raised cell's outlet lies OUTSIDE the raised set
    out = {(y, x): (yy, xx) for y, x, yy, xx in zip(ys, xs, oy, ox)}
    for (y, x), (yy, xx) in out.items():
        if raised[y, x]:
            assert not raised[yy, xx]


def test_routed_flow_unreachable_flats_stay_terminal():
    """A flat with NO draining cell anywhere (constant grid: nothing
    ever descends) keeps every cell a terminal — routing never invents
    descent. And a plateau's strict interior routes THROUGH the
    plateau edge, which drains off the cliff at equal z."""
    g = np.full((9, 9), 7, dtype=np.int16)
    ys, xs, acc, oy, ox = terrain.routed_flow_grid(g)
    assert (acc == 1).all()
    assert np.array_equal(oy, ys) and np.array_equal(ox, xs)
    # plateau-on-plain: the interior flat cell is NOT a terminal (its
    # equal-z neighbors on the plateau edge drain off the cliff), and
    # its path exits the plateau
    g2 = np.zeros((9, 9), dtype=np.int16)
    g2[3:6, 3:6] = 50
    ys2, xs2, _a2, oy2, ox2 = terrain.routed_flow_grid(g2)
    out = {(y, x): (yy, xx) for y, x, yy, xx in zip(ys2, xs2, oy2, ox2)}
    ty, tx = out[(4, 4)]
    assert (ty, tx) != (4, 4)
    assert g2[ty, tx] == 0  # outlet left the plateau


def test_routed_flow_bfs_bound_pin():
    """The flat_routed_flow ORACLE bounds its BFS recursion at 64
    hops; pin that the gate input's true flat diameters sit far below
    (< 16), so the bound can never truncate a real path. Re-derives
    the distances with an independent scalar BFS."""
    from collections import deque

    from hgt2osm2_spark.sources import synthetic

    worst = 0
    for i in range(6):
        row = synthetic.make_crater_tile_row(i, 33, 42)
        grid = codecs.decode(row["bytes"], row["fmt"], 33, 33)
        filled = terrain.fill_grid(grid).astype(np.int16)
        ys, xs, d8v, _ = terrain.d8_grid(filled)
        univ = {(y, x): c for y, x, c in zip(ys, xs, d8v)}
        z = {k: int(filled[k]) for k in univ}
        dist = {k: 0 for k, c in univ.items() if c > 0}
        q = deque(dist)
        while q:
            cur = q.popleft()
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if not (dy or dx):
                        continue
                    nb = (cur[0] + dy, cur[1] + dx)
                    if (nb in univ and univ[nb] == 0 and nb not in dist
                            and z[nb] == z[cur]):
                        dist[nb] = dist[cur] + 1
                        q.append(nb)
        if dist:
            worst = max(worst, max(dist.values()))
    assert 0 < worst < 16


def test_flat_routed_flow_spark_no_exchange(spark):
    from hgt2osm2_spark.sources import synthetic

    df = terrain.flat_routed_flow(synthetic.crater_tiles_df(spark, 3, 33))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "MapInPandas" in plan
    assert df.count() > 2000


def test_viewshed_spark_no_exchange(spark):
    from hgt2osm2_spark.sources import synthetic

    df = terrain.viewshed(synthetic.crater_tiles_df(spark, 3, 33),
                          h_obs=2, radius=14)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "MapInPandas" in plan
    rows = df.collect()
    assert len(rows) > 1500
    vis = sum(r.visible for r in rows)
    assert 0 < vis < len(rows)  # crater terrain occludes SOMETHING
    # engine equals the kernel run per tile through the full surface
    tiles = synthetic.crater_tiles_df(spark, 3, 33).collect()
    want = {}
    for r in tiles:
        grid = codecs.decode(bytes(r.bytes), r.fmt, r.w, r.h)
        v = terrain.viewshed_grid(grid, 16, 16, 2, 14)
        g = grid.astype(np.int64)
        ys, xs = np.nonzero(g != NV)
        for y, x in zip(ys, xs):
            if (y - 16) ** 2 + (x - 16) ** 2 <= 14 * 14:
                want[(r.image_id, int(x), int(y))] = int(v[y, x])
    got = {(r.image_id, r.x, r.y): r.visible for r in rows}
    assert got == want
