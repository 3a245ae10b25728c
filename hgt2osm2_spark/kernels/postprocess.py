"""Post-production: filters, collinear removal, Douglas-Peucker.

Replicates /root/reference/ContourProcessor2.cs PostProduction.Run
(:1264-1383) including the two load-bearing quirks (SURVEY.md §2.11):

Q1 — BoundingRectangle bug (:397-412): every accumulator except wmin
     mistakenly reads wmin, so effectively
         left = min(X); wmax = max(left, X_last);
         hmin = min(left, Y_last); hmax = max(left, Y_last)
     and the edge-exemption test (:1299-1303) compares grid-index
     coordinates against edge = 1/Width and 1.0-edge, exempting almost
     any polyline whose min X <= 1-edge. Both reproduced bug-for-bug
     behind strict_reference=True (set False for the sane geometry).

DP — DouglasPeucker (:419-437, :447-456, :522-578): recursion keeps
     first/last; for closed rings the closing duplicate point is locked
     and the ring is treated as its first n-1 points; split at the
     max squared perpendicular distance (AB x AP)^2 / |AB|^2 > eps^2.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

Point = tuple[float, float]

#: filter-reason labels (A5 metrics, :1210-1262)
REASONS = ("short", "small", "vertical", "horizontal")


@dataclass
class PostCounters:
    short_polylines: int = 0
    small_polylines: int = 0
    vertical_polylines: int = 0
    horizontal_polylines: int = 0
    removed_polylines: int = 0
    unnecessary_points: int = 0
    douglas_peucker_points: int = 0
    polylines: int = 0
    points: int = 0

    def as_dict(self) -> dict[str, int]:
        return dict(self.__dict__)


def bounding_rectangle(pts: list[Point], strict_reference: bool = True):
    """Returns (left, top, width, height). strict_reference replicates
    the accumulator bug (:397-412); otherwise the true bbox."""
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    if strict_reference:
        wmin = min(xs)
        wmax = max(wmin, xs[-1])
        hmin = min(wmin, ys[-1])
        hmax = max(wmin, ys[-1])
    else:
        wmin, wmax, hmin, hmax = min(xs), max(xs), min(ys), max(ys)
    return wmin, hmax, wmax - wmin, hmax - hmin


def is_edge_polyline(pts: list[Point], edge: float, strict_reference: bool = True) -> bool:
    """Edge-zone exemption (:1294-1304). With strict_reference the
    index-unit coords are compared against degree-like constants (Q1/F9)."""
    left, top, width, height = bounding_rectangle(pts, strict_reference)
    return (
        left + width <= edge
        or left <= 1.0 - edge
        or top <= edge
        or top - height <= 1.0 - edge
    )


def remove_collinear(pts: list[Point]) -> tuple[list[Point], int]:
    """Collinear interior-point removal (:1346-1370). The reference's
    remove-and-recheck loop is equivalent to a stack pass: push each
    point, drop the middle of the top-3 whenever both segments are
    diagonal with equal cross-slopes, both vertical, or both horizontal."""
    if len(pts) < 3:
        return pts, 0
    # vectorized bail-out: if no ORIGINAL triple is collinear, the
    # remove-and-recheck loop can never fire (removals only cascade
    # from an initial drop) — about half of real contour polylines
    # skip the sequential pass entirely
    a = np.asarray(pts, dtype=np.float64)
    dx = np.diff(a[:, 0])
    dy = np.diff(a[:, 1])
    dx1, dx2, dy1, dy2 = dx[:-1], dx[1:], dy[:-1], dy[1:]
    diag = (dx1 != 0) & (dx2 != 0) & (dy1 != 0) & (dy2 != 0)
    drop = np.where(
        diag,
        dx1 * dy2 == dx2 * dy1,
        ((dx1 == 0) & (dx2 == 0)) | ((dy1 == 0) & (dy2 == 0)),
    )
    if not drop.any():
        return pts, 0
    out = [pts[0], pts[1]]
    removed = 0
    for p in pts[2:]:
        out.append(p)
        while len(out) >= 3:
            (x0, y0), (x1, y1), (x2, y2) = out[-3], out[-2], out[-1]
            dx1, dy1 = x1 - x0, y1 - y0
            dx2, dy2 = x2 - x1, y2 - y1
            if dx1 != 0 and dx2 != 0 and dy1 != 0 and dy2 != 0:
                drop = dx1 * dy2 == dx2 * dy1
            else:
                drop = (dx1 == 0 and dx2 == 0) or (dy1 == 0 and dy2 == 0)
            if not drop:
                break
            del out[-2]
            removed += 1
    return out, removed


def douglas_peucker(pts: list[Point], eps: float) -> tuple[list[Point], int]:
    """DP with the reference's closed-ring handling (:419-437).
    Iterative stack instead of recursion; identical split rule and
    tie-breaking (strictly-greater wins, later index replaces on greater
    distance only)."""
    n = len(pts)
    closed = n > 0 and pts[0] == pts[-1]
    m = n - 1 if closed else n  # ring: work on first n-1 points
    if m <= 2:
        return pts, 0

    arr = np.asarray(pts, dtype=np.float64)
    xs = arr[:, 0]
    ys = arr[:, 1]
    # plain-float copies for the small-span path (scalar indexing of
    # ndarrays allocates np.float64 boxes; float ops are IEEE-identical)
    xl = xs.tolist()
    yl = ys.tolist()
    valid = np.zeros(n, dtype=bool)
    if closed:
        valid[n - 1] = True  # closing duplicate always kept (:422)
    valid[0] = True
    valid[m - 1] = True

    eps2 = eps * eps
    stack = [(0, m - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 - i0 < 2:
            continue
        # "dMinSquareWidth < dSquareWidth" running max (:566-569) keeps
        # the FIRST index of the maximum — np.argmax semantics exactly
        best = -1
        if i1 - i0 <= 128:
            # small span: scalar Python beats per-op NumPy overhead;
            # identical IEEE-754 arithmetic either way
            x0, y0 = xl[i0], yl[i0]
            abx = xl[i1] - x0
            aby = yl[i1] - y0
            d2ab = abx * abx + aby * aby
            if d2ab == 0.0:
                continue  # :527-528
            bestd = eps2
            for jj in range(i0 + 1, i1):
                cr = abx * (yl[jj] - y0) - aby * (xl[jj] - x0)
                dd = cr * cr / d2ab
                if bestd < dd:
                    bestd = dd
                    best = jj - i0 - 1
        else:
            abx = xs[i1] - xs[i0]
            aby = ys[i1] - ys[i0]
            d2ab = abx * abx + aby * aby
            if d2ab == 0.0:
                continue  # :527-528
            apx = xs[i0 + 1 : i1] - xs[i0]
            apy = ys[i0 + 1 : i1] - ys[i0]
            cross = abx * apy - aby * apx
            d2 = cross * cross / d2ab
            if d2.size:
                j = int(np.argmax(d2))
                if d2[j] > eps2:
                    best = j
        if best >= 0:
            idx = i0 + 1 + best
            valid[idx] = True
            if idx - i0 > 1:
                stack.append((i0, idx))
            if i1 - idx > 1:
                stack.append((idx, i1))

    kept = [pts[i] for i in range(n) if valid[i]]
    return kept, n - len(kept)


def run_polyline(
    pts: list[Point],
    minpt: int,
    minboxwidth: float,
    edge: float,
    dp_eps: float,
    counters: PostCounters,
    strict_reference: bool = True,
) -> list[Point] | None:
    """PostProduction.Run for one polyline (:1294-1383). Returns the
    surviving (possibly simplified) point list, or None if removed."""
    remove = False
    is_edge = is_edge_polyline(pts, edge, strict_reference)

    if not is_edge:
        if len(pts) < minpt:
            counters.short_polylines += 1
            remove = True
        if not remove:
            _, _, width, height = bounding_rectangle(pts, strict_reference)
            if width <= minboxwidth and height <= minboxwidth:
                counters.small_polylines += 1
                remove = True
        if not remove:
            if all(p[0] == pts[0][0] for p in pts[1:]):
                counters.vertical_polylines += 1
                remove = True
        if not remove:
            if all(p[1] == pts[0][1] for p in pts[1:]):
                counters.horizontal_polylines += 1
                remove = True
        if remove:
            counters.removed_polylines += 1
        if not remove:
            pts, nrem = remove_collinear(pts)
            counters.unnecessary_points += nrem

    if not remove:
        pts, ndp = douglas_peucker(pts, dp_eps)
        counters.douglas_peucker_points += ndp
        counters.polylines += 1
        counters.points += len(pts)
        return pts
    return None


#: run_polylines_batch status codes -> filter-reason labels (0 = kept)
STATUS_REASONS = (None, "short", "small", "vertical", "horizontal")


def run_polylines_batch(
    xs: "np.ndarray", ys: "np.ndarray", off: "np.ndarray",
    minpt: int, minboxwidth: float, edge, dp_eps: float,
    strict_reference: bool = True,
):
    """Batch run_polyline over flat point arrays (off[n_poly+1] spans).
    ``edge`` may be a scalar or a per-polyline array (mixed tile widths
    in one batch).

    Returns (oxs, oys, ooff, status, n_unn, n_dp): survivors' simplified
    points live in oxs/oys[ooff[i]:ooff[i+1]]; removed polylines have an
    empty span and status = index into STATUS_REASONS.  Dispatches to
    the C twin (kernels/postprocess_cext.py) when available, else runs
    the scalar run_polyline per polyline — both paths are bit-identical
    (property-pinned)."""
    from . import postprocess_cext

    if postprocess_cext.available():
        res = postprocess_cext.run(
            xs, ys, off, minpt, minboxwidth, edge, dp_eps, strict_reference
        )
        if res is not None:
            return res
    return run_polylines_batch_py(
        xs, ys, off, minpt, minboxwidth, edge, dp_eps, strict_reference
    )


def run_polylines_batch_py(
    xs: "np.ndarray", ys: "np.ndarray", off: "np.ndarray",
    minpt: int, minboxwidth: float, edge, dp_eps: float,
    strict_reference: bool = True,
):
    """Pure-Python fallback/oracle for run_polylines_batch — a scalar
    run_polyline loop with the same flat-array interface."""
    n_poly = len(off) - 1
    oxs: list[float] = []
    oys: list[float] = []
    ooff = np.empty(n_poly + 1, dtype=np.int64)
    status = np.zeros(n_poly, dtype=np.int8)
    n_unn = np.zeros(n_poly, dtype=np.int32)
    n_dp = np.zeros(n_poly, dtype=np.int32)
    edges = (
        np.full(n_poly, float(edge)) if np.ndim(edge) == 0
        else np.asarray(edge, dtype=np.float64)
    )
    for i in range(n_poly):
        s, e = int(off[i]), int(off[i + 1])
        pts = list(zip(xs[s:e].tolist(), ys[s:e].tolist()))
        ooff[i] = len(oxs)
        c = PostCounters()
        kept = run_polyline(
            pts, minpt, minboxwidth, float(edges[i]), dp_eps, c,
            strict_reference
        )
        if kept is None:
            for code, attr in (
                (1, "short_polylines"), (2, "small_polylines"),
                (3, "vertical_polylines"), (4, "horizontal_polylines"),
            ):
                if getattr(c, attr):
                    status[i] = code
                    break
            continue
        n_unn[i] = c.unnecessary_points
        n_dp[i] = c.douglas_peucker_points
        oxs.extend(p[0] for p in kept)
        oys.extend(p[1] for p in kept)
    ooff[n_poly] = len(oxs)
    return (
        np.asarray(oxs, dtype=np.float64), np.asarray(oys, dtype=np.float64),
        ooff, status, n_unn, n_dp,
    )
