"""Vectorized marching-triangles contour extraction (the reference's inner loop).

Semantics replicated from /root/reference/ContourProcessor2.cs:
  cell -> 4 triangles decomposition      CalculateRectangle  :1682-1762
  per-triangle level case analysis       CalculateTriangle   :1775-1978
  linear interpolation                   BetweenPoint        :153-155
  NoValue cell rejection                 :1705-1726
  fakedistance height correction         :1729-1731 (applies to the
      center AFTER it was averaged from uncorrected corners — quirk Q7)

Coordinates are grid-index units with origin at the SW corner
(Get4XY, HGTReader.cs:224-226); conversion to degrees happens only at
output time (Latitude/Longitude, ContourProcessor2.cs:1644-1664).

The whole tile is processed as NumPy arrays — one (triangle, level)
case at a time over all cells — and the resulting segments are sorted
into the reference's sequential emission order
(row y asc, cell x asc, triangle 0..3, level f asc, intra-flat seq)
so that the downstream order-sensitive line-bag/stitching stages
(see stitch.py) reproduce the reference's polylines exactly.
"""

from __future__ import annotations

import numpy as np

NOVALUE = -32768

#: structured dtype of one emitted segment
SEG_DTYPE = np.dtype(
    [
        ("y", np.int32),      # data row (cell bottom index) — drives row-bag grouping
        ("level", np.int32),  # contour elevation
        ("x1", np.float64),
        ("y1", np.float64),
        ("x2", np.float64),
        ("y2", np.float64),
    ]
)


def _between(ax, ay, ah, bx, by, bh, h):
    """p = A + f*(B-A), f = (h-ha)/(hb-ha) — BetweenPoint, ContourProcessor2.cs:153-155."""
    f = (h - ah) / (bh - ah)
    return ax + f * (bx - ax), ay + f * (by - ay)


def extract_segments(grid_ns: np.ndarray, contour_distance: int, fake_distance: float) -> np.ndarray:
    """grid_ns: (H, W) int16-ish, row 0 = north (HGT layout). Returns a
    SEG_DTYPE array in reference emission order."""
    d = int(contour_distance)
    gb = grid_ns[::-1, :].astype(np.float64)  # gb[y, x], y up from SW corner
    H, W = gb.shape
    if H < 2 or W < 2:
        return np.empty(0, dtype=SEG_DTYPE)

    # padded lookup (Get returns NoValue out of range — HGTReader.cs:211-216)
    P = np.full((H + 2, W + 2), float(NOVALUE))
    P[1 : H + 1, 1 : W + 1] = gb

    def at(dy, dx):
        """raw height at (cell_y + dy, cell_x + dx) for every cell, NoValue-padded."""
        return P[1 + dy : H + dy, 1 + dx : W + dx]

    # cell corners (CalculateRectangle :1684-1702): p0 TL, p1 TR, p2 BR, p3 BL
    H0, H1, H2, H3 = at(1, 0), at(1, 1), at(0, 1), at(0, 0)
    v0, v1, v2, v3 = (Hk != NOVALUE for Hk in (H0, H1, H2, H3))
    nvalid = (
        v0.astype(np.int8) + v1.astype(np.int8) + v2.astype(np.int8) + v3.astype(np.int8)
    )
    cell_ok = nvalid >= 3  # >=2 invalid corners -> cell skipped (:1709-1715)

    hsum = (
        np.where(v0, H0, 0.0) + np.where(v1, H1, 0.0) + np.where(v2, H2, 0.0) + np.where(v3, H3, 0.0)
    )
    C = np.where(nvalid == 4, (H0 + H1 + H2 + H3) / 4.0, hsum / np.maximum(nvalid, 1))

    fake = float(fake_distance)
    H0f = np.where(v0, H0 + fake, float(NOVALUE))
    H1f = np.where(v1, H1 + fake, float(NOVALUE))
    H2f = np.where(v2, H2 + fake, float(NOVALUE))
    H3f = np.where(v3, H3 + fake, float(NOVALUE))
    Cf = C + fake  # center is always "valid" where cell_ok

    ny, nx = H - 1, W - 1
    YY, XX = np.mgrid[0:ny, 0:nx]
    cx = XX.astype(np.float64)
    cy = YY.astype(np.float64)

    # triangle vertex tables: (ax, ay, ha, bx, by, hb); c = center
    # call order ContourProcessor2.cs:1758-1761 — top, right, bottom, left
    tris = [
        (cx, cy + 1, H0f, cx + 1, cy + 1, H1f, v0 & v1),       # 0 top
        (cx + 1, cy + 1, H1f, cx + 1, cy, H2f, v1 & v2),       # 1 right
        (cx + 1, cy, H2f, cx, cy, H3f, v2 & v3),               # 2 bottom
        (cx, cy, H3f, cx, cy + 1, H0f, v3 & v0),               # 3 left
    ]
    # flat-case opposite probes per triangle (case e, :1802-1904):
    # (opp_a, opp_b, tmph1, tmph2) — raw (un-faked) neighbor heights
    flat_probe = [
        (at(0, 0), at(0, 1), at(2, 0), at(2, 1)),   # top:    below a / below b / above a / above b
        (at(1, 0), at(0, 0), at(1, 2), at(0, 2)),   # right:  left of a,b / right of a,b
        (at(1, 1), at(1, 0), at(-1, 1), at(-1, 0)), # bottom: above a,b / below a,b
        (at(0, 1), at(1, 1), at(0, -1), at(1, -1)), # left:   right of a,b / left of a,b
    ]

    out_y: list[np.ndarray] = []
    out_lvl: list[np.ndarray] = []
    out_p = []  # x1,y1,x2,y2 arrays
    out_sort = []  # (tri, fkey, seq)

    shape = YY.shape

    def emit(mask, tri_i, fkey, seq, x1, y1, x2, y2, level):
        idx = np.nonzero(mask)
        n = idx[0].size
        if n == 0:
            return
        bc = lambda a: np.broadcast_to(a, shape)[idx]
        out_y.append(YY[idx])
        out_lvl.append(bc(level).astype(np.int64))
        out_p.append((bc(x1), bc(y1), bc(x2), bc(y2)))
        out_sort.append(
            (XX[idx], np.full(n, tri_i, np.int32), bc(fkey).astype(np.float64), np.full(n, seq, np.int8))
        )

    ccx, ccy = cx + 0.5, cy + 0.5  # center point

    for t, (ax, ay, ha, bx, by, hb, ab_valid) in enumerate(tris):
        tri_ok = cell_ok & ab_valid  # invalid corner kills the triangle (:1780-1783)
        if not tri_ok.any():
            continue
        hc = Cf

        flat = tri_ok & (ha == hb) & (hb == hc)  # case e (:1802)
        nonflat = tri_ok & ~flat

        # ---- flat triangles exactly on a contour level (:1804-1905)
        if flat.any():
            ff = ha / d
            on_level = flat & (np.trunc(ff) == ff)
            if on_level.any():
                opp_a, opp_b, t1, t2 = flat_probe[t]
                divider = 2 + (t1 != NOVALUE).astype(np.int8) + (t2 != NOVALUE).astype(np.int8)
                opp_c_sum = ha + hb + np.where(t1 != NOVALUE, t1, 0.0) + np.where(t2 != NOVALUE, t2, 0.0)
                opp_c = np.where(divider >= 3, opp_c_sum / divider, float(NOVALUE))
                lvl = np.trunc(ha).astype(np.int64)  # (int)ha — exact multiple of d here
                emit(on_level & (opp_a != ha), t, ff, 0, ax, ay, ccx, ccy, lvl)
                emit(on_level & (opp_b != hb), t, ff, 1, bx, by, ccx, ccy, lvl)
                emit(on_level & (opp_c != hc), t, ff, 2, ax, ay, bx, by, lvl)

        # ---- normal case: loop contour levels (:1906-1976)
        if not nonflat.any():
            continue
        hmin = np.minimum(ha, np.minimum(hb, hc))
        hmax = np.maximum(ha, np.maximum(hb, hc))
        fmax = np.trunc(hmax / d)
        fmin = np.trunc(hmin / d)
        fmin = np.where(fmin * d < hmin, fmin + 1, fmin)  # :1912-1913

        fmin_m = np.where(nonflat, fmin, np.inf)
        fmax_m = np.where(nonflat, fmax, -np.inf)
        f_lo = fmin_m.min()
        f_hi = fmax_m.max()
        if not np.isfinite(f_lo) or f_lo > f_hi:
            continue

        for f in range(int(f_lo), int(f_hi) + 1):
            h = f * d
            m = nonflat & (fmin <= f) & (f <= fmax) & (hmin <= h) & (h <= hmax)
            if not m.any():
                continue
            ea = ha == h
            eb = hb == h
            ec = hc == h
            identh = ea.astype(np.int8) + eb.astype(np.int8) + ec.astype(np.int8)

            # case 0 (standard, :1936-1951): 2 edge crossings, edges checked AB, BC, CA
            m0 = m & (identh == 0)
            if m0.any():
                cab = ((ha <= h) & (h <= hb)) | ((ha >= h) & (h >= hb))
                cbc = ((hb <= h) & (h <= hc)) | ((hb >= h) & (h >= hc))
                with np.errstate(divide="ignore", invalid="ignore"):
                    pabx, paby = _between(ax, ay, ha, bx, by, hb, h)
                    pbcx, pbcy = _between(bx, by, hb, ccx, ccy, hc, h)
                    pcax, pcay = _between(ccx, ccy, hc, ax, ay, ha, h)
                p1x = np.where(cab, pabx, pbcx)
                p1y = np.where(cab, paby, pbcy)
                p2x = np.where(cab, np.where(cbc, pbcx, pcax), pcax)
                p2y = np.where(cab, np.where(cbc, pbcy, pcay), pcay)
                emit(m0, t, float(f), 0, p1x, p1y, p2x, p2y, h)

            # case 1 (:1953-1962): rotate so the on-level vertex is A;
            # emit A -> crossing(C,B) iff A strictly between min and max
            m1 = m & (identh == 1)
            if m1.any():
                # rotated vertices
                rax = np.where(ea, ax, np.where(eb, bx, ccx))
                ray = np.where(ea, ay, np.where(eb, by, ccy))
                # rotation: if hb==h: (a,b,c)<-(b,c,a); if hc==h: (a,b,c)<-(c,a,b)
                rbx = np.where(ea, bx, np.where(eb, ccx, ax))
                rby = np.where(ea, by, np.where(eb, ccy, ay))
                rhb = np.where(ea, hb, np.where(eb, hc, ha))
                rcx = np.where(ea, ccx, np.where(eb, ax, bx))
                rcy = np.where(ea, ccy, np.where(eb, ay, by))
                rhc = np.where(ea, hc, np.where(eb, ha, hb))
                rha = np.where(ea, ha, np.where(eb, hb, hc))
                strict = (hmin < rha) & (rha < hmax)
                with np.errstate(divide="ignore", invalid="ignore"):
                    qx, qy = _between(rcx, rcy, rhc, rbx, rby, rhb, h)
                emit(m1 & strict, t, float(f), 0, rax, ray, qx, qy, h)

            # case 2 (:1964-1971): the equal side itself, arg order (a,b)/(b,c)/(c,a)
            m2 = m & (identh == 2)
            if m2.any():
                sab = ea & eb
                sbc = eb & ec & ~sab
                sca = ec & ea & ~sab & ~sbc
                emit(m2 & sab, t, float(f), 0, ax, ay, bx, by, h)
                emit(m2 & sbc, t, float(f), 0, bx, by, ccx, ccy, h)
                emit(m2 & sca, t, float(f), 0, ccx, ccy, ax, ay, h)

    if not out_y:
        return np.empty(0, dtype=SEG_DTYPE)

    y = np.concatenate(out_y).astype(np.int64)
    lvl = np.concatenate(out_lvl)
    x1 = np.concatenate([p[0] for p in out_p])
    y1 = np.concatenate([p[1] for p in out_p])
    x2 = np.concatenate([p[2] for p in out_p])
    y2 = np.concatenate([p[3] for p in out_p])
    sx = np.concatenate([s[0] for s in out_sort]).astype(np.int64)
    st = np.concatenate([s[1] for s in out_sort])
    sf = np.concatenate([s[2] for s in out_sort])
    sq = np.concatenate([s[3] for s in out_sort])

    order = np.lexsort((sq, sf, st, sx, y))  # emission order: y, x, tri, f, seq
    seg = np.empty(order.size, dtype=SEG_DTYPE)
    seg["y"] = y[order]
    seg["level"] = lvl[order]
    seg["x1"] = x1[order]
    seg["y1"] = y1[order]
    seg["x2"] = x2[order]
    seg["y2"] = y2[order]
    return seg
