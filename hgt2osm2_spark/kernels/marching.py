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


def extract_segments(
    grid_ns: np.ndarray, contour_distance: int, fake_distance: float,
    strip_rows: int = 64,
    cell_lo: int = 0, cell_hi: int | None = None, y_base: int = 0,
) -> np.ndarray:
    """grid_ns: (H, W) int16-ish, row 0 = north (HGT layout). Returns a
    SEG_DTYPE array in reference emission order.

    STRIP-MINED (VERDICT r3 "Next round" #4): all per-cell work runs in
    row bands of `strip_rows` cell rows, so the float64 corner copies,
    case masks, and interpolation temporaries for one band (~strip x W
    doubles each) stay cache-resident instead of streaming full-grid
    arrays through DRAM once per triangle/case — the memory-bus
    appetite behind the 8->32 scaling gap. Every expression is
    elementwise per cell and evaluated in the identical IEEE order, and
    the final global lexsort is unchanged, so the output is
    bit-identical for any strip_rows.

    WINDOWED execution (sub-tile parallelism, VERDICT r3 #5): pass
    cell_lo/cell_hi to emit only the cell rows [cell_lo, cell_hi) of
    this grid, and y_base to translate local rows/coordinates into the
    enclosing tile's frame — callers hand the kernel a row band plus
    its 2-row halo (flat-case probes reach cell_y±2) and get segments
    bit-identical to the same rows of a whole-tile run (coordinates are
    integer-valued doubles, so the translation is exact)."""
    d = int(contour_distance)
    gb = grid_ns[::-1, :].astype(np.float64)  # gb[y, x], y up from SW corner
    H, W = gb.shape
    if H < 2 or W < 2:
        return np.empty(0, dtype=SEG_DTYPE)

    # padded lookup (Get returns NoValue out of range — HGTReader.cs:211-216)
    P = np.full((H + 2, W + 2), float(NOVALUE))
    P[1 : H + 1, 1 : W + 1] = gb

    ny, nx = H - 1, W - 1
    fake = float(fake_distance)

    out_y: list[np.ndarray] = []
    out_lvl: list[np.ndarray] = []
    out_p = []  # x1,y1,x2,y2 arrays
    out_sort = []  # (x, tri, fkey, seq)

    def emit1d(mask, ys, xs, tri_i, fkey, seq, x1, y1, x2, y2, level):
        """Append segments from compacted 1-D arrays."""
        idx = np.nonzero(mask)[0]
        n = idx.size
        if n == 0:
            return
        g = lambda a: a[idx] if isinstance(a, np.ndarray) else np.full(n, a)
        out_y.append(ys[idx])
        lv = g(level)
        out_lvl.append(lv.astype(np.int64) if isinstance(lv, np.ndarray) else lv)
        out_p.append((g(x1), g(y1), g(x2), g(y2)))
        out_sort.append(
            (xs[idx], np.full(n, tri_i, np.int32), g(fkey).astype(np.float64), np.full(n, seq, np.int8))
        )

    nxl = np.int64(nx)
    c0 = max(int(cell_lo), 0)
    c1 = ny if cell_hi is None else min(int(cell_hi), ny)
    yb = int(y_base)

    # C fast path (kernels/marching_cext.py): the reference's per-cell
    # loop emits in the exact (y, x, tri, level, seq) order the numpy
    # path's final lexsort establishes — no sort needed. Bit-identical
    # (property-pinned); numpy below stays the fallback + oracle.
    from . import marching_cext

    if marching_cext.available():
        ncells = max((c1 - c0), 0) * nx
        res = marching_cext.run(P, d, fake, c0, c1, yb,
                                cap_hint=ncells // 4 + 4096)
        if res is not None:
            oy, olv, x1, y1, x2, y2 = res
            seg = np.empty(oy.size, dtype=SEG_DTYPE)
            seg["y"] = oy
            seg["level"] = olv
            seg["x1"] = x1
            seg["y1"] = y1
            seg["x2"] = x2
            seg["y2"] = y2
            return seg
    for lo in range(c0, c1, max(int(strip_rows), 1)):
        hi = min(lo + max(int(strip_rows), 1), c1)

        def at(dy, dx):
            """raw height at (cell_y + dy, cell_x + dx) for the strip's
            cell rows [lo, hi), NoValue-padded."""
            return P[1 + dy + lo : 1 + dy + hi, 1 + dx : W + dx]

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

        H0f = np.where(v0, H0 + fake, float(NOVALUE))
        H1f = np.where(v1, H1 + fake, float(NOVALUE))
        H2f = np.where(v2, H2 + fake, float(NOVALUE))
        H3f = np.where(v3, H3 + fake, float(NOVALUE))
        Cf = C + fake  # center is always "valid" where cell_ok

        YY, XX = np.mgrid[lo + yb : hi + yb, 0:nx]  # TILE-frame cell indices
        cx = XX.astype(np.float64)
        cy = YY.astype(np.float64)
        shape = YY.shape

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

        ccx, ccy = cx + 0.5, cy + 0.5  # center point

        # Bandwidth note (the 100-TB lever): the naive formulation masks
        # the FULL cell grid once per contour level, moving
        # O(cells x levels) doubles through memory. Instead we compact to
        # the active triangles once, then expand each triangle over ONLY
        # its own crossing levels (sum == segment count). Identical IEEE
        # expression order, ~100x less traffic.
        for t, (ax, ay, ha, bx, by, hb, ab_valid) in enumerate(tris):
            tri_ok = (cell_ok & ab_valid).ravel()  # invalid corner kills the triangle (:1780-1783)
            if not tri_ok.any():
                continue
            # strip-local raveled copies — small enough to stay in cache
            rv = lambda a: np.ascontiguousarray(np.broadcast_to(a, shape)).reshape(-1)
            Ax, Ay, Ha = rv(ax), rv(ay), rv(ha)
            Bx, By, Hb = rv(bx), rv(by), rv(hb)
            Ccx, Ccy, Hc = rv(ccx), rv(ccy), rv(Cf)

            flat = tri_ok & (Ha == Hb) & (Hb == Hc)  # case e (:1802)

            # ---- flat triangles exactly on a contour level (:1804-1905)
            if flat.any():
                with np.errstate(invalid="ignore"):
                    ff = Ha / d
                    on_level = flat & (np.trunc(ff) == ff)
                if on_level.any():
                    onz = np.nonzero(on_level)[0]
                    loc_rows, oXs = onz // nxl, onz % nxl
                    oYs = loc_rows + lo + yb  # tile-frame data row for emission
                    gg = lambda a: np.broadcast_to(a, shape)[loc_rows, oXs]
                    opp_a, opp_b, t1, t2 = (gg(p) for p in flat_probe[t])
                    fHa, fHb, fHc = Ha[onz], Hb[onz], Hc[onz]
                    fAx, fAy, fBx, fBy = Ax[onz], Ay[onz], Bx[onz], By[onz]
                    fCx, fCy = Ccx[onz], Ccy[onz]
                    divider = 2 + (t1 != NOVALUE).astype(np.int8) + (t2 != NOVALUE).astype(np.int8)
                    opp_c_sum = fHa + fHb + np.where(t1 != NOVALUE, t1, 0.0) + np.where(t2 != NOVALUE, t2, 0.0)
                    opp_c = np.where(divider >= 3, opp_c_sum / divider, float(NOVALUE))
                    fff = fHa / d
                    lvl = np.trunc(fHa).astype(np.int64)  # (int)ha — exact multiple of d here
                    emit1d(opp_a != fHa, oYs, oXs, t, fff, 0, fAx, fAy, fCx, fCy, lvl)
                    emit1d(opp_b != fHb, oYs, oXs, t, fff, 1, fBx, fBy, fCx, fCy, lvl)
                    emit1d(opp_c != fHc, oYs, oXs, t, fff, 2, fAx, fAy, fBx, fBy, lvl)

            # ---- normal case (:1906-1976): expand (triangle x its levels)
            nonflat = tri_ok & ~flat
            hmin = np.minimum(Ha, np.minimum(Hb, Hc))
            hmax = np.maximum(Ha, np.maximum(Hb, Hc))
            fmax = np.trunc(hmax / d)
            fmin = np.trunc(hmin / d)
            fmin = np.where(fmin * d < hmin, fmin + 1, fmin)  # :1912-1913

            cnt = (fmax - fmin + 1).astype(np.int64)
            np.clip(cnt, 0, None, out=cnt)
            cnt[~nonflat] = 0
            keep = np.nonzero(cnt)[0]
            if keep.size == 0:
                continue
            kcnt = cnt[keep]
            total = int(kcnt.sum())
            rep = np.repeat(keep, kcnt)  # flat cell index per (triangle, level) pair
            starts = np.cumsum(kcnt) - kcnt
            fl = fmin[rep] + (np.arange(total, dtype=np.int64) - np.repeat(starts, kcnt))
            h = fl * d

            # reference loop guard :1916 (hmin <= h <= hmax, matters for h<0)
            hmn, hmx = hmin[rep], hmax[rep]
            ok = (hmn <= h) & (h <= hmx)

            PAx, PAy, HA = Ax[rep], Ay[rep], Ha[rep]
            PBx, PBy, HB = Bx[rep], By[rep], Hb[rep]
            PCx, PCy, HC = Ccx[rep], Ccy[rep], Hc[rep]
            Yp, Xp = rep // nxl + lo + yb, rep % nxl

            ea = HA == h
            eb = HB == h
            ec = HC == h
            identh = ea.astype(np.int8) + eb.astype(np.int8) + ec.astype(np.int8)
            fkey = fl.astype(np.float64)

            # case 0 (standard, :1936-1951): 2 edge crossings, edges checked AB, BC, CA
            m0 = ok & (identh == 0)
            if m0.any():
                cab = ((HA <= h) & (h <= HB)) | ((HA >= h) & (h >= HB))
                cbc = ((HB <= h) & (h <= HC)) | ((HB >= h) & (h >= HC))
                with np.errstate(divide="ignore", invalid="ignore"):
                    pabx, paby = _between(PAx, PAy, HA, PBx, PBy, HB, h)
                    pbcx, pbcy = _between(PBx, PBy, HB, PCx, PCy, HC, h)
                    pcax, pcay = _between(PCx, PCy, HC, PAx, PAy, HA, h)
                p1x = np.where(cab, pabx, pbcx)
                p1y = np.where(cab, paby, pbcy)
                p2x = np.where(cab, np.where(cbc, pbcx, pcax), pcax)
                p2y = np.where(cab, np.where(cbc, pbcy, pcay), pcay)
                emit1d(m0, Yp, Xp, t, fkey, 0, p1x, p1y, p2x, p2y, h)

            # case 1 (:1953-1962): rotate so the on-level vertex is A;
            # emit A -> crossing(C,B) iff A strictly between min and max
            m1 = ok & (identh == 1)
            if m1.any():
                rax = np.where(ea, PAx, np.where(eb, PBx, PCx))
                ray = np.where(ea, PAy, np.where(eb, PBy, PCy))
                # rotation: if hb==h: (a,b,c)<-(b,c,a); if hc==h: (a,b,c)<-(c,a,b)
                rbx = np.where(ea, PBx, np.where(eb, PCx, PAx))
                rby = np.where(ea, PBy, np.where(eb, PCy, PAy))
                rhb = np.where(ea, HB, np.where(eb, HC, HA))
                rcx = np.where(ea, PCx, np.where(eb, PAx, PBx))
                rcy = np.where(ea, PCy, np.where(eb, PAy, PBy))
                rhc = np.where(ea, HC, np.where(eb, HA, HB))
                rha = np.where(ea, HA, np.where(eb, HB, HC))
                strict = (hmn < rha) & (rha < hmx)
                with np.errstate(divide="ignore", invalid="ignore"):
                    qx, qy = _between(rcx, rcy, rhc, rbx, rby, rhb, h)
                emit1d(m1 & strict, Yp, Xp, t, fkey, 0, rax, ray, qx, qy, h)

            # case 2 (:1964-1971): the equal side itself, arg order (a,b)/(b,c)/(c,a)
            m2 = ok & (identh == 2)
            if m2.any():
                sab = ea & eb
                sbc = eb & ec & ~sab
                sca = ec & ea & ~sab & ~sbc
                emit1d(m2 & sab, Yp, Xp, t, fkey, 0, PAx, PAy, PBx, PBy, h)
                emit1d(m2 & sbc, Yp, Xp, t, fkey, 0, PBx, PBy, PCx, PCy, h)
                emit1d(m2 & sca, Yp, Xp, t, fkey, 0, PCx, PCy, PAx, PAy, h)

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
