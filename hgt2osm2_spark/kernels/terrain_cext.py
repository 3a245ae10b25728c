"""Optional C fast path for the drainage stack (VERDICT r7 #7): D8
flow direction + flow accumulation + outlet labeling, the slowest
per-tile kernels in the tree at SRTM-1 grain (BENCH/TERRAIN.md: the
numpy worklist-Kahn pair is ~4.5 s/3601^2 tile).

Same twin-and-golden contract as marching/stitch/postprocess
(kernels/stitch_cext.py module doc): lazy content-hashed gcc build,
pure-Python/numpy path stays the ORACLE and the fallback, tests assert
bit-equality on random heightfields with NOVALUE holes, make_golden
pins HGT2OSM2_NO_CKERNEL so every golden derives from the Python path.
Everything here is INTEGER arithmetic (the r7 integer-exact gate
discipline), so bit-equality needs no FP flags at all — but the build
keeps the shared -ffp-contract=off contract anyway.

Semantics mirrored exactly from ops/terrain.py:
 - d8: steepest descent ranked by drop2x = k*max(drop,0)^2 (k=2
   cardinal, 1 diagonal), STRICT > so the first (smallest) ESRI code
   wins ties; any NOVALUE in the 3x3 (center included) suppresses the
   cell; pits/flats emit code 0.
 - accumulation: weight-1 sums over the functional descent graph
   (integer addition is order-free, so the C FIFO worklist and the
   numpy round-based Kahn agree bit-for-bit).
 - outlet: the terminal cell of each drainage path (a cell's target
   retires after it, so one reverse sweep of the retirement order
   resolves every label).
"""

from __future__ import annotations

import ctypes

import numpy as np

from . import cext

_C_SOURCE = r"""
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define NOVALUE (-32768)

/* ESRI D8 order (E, SE, S, SW, W, NW, N, NE), +y south — must match
   ops/terrain.py D8_NEIGHBORS exactly (code, dx, dy, cardinal) */
static const int32_t CODES[8] = {1, 2, 4, 8, 16, 32, 64, 128};
static const int32_t DX[8]    = {1, 1, 0, -1, -1, -1, 0, 1};
static const int32_t DY[8]    = {0, 1, 1,  1,  0, -1, -1, -1};
static const int32_t CARD[8]  = {1, 0, 1,  0,  1,  0, 1, 0};

/* Fill interior planes ((h-2) x (w-2), row-major): d8 code, drop2x,
   valid flag, and the neighbor slot index (or -1).  Returns the number
   of valid cells. */
static int64_t d8_planes(const int16_t* g, int64_t h, int64_t w,
                         int32_t* d8, int64_t* drop2x, int8_t* kidx,
                         uint8_t* valid)
{
    int64_t iw = w - 2, n_valid = 0;
    for (int64_t y = 1; y < h - 1; y++) {
        for (int64_t x = 1; x < w - 1; x++) {
            int64_t o = (y - 1) * iw + (x - 1);
            int16_t e = g[y * w + x];
            int bad = (e == NOVALUE);
            int64_t best = 0;
            int32_t code = 0;
            int8_t bk = -1;
            for (int k = 0; k < 8 && !bad; k++) {
                int16_t nb = g[(y + DY[k]) * w + (x + DX[k])];
                if (nb == NOVALUE) { bad = 1; break; }
                int64_t drop = (int64_t)e - (int64_t)nb;
                if (drop <= 0) continue;
                int64_t s = drop * drop;
                if (CARD[k]) s *= 2;
                if (s > best) { best = s; code = CODES[k]; bk = (int8_t)k; }
            }
            if (bad) {
                valid[o] = 0; d8[o] = 0; drop2x[o] = 0; kidx[o] = -1;
            } else {
                valid[o] = 1; d8[o] = code; drop2x[o] = best; kidx[o] = bk;
                n_valid++;
            }
        }
    }
    return n_valid;
}

/* d8 export: compact (ys, xs, d8, drop2x) over valid cells, row-major
   order (the numpy keep order). Returns n or -1. */
int64_t d8_grid_c(const int16_t* g, int64_t h, int64_t w,
                  int32_t* ys, int32_t* xs, int32_t* d8o, int64_t* dr)
{
    if (h < 3 || w < 3) return 0;
    int64_t iw = w - 2, ih = h - 2, np_ = iw * ih;
    int32_t* d8 = (int32_t*)malloc(np_ * sizeof(int32_t));
    int64_t* dp = (int64_t*)malloc(np_ * sizeof(int64_t));
    int8_t*  kx = (int8_t*)malloc(np_);
    uint8_t* va = (uint8_t*)malloc(np_);
    if (!d8 || !dp || !kx || !va) { free(d8); free(dp); free(kx); free(va); return -1; }
    d8_planes(g, h, w, d8, dp, kx, va);
    int64_t n = 0;
    for (int64_t o = 0; o < np_; o++) {
        if (!va[o]) continue;
        ys[n] = (int32_t)(o / iw + 1);
        xs[n] = (int32_t)(o % iw + 1);
        d8o[n] = d8[o];
        dr[n] = dp[o];
        n++;
    }
    free(d8); free(dp); free(kx); free(va);
    return n;
}

/* Full drainage pass: compact (ys, xs, acc, oy, ox) over valid cells.
   Returns n, or -1 on alloc failure, -2 on a cycle (impossible for
   strict descent — defensive). */
int64_t flow_accumulate_c(const int16_t* g, int64_t h, int64_t w,
                          int32_t* ys, int32_t* xs, int64_t* acc,
                          int32_t* oy, int32_t* ox)
{
    if (h < 3 || w < 3) return 0;
    int64_t iw = w - 2, ih = h - 2, np_ = iw * ih;
    int32_t* d8 = (int32_t*)malloc(np_ * sizeof(int32_t));
    int64_t* dp = (int64_t*)malloc(np_ * sizeof(int64_t));
    int8_t*  kx = (int8_t*)malloc(np_);
    uint8_t* va = (uint8_t*)malloc(np_);
    int64_t* lut = (int64_t*)malloc(np_ * sizeof(int64_t));
    if (!d8 || !dp || !kx || !va || !lut) {
        free(d8); free(dp); free(kx); free(va); free(lut); return -1;
    }
    d8_planes(g, h, w, d8, dp, kx, va);
    int64_t n = 0;
    for (int64_t o = 0; o < np_; o++) {
        if (va[o]) { lut[o] = n; ys[n] = (int32_t)(o / iw + 1);
                     xs[n] = (int32_t)(o % iw + 1); n++; }
        else lut[o] = -1;
    }
    int64_t* t = (int64_t*)malloc(n * sizeof(int64_t));
    int64_t* indeg = (int64_t*)calloc(n, sizeof(int64_t));
    int64_t* queue = (int64_t*)malloc(n * sizeof(int64_t));
    int64_t* outl = (int64_t*)malloc(n * sizeof(int64_t));
    if (!t || !indeg || !queue || !outl) {
        free(d8); free(dp); free(kx); free(va); free(lut);
        free(t); free(indeg); free(queue); free(outl); return -1;
    }
    for (int64_t i = 0; i < n; i++) {
        int64_t o = (int64_t)(ys[i] - 1) * iw + (xs[i] - 1);
        int8_t k = kx[o];
        int64_t ti = -1;
        if (k >= 0) {
            int64_t tx = xs[i] + DX[k], ty = ys[i] + DY[k];
            if (tx >= 1 && tx <= iw && ty >= 1 && ty <= ih) {
                ti = lut[(ty - 1) * iw + (tx - 1)];
            }
        }
        t[i] = ti;
        acc[i] = 1;
        if (ti >= 0) indeg[ti]++;
    }
    /* FIFO worklist Kahn: integer sums are order-free, so any valid
       topological order matches the numpy round-based result */
    int64_t head = 0, tail = 0;
    for (int64_t i = 0; i < n; i++) if (indeg[i] == 0) queue[tail++] = i;
    while (head < tail) {
        int64_t c = queue[head++];
        int64_t ti = t[c];
        if (ti >= 0) {
            acc[ti] += acc[c];
            if (--indeg[ti] == 0) queue[tail++] = ti;
        }
    }
    int rc = (tail == n) ? 0 : -2;
    if (rc == 0) {
        for (int64_t i = 0; i < n; i++) outl[i] = i;
        for (int64_t q = n - 1; q >= 0; q--) {
            int64_t c = queue[q];
            if (t[c] >= 0) outl[c] = outl[t[c]];
        }
        for (int64_t i = 0; i < n; i++) {
            oy[i] = ys[outl[i]];
            ox[i] = xs[outl[i]];
        }
    }
    free(d8); free(dp); free(kx); free(va); free(lut);
    free(t); free(indeg); free(queue); free(outl);
    return rc == 0 ? n : rc;
}

/* Downstream flow-path length (ops/terrain.flow_length_grid):
   (ys, xs, steps, ncard) over the valid universe — steps = D8 edges
   to the terminal, ncard = cardinal steps among them.  One FIFO Kahn
   for retirement order + one reverse sweep (a cell's target retires
   later, so its totals are final first) — O(n) vs the numpy pointer
   doubling's O(n log L); both resolve the same integer path geometry
   exactly.  Returns n, -1 alloc, -2 cycle. */
int64_t flow_length_c(const int16_t* g, int64_t h, int64_t w,
                      int32_t* ys, int32_t* xs,
                      int64_t* steps, int64_t* ncard)
{
    if (h < 3 || w < 3) return 0;
    int64_t iw = w - 2, ih = h - 2, np_ = iw * ih;
    int32_t* d8 = (int32_t*)malloc(np_ * sizeof(int32_t));
    int64_t* dp = (int64_t*)malloc(np_ * sizeof(int64_t));
    int8_t*  kx = (int8_t*)malloc(np_);
    uint8_t* va = (uint8_t*)malloc(np_);
    int64_t* lut = (int64_t*)malloc(np_ * sizeof(int64_t));
    if (!d8 || !dp || !kx || !va || !lut) {
        free(d8); free(dp); free(kx); free(va); free(lut); return -1;
    }
    d8_planes(g, h, w, d8, dp, kx, va);
    int64_t n = 0;
    for (int64_t o = 0; o < np_; o++) {
        if (va[o]) { lut[o] = n; ys[n] = (int32_t)(o / iw + 1);
                     xs[n] = (int32_t)(o % iw + 1); n++; }
        else lut[o] = -1;
    }
    int64_t* t = (int64_t*)malloc((n ? n : 1) * sizeof(int64_t));
    int8_t* card = (int8_t*)malloc(n ? n : 1);
    int64_t* indeg = (int64_t*)calloc(n ? n : 1, sizeof(int64_t));
    int64_t* queue = (int64_t*)malloc((n ? n : 1) * sizeof(int64_t));
    if (!t || !card || !indeg || !queue) {
        free(d8); free(dp); free(kx); free(va); free(lut);
        free(t); free(card); free(indeg); free(queue); return -1;
    }
    for (int64_t i = 0; i < n; i++) {
        int64_t o = (int64_t)(ys[i] - 1) * iw + (xs[i] - 1);
        int8_t k = kx[o];
        int64_t ti = -1;
        if (k >= 0) {
            int64_t tx = xs[i] + DX[k], ty = ys[i] + DY[k];
            if (tx >= 1 && tx <= iw && ty >= 1 && ty <= ih)
                ti = lut[(ty - 1) * iw + (tx - 1)];
        }
        t[i] = ti;
        card[i] = (k >= 0) ? (int8_t)CARD[k] : 0;
        steps[i] = 0; ncard[i] = 0;
        if (ti >= 0) indeg[ti]++;
    }
    int64_t head = 0, tail = 0;
    for (int64_t i = 0; i < n; i++) if (indeg[i] == 0) queue[tail++] = i;
    while (head < tail) {
        int64_t c = queue[head++];
        if (t[c] >= 0 && --indeg[t[c]] == 0) queue[tail++] = t[c];
    }
    int rc = (tail == n) ? 0 : -2;
    if (rc == 0) {
        for (int64_t q = n - 1; q >= 0; q--) {
            int64_t c = queue[q];
            if (t[c] >= 0) {
                steps[c] = steps[t[c]] + 1;
                ncard[c] = ncard[t[c]] + card[c];
            }
        }
    }
    free(d8); free(dp); free(kx); free(va); free(lut);
    free(t); free(card); free(indeg); free(queue);
    return rc == 0 ? n : rc;
}

/* Strahler stream order (ops/terrain.stream_order_grid): acc via the
   FIFO Kahn, stream mask acc >= min_acc (descent-closed), then the
   (max order, count-at-max) merge applied per edge at retirement —
   the merge is order-free across arrival orders, so the sequential
   per-edge form agrees with the numpy per-round form exactly.
   Returns n_stream, -1 alloc, -2 cycle. */
int64_t stream_order_c(const int16_t* g, int64_t h, int64_t w,
                       int64_t min_acc, int32_t* ys, int32_t* xs,
                       int64_t* acc_out, int64_t* order_out)
{
    if (h < 3 || w < 3) return 0;
    int64_t iw = w - 2, ih = h - 2, np_ = iw * ih;
    int32_t* d8 = (int32_t*)malloc(np_ * sizeof(int32_t));
    int64_t* dp = (int64_t*)malloc(np_ * sizeof(int64_t));
    int8_t*  kx = (int8_t*)malloc(np_);
    uint8_t* va = (uint8_t*)malloc(np_);
    int64_t* lut = (int64_t*)malloc(np_ * sizeof(int64_t));
    if (!d8 || !dp || !kx || !va || !lut) {
        free(d8); free(dp); free(kx); free(va); free(lut); return -1;
    }
    d8_planes(g, h, w, d8, dp, kx, va);
    int64_t n = 0;
    /* local compact coords (reuse caller buffers at the end) */
    int32_t* cy = (int32_t*)malloc(np_ * sizeof(int32_t));
    int32_t* cx = (int32_t*)malloc(np_ * sizeof(int32_t));
    if (!cy || !cx) {
        free(d8); free(dp); free(kx); free(va); free(lut);
        free(cy); free(cx); return -1;
    }
    for (int64_t o = 0; o < np_; o++) {
        if (va[o]) { lut[o] = n; cy[n] = (int32_t)(o / iw + 1);
                     cx[n] = (int32_t)(o % iw + 1); n++; }
        else lut[o] = -1;
    }
    int64_t* t = (int64_t*)malloc((n ? n : 1) * sizeof(int64_t));
    int64_t* acc = (int64_t*)malloc((n ? n : 1) * sizeof(int64_t));
    int64_t* indeg = (int64_t*)calloc(n ? n : 1, sizeof(int64_t));
    int64_t* queue = (int64_t*)malloc((n ? n : 1) * sizeof(int64_t));
    if (!t || !acc || !indeg || !queue) {
        free(d8); free(dp); free(kx); free(va); free(lut);
        free(cy); free(cx); free(t); free(acc); free(indeg); free(queue);
        return -1;
    }
    for (int64_t i = 0; i < n; i++) {
        int64_t o = (int64_t)(cy[i] - 1) * iw + (cx[i] - 1);
        int8_t k = kx[o];
        int64_t ti = -1;
        if (k >= 0) {
            int64_t tx = cx[i] + DX[k], ty = cy[i] + DY[k];
            if (tx >= 1 && tx <= iw && ty >= 1 && ty <= ih)
                ti = lut[(ty - 1) * iw + (tx - 1)];
        }
        t[i] = ti;
        acc[i] = 1;
        if (ti >= 0) indeg[ti]++;
    }
    int64_t head = 0, tail = 0;
    for (int64_t i = 0; i < n; i++) if (indeg[i] == 0) queue[tail++] = i;
    while (head < tail) {
        int64_t c = queue[head++];
        if (t[c] >= 0) {
            acc[t[c]] += acc[c];
            if (--indeg[t[c]] == 0) queue[tail++] = t[c];
        }
    }
    if (tail != n) {
        free(d8); free(dp); free(kx); free(va); free(lut);
        free(cy); free(cx); free(t); free(acc); free(indeg); free(queue);
        return -2;
    }
    /* stream subgraph Kahn with the (mx, cnt) merge; the mask is
       descent-closed so stream targets stay stream */
    int64_t* mx = (int64_t*)calloc(n ? n : 1, sizeof(int64_t));
    int64_t* cnt = (int64_t*)calloc(n ? n : 1, sizeof(int64_t));
    int64_t* order = (int64_t*)calloc(n ? n : 1, sizeof(int64_t));
    int64_t* sdeg = (int64_t*)calloc(n ? n : 1, sizeof(int64_t));
    if (!mx || !cnt || !order || !sdeg) {
        free(d8); free(dp); free(kx); free(va); free(lut);
        free(cy); free(cx); free(t); free(acc); free(indeg); free(queue);
        free(mx); free(cnt); free(order); free(sdeg); return -1;
    }
    for (int64_t i = 0; i < n; i++) {
        if (acc[i] < min_acc) continue;
        int64_t ti = t[i];
        if (ti >= 0 && acc[ti] >= min_acc) sdeg[ti]++;
    }
    head = 0; tail = 0;
    for (int64_t i = 0; i < n; i++)
        if (acc[i] >= min_acc && sdeg[i] == 0) queue[tail++] = i;
    while (head < tail) {
        int64_t c = queue[head++];
        order[c] = (mx[c] == 0) ? 1 : mx[c] + (cnt[c] >= 2 ? 1 : 0);
        int64_t ti = t[c];
        if (ti >= 0 && acc[ti] >= min_acc) {
            if (order[c] > mx[ti]) { mx[ti] = order[c]; cnt[ti] = 1; }
            else if (order[c] == mx[ti]) cnt[ti]++;
            if (--sdeg[ti] == 0) queue[tail++] = ti;
        }
    }
    /* export stream cells in row-major (compact) order */
    int64_t m = 0;
    for (int64_t i = 0; i < n; i++) {
        if (acc[i] < min_acc) continue;
        ys[m] = cy[i]; xs[m] = cx[i];
        acc_out[m] = acc[i]; order_out[m] = order[i];
        m++;
    }
    free(d8); free(dp); free(kx); free(va); free(lut);
    free(cy); free(cx); free(t); free(acc); free(indeg); free(queue);
    free(mx); free(cnt); free(order); free(sdeg);
    return m;
}

/* Second-order morphometry stencils (ops/terrain.morph_grid):
   (ys, xs, tpi8, tri, rough, zxx, zyy, ixy4) over the valid 3x3
   universe — pure integer sums, one pass. Returns n or -1. */
int64_t morph_c(const int16_t* g, int64_t h, int64_t w,
                int32_t* ys, int32_t* xs, int64_t* tpi8, int64_t* tri,
                int64_t* rough, int64_t* zxx, int64_t* zyy, int64_t* ixy4)
{
    if (h < 3 || w < 3) return 0;
    int64_t n = 0;
    for (int64_t y = 1; y < h - 1; y++) {
        for (int64_t x = 1; x < w - 1; x++) {
            int64_t a = g[(y - 1) * w + (x - 1)];
            int64_t b = g[(y - 1) * w + x];
            int64_t c = g[(y - 1) * w + (x + 1)];
            int64_t d = g[y * w + (x - 1)];
            int64_t e = g[y * w + x];
            int64_t f = g[y * w + (x + 1)];
            int64_t gg = g[(y + 1) * w + (x - 1)];
            int64_t hh = g[(y + 1) * w + x];
            int64_t ii = g[(y + 1) * w + (x + 1)];
            if (a == NOVALUE || b == NOVALUE || c == NOVALUE ||
                d == NOVALUE || e == NOVALUE || f == NOVALUE ||
                gg == NOVALUE || hh == NOVALUE || ii == NOVALUE) continue;
            int64_t s = a + b + c + d + f + gg + hh + ii;
            int64_t trv = 0, mxv = e, mnv = e;
            int64_t nbs[8] = {a, b, c, d, f, gg, hh, ii};
            for (int k = 0; k < 8; k++) {
                int64_t v = nbs[k];
                trv += (v > e) ? (v - e) : (e - v);
                if (v > mxv) mxv = v;
                if (v < mnv) mnv = v;
            }
            ys[n] = (int32_t)y; xs[n] = (int32_t)x;
            tpi8[n] = 8 * e - s;
            tri[n] = trv;
            rough[n] = mxv - mnv;
            zxx[n] = d + f - 2 * e;
            zyy[n] = b + hh - 2 * e;
            ixy4[n] = (a + ii) - (c + gg);
            n++;
        }
    }
    return n;
}

/* Mosaic drainage pass (ops/mosaic.mosaic_tile_arrays): the same
   d8 + FIFO-worklist Kahn over one tile's AUGMENTED grid
   (ha = h + 2, wa = w + 2 where h, w are the tile dims), with the
   two mosaic generalizations — per-cell int64 initial weights
   (has_w = 0 means all-ones) and the owned-box universe cut
   (tile coords x < w-1, y < h-1).  Output arrays are compact over
   owned valid cells in row-major order (the numpy keep order):
   ys/xs tile coords, acc weighted accumulation, term index of the
   local terminal, cross flag (own D8 target leaves the owned box),
   tys/txs the D8 target's tile coords (own coords at pits/flats),
   steps/ncard D8 steps to the local terminal (total / cardinal),
   t the immediate in-box target index (-1 at terminals and cross
   cells).  Returns n, -1 on alloc failure, -2 on a cycle. */
int64_t mosaic_accumulate_c(const int16_t* g, int64_t ha, int64_t wa,
                            const int64_t* wts, int64_t has_w,
                            int32_t* ys, int32_t* xs, int64_t* acc,
                            int64_t* term, uint8_t* cross,
                            int64_t* tys, int64_t* txs,
                            int64_t* steps, int64_t* ncard, int64_t* t)
{
    if (ha < 3 || wa < 3) return 0;
    int64_t w = wa - 2, h = ha - 2;   /* tile dims; interior plane h x w */
    int64_t np_ = w * h;
    int32_t* d8 = (int32_t*)malloc(np_ * sizeof(int32_t));
    int64_t* dp = (int64_t*)malloc(np_ * sizeof(int64_t));
    int8_t*  kx = (int8_t*)malloc(np_);
    uint8_t* va = (uint8_t*)malloc(np_);
    int64_t* lut = (int64_t*)malloc(np_ * sizeof(int64_t));
    if (!d8 || !dp || !kx || !va || !lut) {
        free(d8); free(dp); free(kx); free(va); free(lut); return -1;
    }
    d8_planes(g, ha, wa, d8, dp, kx, va);
    for (int64_t o = 0; o < np_; o++) lut[o] = -1;
    int64_t n = 0;
    for (int64_t y = 0; y < h - 1; y++) {
        for (int64_t x = 0; x < w - 1; x++) {
            int64_t o = y * w + x;
            if (!va[o]) continue;
            lut[o] = n;
            ys[n] = (int32_t)y;
            xs[n] = (int32_t)x;
            n++;
        }
    }
    int64_t* indeg = (int64_t*)calloc(n ? n : 1, sizeof(int64_t));
    int64_t* queue = (int64_t*)malloc((n ? n : 1) * sizeof(int64_t));
    if (!indeg || !queue) {
        free(d8); free(dp); free(kx); free(va); free(lut);
        free(indeg); free(queue); return -1;
    }
    for (int64_t i = 0; i < n; i++) {
        int64_t x = xs[i], y = ys[i], o = y * w + x;
        int8_t k = kx[o];
        int64_t tx = x, ty = y, ti = -1;
        uint8_t cr = 0;
        if (k >= 0) {  /* k >= 0 iff d8 > 0: a strict-descent target */
            tx = x + DX[k]; ty = y + DY[k];
            if (tx >= 0 && tx < w - 1 && ty >= 0 && ty < h - 1)
                ti = lut[ty * w + tx];  /* -1 at dead in-box targets */
            else
                cr = 1;
        }
        txs[i] = tx; tys[i] = ty;
        t[i] = ti; cross[i] = cr;
        acc[i] = has_w ? wts[y * (w - 1) + x] : 1;
        if (ti >= 0) indeg[ti]++;
    }
    int64_t head = 0, tail = 0;
    for (int64_t i = 0; i < n; i++) if (indeg[i] == 0) queue[tail++] = i;
    while (head < tail) {
        int64_t c = queue[head++];
        int64_t ti = t[c];
        if (ti >= 0) {
            acc[ti] += acc[c];
            if (--indeg[ti] == 0) queue[tail++] = ti;
        }
    }
    int rc = (tail == n) ? 0 : -2;
    if (rc == 0) {
        for (int64_t i = 0; i < n; i++) {
            term[i] = i; steps[i] = 0; ncard[i] = 0;
        }
        /* reverse retirement order: a cell's target retires later, so
           its term/steps/ncard are final before the source copies */
        for (int64_t q = n - 1; q >= 0; q--) {
            int64_t c = queue[q];
            int64_t ti = t[c];
            if (ti >= 0) {
                term[c] = term[ti];
                steps[c] = steps[ti] + 1;
                ncard[c] = ncard[ti]
                    + ((txs[c] == xs[c] || tys[c] == ys[c]) ? 1 : 0);
            }
        }
    }
    free(d8); free(dp); free(kx); free(va); free(lut);
    free(indeg); free(queue);
    return rc == 0 ? n : rc;
}

/* Depression fill (Priority-Flood, Barnes 2014, eps = 0): one
   min-heap pass computing W(c) = max(z(c), minimax path to a seed),
   where a seed is a valid cell with < 8 valid neighbors (tile border
   or NOVALUE-adjacent).  W is the FULL h*w int64 surface with
   NOVALUE preserved at invalid cells.  Bit-equal to the numpy
   reconstruction-by-erosion oracle (ops/terrain.fill_grid): both
   compute the unique minimax surface, all-integer.  Lazy-deletion
   heap: stale entries (key != current W) are skipped on pop; a push
   happens only on strict improvement, so heap traffic is O(n) in
   practice.  Returns the valid-cell count, -1 on alloc failure,
   -3 if a valid cell is unreachable from every seed (impossible:
   every valid region touches its own boundary). */
typedef struct { int64_t key; int64_t idx; } HK;

static void hk_up(HK* hp, int64_t i)
{
    while (i > 0) {
        int64_t p = (i - 1) / 2;
        if (hp[p].key <= hp[i].key) break;
        HK t = hp[p]; hp[p] = hp[i]; hp[i] = t;
        i = p;
    }
}

static void hk_down(HK* hp, int64_t sz, int64_t i)
{
    for (;;) {
        int64_t l = 2 * i + 1, r = l + 1, m = i;
        if (l < sz && hp[l].key < hp[m].key) m = l;
        if (r < sz && hp[r].key < hp[m].key) m = r;
        if (m == i) break;
        HK t = hp[m]; hp[m] = hp[i]; hp[i] = t;
        i = m;
    }
}

int64_t fill_c(const int16_t* g, int64_t h, int64_t w, int64_t* W)
{
    const int64_t INF = (int64_t)1 << 62;
    int64_t n = h * w, nvalid = 0;
    if (n <= 0) return 0;
    uint8_t* done = (uint8_t*)calloc(n, 1);
    if (!done) return -1;
    int64_t cap = n + 1024, sz = 0;
    HK* hp = (HK*)malloc(cap * sizeof(HK));
    if (!hp) { free(done); return -1; }
    for (int64_t y = 0; y < h; y++) {
        for (int64_t x = 0; x < w; x++) {
            int64_t o = y * w + x;
            if (g[o] == NOVALUE) { W[o] = NOVALUE; done[o] = 1; continue; }
            nvalid++;
            int nn = 0;
            for (int dy = -1; dy <= 1; dy++) {
                for (int dx = -1; dx <= 1; dx++) {
                    if (!dx && !dy) continue;
                    int64_t xx = x + dx, yy = y + dy;
                    if (xx >= 0 && xx < w && yy >= 0 && yy < h
                        && g[yy * w + xx] != NOVALUE) nn++;
                }
            }
            if (nn < 8) {
                W[o] = g[o];
                hp[sz].key = W[o]; hp[sz].idx = o; hk_up(hp, sz); sz++;
            } else {
                W[o] = INF;
            }
        }
    }
    while (sz) {
        HK top = hp[0];
        hp[0] = hp[--sz];
        if (sz) hk_down(hp, sz, 0);
        int64_t c = top.idx;
        if (done[c] || top.key != W[c]) continue;  /* stale entry */
        done[c] = 1;
        int64_t cy = c / w, cx = c % w;
        for (int dy = -1; dy <= 1; dy++) {
            for (int dx = -1; dx <= 1; dx++) {
                if (!dx && !dy) continue;
                int64_t xx = cx + dx, yy = cy + dy;
                if (xx < 0 || xx >= w || yy < 0 || yy >= h) continue;
                int64_t o = yy * w + xx;
                if (done[o]) continue;
                int64_t cand = g[o] > W[c] ? g[o] : W[c];
                if (cand < W[o]) {
                    W[o] = cand;
                    if (sz == cap) {
                        cap *= 2;
                        HK* nh = (HK*)realloc(hp, cap * sizeof(HK));
                        if (!nh) { free(hp); free(done); return -1; }
                        hp = nh;
                    }
                    hp[sz].key = cand; hp[sz].idx = o; hk_up(hp, sz); sz++;
                }
            }
        }
    }
    int64_t rc = nvalid;
    for (int64_t o = 0; o < n; o++) {
        if (!done[o]) { rc = -3; break; }
    }
    free(hp); free(done);
    return rc;
}

/* Flat-routed drainage (ops/terrain.routed_flow_grid): D8 over an
   (already filled) surface, then every flat cell (d8 = 0) routes to
   the equal-elevation universe neighbor minimizing (BFS hop distance
   to a draining equal-elevation cell, ESRI code); strict + routed
   edges feed the same FIFO Kahn + reverse outlet sweep.  The BFS runs
   as one FIFO pass seeded by all draining cells (dist 0), expanding
   through flat cells of equal z — FIFO order IS breadth order because
   every edge has weight 1.  Returns n, -1 alloc, -2 cycle. */
int64_t routed_flow_c(const int16_t* g, int64_t h, int64_t w,
                      int32_t* ys, int32_t* xs, int64_t* acc,
                      int32_t* oy, int32_t* ox)
{
    if (h < 3 || w < 3) return 0;
    int64_t iw = w - 2, ih = h - 2, np_ = iw * ih;
    int32_t* d8 = (int32_t*)malloc(np_ * sizeof(int32_t));
    int64_t* dp = (int64_t*)malloc(np_ * sizeof(int64_t));
    int8_t*  kx = (int8_t*)malloc(np_);
    uint8_t* va = (uint8_t*)malloc(np_);
    int64_t* lut = (int64_t*)malloc(np_ * sizeof(int64_t));
    if (!d8 || !dp || !kx || !va || !lut) {
        free(d8); free(dp); free(kx); free(va); free(lut); return -1;
    }
    d8_planes(g, h, w, d8, dp, kx, va);
    int64_t n = 0;
    for (int64_t o = 0; o < np_; o++) {
        if (va[o]) { lut[o] = n; ys[n] = (int32_t)(o / iw + 1);
                     xs[n] = (int32_t)(o % iw + 1); n++; }
        else lut[o] = -1;
    }
    int64_t* t = (int64_t*)malloc(n * sizeof(int64_t));
    int64_t* dist = (int64_t*)malloc(n * sizeof(int64_t));
    int64_t* indeg = (int64_t*)calloc(n ? n : 1, sizeof(int64_t));
    int64_t* queue = (int64_t*)malloc((n ? n : 1) * sizeof(int64_t));
    int64_t* outl = (int64_t*)malloc(n * sizeof(int64_t));
    if (!t || !dist || !indeg || !queue || !outl) {
        free(d8); free(dp); free(kx); free(va); free(lut);
        free(t); free(dist); free(indeg); free(queue); free(outl);
        return -1;
    }
    const int64_t INF = (int64_t)1 << 60;
    /* strict-descent targets + BFS seed (draining cells, dist 0) */
    int64_t head = 0, tail = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t o = (int64_t)(ys[i] - 1) * iw + (xs[i] - 1);
        int8_t k = kx[o];
        int64_t ti = -1;
        if (k >= 0) {
            int64_t txx = xs[i] + DX[k], tyy = ys[i] + DY[k];
            if (txx >= 1 && txx <= iw && tyy >= 1 && tyy <= ih)
                ti = lut[(tyy - 1) * iw + (txx - 1)];
        }
        t[i] = ti;
        if (k >= 0) { dist[i] = 0; queue[tail++] = i; }
        else dist[i] = INF;
    }
    /* BFS across equal-z flat cells (unit edges: FIFO = breadth) */
    while (head < tail) {
        int64_t c = queue[head++];
        int16_t zc = g[(int64_t)ys[c] * w + xs[c]];
        for (int k = 0; k < 8; k++) {
            int64_t nx2 = xs[c] + DX[k], ny2 = ys[c] + DY[k];
            if (nx2 < 1 || nx2 > iw || ny2 < 1 || ny2 > ih) continue;
            int64_t ni = lut[(ny2 - 1) * iw + (nx2 - 1)];
            if (ni < 0 || dist[ni] != INF) continue;
            if (g[ny2 * w + nx2] != zc) continue;
            /* dist[ni] == INF implies d8 == 0 (flat) — draining cells
               were all seeded at 0 */
            dist[ni] = dist[c] + 1;
            queue[tail++] = ni;
        }
    }
    /* route reachable flat cells: argmin (dist, code order) over
       equal-z universe neighbors; code order = the k loop order */
    for (int64_t i = 0; i < n; i++) {
        if (t[i] >= 0 || dist[i] == 0) continue;  /* strict or draining */
        if (dist[i] == INF) continue;             /* unreachable flat */
        int16_t zc = g[(int64_t)ys[i] * w + xs[i]];
        int64_t best = INF, bi = -1;
        for (int k = 0; k < 8; k++) {
            int64_t nx2 = xs[i] + DX[k], ny2 = ys[i] + DY[k];
            if (nx2 < 1 || nx2 > iw || ny2 < 1 || ny2 > ih) continue;
            int64_t ni = lut[(ny2 - 1) * iw + (nx2 - 1)];
            if (ni < 0 || g[ny2 * w + nx2] != zc) continue;
            if (dist[ni] < best) { best = dist[ni]; bi = ni; }
        }
        if (bi >= 0 && best < INF) t[i] = bi;
    }
    /* FIFO Kahn over strict + routed edges */
    for (int64_t i = 0; i < n; i++) { acc[i] = 1; }
    for (int64_t i = 0; i < n; i++) if (t[i] >= 0) indeg[t[i]]++;
    head = 0; tail = 0;
    for (int64_t i = 0; i < n; i++) if (indeg[i] == 0) queue[tail++] = i;
    while (head < tail) {
        int64_t c = queue[head++];
        int64_t ti = t[c];
        if (ti >= 0) {
            acc[ti] += acc[c];
            if (--indeg[ti] == 0) queue[tail++] = ti;
        }
    }
    int rc = (tail == n) ? 0 : -2;
    if (rc == 0) {
        for (int64_t i = 0; i < n; i++) outl[i] = i;
        for (int64_t q = n - 1; q >= 0; q--) {
            int64_t c = queue[q];
            if (t[c] >= 0) outl[c] = outl[t[c]];
        }
        for (int64_t i = 0; i < n; i++) {
            oy[i] = ys[outl[i]];
            ox[i] = xs[outl[i]];
        }
    }
    free(d8); free(dp); free(kx); free(va); free(lut);
    free(t); free(dist); free(indeg); free(queue); free(outl);
    return rc == 0 ? n : rc;
}

/* Radius-bounded viewshed (ops/terrain.viewshed_grid): R3
   line-of-sight with the integer-exact angle comparison (sign cases
   over a^2 * d2 cross-products) and round-half-up integer sightline
   sampling.  vis is the FULL h*w uint8 plane (0 outside radius /
   invalid / blocked).  Returns the number of visible cells, or -1 on
   a bad observer (out of range / NOVALUE). */
static int64_t floordiv2(int64_t a, int64_t b)  /* floor(a/b), b > 0 */
{
    int64_t q = a / b, r = a % b;
    return (r != 0 && a < 0) ? q - 1 : q;
}

int64_t viewshed_c(const int16_t* g, int64_t h, int64_t w,
                   int64_t oy, int64_t ox, int64_t h_obs, int64_t radius,
                   uint8_t* vis)
{
    memset(vis, 0, (size_t)(h * w));
    if (oy < 0 || oy >= h || ox < 0 || ox >= w) return -1;
    if (g[oy * w + ox] == NOVALUE) return -1;
    int64_t eye = (int64_t)g[oy * w + ox] + h_obs;
    int64_t r2 = radius * radius, nvis = 0;
    int64_t y0 = oy - radius < 0 ? 0 : oy - radius;
    int64_t y1 = oy + radius >= h ? h - 1 : oy + radius;
    int64_t x0 = ox - radius < 0 ? 0 : ox - radius;
    int64_t x1 = ox + radius >= w ? w - 1 : ox + radius;
    for (int64_t ty = y0; ty <= y1; ty++) {
        for (int64_t tx = x0; tx <= x1; tx++) {
            int16_t zt = g[ty * w + tx];
            if (zt == NOVALUE) continue;
            int64_t dy = ty - oy, dx = tx - ox;
            int64_t dT2 = dy * dy + dx * dx;
            if (dT2 > r2) continue;
            int64_t K = (dy < 0 ? -dy : dy);
            int64_t ax = (dx < 0 ? -dx : dx);
            if (ax > K) K = ax;
            int64_t aT = (int64_t)zt - eye;
            int blocked = 0;
            for (int64_t k = 1; k < K && !blocked; k++) {
                int64_t py = oy + floordiv2(2 * k * dy + K, 2 * K);
                int64_t px = ox + floordiv2(2 * k * dx + K, 2 * K);
                if (py == ty && px == tx) continue;  /* landed on T */
                int16_t zp = g[py * w + px];
                if (zp == NOVALUE) { blocked = 1; break; }
                int64_t aP = (int64_t)zp - eye;
                int64_t dP2 = (py - oy) * (py - oy) + (px - ox) * (px - ox);
                if (aP >= 0 && aT < 0) blocked = 1;
                else if (aP >= 0 && aT >= 0) {
                    if (aP * aP * dT2 >= aT * aT * dP2) blocked = 1;
                } else if (aP < 0 && aT < 0) {
                    if (aP * aP * dT2 <= aT * aT * dP2) blocked = 1;
                }
            }
            if (!blocked) { vis[ty * w + tx] = 1; nvis++; }
        }
    }
    return nvis;
}

/* Border minimax profile for the r9 single-solve mosaic fill
   (ops/mosaic.fill_profile_events): Kruskal sweep of the tile's valid
   cells in increasing (z, index), union-find over cells + the OUT
   drain, emitting a single-linkage dendrogram event whenever two
   components that each contain a node (band cell or OUT=-1) merge.
   Neighbor visit order, the min-rep keep rule, and tie order mirror
   the Python twin exactly, so the event LISTS are identical, not just
   the solved values.  ev_* buffers must hold >= 2*n_band + 8 entries;
   returns the event count, or -1 on alloc failure. */
static int64_t fp_find(int64_t* parent, int64_t a)
{
    while (parent[a] != a) {
        parent[a] = parent[parent[a]];
        a = parent[a];
    }
    return a;
}

int64_t fill_profile_c(const int16_t* g, int64_t h, int64_t w,
                       const uint8_t* seed, const uint8_t* band,
                       int64_t* ev_a, int64_t* ev_b, int64_t* ev_lam)
{
    int64_t n = h * w;
    if (n <= 0) return 0;
    /* counting sort by z (int16 range), ties by ascending index */
    int64_t* counts = (int64_t*)calloc(65537, sizeof(int64_t));
    int64_t* order = (int64_t*)malloc(n * sizeof(int64_t));
    int64_t* parent = (int64_t*)malloc((n + 1) * sizeof(int64_t));
    int64_t* rep = (int64_t*)malloc((n + 1) * sizeof(int64_t));
    int64_t* csize = (int64_t*)malloc((n + 1) * sizeof(int64_t));
    uint8_t* active = (uint8_t*)calloc(n, 1);
    if (!counts || !order || !parent || !rep || !csize || !active) {
        free(counts); free(order); free(parent); free(rep);
        free(csize); free(active);
        return -1;
    }
    int64_t nvalid = 0;
    for (int64_t o = 0; o < n; o++) {
        if (g[o] != NOVALUE) { counts[(int64_t)g[o] + 32768 + 1]++; nvalid++; }
    }
    for (int64_t b = 1; b <= 65536; b++) counts[b] += counts[b - 1];
    for (int64_t o = 0; o < n; o++) {
        if (g[o] != NOVALUE) order[counts[(int64_t)g[o] + 32768]++] = o;
    }
    for (int64_t o = 0; o <= n; o++) {
        parent[o] = o; rep[o] = -3; csize[o] = 1;
    }
    rep[n] = -1;                           /* OUT drain */
    int64_t nev = 0;
    for (int64_t i = 0; i < nvalid; i++) {
        int64_t c = order[i];
        active[c] = 1;
        rep[c] = band[c] ? c : -3;
        int64_t zc = (int64_t)g[c];
        int64_t cy = c / w, cx = c % w;
        int64_t root = c;
        for (int k = 0; k < 9; k++) {
            int64_t r;
            if (k < 8) {
                /* (-1,-1) (-1,0) (-1,1) (0,-1) (0,1) (1,-1) (1,0) (1,1)
                   — the Python twin's dy-major order */
                static const int ODY[8] = {-1,-1,-1, 0, 0, 1, 1, 1};
                static const int ODX[8] = {-1, 0, 1,-1, 1,-1, 0, 1};
                int64_t yy = cy + ODY[k], xx = cx + ODX[k];
                if (yy < 0 || yy >= h || xx < 0 || xx >= w) continue;
                int64_t o = yy * w + xx;
                if (!active[o]) continue;
                r = fp_find(parent, o);
            } else {
                if (!seed[c]) continue;
                r = fp_find(parent, n);
            }
            root = fp_find(parent, root);
            if (r == root) continue;
            int64_t ra = rep[root], rb = rep[r];
            if (ra != -3 && rb != -3) {
                ev_a[nev] = ra; ev_b[nev] = rb; ev_lam[nev] = zc; nev++;
            }
            int64_t keep;
            if (rb == -3) keep = ra;
            else if (ra == -3) keep = rb;
            else keep = ra < rb ? ra : rb;
            /* union by size — events depend only on component
               MEMBERSHIP, not tree shape, so attaching the smaller
               tree keeps find() near-O(1) without changing output
               (the Python twin keeps the naive direction; list
               equality is pinned in tests either way) */
            int64_t big = root, small = r;
            if (csize[small] > csize[big]) { big = r; small = root; }
            parent[small] = big;
            csize[big] += csize[small];
            rep[big] = keep;
            root = big;
        }
    }
    free(counts); free(order); free(parent); free(rep);
    free(csize); free(active);
    return nev;
}
"""

_lib = None
_tried = False


def available() -> bool:
    global _lib, _tried
    if _tried:
        return _lib is not None
    _tried = True
    if cext.disabled():
        return False
    try:
        lib = cext.build_lib("terrain", _C_SOURCE)
        lib.d8_grid_c.restype = ctypes.c_int64
        lib.flow_accumulate_c.restype = ctypes.c_int64
        lib.mosaic_accumulate_c.restype = ctypes.c_int64
        lib.fill_c.restype = ctypes.c_int64
        lib.routed_flow_c.restype = ctypes.c_int64
        lib.flow_length_c.restype = ctypes.c_int64
        lib.stream_order_c.restype = ctypes.c_int64
        lib.morph_c.restype = ctypes.c_int64
        lib.viewshed_c.restype = ctypes.c_int64
        lib.fill_profile_c.restype = ctypes.c_int64
        _lib = lib
    except Exception:
        _lib = None
    return _lib is not None


def _as_i16(grid: np.ndarray) -> np.ndarray | None:
    """int16 view of the grid or None when values would not round-trip
    (the mosaic path hands int64 aug grids; elevations are int16-ranged
    by the HGT contract, but fall back rather than truncate)."""
    if grid.dtype == np.int16:
        return np.ascontiguousarray(grid)
    if not np.issubdtype(grid.dtype, np.integer):
        return None
    if grid.size and (grid.min() < -32768 or grid.max() > 32767):
        return None
    return np.ascontiguousarray(grid.astype(np.int16))


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def d8(grid: np.ndarray):
    """C twin of terrain.d8_grid -> (ys, xs, d8, drop2x) or None."""
    if not available():
        return None
    g = _as_i16(grid)
    if g is None:
        return None
    h, w = g.shape
    cap = max((h - 2) * (w - 2), 0)
    if cap == 0:
        return (np.empty(0, np.int32), np.empty(0, np.int32),
                np.empty(0, np.int32), np.empty(0, np.int64))
    ys = np.empty(cap, np.int32)
    xs = np.empty(cap, np.int32)
    d8o = np.empty(cap, np.int32)
    dr = np.empty(cap, np.int64)
    n = _lib.d8_grid_c(_ptr(g), ctypes.c_int64(h), ctypes.c_int64(w),
                       _ptr(ys), _ptr(xs), _ptr(d8o), _ptr(dr))
    if n < 0:
        return None
    return ys[:n].copy(), xs[:n].copy(), d8o[:n].copy(), dr[:n].copy()


def flow_accumulate(grid: np.ndarray):
    """C twin of terrain.flow_accumulate_grid ->
    (ys, xs, acc, outlet_y, outlet_x) or None."""
    if not available():
        return None
    g = _as_i16(grid)
    if g is None:
        return None
    h, w = g.shape
    cap = max((h - 2) * (w - 2), 0)
    if cap == 0:
        z32, z64 = np.empty(0, np.int32), np.empty(0, np.int64)
        return z32, z32.copy(), z64, z32.copy(), z32.copy()
    ys = np.empty(cap, np.int32)
    xs = np.empty(cap, np.int32)
    acc = np.empty(cap, np.int64)
    oy = np.empty(cap, np.int32)
    ox = np.empty(cap, np.int32)
    n = _lib.flow_accumulate_c(_ptr(g), ctypes.c_int64(h), ctypes.c_int64(w),
                               _ptr(ys), _ptr(xs), _ptr(acc),
                               _ptr(oy), _ptr(ox))
    if n < 0:
        return None
    return (ys[:n].copy(), xs[:n].copy(), acc[:n].copy(),
            oy[:n].copy(), ox[:n].copy())


def mosaic_accumulate(aug: np.ndarray, weights: np.ndarray | None = None):
    """C twin of ops/mosaic.mosaic_tile_arrays over the augmented grid
    -> the same (ys, xs, acc, term, cross, t_ys, t_xs, steps, ncard, t)
    10-tuple, or None (unavailable / non-int16-ranged input)."""
    if not available():
        return None
    g = _as_i16(aug)
    if g is None:
        return None
    ha, wa = g.shape
    h, w = ha - 2, wa - 2
    cap = max((h - 1) * (w - 1), 0)
    if cap == 0:
        z32, z64 = np.empty(0, np.int32), np.empty(0, np.int64)
        return (z32, z32.copy(), z64, z64.copy(),
                np.empty(0, bool), z64.copy(), z64.copy(),
                z64.copy(), z64.copy(), z64.copy())
    if weights is None:
        wts, has_w = np.empty(0, np.int64), 0
    else:
        if weights.shape != (h - 1, w - 1):
            return None
        wts, has_w = np.ascontiguousarray(weights, dtype=np.int64), 1
    ys = np.empty(cap, np.int32)
    xs = np.empty(cap, np.int32)
    acc = np.empty(cap, np.int64)
    term = np.empty(cap, np.int64)
    cross = np.empty(cap, np.uint8)
    t_ys = np.empty(cap, np.int64)
    t_xs = np.empty(cap, np.int64)
    steps = np.empty(cap, np.int64)
    ncard = np.empty(cap, np.int64)
    t = np.empty(cap, np.int64)
    n = _lib.mosaic_accumulate_c(
        _ptr(g), ctypes.c_int64(ha), ctypes.c_int64(wa),
        _ptr(wts), ctypes.c_int64(has_w),
        _ptr(ys), _ptr(xs), _ptr(acc), _ptr(term), _ptr(cross),
        _ptr(t_ys), _ptr(t_xs), _ptr(steps), _ptr(ncard), _ptr(t))
    if n < 0:
        return None
    return (ys[:n].copy(), xs[:n].copy(), acc[:n].copy(),
            term[:n].copy(), cross[:n].astype(bool),
            t_ys[:n].copy(), t_xs[:n].copy(),
            steps[:n].copy(), ncard[:n].copy(), t[:n].copy())


def fill(grid: np.ndarray):
    """C twin of ops/terrain.fill_grid -> the full (h, w) int64 filled
    surface (NOVALUE preserved), or None."""
    if not available():
        return None
    g = _as_i16(grid)
    if g is None:
        return None
    h, w = g.shape
    out = np.empty((h, w), np.int64)
    if h == 0 or w == 0:
        return out
    n = _lib.fill_c(_ptr(g), ctypes.c_int64(h), ctypes.c_int64(w), _ptr(out))
    if n < 0:
        return None
    return out


def fill_profile(g: np.ndarray, seed: np.ndarray, band: np.ndarray):
    """C twin of ops/mosaic._fill_profile_events_py -> list of
    (key_a, key_b, lam) dendrogram events (local linear indices, -1 =
    OUT), or None. Same sweep order, neighbor order and rep rule as the
    Python twin, so the event lists are bit-identical (pinned in
    tests/test_mosaic.py)."""
    if not available():
        return None
    g16 = _as_i16(g)
    if g16 is None:
        return None
    h, w = g16.shape
    if h == 0 or w == 0:
        return []
    nb = int(band.sum())
    cap = 2 * nb + 8
    ev_a = np.empty(cap, np.int64)
    ev_b = np.empty(cap, np.int64)
    ev_l = np.empty(cap, np.int64)
    s8 = np.ascontiguousarray(seed.astype(np.uint8))
    b8 = np.ascontiguousarray(band.astype(np.uint8))
    n = _lib.fill_profile_c(
        _ptr(g16), ctypes.c_int64(h), ctypes.c_int64(w),
        _ptr(s8), _ptr(b8), _ptr(ev_a), _ptr(ev_b), _ptr(ev_l))
    if n < 0:
        return None
    return list(zip(ev_a[:n].tolist(), ev_b[:n].tolist(), ev_l[:n].tolist()))


def routed_flow(filled: np.ndarray):
    """C twin of ops/terrain.routed_flow_grid ->
    (ys, xs, acc, outlet_y, outlet_x) or None."""
    if not available():
        return None
    g = _as_i16(filled)
    if g is None:
        return None
    h, w = g.shape
    cap = max((h - 2) * (w - 2), 0)
    if cap == 0:
        z32, z64 = np.empty(0, np.int32), np.empty(0, np.int64)
        return z32, z32.copy(), z64, z32.copy(), z32.copy()
    ys = np.empty(cap, np.int32)
    xs = np.empty(cap, np.int32)
    acc = np.empty(cap, np.int64)
    oy = np.empty(cap, np.int32)
    ox = np.empty(cap, np.int32)
    n = _lib.routed_flow_c(_ptr(g), ctypes.c_int64(h), ctypes.c_int64(w),
                           _ptr(ys), _ptr(xs), _ptr(acc),
                           _ptr(oy), _ptr(ox))
    if n < 0:
        return None
    return (ys[:n].copy(), xs[:n].copy(), acc[:n].copy(),
            oy[:n].copy(), ox[:n].copy())


def flow_length(grid: np.ndarray):
    """C twin of ops/terrain.flow_length_grid ->
    (ys, xs, steps, n_card, n_diag) or None."""
    if not available():
        return None
    g = _as_i16(grid)
    if g is None:
        return None
    h, w = g.shape
    cap = max((h - 2) * (w - 2), 0)
    if cap == 0:
        z32, z64 = np.empty(0, np.int32), np.empty(0, np.int64)
        return z32, z32.copy(), z64, z64.copy(), z64.copy()
    ys = np.empty(cap, np.int32)
    xs = np.empty(cap, np.int32)
    steps = np.empty(cap, np.int64)
    ncard = np.empty(cap, np.int64)
    n = _lib.flow_length_c(_ptr(g), ctypes.c_int64(h), ctypes.c_int64(w),
                           _ptr(ys), _ptr(xs), _ptr(steps), _ptr(ncard))
    if n < 0:
        return None
    steps, ncard = steps[:n].copy(), ncard[:n].copy()
    return ys[:n].copy(), xs[:n].copy(), steps, ncard, steps - ncard


def stream_order(grid: np.ndarray, min_acc: int):
    """C twin of ops/terrain.stream_order_grid ->
    (ys, xs, acc, sorder) or None."""
    if not available():
        return None
    g = _as_i16(grid)
    if g is None:
        return None
    h, w = g.shape
    cap = max((h - 2) * (w - 2), 0)
    if cap == 0:
        z32, z64 = np.empty(0, np.int32), np.empty(0, np.int64)
        return z32, z32.copy(), z64, z64.copy()
    ys = np.empty(cap, np.int32)
    xs = np.empty(cap, np.int32)
    acc = np.empty(cap, np.int64)
    order = np.empty(cap, np.int64)
    n = _lib.stream_order_c(_ptr(g), ctypes.c_int64(h), ctypes.c_int64(w),
                            ctypes.c_int64(int(min_acc)),
                            _ptr(ys), _ptr(xs), _ptr(acc), _ptr(order))
    if n < 0:
        return None
    return (ys[:n].copy(), xs[:n].copy(), acc[:n].copy(),
            order[:n].copy())


def morph(grid: np.ndarray):
    """C twin of ops/terrain.morph_grid ->
    (ys, xs, tpi8, tri, rough, zxx, zyy, ixy4) or None."""
    if not available():
        return None
    g = _as_i16(grid)
    if g is None:
        return None
    h, w = g.shape
    cap = max((h - 2) * (w - 2), 0)
    if cap == 0:
        z32, z64 = np.empty(0, np.int32), np.empty(0, np.int64)
        return (z32, z32.copy(), z64, z64.copy(), z64.copy(),
                z64.copy(), z64.copy(), z64.copy())
    ys = np.empty(cap, np.int32)
    xs = np.empty(cap, np.int32)
    outs = [np.empty(cap, np.int64) for _ in range(6)]
    n = _lib.morph_c(_ptr(g), ctypes.c_int64(h), ctypes.c_int64(w),
                     _ptr(ys), _ptr(xs), *[_ptr(o) for o in outs])
    if n < 0:
        return None
    return (ys[:n].copy(), xs[:n].copy(), *[o[:n].copy() for o in outs])


def viewshed(grid: np.ndarray, oy: int, ox: int,
             h_obs: int = 2, radius: int = 100):
    """C twin of ops/terrain.viewshed_grid -> full (h, w) bool plane,
    or None (unavailable / non-int16-ranged / bad observer)."""
    if not available():
        return None
    g = _as_i16(grid)
    if g is None:
        return None
    h, w = g.shape
    vis = np.zeros((h, w), np.uint8)
    if h == 0 or w == 0:
        return vis.astype(bool)
    n = _lib.viewshed_c(_ptr(g), ctypes.c_int64(h), ctypes.c_int64(w),
                        ctypes.c_int64(int(oy)), ctypes.c_int64(int(ox)),
                        ctypes.c_int64(int(h_obs)),
                        ctypes.c_int64(int(radius)), _ptr(vis))
    if n < 0:
        return vis.astype(bool)  # bad observer: all-False, same as numpy
    return vis.astype(bool)
