"""Pure-stdlib WebP-lossless (VP8L) codec.

Written from the public "WebP Lossless Bitstream Specification"
(https://developers.google.com/speed/webp/docs/webp_lossless_bitstream_specification)
— no third-party image library. Decoder supports the full format:

  * LSB-first bit stream, 14-bit dimensions header
  * all four transforms (predictor [14 modes], color transform,
    subtract-green, color-indexing incl. <=16-color pixel bundling),
    applied inverse in reverse stream order with per-transform widths
  * canonical prefix codes: simple (1-2 symbol) and normal
    (code-length code with 16/17/18 repeats, optional max_symbol)
  * meta prefix codes (entropy image selecting per-tile code groups)
  * color cache (0x1e35a7bd multiplicative hash)
  * LZ77 backward references with the 120-entry 2D distance mapping

The encoder emits valid VP8L with a deliberately small feature set —
literals + optional color cache + optional dist-1 run backrefs +
optional subtract-green / fixed-mode predictor / palette transforms —
enough to produce real-world-shaped streams exercising every decoder
path, with package-merge length-limited canonical codes.

Reference analogue: the tile codecs surface (HGTReader.cs:111-146) —
webp is a scraped-corpus image format the multimodal ops must ingest.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- bits

class BitReader:
    """LSB-first bit reader (VP8L bit order)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # in bits

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("vp8l: truncated stream")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v

    def bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("vp8l: truncated stream")
        b = (self.data[byte] >> (self.pos & 7)) & 1
        self.pos += 1
        return b


class BitWriter:
    """LSB-first bit writer."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def code(self, code: int, length: int) -> None:
        """Huffman code bits, MSB of the code first (spec bit order)."""
        for i in range(length - 1, -1, -1):
            self.bits((code >> i) & 1, 1)

    def done(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


# ------------------------------------------------------- prefix codes

#: order in which code-length-code lengths are stored (spec §6.2.2)
CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical (sorted by length then symbol,
    codes incrementing — the DEFLATE/VP8L rule)."""
    syms = sorted((l, s) for s, l in lengths.items() if l > 0)
    codes: dict[int, tuple[int, int]] = {}
    code, prev_len = 0, 0
    for l, s in syms:
        code <<= l - prev_len
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class _Huff:
    """Bit-serial canonical-prefix decoder. A code with exactly one
    used symbol consumes ZERO bits (matches libwebp/simple-code
    semantics)."""

    def __init__(self, lengths: dict[int, int]):
        used = [(l, s) for s, l in lengths.items() if l > 0]
        if len(used) == 1:
            self.single: int | None = used[0][1]
            self.table: dict[tuple[int, int], int] = {}
            return
        self.single = None
        self.table = {
            (l, c): s for s, (c, l) in _canonical_codes(lengths).items()
        }

    @classmethod
    def of_single(cls, sym: int) -> "_Huff":
        h = cls.__new__(cls)
        h.single = sym
        h.table = {}
        return h

    @classmethod
    def of_pair(cls, sym0: int, sym1: int) -> "_Huff":
        """Two-symbol simple code: codes {0, 1} in WRITE order (NOT
        canonical by symbol value — the symbols may arrive unsorted)."""
        h = cls.__new__(cls)
        h.single = None
        h.table = {(1, 0): sym0, (1, 1): sym1}
        return h

    def read(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        acc = 0
        length = 0
        while True:
            acc = (acc << 1) | br.bit()
            length += 1
            sym = self.table.get((length, acc))
            if sym is not None:
                return sym
            if length > 15:
                raise ValueError("vp8l: invalid prefix code")


def _read_prefix_code(br: BitReader, alphabet_size: int) -> _Huff:
    """One prefix code (spec §6.2.1/6.2.2): simple or normal form."""
    if br.bit():  # simple
        num_symbols = br.bit() + 1
        if br.bit():  # first symbol in 8 bits
            sym0 = br.bits(8)
        else:
            sym0 = br.bits(1)
        if num_symbols == 1:
            return _Huff.of_single(sym0)
        sym1 = br.bits(8)
        return _Huff.of_pair(sym0, sym1)

    num_codes = br.bits(4) + 4
    cl_lens = {i: 0 for i in range(19)}
    for i in range(num_codes):
        cl_lens[CL_ORDER[i]] = br.bits(3)
    cl_huff = _Huff(cl_lens)

    if br.bit():  # use max_symbol
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size

    lengths: dict[int, int] = {}
    prev_nz = 8
    i = 0
    while i < alphabet_size:
        if max_symbol == 0:
            break  # remaining symbols are unused (zero length)
        max_symbol -= 1
        sym = cl_huff.read(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_nz = sym
        elif sym == 16:
            rep = 3 + br.bits(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev_nz
                    i += 1
        elif sym == 17:
            i += 3 + br.bits(3)
        else:  # 18
            i += 11 + br.bits(7)
    return _Huff(lengths)


def _prefix_decode_value(br: BitReader, code: int) -> int:
    """length/distance prefix decoding (spec §6.2.3)."""
    if code < 4:
        return code + 1
    extra_bits = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra_bits
    return offset + br.bits(extra_bits) + 1


# the closed-form prefix encode is easy to get wrong; derive the code
# ranges from the normative decoder rule instead (40 codes — cheap, exact)
_PREFIX_RANGES = []
for _c in range(40):
    if _c < 4:
        _PREFIX_RANGES.append((_c + 1, _c + 1, 0))
    else:
        _e = (_c - 2) >> 1
        _off = (2 + (_c & 1)) << _e
        _PREFIX_RANGES.append((_off + 1, _off + (1 << _e), _e))


def prefix_encode(v: int) -> tuple[int, int, int]:
    for code, (lo, hi, extra) in enumerate(_PREFIX_RANGES):
        if lo <= v <= hi:
            return code, v - lo, extra
    raise ValueError(f"prefix_encode: value {v} out of range")


# ------------------------------------------------- distance mapping

#: the spec's 120 closest (dx, dy) neighborhood offsets, in code order
#: (code 1 = first entry). byte form (dy<<4)|(8-dx) matches libwebp's
#: kCodeToPlane (first rows cross-checked in tests/test_webp.py).
DIST_MAP: list[tuple[int, int]] = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def plane_code_to_dist(xsize: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = DIST_MAP[code - 1]
    dist = dy * xsize + dx
    return dist if dist >= 1 else 1


# ------------------------------------------------------------ decoder

_HASH_MUL = 0x1E35A7BD


def _cache_index(argb: int, cache_bits: int) -> int:
    return ((_HASH_MUL * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


class _Group:
    __slots__ = ("green", "red", "blue", "alpha", "dist")

    def __init__(self, green, red, blue, alpha, dist):
        self.green, self.red, self.blue = green, red, blue
        self.alpha, self.dist = alpha, dist


def _decode_entropy_coded(br: BitReader, w: int, h: int, is_main: bool) -> np.ndarray:
    """One entropy-coded image (spec §6): optional color cache, prefix
    codes (with meta prefix image when is_main), LZ77 data. Returns a
    flat uint32 ARGB array of w*h pixels."""
    # meta prefix codes FIRST would be wrong: stream order is
    # color-cache-info, then the prefix-code section (whose first bit,
    # for the main image only, is the meta-prefix flag)
    cache_bits = 0
    if br.bit():
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"vp8l: bad cache_bits {cache_bits}")

    meta = None
    meta_bits = 0
    n_groups = 1
    mw = 0
    if is_main and br.bit():
        meta_bits = br.bits(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_px = _decode_entropy_coded(br, mw, mh, False)
        meta = ((meta_px >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1

    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(_Group(
            _read_prefix_code(br, green_alpha),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 256),
            _read_prefix_code(br, 40),
        ))

    n = w * h
    out = np.zeros(n, dtype=np.uint32)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    i = 0
    while i < n:
        if meta is not None:
            x, y = i % w, i // w
            g = groups[int(meta[(y >> meta_bits) * mw + (x >> meta_bits)])]
        else:
            g = groups[0]
        s = g.green.read(br)
        if s < 256:
            red = g.red.read(br)
            blue = g.blue.read(br)
            alpha = g.alpha.read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[i] = px
            if cache is not None:
                cache[_cache_index(px, cache_bits)] = px
            i += 1
        elif s < 256 + 24:
            length = _prefix_decode_value(br, s - 256)
            dval = _prefix_decode_value(br, g.dist.read(br))
            dist = plane_code_to_dist(w, dval)
            if dist > i:
                raise ValueError("vp8l: backref before start")
            for _ in range(length):
                if i >= n:
                    raise ValueError("vp8l: backref past end")
                px = int(out[i - dist])
                out[i] = px
                if cache is not None:
                    cache[_cache_index(px, cache_bits)] = px
                i += 1
        else:
            if cache is None:
                raise ValueError("vp8l: cache symbol without cache")
            out[i] = cache[s - 256 - 24]
            i += 1
    return out


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _px_channels(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _from_channels(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _avg2_px(p1: int, p2: int) -> int:
    a1, r1, g1, b1 = _px_channels(p1)
    a2, r2, g2, b2 = _px_channels(p2)
    return _from_channels(_avg2(a1, a2), _avg2(r1, r2), _avg2(g1, g2), _avg2(b1, b2))


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2_px(_avg2_px(left, tr), top)
    if mode == 6:
        return _avg2_px(left, tl)
    if mode == 7:
        return _avg2_px(left, top)
    if mode == 8:
        return _avg2_px(tl, top)
    if mode == 9:
        return _avg2_px(top, tr)
    if mode == 10:
        return _avg2_px(_avg2_px(left, tl), _avg2_px(top, tr))
    if mode == 11:  # Select
        la, lr, lg, lb = _px_channels(left)
        ta, tr_, tg, tb = _px_channels(top)
        xa, xr, xg, xb = _px_channels(tl)
        pa, pr, pg, pb = la + ta - xa, lr + tr_ - xr, lg + tg - xg, lb + tb - xb
        p_l = abs(pa - la) + abs(pr - lr) + abs(pg - lg) + abs(pb - lb)
        p_t = abs(pa - ta) + abs(pr - tr_) + abs(pg - tg) + abs(pb - tb)
        return left if p_l < p_t else top
    if mode == 12:  # ClampAddSubtractFull
        la, lr, lg, lb = _px_channels(left)
        ta, tr_, tg, tb = _px_channels(top)
        xa, xr, xg, xb = _px_channels(tl)
        return _from_channels(
            _clamp(la + ta - xa), _clamp(lr + tr_ - xr),
            _clamp(lg + tg - xg), _clamp(lb + tb - xb),
        )
    if mode == 13:  # ClampAddSubtractHalf
        av = _avg2_px(left, top)
        aa, ar, ag, ab = _px_channels(av)
        xa, xr, xg, xb = _px_channels(tl)

        def half(a: int, b: int) -> int:
            return _clamp(a + int((a - b) / 2))  # trunc toward zero, like C

        return _from_channels(half(aa, xa), half(ar, xr), half(ag, xg), half(ab, xb))
    raise ValueError(f"vp8l: bad predictor mode {mode}")


def _add_px(residual: int, pred: int) -> int:
    ra, rr, rg, rb = _px_channels(residual)
    pa, pr, pg, pb = _px_channels(pred)
    return _from_channels(
        (ra + pa) & 0xFF, (rr + pr) & 0xFF, (rg + pg) & 0xFF, (rb + pb) & 0xFF
    )


def _sub_px(px: int, pred: int) -> int:
    a, r, g, b = _px_channels(px)
    pa, pr, pg, pb = _px_channels(pred)
    return _from_channels(
        (a - pa) & 0xFF, (r - pr) & 0xFF, (g - pg) & 0xFF, (b - pb) & 0xFF
    )


def _inverse_predictor(flat: np.ndarray, w: int, h: int, bits: int,
                       tiles: np.ndarray, tw: int) -> None:
    for y in range(h):
        base = y * w
        for x in range(w):
            i = base + x
            if i == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(flat[i - 1])  # L
            elif x == 0:
                pred = int(flat[i - w])  # T
            else:
                mode = (int(tiles[(y >> bits) * tw + (x >> bits)]) >> 8) & 0xFF
                left = int(flat[i - 1])
                top = int(flat[i - w])
                tl = int(flat[i - w - 1])
                # TR for the last column = first pixel of the current
                # row (the contiguous-memory rule, normative)
                tr = int(flat[i - w + 1])
                pred = _predict(mode, left, top, tl, tr)
            flat[i] = _add_px(int(flat[i]), pred)


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    return (_s8(t) * _s8(c)) >> 5


def _inverse_color_transform(flat: np.ndarray, w: int, h: int, bits: int,
                             tiles: np.ndarray, tw: int) -> None:
    for y in range(h):
        for x in range(w):
            i = y * w + x
            cte = int(tiles[(y >> bits) * tw + (x >> bits)])
            g2r = cte & 0xFF
            g2b = (cte >> 8) & 0xFF
            r2b = (cte >> 16) & 0xFF
            px = int(flat[i])
            a, r, g, b = _px_channels(px)
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            flat[i] = _from_channels(a, r, g, b)


def _inverse_subtract_green(flat: np.ndarray) -> None:
    g = (flat >> np.uint32(8)) & np.uint32(0xFF)
    r = ((flat >> np.uint32(16)) & np.uint32(0xFF)) + g
    b = (flat & np.uint32(0xFF)) + g
    flat[:] = (
        (flat & np.uint32(0xFF00FF00))
        | ((r & np.uint32(0xFF)) << np.uint32(16))
        | (b & np.uint32(0xFF))
    )


def palette_width_bits(palette_size: int) -> int:
    if palette_size <= 2:
        return 3
    if palette_size <= 4:
        return 2
    if palette_size <= 16:
        return 1
    return 0


def _inverse_color_indexing(flat: np.ndarray, packed_w: int, h: int,
                            palette: list[int], orig_w: int) -> np.ndarray:
    wb = palette_width_bits(len(palette))
    bpp = 8 >> wb
    out = np.zeros(orig_w * h, dtype=np.uint32)
    mask = (1 << bpp) - 1
    for y in range(h):
        for x in range(orig_w):
            packed = int(flat[y * packed_w + (x >> wb)]) if wb else int(flat[y * packed_w + x])
            green = (packed >> 8) & 0xFF
            idx = (green >> ((x & ((1 << wb) - 1)) * bpp)) & mask if wb else green
            out[y * orig_w + x] = palette[idx] if idx < len(palette) else 0
    return out


def decode_vp8l(payload: bytes) -> np.ndarray:
    """VP8L payload -> (h, w, 4) uint8 RGBA."""
    br = BitReader(payload)
    if br.bits(8) != 0x2F:
        raise ValueError("vp8l: bad signature")
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("vp8l: unknown version")

    transforms: list[tuple] = []
    cur_w = w
    seen: set[int] = set()
    while br.bit():
        t = br.bits(2)
        if t in seen:
            raise ValueError("vp8l: duplicate transform")
        seen.add(t)
        if t == 2:  # subtract green
            transforms.append(("sg",))
        elif t in (0, 1):  # predictor / color transform
            bits = br.bits(3) + 2
            tw = (cur_w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            tiles = _decode_entropy_coded(br, tw, th, False)
            transforms.append(("pred" if t == 0 else "ct", cur_w, bits, tiles, tw))
        else:  # color indexing
            psize = br.bits(8) + 1
            raw = _decode_entropy_coded(br, psize, 1, False)
            palette: list[int] = []
            acc = 0
            for v in raw:
                # palette entries are delta-coded per channel
                acc = _add_px(int(v), acc) if palette else int(v)
                palette.append(acc)
            wb = palette_width_bits(psize)
            packed_w = (cur_w + (1 << wb) - 1) >> wb
            transforms.append(("pal", cur_w, palette, packed_w))
            cur_w = packed_w

    flat = _decode_entropy_coded(br, cur_w, h, True)

    for tf in reversed(transforms):
        if tf[0] == "sg":
            _inverse_subtract_green(flat)
        elif tf[0] == "pred":
            _, width, bits, tiles, tw = tf
            _inverse_predictor(flat, width, h, bits, tiles, tw)
        elif tf[0] == "ct":
            _, width, bits, tiles, tw = tf
            _inverse_color_transform(flat, width, h, bits, tiles, tw)
        else:
            _, orig_w, palette, packed_w = tf
            flat = _inverse_color_indexing(flat, packed_w, h, palette, orig_w)
            cur_w = orig_w

    a = (flat >> np.uint32(24)) & np.uint32(0xFF)
    r = (flat >> np.uint32(16)) & np.uint32(0xFF)
    g = (flat >> np.uint32(8)) & np.uint32(0xFF)
    b = flat & np.uint32(0xFF)
    return np.stack(
        [r.reshape(h, w), g.reshape(h, w), b.reshape(h, w), a.reshape(h, w)],
        axis=2,
    ).astype(np.uint8)


def decode_webp(data: bytes) -> np.ndarray:
    """RIFF WebP container -> (h, w, 4) uint8 RGBA (lossless only)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("webp: not a RIFF WebP file")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            return decode_vp8l(body)
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "webp: lossy (VP8) streams are not supported"
            )
        # VP8X (extended header), ICCP/EXIF/XMP metadata, ALPH, ANIM...
        # are skipped: a lossless file with metadata carries its VP8L
        # chunk later in the stream
        pos += 8 + size + (size & 1)
    raise ValueError("webp: no VP8L chunk")


def decode_webp_rgb8(data: bytes) -> np.ndarray:
    return decode_webp(data)[:, :, :3]


# ------------------------------------------------------------ encoder

def _package_merge(freqs: dict[int, int], limit: int) -> dict[int, int]:
    """Optimal length-limited prefix code lengths (package-merge)."""
    syms = sorted(freqs)
    n = len(syms)
    if n == 0:
        return {}
    if n == 1:
        return {syms[0]: 1}
    if (1 << limit) < n:
        raise ValueError("package_merge: limit too small")
    leaves = sorted((freqs[s], (s,)) for s in syms)
    pkgs = list(leaves)
    for _ in range(limit - 1):
        paired = [
            (pkgs[i][0] + pkgs[i + 1][0], pkgs[i][1] + pkgs[i + 1][1])
            for i in range(0, len(pkgs) - 1, 2)
        ]
        pkgs = sorted(paired + leaves)
    lengths = {s: 0 for s in syms}
    for _w, members in pkgs[: 2 * n - 2]:
        for s in members:
            lengths[s] += 1
    kraft = sum(2 ** -l for l in lengths.values() if l > 0)
    if abs(kraft - 1.0) > 1e-9 or max(lengths.values()) > limit:
        raise AssertionError(f"package_merge: bad code (kraft={kraft})")
    return lengths


def _write_prefix_code(bw: BitWriter, lengths: dict[int, int],
                       alphabet_size: int) -> dict[int, tuple[int, int]]:
    """Emit one prefix code (simple form for <=2 symbols, else normal
    form with literal code-length entries); returns symbol->(code,len)
    for subsequent data writing."""
    used = sorted(s for s, l in lengths.items() if l > 0)
    if len(used) == 0:
        raise ValueError("empty prefix code")
    if len(used) <= 2 and used[-1] <= 255:
        # simple form stores symbols in at most 8 bits — symbols >= 256
        # (length / cache codes in the green alphabet) need normal form
        bw.bits(1, 1)  # simple
        bw.bits(len(used) - 1, 1)
        if used[0] > 1:
            bw.bits(1, 1)
            bw.bits(used[0], 8)
        else:
            bw.bits(0, 1)
            bw.bits(used[0], 1)
        if len(used) == 1:
            return {used[0]: (0, 0)}
        bw.bits(used[1], 8)
        return _canonical_codes({used[0]: 1, used[1]: 1})

    bw.bits(0, 1)  # normal
    seq = [lengths.get(i, 0) for i in range(alphabet_size)]
    cl_freqs: dict[int, int] = {}
    for l in seq:
        cl_freqs[l] = cl_freqs.get(l, 0) + 1
    if len(cl_freqs) == 1:
        cl_lens = {next(iter(cl_freqs)): 1}
    else:
        cl_lens = _package_merge(cl_freqs, 7)
    max_order_idx = max(CL_ORDER.index(s) for s in cl_lens) + 1
    num_codes = max(max_order_idx, 4)
    bw.bits(num_codes - 4, 4)
    for i in range(num_codes):
        bw.bits(cl_lens.get(CL_ORDER[i], 0), 3)
    bw.bits(0, 1)  # no max_symbol override
    if len(cl_lens) == 1:
        cl_codes: dict[int, tuple[int, int]] = {next(iter(cl_lens)): (0, 0)}
    else:
        cl_codes = _canonical_codes(cl_lens)
    for l in seq:
        c, n = cl_codes[l]
        bw.code(c, n)
    if len(used) == 1:
        # decoder treats a single-symbol code as 0-bit
        return {used[0]: (0, 0)}
    return _canonical_codes(lengths)


def _emit_symbols(pixels: list[int], cache_bits: int, use_runs: bool):
    """Plan the symbol stream: list of ('lit', a, r, g, b) / ('cache',
    idx) / ('ref', length, dist_code) events, plus channel freqs."""
    events = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    n = len(pixels)
    i = 0
    while i < n:
        px = pixels[i]
        if use_runs and i > 0 and pixels[i - 1] == px:
            run = 1
            while i + run < n and pixels[i + run] == px and run < 4096:
                run += 1
            if run >= 3:
                events.append(("ref", run, 2))  # plane code 2 == (1,0) == dist 1
                if cache is not None:
                    cache[_cache_index(px, cache_bits)] = px
                i += run
                continue
        if cache is not None:
            idx = _cache_index(px, cache_bits)
            if cache[idx] == px:
                events.append(("cache", idx))
                i += 1
                continue
            cache[idx] = px
        a, r, g, b = _px_channels(px)
        events.append(("lit", a, r, g, b))
        i += 1
    return events


def _encode_entropy_coded(bw: BitWriter, pixels: list[int], is_main: bool,
                          cache_bits: int = 0, use_runs: bool = False) -> None:
    if cache_bits:
        bw.bits(1, 1)
        bw.bits(cache_bits, 4)
    else:
        bw.bits(0, 1)
    if is_main:
        bw.bits(0, 1)  # no meta prefix codes

    events = _emit_symbols(pixels, cache_bits, use_runs)
    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}
    for ev in events:
        if ev[0] == "lit":
            _, a, r, g, b = ev
            gf[g] = gf.get(g, 0) + 1
            rf[r] = rf.get(r, 0) + 1
            bf[b] = bf.get(b, 0) + 1
            af[a] = af.get(a, 0) + 1
        elif ev[0] == "cache":
            s = 256 + 24 + ev[1]
            gf[s] = gf.get(s, 0) + 1
        else:
            _, length, dcode = ev
            lp, _lx, _ln = prefix_encode(length)
            gf[256 + lp] = gf.get(256 + lp, 0) + 1
            dp, _dx, _dn = prefix_encode(dcode)
            df[dp] = df.get(dp, 0) + 1
    # every code must exist even if unused in the data
    for d in (rf, bf, af, df):
        if not d:
            d[0] = 1

    def lens(freqs: dict[int, int]) -> dict[int, int]:
        if len(freqs) <= 2:
            return {s: 1 for s in freqs}
        return _package_merge(freqs, 15)

    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    gc = _write_prefix_code(bw, lens(gf), green_alpha)
    rc = _write_prefix_code(bw, lens(rf), 256)
    bc = _write_prefix_code(bw, lens(bf), 256)
    ac = _write_prefix_code(bw, lens(af), 256)
    dc = _write_prefix_code(bw, lens(df), 40)

    for ev in events:
        if ev[0] == "lit":
            _, a, r, g, b = ev
            bw.code(gc[g][0], gc[g][1])
            bw.code(rc[r][0], rc[r][1])
            bw.code(bc[b][0], bc[b][1])
            bw.code(ac[a][0], ac[a][1])
        elif ev[0] == "cache":
            s = 256 + 24 + ev[1]
            bw.code(gc[s][0], gc[s][1])
        else:
            _, length, dcode = ev
            lp, lx, ln = prefix_encode(length)
            bw.code(gc[256 + lp][0], gc[256 + lp][1])
            bw.bits(lx, ln)
            dp, dx, dn = prefix_encode(dcode)
            bw.code(dc[dp][0], dc[dp][1])
            bw.bits(dx, dn)


def _forward_subtract_green(pixels: list[int]) -> list[int]:
    out = []
    for px in pixels:
        a, r, g, b = _px_channels(px)
        out.append(_from_channels(a, (r - g) & 0xFF, g, (b - g) & 0xFF))
    return out


def _forward_predictor(pixels: list[int], w: int, h: int, mode: int) -> list[int]:
    """Residuals for a UNIFORM predictor mode (encoder side; border
    rules identical to the decoder's)."""
    out = list(pixels)
    res = [0] * len(pixels)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if i == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = out[i - 1]
            elif x == 0:
                pred = out[i - w]
            else:
                pred = _predict(mode, out[i - 1], out[i - w], out[i - w - 1],
                                out[i - w + 1])
            res[i] = _sub_px(out[i], pred)
    return res


def _forward_color_transform(pixels: list[int], cte: tuple[int, int, int]) -> list[int]:
    """Residuals for a UNIFORM ColorTransformElement (g2r, g2b, r2b)."""
    g2r, g2b, r2b = cte
    out = []
    for px in pixels:
        a, r, g, b = _px_channels(px)
        rr = (r - _ct_delta(g2r, g)) & 0xFF
        bb = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
        out.append(_from_channels(a, rr, g, bb))
    return out


def encode_vp8l(rgba: np.ndarray, cache_bits: int = 0, use_runs: bool = False,
                subtract_green: bool = False, predictor: int | None = None,
                palette: bool = False,
                color_transform: tuple[int, int, int] | None = None) -> bytes:
    """(h, w, 3|4) uint8 -> VP8L payload. Transforms are optional and
    compose in the spec's canonical order (predictor and subtract-green
    are mutually composable; palette replaces both)."""
    if rgba.ndim != 3 or rgba.shape[2] not in (3, 4):
        raise ValueError("encode_vp8l: need (h, w, 3|4) uint8")
    h, w = rgba.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("encode_vp8l: dims out of range")
    a = rgba[:, :, 3] if rgba.shape[2] == 4 else np.full((h, w), 255, np.uint8)
    flat = (
        (a.astype(np.uint32) << 24)
        | (rgba[:, :, 0].astype(np.uint32) << 16)
        | (rgba[:, :, 1].astype(np.uint32) << 8)
        | rgba[:, :, 2].astype(np.uint32)
    ).ravel()
    pixels = [int(v) for v in flat]

    bw = BitWriter()
    bw.bits(0x2F, 8)
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(1 if (rgba.shape[2] == 4 and (a != 255).any()) else 0, 1)
    bw.bits(0, 3)  # version

    if palette:
        pal: list[int] = []
        index = {}
        for px in pixels:
            if px not in index:
                index[px] = len(pal)
                pal.append(px)
        if len(pal) > 256:
            # VP8L caps COLOR_INDEXING at 256 entries; real encoders
            # (cwebp) silently fall back to a non-palette encoding here
            # rather than failing, so we do the same.
            palette = False
            subtract_green = True
    if palette:
        bw.bits(1, 1)
        bw.bits(3, 2)  # COLOR_INDEXING
        bw.bits(len(pal) - 1, 8)
        deltas = [pal[0]] + [_sub_px(pal[i], pal[i - 1]) for i in range(1, len(pal))]
        _encode_entropy_coded(bw, deltas, False)
        wb = palette_width_bits(len(pal))
        packed_w = (w + (1 << wb) - 1) >> wb
        packed = [0] * (packed_w * h)
        for y in range(h):
            for x in range(w):
                idx = index[pixels[y * w + x]]
                if wb:
                    bpp = 8 >> wb
                    j = y * packed_w + (x >> wb)
                    green = (packed[j] >> 8) & 0xFF
                    green |= idx << ((x & ((1 << wb) - 1)) * bpp)
                    packed[j] = 0xFF000000 | (green << 8)
                else:
                    packed[y * packed_w + x] = 0xFF000000 | (idx << 8)
        bw.bits(0, 1)  # end of transforms
        _encode_entropy_coded(bw, packed, True, cache_bits, use_runs)
        return bw.done()

    if predictor is not None:
        bw.bits(1, 1)
        bw.bits(0, 2)  # PREDICTOR
        bits = 4
        bw.bits(bits - 2, 3)
        tw = (w + (1 << bits) - 1) >> bits
        th = (h + (1 << bits) - 1) >> bits
        tile_px = [0xFF000000 | (int(predictor) << 8)] * (tw * th)
        _encode_entropy_coded(bw, tile_px, False)
        pixels = _forward_predictor(pixels, w, h, int(predictor))
    if color_transform is not None:
        if predictor is not None:
            raise ValueError("encode_vp8l: color_transform excludes predictor")
        bw.bits(1, 1)
        bw.bits(1, 2)  # COLOR_TRANSFORM
        bits = 4
        bw.bits(bits - 2, 3)
        tw = (w + (1 << bits) - 1) >> bits
        th = (h + (1 << bits) - 1) >> bits
        g2r, g2b, r2b = color_transform
        cte_px = 0xFF000000 | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) | (g2r & 0xFF)
        _encode_entropy_coded(bw, [cte_px] * (tw * th), False)
        pixels = _forward_color_transform(pixels, color_transform)
    if subtract_green:
        bw.bits(1, 1)
        bw.bits(2, 2)  # SUBTRACT_GREEN
        # NOTE: decoder applies inverses in REVERSE stream order, so
        # subtract-green must be the LAST-read transform to be undone
        # FIRST; forward order here is therefore predictor-then-sg
        pixels = _forward_subtract_green(pixels)
    bw.bits(0, 1)  # end of transforms
    _encode_entropy_coded(bw, pixels, True, cache_bits, use_runs)
    return bw.done()


def encode_webp(rgba: np.ndarray, **kw) -> bytes:
    payload = encode_vp8l(rgba, **kw)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
