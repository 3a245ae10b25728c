"""Pure-Python GIF87a/89a codec (palette + LZW), no external libraries.

Scraped web corpora are full of GIFs; with this, the engine's real
image formats are png-rgb, baseline jpeg, and gif — only entropy-coded
webp remains a stub. Layout follows the public GIF89a specification
(logical screen descriptor, global color table, image descriptor,
LZW-compressed indices in 255-byte sub-blocks, trailer).

GIF is lossless over palettized pixels: the codec contract is
decode(encode(img)) == quantize(img) exactly. Encoding quantizes to
the web-safe 6x6x6 uniform cube (216 colors) — deterministic, no
dithering, so the quantization error is bounded and reproducible.

The decoder handles: both global and local color tables, interlaced
images (4-pass row shuffle), 89a extension blocks (skipped), and LZW
code-size growth up to 12 bits with CLEAR/EOI handling.
"""

from __future__ import annotations

import struct

import numpy as np

_TRAILER = 0x3B
_IMAGE_SEP = 0x2C
_EXTENSION = 0x21


def websafe_quantize(img: np.ndarray) -> np.ndarray:
    """uint8 RGB -> nearest color of the 6x6x6 cube (values 0,51,..255).
    Deterministic round-to-nearest; the palette index is recoverable as
    r6*36 + g6*6 + b6."""
    return (np.rint(img.astype(np.float64) / 51.0) * 51.0).astype(np.uint8)


def _websafe_palette() -> np.ndarray:
    levels = np.arange(6, dtype=np.uint8) * 51
    r, g, b = np.meshgrid(levels, levels, levels, indexing="ij")
    pal = np.zeros((256, 3), np.uint8)
    pal[:216] = np.stack([r.ravel(), g.ravel(), b.ravel()], axis=1)
    return pal


def _lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    next_code = eoi + 1
    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}

    out = bytearray()
    cur = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8

    emit(clear)
    prefix = b""
    for v in indices.tobytes():
        probe = prefix + bytes([v])
        if probe in table:
            prefix = probe
            continue
        emit(table[prefix])
        table[probe] = next_code
        next_code += 1
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        elif next_code >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        prefix = bytes([v])
    if prefix:
        emit(table[prefix])
    emit(eoi)
    if nbits:
        out.append(cur & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]

    out = bytearray()
    cur = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("gif: LZW stream truncated")
            cur |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = cur & ((1 << code_size) - 1)
        cur >>= code_size
        nbits -= code_size

        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK special case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"gif: LZW code {code} out of range")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    if len(out) < n_pixels:
        raise ValueError(f"gif: decoded {len(out)} of {n_pixels} pixels")
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


def encode_gif_rgb8(img: np.ndarray) -> bytes:
    """uint8 RGB (h, w, 3) -> single-frame GIF89a, web-safe palette."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_gif_rgb8: want uint8 (h, w, 3)")
    h, w = img.shape[:2]
    q = websafe_quantize(img).astype(np.uint16)
    idx = ((q[:, :, 0] // 51) * 36 + (q[:, :, 1] // 51) * 6
           + q[:, :, 2] // 51).astype(np.uint8)

    out = bytearray(b"GIF89a")
    # logical screen descriptor: 256-entry global color table, 8 bpp
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += _websafe_palette().tobytes()
    # image descriptor, no local table, not interlaced
    out += struct.pack("<BHHHHB", _IMAGE_SEP, 0, 0, w, h, 0)
    out.append(8)  # LZW minimum code size
    payload = _lzw_compress(idx.ravel(), 8)
    for i in range(0, len(payload), 255):
        block = payload[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)  # block terminator
    out.append(_TRAILER)
    return bytes(out)


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = (list(range(0, h, 8)) + list(range(4, h, 8))
             + list(range(2, h, 4)) + list(range(1, h, 2)))
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif_rgb8(data: bytes) -> np.ndarray:
    """Single-frame GIF -> uint8 RGB (h, w, 3). Extension blocks are
    skipped; interlaced frames are de-interlaced. Raises ValueError on
    malformed input (callers quarantine)."""
    try:
        return _decode_gif_rgb8(data)
    except (IndexError, struct.error) as e:  # truncated structures
        raise ValueError(f"gif: truncated or malformed container ({e})")


def _decode_gif_rgb8(data: bytes) -> np.ndarray:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == _TRAILER:
            break
        if block == _EXTENSION:
            pos += 1  # label
            while data[pos]:  # skip sub-blocks
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != _IMAGE_SEP:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
        x0, y0, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("gif: no color table")
        min_code = data[pos]
        pos += 1
        payload = bytearray()
        while data[pos]:
            ln = data[pos]
            payload += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decompress(bytes(payload), min_code, w * h).reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        if (idx >= len(pal)).any():
            raise ValueError("gif: pixel index outside color table")
        frame = pal[idx]
        if (x0, y0, w, h) != (0, 0, sw, sh):
            full = np.zeros((sh, sw, 3), np.uint8)
            full[y0 : y0 + h, x0 : x0 + w] = frame
            return full
        return frame
    raise ValueError("gif: no image block before trailer")
