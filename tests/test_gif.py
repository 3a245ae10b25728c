"""kernels/gif.py — pure-Python GIF codec.

GIF's contract is LOSSLESS over palettized pixels:
decode(encode(img)) == websafe_quantize(img) exactly. The independent
twin here is a parent-pointer LZW decoder (different algorithmic
formulation from the kernel's byte-string table) driven over the
kernel's compressed stream.
"""

import struct

import numpy as np
import pytest

from hgt2osm2_spark.kernels import gif
from hgt2osm2_spark.sources import synthetic


def test_roundtrip_lossless_over_quantize():
    for idx in range(3):
        img = synthetic.rgb_image(idx, 41)
        dec = gif.decode_gif_rgb8(gif.encode_gif_rgb8(img))
        assert (dec == gif.websafe_quantize(img)).all()


def test_roundtrip_noise_exercises_table_reset():
    """64x64 random pixels blow past 4096 LZW codes — the CLEAR/reset
    path must round-trip exactly."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    dec = gif.decode_gif_rgb8(gif.encode_gif_rgb8(img))
    assert (dec == gif.websafe_quantize(img)).all()


def _lzw_decode_parent_pointer(data: bytes, min_code: int, n: int) -> list:
    """Independent LZW twin: parent-pointer table (code -> (prefix
    code, final byte)) with explicit stack unwind, instead of the
    kernel's materialized byte strings."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    parent, last, first = {}, {}, {}
    for i in range(clear):
        parent[i], last[i], first[i] = None, i, i
    next_code = eoi + 1
    size = min_code + 1
    out, cur, nbits, pos, prev = [], 0, 0, 0, None

    def expand(code):
        stack = []
        while code is not None:
            stack.append(last[code])
            code = parent[code]
        return stack[::-1]

    while len(out) < n:
        while nbits < size:
            cur |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = cur & ((1 << size) - 1)
        cur >>= size
        nbits -= size
        if code == clear:
            parent = {i: None for i in range(clear)}
            last = {i: i for i in range(clear)}
            first = {i: i for i in range(clear)}
            next_code, size, prev = eoi + 1, min_code + 1, None
            continue
        if code == eoi:
            break
        if prev is None:
            out.extend(expand(code))
        else:
            if code < next_code:
                head = first[code]
            else:
                head = first[prev]
            parent[next_code] = prev
            last[next_code] = head
            first[next_code] = first[prev]
            next_code += 1
            out.extend(expand(code if code < next_code - 1 else next_code - 1))
        prev = code
        if next_code == (1 << size) and size < 12:
            size += 1
    return out[:n]


def test_lzw_against_parent_pointer_twin():
    rng = np.random.default_rng(9)
    for n, alphabet in [(500, 4), (2000, 200), (9000, 256)]:
        idx = rng.integers(0, alphabet, n).astype(np.uint8)
        comp = gif._lzw_compress(idx, 8)
        kernel = gif._lzw_decompress(comp, 8, n)
        twin = _lzw_decode_parent_pointer(comp, 8, n)
        assert list(kernel) == twin


def test_interlaced_decode():
    """Build an interlaced variant by hand (permute rows per the 4-pass
    scheme, set the interlace flag) and check the decoder restores row
    order."""
    img = synthetic.rgb_image(2, 16)
    q = gif.websafe_quantize(img)
    blob = bytearray(gif.encode_gif_rgb8(img))
    # image descriptor starts right after header+LSD+GCT
    desc_at = 13 + 256 * 3
    assert blob[desc_at] == 0x2C
    h = 16
    order = (list(range(0, h, 8)) + list(range(4, h, 8))
             + list(range(2, h, 4)) + list(range(1, h, 2)))
    idx = ((q[:, :, 0].astype(np.uint16) // 51) * 36
           + (q[:, :, 1] // 51) * 6 + q[:, :, 2] // 51).astype(np.uint8)
    payload = gif._lzw_compress(idx[order].ravel(), 8)
    # descriptor = sep + <HHHHB> = 10 bytes; flags is its last byte
    out = blob[: desc_at + 10]
    out[desc_at + 9] = 0x40  # interlace flag
    out.append(8)
    for i in range(0, len(payload), 255):
        out.append(len(payload[i : i + 255]))
        out += payload[i : i + 255]
    out += b"\x00\x3b"
    dec = gif.decode_gif_rgb8(bytes(out))
    assert (dec == q).all()


def test_malformed_rejected():
    img = synthetic.rgb_image(0, 16)
    blob = gif.encode_gif_rgb8(img)
    with pytest.raises(ValueError):
        gif.decode_gif_rgb8(b"NOTGIF" + blob[6:])
    with pytest.raises(ValueError):
        gif.decode_gif_rgb8(blob[:40])  # truncated mid-table
    # truncate inside the LZW stream: keep structure, cut sub-blocks
    with pytest.raises(ValueError):
        gif.decode_gif_rgb8(blob[:-20] + b"\x00\x3b")


def test_extension_blocks_skipped():
    img = synthetic.rgb_image(1, 12)
    blob = gif.encode_gif_rgb8(img)
    desc_at = 13 + 256 * 3
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext
    patched = blob[:desc_at] + gce + blob[desc_at:]
    assert (gif.decode_gif_rgb8(patched)
            == gif.decode_gif_rgb8(blob)).all()
