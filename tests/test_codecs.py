import numpy as np
import pytest

from hgt2osm2_spark.kernels import codecs
from hgt2osm2_spark.kernels.codecs import NOVALUE


def _grid(h=33, w=33, seed=7, holes=True):
    rng = np.random.default_rng(seed)
    g = (rng.normal(500, 200, (h, w))).astype(np.int16)
    if holes:
        m = rng.random((h, w)) < 0.01
        g[m] = NOVALUE
    return g


def test_hgt_roundtrip():
    g = _grid()
    assert np.array_equal(codecs.decode_hgt(codecs.encode_hgt(g), 33, 33), g)


def test_png_roundtrip_lossless():
    g = _grid()
    assert np.array_equal(codecs.decode_png16(codecs.encode_png16(g)), g)


def test_png_full_int16_range():
    g = np.array([[-32768, -1], [0, 32767]], dtype=np.int16)
    assert np.array_equal(codecs.decode_png16(codecs.encode_png16(g)), g)


def test_djpg_lossy_psnr():
    g = _grid(64, 64, seed=3)
    out = codecs.decode_djpg(codecs.encode_djpg(g, quality=90))
    assert out.shape == g.shape
    # NoValue mask survives the lossy round trip exactly
    assert np.array_equal(out == NOVALUE, g == NOVALUE)
    assert codecs.psnr(g, out) >= 40.0


def test_djpg_non_multiple_of_8():
    g = _grid(21, 13, seed=5, holes=False)
    out = codecs.decode_djpg(codecs.encode_djpg(g, quality=95))
    assert out.shape == (21, 13)
    assert codecs.psnr(g, out) >= 40.0


def test_decode_dispatch_unknown():
    with pytest.raises(NotImplementedError):
        codecs.decode(b"xx", "tiff", 2, 2)


def test_phash_deterministic_and_sensitive():
    g = _grid(64, 64, seed=1, holes=False)
    h1 = codecs.phash64(g)
    assert h1 == codecs.phash64(g.copy())
    g2 = g.copy()
    g2[:32, :] += 500
    assert h1 != codecs.phash64(g2)
    assert -(2**63) <= h1 < 2**63


def test_hgt_zip_roundtrip_and_member_lookup():
    """S2: transparent .hgt.zip member lookup (HGTReader.cs:127-146) —
    named lookup (case-insensitive, nested dirs), single-member
    fallback, size inference from member length."""
    import io
    import zipfile

    import numpy as np
    import pytest

    from hgt2osm2_spark.kernels import codecs

    grid = np.arange(49, dtype=np.int16).reshape(7, 7) - 10
    grid[0, 3] = codecs.NOVALUE

    # simple roundtrip through the dispatch layer
    data = codecs.encode(grid, "hgt.zip", name="n51e002")
    out = codecs.decode(data, "hgt.zip", 7, 7, name="n51e002")
    assert np.array_equal(out, grid)
    # size inference (w=h=0)
    assert np.array_equal(codecs.decode(data, "hgt.zip", 0, 0), grid)

    # multi-member archive: named lookup must pick the right member,
    # case-insensitively and under a directory prefix
    other = np.full((7, 7), 99, dtype=np.int16)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("a/N51E002.hgt", codecs.encode_hgt(grid))
        z.writestr("b/N51E003.hgt", codecs.encode_hgt(other))
    multi = buf.getvalue()
    assert np.array_equal(codecs.decode_hgt_zip(multi, name="n51e002"), grid)
    assert np.array_equal(codecs.decode_hgt_zip(multi, name="N51E003"), other)
    # ambiguous without a name
    with pytest.raises(ValueError):
        codecs.decode_hgt_zip(multi)


def test_scan_hgt_dir_binaryfile(spark, tmp_path):
    """S2+S4 end-to-end: binaryFile scan of a mixed raw/zip directory
    reproduces the original grids bit-exactly."""
    import numpy as np

    from hgt2osm2_spark.kernels import codecs
    from hgt2osm2_spark.sources.decode import scan_hgt_dir
    from hgt2osm2_spark.sources.synthetic import heightfield

    grids = {}
    for i, (name, zipped) in enumerate(
        [("n45e010", True), ("s03w072", False), ("n00e000", True)]
    ):
        g = heightfield(i, 13, seed=5)
        grids[name] = g
        p = tmp_path / (f"{name}.hgt" + (".zip" if zipped else ""))
        p.write_bytes(codecs.encode(g, "hgt.zip" if zipped else "hgt", name=name))
    # a non-tile file must be ignored
    (tmp_path / "README.txt").write_text("not a tile")

    rows = scan_hgt_dir(spark, str(tmp_path)).collect()
    assert sorted(r["image_id"] for r in rows) == sorted(grids)
    for r in rows:
        got = codecs.decode(bytes(r["bytes"]), r["fmt"], r["w"], r["h"], name=r["image_id"])
        assert np.array_equal(got, grids[r["image_id"]])
        assert codecs.phash64(got) == r["phash"]


def test_png_rgb8_roundtrip_and_foreign_filters():
    """Real RGB8 PNG codec: lossless roundtrip (PSNR = inf >= 40 dB) and
    correct decoding of FOREIGN-encoded files using every scanline
    filter type (Sub/Up/Average/Paeth), which our own encoder never
    emits."""
    import struct
    import zlib

    import numpy as np

    from hgt2osm2_spark.kernels import codecs

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (23, 17, 3)).astype(np.uint8)

    # own-encoder roundtrip: bit-exact
    out = codecs.decode_png_rgb8(codecs.encode_png_rgb8(img))
    assert np.array_equal(out, img)

    # foreign encoder applying filter type (y % 5) per scanline
    h, w, _ = img.shape
    stride = 3 * w
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = y % 5
        cur = flat[y]
        line = cur.copy()
        for x in range(stride):
            a = cur[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if f == 1:
                line[x] = (cur[x] - a) & 0xFF
            elif f == 2:
                line[x] = (cur[x] - b) & 0xFF
            elif f == 3:
                line[x] = (cur[x] - ((a + b) >> 1)) & 0xFF
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (cur[x] - pred) & 0xFF
        raw.append(f)
        raw.extend(line.astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    foreign = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(codecs.decode_png_rgb8(foreign), img)

    # luma view is deterministic and in range
    gray = codecs.rgb_to_gray_i16(img)
    assert gray.shape == (h, w) and gray.min() >= 0 and gray.max() <= 255


def test_multimodal_png_rgb_end_to_end(spark):
    """'png-rgb' is no longer stubbed: features + resize run the real
    decoder through the Spark plumbing."""
    import numpy as np
    import pandas as pd

    from hgt2osm2_spark.kernels import codecs
    from hgt2osm2_spark.ops import multimodal

    assert "png-rgb" not in multimodal.UNSUPPORTED_REAL_FORMATS

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    pdf = pd.DataFrame([{
        "image_id": "rgb0", "bytes": codecs.encode_png_rgb8(img),
        "w": 16, "h": 16, "fmt": "png-rgb",
    }])
    tiles = spark.createDataFrame(pdf)

    feats = multimodal.decode_features(tiles).collect()
    assert len(feats) == 1 and abs(sum(feats[0]["features"]) - 1.0) < 1e-9

    small = multimodal.resize_tiles(tiles, factor=2).collect()[0]
    assert (small["w"], small["h"], small["fmt"]) == (8, 8, "png-rgb")
    dec = codecs.decode_png_rgb8(bytes(small["bytes"]))
    want = np.rint(
        img.reshape(8, 2, 8, 2, 3).astype(np.float64).mean(axis=(1, 3))
    ).astype(np.uint8)
    assert np.array_equal(dec, want)
