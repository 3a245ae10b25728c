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
