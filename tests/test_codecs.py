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
