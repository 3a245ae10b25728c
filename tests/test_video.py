"""kernels/avi.py + ops/multimodal video path (round 3).

The video contract mirrors the north rule's per-row invariant: after
container demux and lossy per-frame decode, pixels must be allclose to
the pre-encode source at PSNR >= 40 dB, and the container round trip
must be byte-exact on the frame payloads.
"""

import numpy as np
import pytest

from hgt2osm2_spark.kernels import avi, jpeg
from hgt2osm2_spark.ops import multimodal
from hgt2osm2_spark.sources import synthetic


def test_mux_demux_roundtrip_byte_exact():
    frames = [bytes([i]) * (101 + i) for i in range(5)]  # odd sizes -> pad path
    blob = avi.encode_avi_mjpeg(frames, w=16, h=12, fps=25)
    info = avi.demux_avi(blob)
    assert info["w"] == 16 and info["h"] == 12 and info["fps"] == 25
    assert info["n_frames"] == 5
    assert info["frames"] == frames


def test_demux_rejects_malformed():
    with pytest.raises(ValueError):
        avi.demux_avi(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        avi.demux_avi(b"not a riff at all....")
    # truncated movi chunk overruns its parent
    frames = [b"x" * 50]
    blob = avi.encode_avi_mjpeg(frames, w=4, h=4)
    with pytest.raises(ValueError):
        avi.demux_avi(blob[:-30])


def test_marker_scan_twin_agrees_with_chunk_walk():
    """The golden twin demuxes by JPEG SOI/EOI marker scan — a genuinely
    different parsing strategy. Both must find identical frames."""
    row = synthetic.make_video_row(3, n_frames=6, size=33)
    info = avi.demux_avi(row["bytes"])
    scanned = _marker_scan(row["bytes"])
    assert scanned == info["frames"]


def _marker_scan(data: bytes) -> list[bytes]:
    out, pos = [], 0
    while True:
        soi = data.find(b"\xff\xd8\xff", pos)
        if soi < 0:
            return out
        eoi = data.find(b"\xff\xd9", soi)
        assert eoi > 0
        out.append(data[soi : eoi + 2])
        pos = eoi + 2


def test_video_psnr_contract():
    """Demux + decode of every frame stays >= 40 dB vs the pre-encode
    source frames (lossy-format invariant from the input hint)."""
    idx, n_frames, size = 1, 5, 33
    row = synthetic.make_video_row(idx, n_frames=n_frames, size=size)
    info = avi.demux_avi(row["bytes"])
    assert len(info["frames"]) == n_frames
    for t, payload in enumerate(info["frames"]):
        src = synthetic.video_frame(idx, t, size)
        dec = jpeg.decode_jpeg(payload)
        assert dec.shape == src.shape
        assert jpeg.psnr(src, dec) >= 40.0


def test_video_frames_operator(spark):
    vids = synthetic.videos_df(spark, n_clips=3, n_frames=6)
    frames = multimodal.video_frames(vids, every=2).toPandas()
    assert len(frames) == 3 * 3  # frames 0,2,4 per clip
    assert sorted(frames["frame_idx"].unique()) == [0, 2, 4]
    # payloads are real JPEGs
    assert all(bytes(f)[:3] == b"\xff\xd8\xff" for f in frames["frame"])


def test_video_frame_features_operator(spark):
    vids = synthetic.videos_df(spark, n_clips=2, n_frames=4)
    stats = multimodal.video_frame_features(vids).toPandas()
    assert len(stats) == 2 * 4
    # a pure horizontal pan preserves the luma histogram: per-clip frame
    # means must agree tightly (jpeg noise only)
    for _, grp in stats.groupby("image_id"):
        assert grp["mean_luma"].max() - grp["mean_luma"].min() < 1.0
        assert (grp["std_luma"] > 0).all()


def test_video_rejects_non_avi(spark):
    imgs = synthetic.images_df(spark, n_images=2)
    with pytest.raises(Exception, match="NotImplementedError|real"):
        multimodal.video_frames(imgs).collect()


def test_grayscale_mjpeg_frames(spark):
    """Regression: 1-component MJPEG frames decode to 2-D arrays; the
    feature path must treat them as luma directly, not crash."""
    import pandas as pd

    from hgt2osm2_spark.kernels import avi as avik
    from hgt2osm2_spark.kernels import jpeg as jpegk

    gray = (synthetic.rgb_image(0, 17)[:, :, 1]).copy()
    frames = [jpegk.encode_jpeg_gray8(gray, quality=95) for _ in range(3)]
    blob = avik.encode_avi_mjpeg(frames, w=17, h=17)
    df = spark.createDataFrame(pd.DataFrame([
        {"image_id": "g0", "bytes": blob, "fmt": "avi-mjpeg"},
    ]))
    stats = multimodal.video_frame_features(df).toPandas()
    assert len(stats) == 3
    assert (stats["mean_luma"] > 0).all()


def test_avi_truncated_header_is_valueerror():
    import pytest as _pytest

    from hgt2osm2_spark.kernels import avi as avik

    blob = avik.encode_avi_mjpeg([b"x" * 40], w=4, h=4)
    for cut in (20, 30, 45, 60):
        with _pytest.raises(ValueError):
            avik.demux_avi(blob[:cut])
