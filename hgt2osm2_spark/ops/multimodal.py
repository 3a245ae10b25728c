"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real image/audio/video codec libraries are NOT in this container. The
image path is nonetheless REAL: pure-Python PNG (kernels.codecs) and
baseline JPEG (kernels.jpeg) codecs decode standard bytes end-to-end.
Audio/video container formats stay clearly-marked stubs
(NotImplementedError), while their Spark-side plumbing — schema,
partition strategy, Arrow UDF signatures, batch shapes — is real and
tested with the engine's own deterministic formats.

Operators:
  decode_features    binary -> fixed-width feature vector (mapInPandas)
  resize_tiles       grid resize (block-mean downsample), re-encoded
  frame_sample       treat a binary as T stacked frames; sample every
                     k-th frame (video-shaped plumbing)
  video_frames       REAL AVI container demux (kernels.avi) -> MJPEG
                     frame payloads
  video_frame_features  demux + per-frame baseline-JPEG decode -> luma
                     stats (the full real video path)
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..kernels import codecs

#: formats the stub decoder refuses (real libs unavailable here).
#: 'png-rgb' graduated to a REAL pure-Python decoder in round 2
#: (codecs.decode_png_rgb8: stdlib zlib + all five scanline filters);
#: 'jpeg' AND 'wav' graduated in round 3 (kernels.jpeg:
#: baseline-sequential huffman + dequant + IDCT, validated against
#: Java ImageIO; kernels.audio: RIFF/PCM u8..s32 + float, validated
#: against the stdlib wave module); 'avi-mjpeg' AND 'gif' graduated in
#: round 3 (kernels.avi RIFF mux/demux + per-frame kernels.jpeg decode;
#: kernels.gif palette+LZW, lossless over quantized pixels); 'webp'
#: graduated in round 4 (kernels.webp: full VP8L — all four transforms,
#: color cache, meta prefix codes, LZ77 — from the public lossless
#: bitstream spec, round-trip exact), and so did the 'mp4' CONTAINER
#: (kernels.mp4: ISO-BMFF box-tree demux + generic sample-table
#: resolution; MJPEG tracks pixel-decode end-to-end, an avc1/h264
#: track raises with its codec named). The remaining entries are
#: genuinely codec-bound BITSTREAMS (mp3 hybrid filterbank, h264
#: CABAC/CAVLC) with no feasible stdlib-only decoder — they are the
#: documented native-codec seam, not pending work: see COVERAGE.md
#: "Native fast paths and the fleet-scale swap points".
UNSUPPORTED_REAL_FORMATS = {"mp3", "h264"}


def _decode_any(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if fmt in UNSUPPORTED_REAL_FORMATS:
        raise NotImplementedError(
            f"decoder for {fmt!r} requires an image/audio library not present "
            "in this environment — plumbing is exercised via hgt/png/jpg"
        )
    return codecs.decode(data, fmt, w, h)


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def decode_features(tiles: DataFrame, n_bins: int = 16) -> DataFrame:
    """binary -> normalized histogram feature vector (fixed width).
    The Arrow batch shape (rows of MB-sized binaries) is the same a JPEG
    feature extractor would see."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for img, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                grid = _decode_any(data, fmt, int(w), int(h)).astype(np.float64)
                valid = grid != codecs.NOVALUE
                vals = grid[valid]
                if vals.size == 0:
                    hist = np.zeros(n_bins)
                else:
                    hist, _ = np.histogram(vals, bins=n_bins, range=(vals.min(), vals.max() + 1))
                    hist = hist / vals.size
                ids.append(img)
                feats.append(hist.tolist())
            yield pd.DataFrame({"image_id": ids, "features": feats})

    return tiles.mapInPandas(gen, schema=FEATURES_SCHEMA)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("mean_luma", T.DoubleType(), False),
        T.StructField("std_luma", T.DoubleType(), False),
        T.StructField("entropy", T.DoubleType(), False),
        T.StructField("edge_density", T.DoubleType(), False),
    ]
)

IMAGE_STATS_Q_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("error", T.StringType(), False),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("std_luma", T.DoubleType(), True),
        T.StructField("entropy", T.DoubleType(), True),
        T.StructField("edge_density", T.DoubleType(), True),
    ]
)


def _one_image_stats(data: bytes, fmt: str, edge_thresh: float) -> dict:
    from ..kernels import jpeg as _jpeg

    if fmt == "png-rgb":
        px = codecs.decode_png_rgb8(data)
    elif fmt == "jpeg":
        px = _jpeg.decode_jpeg(data)
        if px.ndim == 2:
            px = np.stack([px] * 3, axis=2)
    elif fmt == "gif":
        from ..kernels import gif as _gif

        px = _gif.decode_gif_rgb8(data)
    elif fmt == "webp":
        from ..kernels import webp as _webp

        px = _webp.decode_webp_rgb8(data)
    else:
        raise NotImplementedError(
            f"image_stats: {fmt!r} is not a real image format here"
        )
    px = px.astype(np.float64)
    luma = (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1]
            + 0.114 * px[:, :, 2])
    lu8 = np.clip(np.rint(luma), 0, 255).astype(np.uint8)
    counts = np.bincount(lu8.ravel(), minlength=256)
    p = counts[counts > 0] / lu8.size
    entropy = float(-(p * np.log2(p)).sum())
    # Sobel over the interior (no padding — border excluded)
    gx = (luma[:-2, 2:] + 2 * luma[1:-1, 2:] + luma[2:, 2:]
          - luma[:-2, :-2] - 2 * luma[1:-1, :-2] - luma[2:, :-2])
    gy = (luma[2:, :-2] + 2 * luma[2:, 1:-1] + luma[2:, 2:]
          - luma[:-2, :-2] - 2 * luma[:-2, 1:-1] - luma[:-2, 2:])
    mag = np.sqrt(gx * gx + gy * gy)
    # images under 3px have no Sobel interior: zero edges by definition
    # (NOT NaN — NaN would sail through quality filters as ok)
    edge_density = float((mag > edge_thresh).mean()) if mag.size else 0.0
    return {
        "mean_luma": round(float(luma.mean()), 6),
        "std_luma": round(float(luma.std()), 6),
        "entropy": round(entropy, 6),
        "edge_density": round(edge_density, 6),
    }


def image_stats(images: DataFrame, edge_thresh: float = 30.0) -> DataFrame:
    """Per-image quality signals over REAL decoded pixels — the image
    analogue of ops/text.quality_score for training-data filtering:
    luma mean/contrast, 256-bin luma entropy (near-blank screenshots
    and solid fills score ~0), and Sobel edge density (information
    content; flat synthetic images score low). Rounded to 6 so the
    plain-loop golden twin hashes equal. Raises on a corrupt payload —
    use image_stats_quarantined when the input is untrusted."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in IMAGE_STATS_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for img, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                rows.append(
                    {"image_id": img,
                     **_one_image_stats(bytes(data), fmt, edge_thresh)}
                )
            yield pd.DataFrame(rows, columns=cols)

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        gen, schema=IMAGE_STATS_SCHEMA
    )


def image_stats_quarantined(images: DataFrame,
                            edge_thresh: float = 30.0) -> DataFrame:
    """image_stats for UNTRUSTED payloads (scraped corpora): a corrupt
    or truncated image flags its row (ok=false, error=<exception
    class>) instead of killing the task — at 10^12 rows one bad byte
    stream must never cost a 10-hour job. Mirrors
    sources/decode.decode_stats_quarantined for grids."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in IMAGE_STATS_Q_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for img, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    stats = _one_image_stats(bytes(data), fmt, edge_thresh)
                    rows.append({"image_id": img, "ok": True, "error": "",
                                 **stats})
                except Exception as e:  # noqa: BLE001 — quarantine boundary
                    rows.append({"image_id": img, "ok": False,
                                 "error": type(e).__name__,
                                 "mean_luma": None, "std_luma": None,
                                 "entropy": None, "edge_density": None})
            yield pd.DataFrame(rows, columns=cols)

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        gen, schema=IMAGE_STATS_Q_SCHEMA
    )


def phash_near_dup(images: DataFrame, max_hamming: int = 10,
                   id_col: str = "image_id", phash_col: str = "phash") -> DataFrame:
    """Near-duplicate IMAGE pairs by perceptual-hash hamming distance —
    the multimodal analogue of simhash text dedup, over the input
    table's phash:int64 column (input_hint schema; codecs.phash64).
    Banded candidates (pigeonhole over max_hamming+1 bit-bands), exact
    popcount verify; never all-pairs. Returns (id_a, id_b, hamming)."""
    from .dedup import hamming_near_pairs

    sk = images.select(F.col(id_col).alias("id"), F.col(phash_col).alias("sketch"))
    return hamming_near_pairs(sk, max_hamming)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
    ]
)


def resize_tiles(tiles: DataFrame, factor: int = 2) -> DataFrame:
    """Block-mean downsample by `factor`, re-encoded in the same format.
    NoValue cells poison their block (stay NoValue) — missing data is
    never averaged into real samples."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for img, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                hh = (h // factor) * factor
                ww = (w // factor) * factor
                if fmt in ("png-rgb", "jpeg"):
                    if fmt == "png-rgb":
                        px = codecs.decode_png_rgb8(bytes(data))
                    else:
                        from ..kernels import jpeg as _jpeg

                        px = _jpeg.decode_jpeg(bytes(data))
                        if px.ndim == 2:  # grayscale jpeg -> 3-channel
                            px = np.stack([px] * 3, axis=2)
                    rgb = px[:hh, :ww].astype(np.float64)
                    blocks = rgb.reshape(hh // factor, factor, ww // factor, factor, 3)
                    small8 = np.rint(blocks.mean(axis=(1, 3))).astype(np.uint8)
                    if fmt == "png-rgb":
                        payload = codecs.encode_png_rgb8(small8)
                    else:
                        from ..kernels import jpeg as _jpeg

                        payload = _jpeg.encode_jpeg_rgb8(small8, quality=92)
                    sw, sh = small8.shape[1], small8.shape[0]
                else:
                    grid = _decode_any(data, fmt, int(w), int(h))
                    g = grid[:hh, :ww].astype(np.float64)
                    bad = g == codecs.NOVALUE
                    blocks = g.reshape(hh // factor, factor, ww // factor, factor)
                    badb = bad.reshape(hh // factor, factor, ww // factor, factor).any(axis=(1, 3))
                    small = blocks.mean(axis=(1, 3))
                    small = np.where(badb, codecs.NOVALUE, np.rint(small)).astype(np.int16)
                    payload = codecs.encode(small, fmt)
                    sw, sh = small.shape[1], small.shape[0]
                out.append(
                    {
                        "image_id": img,
                        "bytes": payload,
                        "w": sw,
                        "h": sh,
                        "fmt": fmt,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return tiles.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(gen, schema=RESIZE_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("duration_s", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("peak", T.DoubleType(), False),
        T.StructField("zcr", T.DoubleType(), False),
    ]
)


def audio_features(clips: DataFrame) -> DataFrame:
    """wav binary -> per-clip features (duration, RMS, peak,
    zero-crossing rate) via the REAL pure-Python RIFF/PCM decoder
    (kernels.audio). Entropy-coded audio (mp3) still refuses through
    _decode_any's honest stub."""
    from ..kernels import audio as _audio

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AUDIO_FEATURES_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for cid, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                if fmt != "wav":
                    raise NotImplementedError(
                        f"audio_features: {fmt!r} needs a codec library not "
                        "present here (only RIFF/PCM wav is real)"
                    )
                samples, rate = _audio.decode_wav(bytes(data))
                f = _audio.clip_features(samples, rate)
                rows.append(
                    {"image_id": cid, "sample_rate": rate,
                     "n_channels": samples.shape[1], **f}
                )
            yield pd.DataFrame(rows, columns=cols)

    return clips.select("image_id", "bytes", "fmt").mapInPandas(
        gen, schema=AUDIO_FEATURES_SCHEMA
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def frame_sample(videos: DataFrame, every: int = 2, frame_bytes: int | None = None) -> DataFrame:
    """Video-shaped plumbing: treat `bytes` as T concatenated raw frames
    of `frame_bytes` each (w*h*2 if not given); emit every k-th frame.
    A real container demuxer would slot into the same UDF."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for img, data, w, h in zip(pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"]):
                fb = frame_bytes or int(w) * int(h) * 2
                n = len(data) // fb
                for t in range(0, n, every):
                    out.append({"image_id": img, "frame_idx": t, "frame": data[t * fb : (t + 1) * fb]})
            yield pd.DataFrame(out, columns=[f.name for f in FRAMES_SCHEMA.fields])

    return videos.select("image_id", "bytes", "w", "h").mapInPandas(gen, schema=FRAMES_SCHEMA)


def video_frames(videos: DataFrame, every: int = 1) -> DataFrame:
    """REAL container demux: AVI (kernels.avi RIFF walk) -> every k-th
    encoded MJPEG frame payload, same output schema as frame_sample.
    One clip stays one task-local unit — at 10^12 clips the op is
    embarrassingly parallel and the exploded frame rows inherit the
    clip partitioning (no shuffle)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels import avi as _avi

        for pdf in batches:
            out = []
            for img, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                if fmt != "avi-mjpeg":
                    raise NotImplementedError(
                        f"video_frames: {fmt!r} needs a codec library not "
                        "present here (only RIFF/AVI MJPEG is real)"
                    )
                info = _avi.demux_avi(bytes(data))
                for t in range(0, len(info["frames"]), every):
                    out.append({"image_id": img, "frame_idx": t,
                                "frame": info["frames"][t]})
            yield pd.DataFrame(out, columns=[f.name for f in FRAMES_SCHEMA.fields])

    return videos.select("image_id", "bytes", "fmt").mapInPandas(
        gen, schema=FRAMES_SCHEMA
    )


VIDEO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("mean_luma", T.DoubleType(), False),
        T.StructField("std_luma", T.DoubleType(), False),
    ]
)


def video_frame_features(videos: DataFrame, every: int = 1) -> DataFrame:
    """Full real video path: AVI demux -> per-frame baseline-JPEG decode
    (kernels.jpeg) -> luma statistics.

    r5: the stats are FIXED-POINT-derived (the BM25 pattern): per-pixel
    lumaq = 299R + 587G + 114B is an exact int64, summed exactly, so
    the per-frame aggregates are invariant to summation order and the
    oracle COMPUTES mean/std in SQL from the integer sums golden
    (video_frame_sums) with the identical double expression — no
    twin-reads-result-back. mean = sum_q/1000/n; var = sumsq_q/1e6/n -
    mean^2 (clamped at 0); both rounded to 6."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels import avi as _avi
        from ..kernels import jpeg as _jpeg
        from ..kernels import mp4 as _mp4

        cols = [f.name for f in VIDEO_STATS_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for img, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                if fmt == "avi-mjpeg":
                    info = _avi.demux_avi(bytes(data))
                elif fmt == "mp4":
                    # real ISO-BMFF demux (r4); only the JPEG codec is
                    # pixel-decodable — an avc1/h264 track raises here,
                    # honestly, with its codec named
                    info = _mp4.demux_mp4(bytes(data))
                    if info["codec"] not in ("jpeg", "mjpa", "mjpb"):
                        raise NotImplementedError(
                            f"video_frame_features: mp4 codec {info['codec']!r}"
                            " has no stdlib-feasible pixel decoder"
                        )
                else:
                    raise NotImplementedError(
                        f"video_frame_features: {fmt!r} is not a real format here"
                    )
                for t in range(0, len(info["frames"]), every):
                    px = _jpeg.decode_jpeg(info["frames"][t]).astype(np.int64)
                    if px.ndim == 2:  # grayscale MJPEG frame
                        lumaq = 1000 * px
                    else:
                        lumaq = (299 * px[:, :, 0] + 587 * px[:, :, 1]
                                 + 114 * px[:, :, 2])
                    n = lumaq.size
                    sum_q = int(lumaq.sum())
                    sumsq_q = int((lumaq * lumaq).sum())
                    mean_raw = sum_q / 1000.0 / n
                    var = sumsq_q / 1000000.0 / n - mean_raw * mean_raw
                    std = math.sqrt(var if var > 0 else 0.0)
                    rows.append(
                        {"image_id": img, "frame_idx": t,
                         "mean_luma": round(mean_raw, 6),
                         "std_luma": round(std, 6)}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return videos.select("image_id", "bytes", "fmt").mapInPandas(
        gen, schema=VIDEO_STATS_SCHEMA
    )
