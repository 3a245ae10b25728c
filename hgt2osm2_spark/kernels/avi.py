"""Minimal RIFF/AVI container mux + demux for MJPEG video streams —
pure Python, no external codec libraries.

Combined with kernels.jpeg (baseline-sequential JPEG, ImageIO-validated
in round 3) this gives the engine a REAL end-to-end video path: AVI
container demux -> per-frame JPEG decode -> features, honoring the
engine's decoded-pixel PSNR>=40dB contract on lossy frames. The layout
follows the public Microsoft RIFF AVI file reference (avih / strh /
strf(BITMAPINFOHEADER) / movi / idx1); only the structures the demuxer
needs are written — enough that the produced files are well-formed for
any standard AVI reader.

Reference analogue: the reference renders its raster outputs through a
managed image API (Program.cs:242-265); here the container plumbing is
hand-rolled because no imaging/AV library exists in this environment.

Demux is intentionally tolerant: frames may live directly in the 'movi'
LIST or inside nested 'rec ' LISTs, and both compressed ('00dc') and
uncompressed ('00db') stream-0 chunks are accepted. The optional idx1
index is written but never required for reading.
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    # RIFF chunks are word-aligned: odd payloads carry one pad byte that
    # is NOT counted in the stored size
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(frames: list[bytes], w: int, h: int, fps: int = 10) -> bytes:
    """Mux already-encoded JPEG frame payloads into an AVI container."""
    if not frames:
        raise ValueError("encode_avi_mjpeg: need at least one frame")
    max_frame = max(len(f) for f in frames)
    usec_per_frame = 1_000_000 // fps

    avih = struct.pack(
        "<14I",
        usec_per_frame,
        max_frame * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        len(frames),
        0,  # dwInitialFrames
        1,  # dwStreams
        max_frame,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<10I4h",
            0, 0, 0,  # flags, prio+lang, initial frames
            1, fps,  # dwScale / dwRate -> frame rate
            0, len(frames),
            max_frame,
            0xFFFFFFFF,  # dwQuality: default
            0,  # dwSampleSize: 0 = varying
            0, 0, w, h,  # rcFrame
        )
    )
    # BITMAPINFOHEADER with biCompression = 'MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b"movi"
    idx_entries = []
    for f in frames:
        # idx1 offsets are relative to the start of 'movi' (the fourcc)
        idx_entries.append((len(movi_body) - 4, len(f)))
        movi_body += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_body)

    idx1 = b"".join(
        b"00dc" + struct.pack("<3I", 0x10, off, size)  # AVIIF_KEYFRAME
        for off, size in idx_entries
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking word-aligned
    RIFF chunks in data[start:end)."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = pos + 8
        if payload + size > end:
            raise ValueError(
                f"avi: chunk {fourcc!r} at {pos} overruns its parent "
                f"({payload + size} > {end})"
            )
        yield fourcc, payload, size
        pos = payload + size + (size % 2)


def demux_avi(data: bytes) -> dict:
    """Parse an AVI container; return
    ``{"w", "h", "fps", "n_frames", "frames": [bytes, ...]}``.

    Frames are the raw stream-0 payloads in file order ('00dc'/'00db',
    including inside nested 'rec ' LISTs). Raises ValueError on a
    malformed container — callers quarantine, the engine never guesses.
    """
    try:
        return _demux_avi(data)
    except (IndexError, struct.error) as e:  # truncated structures
        raise ValueError(f"avi: truncated or malformed container ({e})")


def _demux_avi(data: bytes) -> dict:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("avi: not a RIFF/AVI container")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_size, len(data))

    info = {"w": 0, "h": 0, "fps": 0, "n_frames": 0, "frames": []}

    def walk(start: int, stop: int) -> None:
        for fourcc, p, size in _iter_chunks(data, start, stop):
            if fourcc == b"LIST":
                ltype = data[p : p + 4]
                if ltype in (b"hdrl", b"movi", b"rec ", b"strl"):
                    walk(p + 4, p + size)
            elif fourcc == b"avih":
                if size < 40:
                    raise ValueError(f"avi: avih chunk too short ({size} bytes)")
                fields = struct.unpack_from("<10I", data, p)
                info["fps"] = 1_000_000 // fields[0] if fields[0] else 0
                info["n_frames"] = fields[4]
                info["w"], info["h"] = fields[8], fields[9]
            elif fourcc in (b"00dc", b"00db"):
                info["frames"].append(bytes(data[p : p + size]))

    walk(12, end)
    if info["w"] == 0 or info["h"] == 0:
        raise ValueError("avi: missing avih header")
    if info["n_frames"] != len(info["frames"]):
        raise ValueError(
            f"avi: header declares {info['n_frames']} frames, "
            f"found {len(info['frames'])}"
        )
    return info
