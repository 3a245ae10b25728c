"""Minimal ISO-BMFF (MP4) container mux + demux for MJPEG video
tracks — pure Python, no external codec libraries.

Combined with kernels.jpeg this gives the engine a REAL end-to-end
MP4 video path: box-tree demux -> sample-table resolution
(stts/stsc/stsz/stco|co64) -> per-frame baseline-JPEG decode ->
features. The writer emits a spec-shaped file (ftyp, mdat, moov with
mvhd/trak/tkhd/mdia/mdhd/hdlr/minf/vmhd/dinf/stbl) that any standard
ISO-BMFF reader can parse; the reader walks the full box grammar
(64-bit largesize, size-0 to-EOF, nested containers) and resolves the
generic sample tables, so it demuxes real-world files too. The h264
BITSTREAM inside an avc1 track remains honestly undecodable here —
demux surfaces the codec fourcc and raw samples, pixel decode raises
for non-JPEG codecs (ops/multimodal).

Layout follows the public ISO/IEC 14496-12 base-media spec; MJPEG in
MP4 uses the QuickTime-style 'jpeg' VisualSampleEntry.
"""

from __future__ import annotations

import struct


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


def mux_mp4_mjpeg(frames: list[bytes], w: int, h: int, fps: int = 10) -> bytes:
    """Mux already-encoded JPEG frame payloads into an MP4 container
    (one video track, all samples in one chunk, constant frame
    duration). mdat precedes moov so chunk offsets are fixed."""
    if not frames:
        raise ValueError("mux_mp4_mjpeg: need at least one frame")
    n = len(frames)
    timescale = fps * 1000
    delta = 1000
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(frames))
    first_sample_off = len(ftyp) + 8  # mdat header

    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, duration
    ) + struct.pack(">IHH", 0x00010000, 0x0100, 0) + b"\x00" * 8
        + _UNITY_MATRIX + b"\x00" * 24 + struct.pack(">I", 2))

    tkhd = _full(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0, 0, 1, 0, duration
    ) + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
        + _UNITY_MATRIX + struct.pack(">II", w << 16, h << 16))

    mdhd = _full(b"mdhd", 0, 0, struct.pack(
        ">IIII", 0, 0, timescale, duration
    ) + struct.pack(">HH", 0x55C4, 0))  # language 'und'

    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"VideoHandler\x00")

    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)

    sample_entry = _box(b"jpeg", (
        b"\x00" * 6 + struct.pack(">H", 1)           # data_reference_index
        + struct.pack(">HH", 0, 0) + b"\x00" * 12     # predefined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)                        # frame_count
        + b"\x00" * 32                                # compressorname
        + struct.pack(">Hh", 24, -1)                  # depth, predefined
    ))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(f)) for f in frames))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, first_sample_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


_UNITY_MATRIX = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)

#: boxes that contain other boxes directly (no extra header fields)
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"dinf", b"stbl",
               b"edts", b"udta", b"mvex", b"moof", b"traf"}


def _iter_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        fourcc = data[pos + 4 : pos + 8]
        body_off = pos + 8
        if size == 1:
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body_off = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("mp4: malformed box size")
        yield fourcc, body_off, pos + size
        pos += size


def _find(data: bytes, path: list[bytes], start: int, end: int) -> tuple[int, int] | None:
    """Locate the first box at `path` (list of fourccs) -> (body_off, end)."""
    for fourcc, body, stop in _iter_boxes(data, start, end):
        if fourcc == path[0]:
            if len(path) == 1:
                return body, stop
            return _find(data, path[1:], body, stop)
    return None


def _u32s(data: bytes, off: int, n: int) -> list[int]:
    return list(struct.unpack(f">{n}I", data[off : off + 4 * n]))


def demux_mp4(data: bytes) -> dict:
    """Parse the first VIDEO track: returns {codec, w, h, timescale,
    duration, n_frames, frames: [bytes]} with per-sample payloads
    resolved through the generic stts/stsc/stsz/stco|co64 tables
    (works for any chunking layout, not just the writer's)."""
    if len(data) < 16:
        raise ValueError("mp4: truncated")
    moov = _find(data, [b"moov"], 0, len(data))
    if moov is None:
        raise ValueError("mp4: no moov box")

    for trak_cc, trak_body, trak_end in _iter_boxes(data, *moov):
        if trak_cc != b"trak":
            continue
        hdlr = _find(data, [b"mdia", b"hdlr"], trak_body, trak_end)
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find(data, [b"mdia", b"mdhd"], trak_body, trak_end)
        version = data[mdhd[0]]
        if version == 1:
            timescale, duration = struct.unpack(">IQ", data[mdhd[0] + 20 : mdhd[0] + 32])
        else:
            timescale, duration = struct.unpack(">II", data[mdhd[0] + 12 : mdhd[0] + 20])

        stbl = _find(data, [b"mdia", b"minf", b"stbl"], trak_body, trak_end)
        if stbl is None:
            raise ValueError("mp4: video track without stbl")

        stsd = _find(data, [b"stsd"], *stbl)
        entry_off = stsd[0] + 8  # fullbox header + entry_count
        codec = data[entry_off + 4 : entry_off + 8].decode("latin1")
        w, h = struct.unpack(">HH", data[entry_off + 8 + 24 : entry_off + 8 + 28])

        stsz = _find(data, [b"stsz"], *stbl)
        fixed, count = struct.unpack(">II", data[stsz[0] + 4 : stsz[0] + 12])
        sizes = [fixed] * count if fixed else _u32s(data, stsz[0] + 12, count)

        co = _find(data, [b"stco"], *stbl)
        if co is not None:
            (n_chunks,) = struct.unpack(">I", data[co[0] + 4 : co[0] + 8])
            offsets = _u32s(data, co[0] + 8, n_chunks)
        else:
            co = _find(data, [b"co64"], *stbl)
            if co is None:
                raise ValueError("mp4: no chunk offsets")
            (n_chunks,) = struct.unpack(">I", data[co[0] + 4 : co[0] + 8])
            offsets = list(struct.unpack(f">{n_chunks}Q", data[co[0] + 8 : co[0] + 8 + 8 * n_chunks]))

        stsc = _find(data, [b"stsc"], *stbl)
        (n_ent,) = struct.unpack(">I", data[stsc[0] + 4 : stsc[0] + 8])
        ent = [struct.unpack(">III", data[stsc[0] + 8 + 12 * i : stsc[0] + 20 + 12 * i])
               for i in range(n_ent)]  # (first_chunk, samples_per_chunk, sdidx)

        # expand samples-per-chunk runs across the chunk list
        frames: list[bytes] = []
        si = 0
        for ci in range(len(offsets)):
            spc = 0
            for j, (first, per, _sd) in enumerate(ent):
                last = ent[j + 1][0] - 1 if j + 1 < len(ent) else len(offsets)
                if first <= ci + 1 <= last:
                    spc = per
                    break
            off = offsets[ci]
            for _ in range(spc):
                if si >= len(sizes):
                    break
                frames.append(data[off : off + sizes[si]])
                off += sizes[si]
                si += 1
        if si != len(sizes):
            raise ValueError("mp4: sample table inconsistent")
        return {
            "codec": codec, "w": int(w), "h": int(h),
            "timescale": int(timescale), "duration": int(duration),
            "n_frames": len(frames), "frames": frames,
        }
    raise ValueError("mp4: no video track")
