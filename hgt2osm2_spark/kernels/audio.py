"""Pure-Python WAV (RIFF/PCM) codec — the audio leg of the multimodal
surface.

WAV is a container of raw PCM frames; parsing it needs only struct +
numpy, so — like PNG (round 2) and baseline JPEG (round 3) — it
graduates from the honest stub set to a REAL decoder. The stdlib
``wave`` module doubles as an independent parser in tests (it reads
our bytes, we read its). mp3/webp/mp4/h264 stay stubbed: those are
genuinely codec-bound.

  decode_wav(data)  -> (samples float64 [n_frames, n_channels] in
                        [-1, 1], sample_rate)
                       Accepts PCM u8 / s16 / s24 / s32 and IEEE
                       float32/float64, any channel count, and skips
                       unknown RIFF chunks (LIST, fact, ...).
  encode_wav(samples_i16, rate) -> canonical 16-bit PCM RIFF bytes
                       (what the synthetic audio table stores).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n_frames,) or (n_frames, n_channels) int16 -> RIFF/WAVE bytes."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n_ch = samples.shape[1]
    data = samples.astype("<i2").tobytes()
    byte_rate = rate * n_ch * 2
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, byte_rate, n_ch * 2, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> (float64 [n_frames, n_channels] in [-1, 1],
    sample_rate). Integer PCM is scaled by its nominal full scale
    (2^(bits-1)); u8 is offset-binary per the spec."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt_tag = n_ch = rate = bits = None
    frames = None
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8: pos + 8 + clen]
        pos += 8 + clen + (clen & 1)          # chunks are word-aligned
        if cid == b"fmt ":
            fmt_tag, n_ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt_tag == 0xFFFE and clen >= 24:   # WAVE_FORMAT_EXTENSIBLE
                (fmt_tag,) = struct.unpack_from("<H", body, 24)
        elif cid == b"data":
            frames = body
    if fmt_tag is None or frames is None:
        raise ValueError("corrupt WAV: missing fmt/data chunk")
    if fmt_tag == 1:      # integer PCM
        if bits == 8:
            x = (np.frombuffer(frames, np.uint8).astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(frames, "<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(frames, np.uint8)
            raw = raw[: len(raw) // 3 * 3].reshape(-1, 3)
            v = (raw[:, 0].astype(np.int32)
                 | (raw[:, 1].astype(np.int32) << 8)
                 | (raw[:, 2].astype(np.int32) << 16))
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(frames, "<i4").astype(np.float64) / float(1 << 31)
        else:
            raise NotImplementedError(f"{bits}-bit integer PCM")
    elif fmt_tag == 3:    # IEEE float
        x = np.frombuffer(frames, "<f4" if bits == 32 else "<f8").astype(np.float64)
    else:
        raise NotImplementedError(f"WAV format tag {fmt_tag} (only PCM/float)")
    n_fr = x.size // n_ch
    return x[: n_fr * n_ch].reshape(n_fr, n_ch), int(rate)


def clip_features(samples: np.ndarray, rate: int) -> dict:
    """Deterministic per-clip features over the mono mix: duration,
    RMS, peak, zero-crossing rate — the audio analogue of the image
    histogram features (same Arrow batch shape at 100 TB)."""
    mono = samples.mean(axis=1)
    n = mono.size
    if n == 0:
        return {"duration_s": 0.0, "rms": 0.0, "peak": 0.0, "zcr": 0.0}
    zc = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    return {
        "duration_s": n / float(rate),
        "rms": float(np.sqrt(np.mean(mono * mono))),
        "peak": float(np.max(np.abs(mono))),
        "zcr": zc / float(n),
    }
