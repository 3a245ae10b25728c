"""kernels.audio: pure-Python RIFF/PCM WAV codec (round 3).

The stdlib ``wave`` module is the independent parser: it must read our
bytes, and our decoder must read its."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from hgt2osm2_spark.kernels import audio


def _clip(n=4000, ch=1, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    out = np.zeros((n, ch))
    for c in range(ch):
        out[:, c] = 9000 * np.sin(2 * np.pi * rng.uniform(100, 2000) * t)
    return np.rint(out).astype(np.int16)


@pytest.mark.parametrize("ch", [1, 2])
def test_roundtrip_s16_exact(ch):
    pcm = _clip(ch=ch, seed=ch)
    got, rate = audio.decode_wav(audio.encode_wav(pcm, 16000))
    assert rate == 16000 and got.shape == pcm.shape
    assert np.array_equal(np.rint(got * 32768.0).astype(np.int16), pcm)


def test_stdlib_wave_reads_our_bytes():
    pcm = _clip(ch=2, seed=3)
    data = audio.encode_wav(pcm, 22050)
    with wave.open(io.BytesIO(data)) as wf:
        assert (wf.getnchannels(), wf.getframerate(), wf.getsampwidth()) == (2, 22050, 2)
        raw = wf.readframes(wf.getnframes())
    assert np.array_equal(np.frombuffer(raw, "<i2").reshape(-1, 2), pcm)


def test_we_read_stdlib_wave_bytes_u8():
    rng = np.random.default_rng(5)
    u8 = rng.integers(0, 256, 1000).astype(np.uint8)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(8000)
        wf.writeframes(u8.tobytes())
    got, rate = audio.decode_wav(buf.getvalue())
    assert rate == 8000
    assert np.array_equal(got[:, 0], (u8.astype(np.float64) - 128.0) / 128.0)


def test_s24_and_f32_paths():
    # hand-build a 24-bit PCM file
    vals = np.array([0, 1, -1, (1 << 23) - 1, -(1 << 23)], dtype=np.int64)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    data = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(raw)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    got, _ = audio.decode_wav(data)
    assert np.allclose(got[:, 0] * (1 << 23), vals)

    f = np.array([0.5, -0.25, 1.0], dtype=np.float32)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    raw = f.tobytes()
    data = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(raw)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    got, _ = audio.decode_wav(data)
    assert np.array_equal(got[:, 0], f.astype(np.float64))


def test_unknown_chunks_skipped_and_garbage_rejected():
    pcm = _clip(seed=9)
    data = bytearray(audio.encode_wav(pcm, 16000))
    # splice a LIST chunk between fmt and data
    insert = b"LIST" + struct.pack("<I", 4) + b"INFO"
    fmt_end = 12 + 8 + 16
    data = bytes(data[:fmt_end]) + insert + bytes(data[fmt_end:])
    got, rate = audio.decode_wav(data)
    assert np.array_equal(np.rint(got * 32768.0).astype(np.int16), pcm)
    with pytest.raises(ValueError):
        audio.decode_wav(b"not riff at all..")


def test_clip_features_scalar_twin():
    pcm = _clip(ch=2, seed=11)
    samples, rate = audio.decode_wav(audio.encode_wav(pcm, 16000))
    f = audio.clip_features(samples, rate)
    mono = samples.mean(axis=1)
    assert f["duration_s"] == len(mono) / 16000.0
    assert abs(f["rms"] - float(np.sqrt((mono ** 2).mean()))) < 1e-15
    assert f["peak"] == float(np.abs(mono).max())
    assert 0.0 < f["zcr"] < 1.0
