"""RIFF/WAVE PCM decoder + the decode_audio_batch mapInPandas surface.

WAVs are built in the test with stdlib ``wave`` (an independent writer the
product code never uses), so writer/parser bugs can't cancel.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import numpy as np
import pytest

from fairtracks_validator_spark.operators.multimodal import (
    _parse_wav,
    _wav_features,
    decode_audio_batch,
)


def make_wav(samples: np.ndarray, rate: int = 8000, sampwidth: int = 2) -> bytes:
    """samples: (n, ch) float in [-1, 1] → WAV bytes via stdlib wave."""
    n, ch = samples.shape
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        if sampwidth == 1:
            data = ((samples * 127) + 128).clip(0, 255).astype(np.uint8)
        elif sampwidth == 2:
            data = (samples * 32767).clip(-32768, 32767).astype("<i2")
        else:
            data = (samples * 2147483647).clip(
                -2147483648, 2147483647).astype("<i4")
        w.writeframes(data.reshape(-1).tobytes())
    return buf.getvalue()


def test_wav_16bit_roundtrip():
    t = np.arange(800) / 8000.0
    sig = np.stack([np.sin(2 * np.pi * 440 * t),
                    0.5 * np.sin(2 * np.pi * 220 * t)], axis=1)
    rate, got = _parse_wav(make_wav(sig, rate=8000, sampwidth=2))
    assert rate == 8000 and got.shape == (800, 2)
    assert np.abs(got - sig).max() < 1e-3  # 16-bit quantization bound


def test_wav_8_and_32bit():
    sig = np.linspace(-0.9, 0.9, 64).reshape(-1, 1)
    r8, g8 = _parse_wav(make_wav(sig, sampwidth=1))
    assert g8.shape == (64, 1) and np.abs(g8 - sig).max() < 2e-2
    r32, g32 = _parse_wav(make_wav(sig, sampwidth=4))
    assert np.abs(g32 - sig).max() < 1e-8


def test_wav_features_contract():
    sig = np.stack([np.ones(100) * 0.5, np.ones(100) * -0.5], axis=1)
    payload = make_wav(sig, rate=1000)
    rate, ch, n, dur, md5, feats = _wav_features(payload)
    assert (rate, ch, n) == (1000, 2, 100)
    assert dur == pytest.approx(0.1)
    assert md5 == hashlib.md5(payload).hexdigest()
    # mono mean of (+0.5, -0.5) channels ~ 0; channel-0 mean ~ +0.5
    assert feats[0] == pytest.approx(0.0, abs=1e-2)
    assert feats[6] == pytest.approx(0.5, abs=1e-2)
    assert len(feats) == 8


def test_wav_malformed():
    with pytest.raises(ValueError, match="not a RIFF"):
        _parse_wav(b"nope")
    # non-PCM format code rejected by name
    bad = bytearray(make_wav(np.zeros((4, 1))))
    idx = bad.find(b"fmt ")
    struct.pack_into("<H", bad, idx + 8, 3)  # IEEE float format code
    with pytest.raises(ValueError, match="format code"):
        _parse_wav(bytes(bad))
    # zero channels must be the documented ValueError, not ZeroDivisionError
    bad2 = bytearray(make_wav(np.zeros((4, 1))))
    idx2 = bad2.find(b"fmt ")
    struct.pack_into("<H", bad2, idx2 + 10, 0)  # n_channels = 0
    with pytest.raises(ValueError, match="channels"):
        _parse_wav(bytes(bad2))


def test_wav_spark_surface(spark):
    sig = np.sin(2 * np.pi * 100 * np.arange(400) / 4000.0).reshape(-1, 1)
    p1 = make_wav(sig, rate=4000)
    df = spark.createDataFrame(
        [(1, bytearray(p1)), (2, bytearray(b"ID3mp3fake")), (3, None)],
        "id LONG, payload BINARY",
    )
    ok = {r["id"]: r for r in
          decode_audio_batch(df.where("id = 1 or id = 3")).collect()}
    assert ok[1]["sample_rate"] == 4000 and ok[1]["n_samples"] == 400
    assert ok[1]["duration_s"] == pytest.approx(0.1)
    assert ok[1]["checksum"] == hashlib.md5(p1).hexdigest()
    assert ok[3]["checksum"] == "" and ok[3]["n_bytes"] == 0
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        decode_audio_batch(df.where("id = 2")).collect()

    # capture mode: the mp3 row becomes an error row, good rows unaffected
    cap = {r["id"]: r for r in
           decode_audio_batch(df, on_error="capture").collect()}
    assert cap[1]["error"] is None and cap[1]["sample_rate"] == 4000
    assert cap[2]["error"].startswith("NotImplementedError")
    assert cap[2]["sample_rate"] is None


def test_resize_on_error_capture(spark):
    from fairtracks_validator_spark.operators.multimodal import (
        resize_image_batch,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"P6\n2 2\n255\n" + bytes(12))),
         (2, bytearray(b"P6\n9 9\n255\nshort"))],
        "id LONG, payload BINARY",
    )
    out = {r["id"]: r for r in
           resize_image_batch(df, 2, 2, on_error="capture").collect()}
    assert out[1]["error"] is None and out[1]["payload"] is not None
    assert out[2]["error"].startswith("ValueError") and out[2]["payload"] is None
