"""Pure-stdlib PNG codec: decode (filters 0-4, color types 0/2/3/4/6),
resize round-trip, and the Spark mapInPandas surface over planted PNGs.

The test builds its PNGs with an independent forward-filter implementation
(straight from the PNG spec), so decoder bugs can't cancel encoder bugs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from fairtracks_validator_spark.operators.multimodal import (
    _encode_png,
    _parse_png,
    _png_decode,
    _rgb_features,
    decode_image_batch,
    resize_image_batch,
)

SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def build_png(px: np.ndarray, color_type: int, filters: list[int],
              plte: np.ndarray | None = None) -> bytes:
    """Forward-filter encoder per the PNG spec — the test's independent
    oracle. ``px`` is (h, w, channels) uint8; ``filters[y]`` picks the
    filter type of scanline y."""
    h, w, ch = px.shape
    prev = np.zeros(w * ch, dtype=np.int32)
    raster = bytearray()
    for y in range(h):
        cur = px[y].reshape(-1).astype(np.int32)
        ft = filters[y % len(filters)]
        out = np.empty_like(cur)
        for i in range(len(cur)):
            left = int(cur[i - ch]) if i >= ch else 0
            up = int(prev[i])
            ul = int(prev[i - ch]) if i >= ch else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) >> 1,
                    4: _paeth(left, up, ul)}[ft]
            out[i] = (int(cur[i]) - pred) & 0xFF
        raster.append(ft)
        raster.extend(out.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        body += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    return body + _chunk(b"IDAT", zlib.compress(bytes(raster))) + _chunk(b"IEND", b"")


def _rng_px(h, w, ch, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8).astype(np.uint8)


def test_png_rgb_every_filter_type():
    """Each scanline uses a different filter (0,1,2,3,4 cycling): decode
    must be pixel-exact against the pre-filter raster."""
    px = _rng_px(10, 7, 3)
    payload = build_png(px, 2, [0, 1, 2, 3, 4])
    w, h, got = _parse_png(payload)
    assert (w, h) == (7, 10)
    assert np.array_equal(got, px)


def test_png_color_types():
    # gray (0): replicated to 3 channels
    g = _rng_px(5, 6, 1, seed=1)
    w, h, got = _parse_png(build_png(g, 0, [0, 1, 2, 3, 4]))
    assert np.array_equal(got, np.repeat(g, 3, axis=2))
    # gray+alpha (4): alpha dropped
    ga = _rng_px(4, 5, 2, seed=2)
    w, h, got = _parse_png(build_png(ga, 4, [4, 3, 2, 1]))
    assert np.array_equal(got, np.repeat(ga[..., :1], 3, axis=2))
    # RGBA (6): alpha dropped
    rgba = _rng_px(6, 4, 4, seed=3)
    w, h, got = _parse_png(build_png(rgba, 6, [1, 4]))
    assert np.array_equal(got, rgba[..., :3])
    # palette (3)
    plte = _rng_px(1, 16, 3, seed=4).reshape(16, 3)
    idx = _rng_px(5, 5, 1, seed=5) % 16
    w, h, got = _parse_png(build_png(idx, 3, [0, 2], plte=plte))
    assert np.array_equal(got, plte[idx[..., 0]])


def test_png_encoder_decoder_roundtrip():
    px = _rng_px(9, 11, 3, seed=6)
    assert np.array_equal(_parse_png(_encode_png(px))[2], px)


def test_png_malformed_raises():
    px = _rng_px(4, 4, 3)
    good = build_png(px, 2, [0])
    with pytest.raises(ValueError, match="not a PNG"):
        _parse_png(b"nope" + good)
    with pytest.raises(ValueError, match="truncated|missing"):
        _parse_png(good[: len(good) // 2])
    with pytest.raises(ValueError):  # interlaced flagged unsupported
        bad = bytearray(good)
        bad[8 + 8 + 12] = 1  # IHDR interlace byte
        _parse_png(bytes(bad))
    # 16-bit depth unsupported, error names the reason
    with pytest.raises(ValueError, match="unsupported PNG shape"):
        bad = bytearray(good)
        bad[8 + 8 + 8] = 16  # IHDR bit-depth byte
        _parse_png(bytes(bad))


def test_png_decode_features_match_ppm_discipline():
    """_png_decode returns the same feature contract as PPM: payload md5 +
    8-dim stats computed from the decoded pixels."""
    px = _rng_px(8, 8, 3, seed=8)
    payload = build_png(px, 2, [0, 1, 2, 3, 4])
    got = _png_decode(payload)
    assert got == _rgb_features(payload, 8, 8, px)


def test_decode_on_error_capture(spark):
    """on_error='capture': corrupt payloads among good ones yield error
    rows instead of killing the job — one row per input either way."""
    px = _rng_px(6, 6, 3)
    good = build_png(px, 2, [0])
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(good[: len(good) // 2])),
         (3, bytearray(b"ID3mp3fake")), (4, None)],
        "id LONG, payload BINARY",
    )
    out = {r["id"]: r for r in
           decode_image_batch(df, on_error="capture").collect()}
    assert out[1]["error"] is None and (out[1]["width"], out[1]["height"]) == (6, 6)
    assert out[2]["error"].startswith("ValueError") and out[2]["width"] is None
    assert out[3]["error"].startswith("NotImplementedError")
    # exception classes BEYOND the codecs' own ValueError must also be
    # captured (code-review r4): corrupt deflate raises zlib.error
    import struct as _st
    import zlib as _zl
    bad_idat = (SIG + _chunk(b"IHDR", _st.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
                + _chunk(b"IDAT", b"not-deflate-data") + _chunk(b"IEND", b""))
    try:
        _zl.decompress(b"not-deflate-data")
    except Exception as e:
        assert not isinstance(e, ValueError)  # precondition: distinct class
    df2 = spark.createDataFrame([(9, bytearray(bad_idat))], "id LONG, payload BINARY")
    row = decode_image_batch(df2, on_error="capture").collect()[0]
    assert row["error"] is not None and row["width"] is None
    assert out[4]["error"] is None and out[4]["n_bytes"] == 0
    with pytest.raises(Exception):  # default fail mode still propagates
        decode_image_batch(df).collect()
    with pytest.raises(ValueError, match="on_error"):
        decode_image_batch(df, on_error="nope")


def test_png_spark_decode_and_resize(spark):
    """The real (non-fake) kernels over planted PNGs through mapInPandas:
    decode yields exact dims/checksum, resize output re-decodes byte-exactly
    to the numpy nearest-neighbour resample."""
    import hashlib

    px1 = _rng_px(12, 9, 3, seed=9)
    px2 = _rng_px(6, 15, 3, seed=10)
    p1, p2 = build_png(px1, 2, [0, 1, 2, 3, 4]), build_png(px2, 2, [4, 2])
    df = spark.createDataFrame(
        [(1, bytearray(p1)), (2, bytearray(p2))], "id LONG, payload BINARY"
    )
    dec = {r["id"]: r for r in decode_image_batch(df).collect()}
    assert (dec[1]["width"], dec[1]["height"]) == (9, 12)
    assert dec[1]["checksum"] == hashlib.md5(p1).hexdigest()
    assert dec[2]["checksum"] == hashlib.md5(p2).hexdigest()
    assert len(dec[1]["features"]) == 8

    out = {r["id"]: r for r in resize_image_batch(df, 4, 5).collect()}
    for i, px in ((1, px1), (2, px2)):
        w, h, got = _parse_png(bytes(out[i]["payload"]))
        assert (w, h) == (4, 5)
        sh, sw = px.shape[0], px.shape[1]
        xi = np.minimum((np.arange(4) * sw) // 4, sw - 1)
        yi = np.minimum((np.arange(5) * sh) // 5, sh - 1)
        assert np.array_equal(got, px[yi][:, xi])
