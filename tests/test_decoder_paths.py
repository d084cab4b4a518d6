"""Decoder-path routing (VERDICT r4 #5): PIL fast path vs stdlib codecs.

- without PIL: ``auto`` ≡ ``stdlib`` (same rows), ``pil`` fails at plan
  time with a named error;
- with PIL (skipped in this container): PNG rows are bit-identical across
  paths; JPEG width/height/checksum identical, features within the IDCT
  rounding tolerance documented on ``_pil_parse``.
"""

from __future__ import annotations

import numpy as np
import pytest

from fairtracks_validator_spark.operators.multimodal import (
    _encode_png,
    _pil_module,
    decode_image_batch,
    resize_image_batch,
)
from test_jpeg_codec import encode_jpeg


def _corpus(spark):
    rng = np.random.RandomState(11)
    rows = []
    for i in range(4):
        px = rng.randint(0, 256, size=(24 + i, 16 + i, 3), dtype=np.uint8)
        rows.append((2 * i, bytearray(_encode_png(px))))
        rows.append((2 * i + 1, bytearray(encode_jpeg(px))))
    return spark.createDataFrame(rows, "id long, payload binary")


def test_invalid_decoder_rejected(spark):
    df = _corpus(spark)
    with pytest.raises(ValueError, match="decoder must be"):
        decode_image_batch(df, decoder="nope")


@pytest.mark.skipif(_pil_module() is not None, reason="PIL installed")
def test_auto_falls_back_to_stdlib_without_pil(spark):
    df = _corpus(spark)
    auto = {r["id"]: r for r in decode_image_batch(df, decoder="auto").collect()}
    std = {r["id"]: r for r in decode_image_batch(df, decoder="stdlib").collect()}
    assert auto == std and len(auto) == 8
    with pytest.raises(RuntimeError, match="pil"):
        decode_image_batch(df, decoder="pil")
    with pytest.raises(RuntimeError, match="pil"):
        resize_image_batch(df, 8, 8, decoder="pil")


@pytest.mark.skipif(_pil_module() is None, reason="PIL not installed")
def test_pil_parity_with_stdlib(spark):
    df = _corpus(spark)
    pil = {r["id"]: r for r in decode_image_batch(df, decoder="pil").collect()}
    std = {r["id"]: r for r in decode_image_batch(df, decoder="stdlib").collect()}
    for i, p in pil.items():
        s = std[i]
        assert (p["width"], p["height"], p["checksum"]) == (
            s["width"], s["height"], s["checksum"],
        )
        if i % 2 == 0:  # PNG: lossless → bit-identical features
            assert p["features"] == s["features"]
        else:  # JPEG: IDCT rounding ±1/sample → features within 0.005
            assert np.allclose(p["features"], s["features"], atol=5e-3)
    # resize: decode path differs, resample+PNG re-encode shared — PNG
    # inputs must produce byte-identical outputs
    rp = {r["id"]: bytes(r["payload"])
          for r in resize_image_batch(df, 8, 8, decoder="pil").collect()}
    rs = {r["id"]: bytes(r["payload"])
          for r in resize_image_batch(df, 8, 8, decoder="stdlib").collect()}
    for i in rp:
        if i % 2 == 0:
            assert rp[i] == rs[i]


def test_max_pixels_gate_uniform_across_paths(spark):
    """The decompression-bomb gate fires from header dims BEFORE decode,
    identically on every decoder path (code-review r5: PIL's own global
    limit previously made 'auto' reject payloads 'stdlib' decoded fine)."""
    df = _corpus(spark)  # images are 24x16..27x19 = 384..513 px
    for decoder in ("auto", "stdlib"):
        # generous budget: everything decodes
        ok = decode_image_batch(df, decoder=decoder, max_pixels=10_000).collect()
        assert len(ok) == 8 and all(r["checksum"] for r in ok)
        # tiny budget: every row fails with the NAMED error, captured
        cap = decode_image_batch(
            df, decoder=decoder, max_pixels=100, on_error="capture"
        ).collect()
        assert len(cap) == 8
        assert all(
            r["error"] and "exceed max_pixels=100" in r["error"] for r in cap
        )
        # fail mode propagates the ValueError
        with pytest.raises(Exception, match="max_pixels"):
            decode_image_batch(df, decoder=decoder, max_pixels=100).collect()
    # resize honors the same gate
    cap = resize_image_batch(
        df, 8, 8, decoder="stdlib", max_pixels=100, on_error="capture"
    ).collect()
    assert all(r["error"] and "max_pixels" in r["error"] for r in cap)


def test_image_dims_header_sniff():
    """_image_dims reads dims from headers alone — PPM, PNG, JPEG."""
    from fairtracks_validator_spark.operators.multimodal import _image_dims

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(13, 21, 3), dtype=np.uint8)
    assert _image_dims(_encode_png(px)) == (21, 13)
    assert _image_dims(encode_jpeg(px)) == (21, 13)
    assert _image_dims(b"P6\n21 13\n255\n" + px.tobytes()) == (21, 13)
    assert _image_dims(b"\x00not an image") is None
    assert _image_dims(b"\xff\xd8\x00trunc") is None
