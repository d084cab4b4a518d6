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
