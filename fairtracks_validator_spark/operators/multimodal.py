"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns next to typed metadata, exactly
like ``pages.html``. Decode / feature-extraction runs through ``mapInPandas``
— Arrow batches in, Arrow batches out, schema declared up front — so the
Spark-side contract (partitioning, batch shape, output schema) is real and
tested even though the actual codecs are not installed in this container.

``decode_image_batch`` is the REAL plumbing with a STUB kernel: by default it
raises ``NotImplementedError`` (no PIL/libjpeg here); with
``fake_decoder=True`` it produces a deterministic fake decode (dimensions +
checksum features derived from the bytes) so tests exercise the full path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

DECODED_SCHEMA = (
    "id long, n_bytes int, width int, height int, checksum string, "
    "features array<float>"
)


def _fake_decode(payload: bytes) -> tuple[int, int, str, list[float]]:
    """Deterministic stand-in for a real image decoder: derives dimensions
    and an 8-dim feature vector from the payload bytes alone."""
    import hashlib

    h = hashlib.md5(payload).hexdigest()
    w = 16 + int(h[:4], 16) % 1024
    ht = 16 + int(h[4:8], 16) % 1024
    feats = [int(h[i * 2 : i * 2 + 2], 16) / 255.0 for i in range(8)]
    return w, ht, h, feats


def decode_image_batch(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    fake_decoder: bool = False,
) -> DataFrame:
    """Decode a binary column into typed features via mapInPandas.

    Real decoders (PIL / ffmpeg / torchaudio) plug into ``kernel`` — the
    Arrow plumbing, batch iteration, and output schema stay identical.
    """

    def kernel(payload: bytes):
        if fake_decoder:
            return _fake_decode(payload)
        raise NotImplementedError(
            "image/audio codecs are not installed in this environment; "
            "pass fake_decoder=True for the deterministic test kernel"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "id": pdf[id_col].astype("int64"),
                "n_bytes": pdf[payload_col].map(lambda b: len(b) if b is not None else 0),
            }
            decoded = pdf[payload_col].map(
                lambda b: kernel(bytes(b)) if b is not None else (0, 0, "", [])
            )
            out["width"] = decoded.map(lambda d: d[0])
            out["height"] = decoded.map(lambda d: d[1])
            out["checksum"] = decoded.map(lambda d: d[2])
            out["features"] = decoded.map(lambda d: d[3])
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(decode, DECODED_SCHEMA)


RESIZED_SCHEMA = "id long, width int, height int, payload binary"


def resize_image_batch(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "id",
    payload_col: str = "payload",
    fake_kernel: bool = False,
) -> DataFrame:
    """Resize a binary image column via mapInPandas (same contract as
    :func:`decode_image_batch`: real Arrow plumbing + output schema, codec
    kernel stubbed). The fake kernel emits a deterministic byte-stride
    downsample so tests can assert batch shape, schema, and determinism."""

    def kernel(payload: bytes) -> bytes:
        if fake_kernel:
            # deterministic stand-in: stride-sample the byte stream to the
            # target "pixel" count — stable for identical inputs
            n = max(target_w * target_h, 1)
            step = max(len(payload) // n, 1)
            return payload[::step][:n]
        raise NotImplementedError(
            "image codecs are not installed in this environment; "
            "pass fake_kernel=True for the deterministic test kernel"
        )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "width": target_w,
                    "height": target_h,
                    "payload": pdf[payload_col].map(
                        lambda b: kernel(bytes(b)) if b is not None else None
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(resize, RESIZED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling *plan* for video payloads: emits (id, frame_index) rows
    without decoding — the decode itself is the stubbed kernel above."""
    from pyspark.sql import functions as F

    return df.select(
        F.col("id"),
        F.explode(
            F.sequence(F.lit(0), F.greatest(
                (F.length("payload") / every_n).cast("int") - 1, F.lit(0)))
        ).alias("frame_index"),
    )
