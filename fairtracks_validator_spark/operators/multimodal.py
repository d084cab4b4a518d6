"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns next to typed metadata, exactly
like ``pages.html``. Decode / feature-extraction runs through ``mapInPandas``
— Arrow batches in, Arrow batches out, schema declared up front. PPM (P6)
decodes and resizes FOR REAL (pure-numpy codec, no external libs); jpeg/png/
audio kernels stay env-gated stubs because their codecs are not installed in
this container — the Spark-side contract is identical either way.

``decode_image_batch``: P6 payloads hit the real ``_ppm_decode`` kernel;
other formats raise ``NotImplementedError`` unless ``fake_decoder=True``
selects the deterministic fake (dimensions + checksum features derived from
the bytes) that exercises the full path in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

DECODED_SCHEMA = (
    "id long, n_bytes int, width int, height int, checksum string, "
    "features array<float>"
)


def _parse_ppm(payload: bytes):
    """Pure-numpy P6 (binary PPM) parser — a REAL codec with no external
    deps: header `P6 <w> <h> <maxval>` (comments allowed), then raw RGB.
    Returns (w, h, ndarray[h, w, 3] uint8). Raises ValueError on malformed
    input."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    need = w * h * 3
    raster = payload[pos : pos + need]
    if len(raster) < need:
        raise ValueError("truncated PPM raster")
    return w, h, np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def _ppm_decode(payload: bytes) -> tuple[int, int, str, list[float]]:
    """Real decode for PPM payloads: dimensions, md5 checksum, and an 8-dim
    feature vector (per-channel mean and std in [0,1], gray min, gray max)."""
    import hashlib

    import numpy as np

    w, h, px = _parse_ppm(payload)
    f = px.astype(np.float64) / 255.0
    gray = f.mean(axis=2)
    feats = (
        [float(f[..., c].mean()) for c in range(3)]
        + [float(f[..., c].std()) for c in range(3)]
        + [float(gray.min()), float(gray.max())]
    )
    return w, h, hashlib.md5(payload).hexdigest(), [round(x, 6) for x in feats]


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
        if payload.startswith(b"P6"):
            # PPM decodes for real (pure numpy — no external codec needed)
            return _ppm_decode(payload)
        if fake_decoder:
            return _fake_decode(payload)
        raise NotImplementedError(
            "jpeg/png/audio codecs are not installed in this environment "
            "(PPM decodes natively); pass fake_decoder=True for the "
            "deterministic test kernel"
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
        if payload.startswith(b"P6"):
            # real nearest-neighbour resample for PPM (pure numpy)
            import numpy as np

            w, h, px = _parse_ppm(payload)
            xi = np.minimum((np.arange(target_w) * w) // target_w, w - 1)
            yi = np.minimum((np.arange(target_h) * h) // target_h, h - 1)
            out = px[yi][:, xi]
            return (f"P6\n{target_w} {target_h}\n255\n".encode()
                    + out.tobytes())
        if fake_kernel:
            # deterministic stand-in: stride-sample the byte stream to the
            # target "pixel" count — stable for identical inputs
            n = max(target_w * target_h, 1)
            step = max(len(payload) // n, 1)
            return payload[::step][:n]
        raise NotImplementedError(
            "jpeg/png codecs are not installed in this environment (PPM "
            "resizes natively); pass fake_kernel=True for the deterministic "
            "test kernel"
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

    # empty/NULL payloads plan ZERO frames — the old greatest(...-1, 0)
    # floor emitted a phantom frame 0 for them (code-review r3)
    n_frames = F.coalesce(
        F.floor(F.length("payload") / F.lit(float(every_n))).cast("int"), F.lit(0)
    )
    idx = F.when(
        n_frames > 0, F.sequence(F.lit(0), n_frames - 1)
    ).otherwise(F.array().cast("array<int>"))
    return df.select(F.col("id"), F.explode(idx).alias("frame_index"))
