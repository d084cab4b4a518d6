"""Baseline-JPEG decoder vs an independent test-side encoder.

The test encoder implements T.81 forward: RGB→YCbCr, optional 2×2 chroma
downsample, FDCT, quantize, zigzag, canonical-Huffman entropy coding, byte
stuffing, restart markers — written from the spec, sharing no code with the
decoder, so bugs can't cancel. With all-ones quant tables a flat-color
image round-trips EXACTLY; random images round-trip within the DCT
rounding bound.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fairtracks_validator_spark.operators.jpeg import _ZIGZAG, _parse_jpeg

# orthonormal DCT basis (same public formula; independent derivation path)
_B = np.array([[0.5 * ((1 / np.sqrt(2)) if u == 0 else 1.0)
                * np.cos((2 * x + 1) * u * np.pi / 16.0)
                for u in range(8)] for x in range(8)])


def _enc_table(symbols):
    """Canonical Huffman table with symbols at code lengths 9/10 (≤128 per
    length keeps each BITS byte valid; never produces the reserved all-ones
    code). Returns (bits, vals, {sym: (code, len)})."""
    vals = sorted(symbols)
    bits = [0] * 16
    first = min(len(vals), 128)
    bits[8], bits[9] = first, len(vals) - first
    enc, code, k = {}, 0, 0
    for length in (9, 10):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return bits, vals, enc


class _Writer:
    def __init__(self):
        self.buf, self.acc, self.n = bytearray(), 0, 0

    def put(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self):
        while self.n:
            self.put(1, 1)  # pad with 1-bits per spec


def _cat(v):
    return int(abs(v)).bit_length()


def _mag(v, n):
    return v if v >= 0 else v + (1 << n) - 1


def _encode_plane_block(w, block, dc_enc, ac_enc, pred):
    f = _B.T @ (block - 128.0) @ _B
    # scan order: q[k] = F_linear[_ZIGZAG[k]]
    q = np.rint(f).astype(np.int64).reshape(-1)[_ZIGZAG]
    dc = int(q[0])
    diff = dc - pred
    n = _cat(diff)
    w.put(*dc_enc[n])
    if n:
        w.put(_mag(diff, n), n)
    run = 0
    last_nz = max([k for k in range(1, 64) if q[k]] or [0])
    for k in range(1, last_nz + 1):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            w.put(*ac_enc[0xF0])
            run -= 16
        s = _cat(v)
        w.put(*ac_enc[(run << 4) | s])
        w.put(_mag(v, s), s)
        run = 0
    if last_nz < 63:
        w.put(*ac_enc[0x00])  # EOB
    return dc


def encode_jpeg(rgb: np.ndarray, subsample=False, gray=False, dri=0) -> bytes:
    """Minimal spec-driven baseline encoder (all-ones quant tables)."""
    h, w_, _ = rgb.shape
    r, g, b = (rgb[..., c].astype(np.float64) for c in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    if gray:
        comps = [(1, 1, 1, [y])]
    elif subsample:
        # 4:2:0 — chroma = 2x2 mean; pad planes to MCU multiples
        def ds(p):
            ph = -(-p.shape[0] // 2) * 2
            pw = -(-p.shape[1] // 2) * 2
            pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), "edge")
            return (pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2]
                    + pp[1::2, 1::2]) / 4.0

        comps = [(1, 2, 2, [y]), (2, 1, 1, [ds(cb)]), (3, 1, 1, [ds(cr)])]
    else:
        comps = [(1, 1, 1, [y]), (2, 1, 1, [cb]), (3, 1, 1, [cr])]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = -(-w_ // (8 * hmax)), -(-h // (8 * vmax))
    padded = {}
    for cid, hs, vs, (plane,) in comps:
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        padded[cid] = np.pad(
            plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), "edge"
        )

    dc_bits, dc_vals, dc_enc = _enc_table(range(12))
    ac_bits, ac_vals, ac_enc = _enc_table(range(256))

    def chunk(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += chunk(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT id0, all ones
    sof = bytes([8]) + struct.pack(">HH", h, w_) + bytes([len(comps)])
    for cid, hs, vs, _p in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += chunk(0xC0, sof)
    out += chunk(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += chunk(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    if dri:
        out += chunk(0xDD, struct.pack(">H", dri))
    sos = bytes([len(comps)])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00])  # dc table 0, ac table 0
    sos += bytes([0, 63, 0])
    out += chunk(0xDA, sos)

    wtr = _Writer()
    preds = {cid: 0 for cid, *_ in comps}
    n_mcu, rst = 0, 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and n_mcu and n_mcu % dri == 0:
                wtr.flush()
                out += wtr.buf
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                wtr = _Writer()
                preds = {cid: 0 for cid, *_ in comps}
            for cid, hs, vs, _p in comps:
                for by in range(vs):
                    for bx in range(hs):
                        y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                        blk = padded[cid][y0 : y0 + 8, x0 : x0 + 8]
                        preds[cid] = _encode_plane_block(
                            wtr, blk, dc_enc, ac_enc, preds[cid]
                        )
            n_mcu += 1
    wtr.flush()
    out += wtr.buf
    out += b"\xff\xd9"
    return bytes(out)


def _rng(h, w, seed):
    return np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3), dtype=np.uint8
    ).astype(np.uint8)


def test_jpeg_flat_color_exact():
    """Flat color: the only nonzero coefficient is DC, which quantizes with
    zero loss at all-ones tables — decode must be EXACT."""
    img = np.full((16, 24, 3), 0, np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 90, 160, 200
    w, h, got = _parse_jpeg(encode_jpeg(img))
    assert (w, h) == (24, 16)
    assert np.array_equal(got, img)


def test_jpeg_444_roundtrip_tolerance():
    img = _rng(24, 17, seed=3)  # non-multiple-of-8 width exercises padding
    w, h, got = _parse_jpeg(encode_jpeg(img))
    assert (w, h) == (17, 24)
    err = np.abs(got.astype(int) - img.astype(int)).max()
    assert err <= 3  # DCT quantize + two float color transforms


def test_jpeg_420_subsampled():
    """4:2:0: flat-chroma image decodes exactly (downsample of a constant
    is the constant); luma detail survives within tolerance."""
    img = np.zeros((32, 32, 3), np.uint8)
    gray = np.arange(32 * 32).reshape(32, 32) % 200 + 20
    for c in range(3):
        img[..., c] = gray  # R=G=B -> chroma exactly 128 everywhere
    w, h, got = _parse_jpeg(encode_jpeg(img, subsample=True))
    assert (w, h) == (32, 32)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 3


def test_jpeg_grayscale():
    img = _rng(16, 16, seed=5)
    mono = img[..., 0]
    rgb = np.repeat(mono[..., None], 3, axis=2)
    w, h, got = _parse_jpeg(encode_jpeg(rgb, gray=True))
    # grayscale decodes replicated across channels; Y of an R=G=B image is
    # the channel value itself
    assert np.abs(got.astype(int) - rgb.astype(int)).max() <= 2


def test_jpeg_restart_markers():
    img = _rng(32, 16, seed=7)
    plain = _parse_jpeg(encode_jpeg(img))[2]
    with_rst = _parse_jpeg(encode_jpeg(img, dri=1))[2]
    assert np.array_equal(plain, with_rst)


def test_jpeg_malformed_and_unsupported():
    img = np.full((8, 8, 3), 128, np.uint8)
    good = encode_jpeg(img)
    with pytest.raises(ValueError, match="SOI"):
        _parse_jpeg(b"nope")
    with pytest.raises(ValueError, match="truncated|no SOS|marker"):
        _parse_jpeg(good[:40])
    prog = bytearray(good)
    idx = prog.find(bytes([0xFF, 0xC0]))
    prog[idx + 1] = 0xC2  # SOF2 + a baseline SOS (Ss=0,Se=63) = malformed
    with pytest.raises(ValueError, match="progressive DC scan"):
        _parse_jpeg(bytes(prog))
    arith = bytearray(good)
    arith[idx + 1] = 0xC9  # arithmetic coding: named unsupported
    with pytest.raises(ValueError, match="SOF9"):
        _parse_jpeg(bytes(arith))


def test_jpeg_spark_surface(spark):
    """Planted JPEGs through the real (non-fake) mapInPandas kernels:
    decode yields exact dims + md5; resize re-decodes to the nearest-
    neighbour resample of the DECODED pixels, byte-exact (PNG output)."""
    import hashlib

    from fairtracks_validator_spark.operators.multimodal import (
        _parse_png,
        decode_image_batch,
        resize_image_batch,
    )

    img1, img2 = _rng(24, 16, seed=11), _rng(16, 24, seed=12)
    p1, p2 = encode_jpeg(img1), encode_jpeg(img2, subsample=True)
    df = spark.createDataFrame(
        [(1, bytearray(p1)), (2, bytearray(p2))], "id LONG, payload BINARY"
    )
    dec = {r["id"]: r for r in decode_image_batch(df).collect()}
    assert (dec[1]["width"], dec[1]["height"]) == (16, 24)
    assert (dec[2]["width"], dec[2]["height"]) == (24, 16)
    assert dec[1]["checksum"] == hashlib.md5(p1).hexdigest()
    assert len(dec[2]["features"]) == 8

    out = {r["id"]: r for r in resize_image_batch(df, 5, 7).collect()}
    for i, payload in ((1, p1), (2, p2)):
        px = _parse_jpeg(payload)[2]
        sh, sw = px.shape[0], px.shape[1]
        xi = np.minimum((np.arange(5) * sw) // 5, sw - 1)
        yi = np.minimum((np.arange(7) * sh) // 7, sh - 1)
        w, h, got = _parse_png(bytes(out[i]["payload"]))
        assert (w, h) == (5, 7)
        assert np.array_equal(got, px[yi][:, xi])


def test_undefined_table_ids_raise_valueerror():
    """Scans referencing never-defined Huffman/quant tables are malformed
    DATA → the module's ValueError contract, not a KeyError (code-review
    r5: capture mode must record a named decode error)."""
    import numpy as np

    from fairtracks_validator_spark.operators.jpeg import _parse_jpeg

    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    payload = bytearray(encode_jpeg(px))
    # find SOS (FFDA) and patch the first component's Td/Ta nibbles to
    # table ids 7/7, which no DHT in this stream defines
    i = payload.find(b"\xff\xda")
    assert i > 0
    # FFDA len(2) ns cid tids -> tids at offset i+6
    payload[i + 6] = 0x77
    with pytest.raises(ValueError, match="undefined (DC|AC) table"):
        _parse_jpeg(bytes(payload))
