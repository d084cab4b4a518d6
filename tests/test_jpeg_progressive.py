"""Progressive-JPEG decoder vs an independent test-side encoder.

The encoder here writes T.81 §G progressive streams — DC first/refine
scans, AC spectral-selection first scans with cross-block EOB runs and
ZRL, AC refinement scans with correction bits, newly-nonzero ±1
placement and per-block EOB sweeps — from the spec, sharing no code with
the decoder. It emits the SAME quantized coefficients the baseline
encoder in ``test_jpeg_codec`` would (all-ones quant tables), so
``_parse_jpeg(progressive) == _parse_jpeg(baseline)`` must hold exactly:
a progressive stream is just a re-ordering of the same data.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fairtracks_validator_spark.operators.jpeg import _ZIGZAG, _parse_jpeg
from tests.test_jpeg_codec import _B, _Writer, _cat, _enc_table, _mag, encode_jpeg


def _components(rgb, subsample, gray):
    """(cid, hs, vs, zigzag-coefficient grid [bh_pad, bw_pad, 64]) per
    component — identical padding/downsample math to the baseline encoder."""
    h, w_, _ = rgb.shape
    r, g, b = (rgb[..., c].astype(np.float64) for c in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    if gray:
        comps = [(1, 1, 1, y)]
    elif subsample:
        def ds(p):
            ph, pw = -(-p.shape[0] // 2) * 2, -(-p.shape[1] // 2) * 2
            pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), "edge")
            return (pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2]
                    + pp[1::2, 1::2]) / 4.0
        comps = [(1, 2, 2, y), (2, 1, 1, ds(cb)), (3, 1, 1, ds(cr))]
    else:
        comps = [(1, 1, 1, y), (2, 1, 1, cb), (3, 1, 1, cr)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = -(-w_ // (8 * hmax)), -(-h // (8 * vmax))
    out = []
    for cid, hs, vs, plane in comps:
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        p = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                   "edge")
        bh, bw = ph // 8, pw // 8
        grid = np.zeros((bh, bw, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                f = _B.T @ (blk - 128.0) @ _B
                grid[by, bx] = np.rint(f).reshape(-1)[_ZIGZAG]
        out.append((cid, hs, vs, grid))
    return out, hmax, vmax, mcux, mcuy


def _sshift(v: int, al: int) -> int:
    """AC point transform: magnitude shift toward zero (G.1.2.2)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


class _ScanWriter:
    """One entropy-coded progressive scan, with restart support."""

    def __init__(self, out: bytearray, dri: int):
        self.out, self.dri = out, dri
        self.w = _Writer()
        self.n_mcu, self.rst = 0, 0

    def unit_boundary(self, flush_cb=None):
        if self.dri and self.n_mcu and self.n_mcu % self.dri == 0:
            if flush_cb:
                flush_cb()
            self.w.flush()
            self.out += self.w.buf
            self.out += bytes([0xFF, 0xD0 + self.rst])
            self.rst = (self.rst + 1) % 8
            self.w = _Writer()
            return True
        return False

    def finish(self, flush_cb=None):
        if flush_cb:
            flush_cb()
        self.w.flush()
        self.out += self.w.buf


def _dc_scan(out, comps, mcux, mcuy, al, refine, dc_enc, dri):
    sw = _ScanWriter(out, dri)
    preds = {cid: 0 for cid, *_ in comps}
    interleaved = len(comps) > 1
    units = []
    if interleaved:
        for my in range(mcuy):
            for mx in range(mcux):
                mcu = []
                for cid, hs, vs, grid in comps:
                    for by in range(vs):
                        for bx in range(hs):
                            mcu.append((cid, grid, my * vs + by, mx * hs + bx))
                units.append(mcu)
    else:
        cid, hs, vs, grid = comps[0]
        units = [[(cid, grid, by, bx)]
                 for by in range(grid.shape[0]) for bx in range(grid.shape[1])]
    for mcu in units:
        if sw.unit_boundary():
            preds = {cid: 0 for cid, *_ in comps}
        sw.n_mcu += 1
        for cid, grid, row, col in mcu:
            dc = int(grid[row, col, 0])
            if refine:
                sw.w.put((dc >> al) & 1, 1)
            else:
                v = dc >> al  # arithmetic shift (G.1.2.1)
                diff = v - preds[cid]
                preds[cid] = v
                n = _cat(diff)
                sw.w.put(*dc_enc[n])
                if n:
                    sw.w.put(_mag(diff, n), n)
    sw.finish()


def _ac_first_scan(out, grid, ss, se, al, ac_enc, dri):
    sw = _ScanWriter(out, dri)
    state = {"eobrun": 0}

    def flush():
        n = state["eobrun"]
        if n:
            r = n.bit_length() - 1
            sw.w.put(*ac_enc[r << 4])
            if r:
                sw.w.put(n - (1 << r), r)
            state["eobrun"] = 0

    bh, bw = grid.shape[0], grid.shape[1]
    for by in range(bh):
        for bx in range(bw):
            sw.unit_boundary(flush)
            sw.n_mcu += 1
            q = [_sshift(int(grid[by, bx, k]), al) for k in range(64)]
            nz = [k for k in range(ss, se + 1) if q[k]]
            if not nz:
                state["eobrun"] += 1
                if state["eobrun"] == 0x7FFF:
                    flush()
                continue
            flush()
            run = 0
            for k in range(ss, nz[-1] + 1):
                v = q[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    sw.w.put(*ac_enc[0xF0])
                    run -= 16
                s = _cat(v)
                sw.w.put(*ac_enc[(run << 4) | s])
                sw.w.put(_mag(v, s), s)
                run = 0
            if nz[-1] < se:
                state["eobrun"] += 1
    sw.finish(flush)


def _ac_refine_scan(out, grid, ss, se, al, ac_enc, dri):
    """Mirror of the decoder walk (G.1.2.3): history coefficients emit one
    correction bit wherever the walk crosses them; newly-nonzero emit a
    (run, 1) code + sign; trailing zeros emit a single-block EOB whose
    sweep carries the remaining correction bits."""
    sw = _ScanWriter(out, dri)
    bh, bw = grid.shape[0], grid.shape[1]
    for by in range(bh):
        for bx in range(bw):
            sw.unit_boundary()
            sw.n_mcu += 1
            q = [int(grid[by, bx, k]) for k in range(64)]

            def hist(k):  # nonzero after previous (coarser) scans
                return (abs(q[k]) >> (al + 1)) != 0

            def newbit(k):  # becomes nonzero in THIS scan
                return (abs(q[k]) >> al) == 1

            k = ss
            while k <= se:
                j, r, probe = None, 0, k
                while probe <= se:
                    if hist(probe):
                        probe += 1
                        continue
                    if newbit(probe):
                        j = probe
                        break
                    r += 1
                    probe += 1
                if j is None:
                    if any(True for p in range(k, se + 1)):
                        sw.w.put(*ac_enc[0x00])  # EOB (run of 1 block)
                        for p in range(k, se + 1):
                            if hist(p):
                                sw.w.put((abs(q[p]) >> al) & 1, 1)
                    k = se + 1
                    break
                while r > 15:
                    sw.w.put(*ac_enc[0xF0])  # ZRL
                    cnt = 0
                    while cnt < 16:
                        if hist(k):
                            sw.w.put((abs(q[k]) >> al) & 1, 1)
                        else:
                            cnt += 1
                        k += 1
                    r -= 16
                sw.w.put(*ac_enc[(r << 4) | 1])
                sw.w.put(1 if q[j] > 0 else 0, 1)
                while k < j:
                    if hist(k):
                        sw.w.put((abs(q[k]) >> al) & 1, 1)
                    k += 1
                k = j + 1
    sw.finish()


def encode_jpeg_progressive(rgb, subsample=False, gray=False, dri=0) -> bytes:
    """Spec-driven SOF2 encoder (all-ones quant tables): DC Al=1→0, then
    per component AC bands (1,5) and (6,63) at Al=1, refined to Al=0."""
    h, w_, _ = rgb.shape
    comps, hmax, vmax, mcux, mcuy = _components(rgb, subsample, gray)
    dc_bits, dc_vals, dc_enc = _enc_table(range(12))
    ac_bits, ac_vals, ac_enc = _enc_table(range(256))

    def chunk(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += chunk(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = bytes([8]) + struct.pack(">HH", h, w_) + bytes([len(comps)])
    for cid, hs, vs, _g in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += chunk(0xC2, sof)  # SOF2: progressive
    out += chunk(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += chunk(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    if dri:
        out += chunk(0xDD, struct.pack(">H", dri))

    def sos(scan_comps, ss, se, ah, al):
        body = bytes([len(scan_comps)])
        for cid in scan_comps:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        out.extend(chunk(0xDA, body))

    all_ids = [c[0] for c in comps]
    sos(all_ids, 0, 0, 0, 1)
    _dc_scan(out, comps, mcux, mcuy, 1, False, dc_enc, dri)
    sos(all_ids, 0, 0, 1, 0)
    _dc_scan(out, comps, mcux, mcuy, 0, True, dc_enc, dri)
    for cid, hs, vs, grid in comps:
        # AC scans walk the component's own ceil(dim/8) grid
        cw, ch = -(-w_ * hs // hmax), -(-h * vs // vmax)
        own = grid[: -(-ch // 8), : -(-cw // 8)]
        for ss, se in ((1, 5), (6, 63)):
            sos([cid], ss, se, 0, 1)
            _ac_first_scan(out, own, ss, se, 1, ac_enc, dri)
        for ss, se in ((1, 5), (6, 63)):
            sos([cid], ss, se, 1, 0)
            _ac_refine_scan(out, own, ss, se, 0, ac_enc, dri)
    out += b"\xff\xd9"
    return bytes(out)


def _rng(h, w, seed):
    return np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3), dtype=np.uint8)


def _assert_matches_baseline(img, **kw):
    wb, hb, base = _parse_jpeg(encode_jpeg(img, **kw))
    wp, hp, prog = _parse_jpeg(encode_jpeg_progressive(img, **kw))
    assert (wb, hb) == (wp, hp)
    assert np.array_equal(base, prog), (
        np.abs(base.astype(int) - prog.astype(int)).max())


def test_progressive_flat_color_exact():
    img = np.zeros((16, 24, 3), np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 90, 160, 200
    w, h, got = _parse_jpeg(encode_jpeg_progressive(img))
    assert (w, h) == (24, 16)
    assert np.array_equal(got, img)


def test_progressive_equals_baseline_444():
    _assert_matches_baseline(_rng(24, 17, seed=3))  # padding exercised


def test_progressive_equals_baseline_420():
    _assert_matches_baseline(_rng(32, 24, seed=9), subsample=True)


def test_progressive_equals_baseline_gray():
    _assert_matches_baseline(_rng(16, 16, seed=5), gray=True)


def test_progressive_sparse_bands_eob_runs():
    """Flat regions → all-zero AC bands → multi-block EOB runs and long
    zero runs (ZRL) in the first scans; a few sharp pixels keep some
    blocks dense so runs break mid-scan."""
    img = np.full((48, 48, 3), 77, np.uint8)
    img[5, 5], img[30, 41], img[41, 7] = (255, 0, 0), (0, 255, 0), (0, 0, 255)
    _assert_matches_baseline(img)


def test_progressive_restart_markers():
    img = _rng(32, 16, seed=7)
    plain = _parse_jpeg(encode_jpeg_progressive(img))[2]
    with_rst = _parse_jpeg(encode_jpeg_progressive(img, dri=2))[2]
    assert np.array_equal(plain, with_rst)


def test_progressive_malformed():
    img = np.full((8, 8, 3), 128, np.uint8)
    good = encode_jpeg_progressive(img)
    with pytest.raises(ValueError, match="truncated|marker|interval|Huffman"):
        _parse_jpeg(good[: len(good) - 30])
    # arithmetic-coded frames stay a named error
    bad = bytearray(good)
    idx = bad.find(bytes([0xFF, 0xC2]))
    bad[idx + 1] = 0xC9
    with pytest.raises(ValueError, match="SOF9"):
        _parse_jpeg(bytes(bad))


def test_progressive_spark_surface(spark):
    """A progressive payload decodes through the real mapInPandas kernel —
    the capture column stays empty where r4 would have reported
    'unsupported frame type SOF2'."""
    from fairtracks_validator_spark.operators.multimodal import (
        decode_image_batch,
    )

    img = _rng(24, 16, seed=11)
    p = encode_jpeg_progressive(img)
    df = spark.createDataFrame([(1, bytearray(p))], "id LONG, payload BINARY")
    row = decode_image_batch(df, on_error="capture").collect()[0]
    assert row["error"] is None
    assert (row["width"], row["height"]) == (16, 24)
