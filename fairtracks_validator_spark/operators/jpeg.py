"""Pure stdlib+numpy JPEG decoder (VERDICT r3 #5, r4; progressive r5).

Scope: sequential baseline DCT (SOF0/1) AND progressive DCT (SOF2 — DC
first/refine, AC spectral-selection first/refine with EOB runs, T.81 §G),
8-bit samples, Huffman entropy coding, 1-component (grayscale) or
3-component (YCbCr/JFIF) frames, any sampling factors up to 2×2 (4:4:4,
4:2:2, 4:2:0), restart markers, 0xFF00 byte stuffing. Arithmetic coding,
hierarchical frames, and 12-bit depth raise ``ValueError`` — named, not
silent. Real Common-Crawl image payloads are ~10-30% progressive, so SOF2
support is what keeps a 10^12-row multimodal pass from filling its capture
column with "unsupported frame type".

Everything here is from the public ITU-T T.81 spec: marker segments →
quant/Huffman tables → MCU-interleaved block decode (DC predict + AC
run-length; for SOF2, per-scan coefficient accumulation into zigzag-order
buffers) → dequantize → dezigzag → float64 IDCT → chroma upsample →
JFIF YCbCr→RGB. The IDCT is the separable orthonormal 8×8 DCT-III as two
matrix products — deterministic across platforms (float64 + round-half-up).

The kernel contract matches the PPM/PNG codecs in ``multimodal``:
``_parse_jpeg(payload) -> (w, h, ndarray[h, w, 3] uint8)``.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: scan index -> linear position in the 8x8 block
_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8x8 DCT basis: A[x, u] = c(u)/2 * cos((2x+1) u pi / 16)
_A = np.zeros((8, 8))
for _x in range(8):
    for _u in range(8):
        _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
        _A[_x, _u] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _build_huff(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """(code_length, code) -> symbol, per T.81 C.2 canonical assignment."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over the de-stuffed entropy-coded segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data, self.pos, self.bit = data, 0, 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit, self.pos = 0, self.pos + 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 sign extension of an n-bit magnitude."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _decode_block(br: _BitReader, dc_tab, ac_tab, qt: np.ndarray, pred: int):
    """One 8×8 block: DC diff + AC run-length → dequantized spatial pixels
    (before level shift). Returns (block[8,8] float64, new_dc_pred)."""
    coeffs = np.zeros(64, dtype=np.float64)
    t = br.decode(dc_tab)
    diff = _extend(br.receive(t), t)
    pred += diff
    coeffs[0] = pred * qt[0]
    k = 1
    while k < 64:
        rs = br.decode(ac_tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past end of block")
        coeffs[k] = _extend(br.receive(s), s) * qt[k]
        k += 1
    block = np.zeros(64, dtype=np.float64)
    block[_ZIGZAG] = coeffs
    return _A @ block.reshape(8, 8) @ _A.T, pred


def _split_scan(data: bytes) -> tuple[list[bytes], int]:
    """De-stuff the entropy-coded segment and split at restart markers.
    Returns (one de-stuffed bytes object per restart interval, offset of
    the next real marker) — the offset lets a progressive parser resume
    its marker loop after each scan."""
    parts, cur, i, n = [], bytearray(), 0, len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        m = data[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:  # stuffed FF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn: byte-align + new interval
            parts.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # next real marker (EOI or other) — scan ends
            break
    parts.append(bytes(cur))
    return parts, i


def _parse_jpeg(payload: bytes):
    """JPEG (baseline SOF0/1 or progressive SOF2) → (w, h,
    ndarray[h, w, 3] uint8). ValueError on malformed or out-of-scope
    (arithmetic/hierarchical/12-bit) input."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG payload (missing SOI)")
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None  # (h, w, [(cid, hsamp, vsamp, qt_id)])
    progressive = False
    prog = None  # _ProgState once the first SOF2 scan arrives
    restart_interval = 0
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte (T.81 B.1.1.2)
            i += 1
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        seg = payload[i + 4 : i + 2 + seglen]
        i += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if prec == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2")
                    p += 128
                qts[tid] = tbl.astype(np.float64)
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = seg[p + 17 : p + 17 + nv]
                (dc_tabs if cls == 0 else ac_tabs)[tid] = _build_huff(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG sample precision {prec}")
            if nc not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {nc}")
            comps = []
            for c in range(nc):
                cid, samp, qid = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0xF, qid))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type SOF{marker - 0xC0} "
                "(baseline SOF0/1 and progressive SOF2 supported)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if len(seg) < 4 or len(seg) < 4 + 2 * seg[0]:
                raise ValueError("truncated JPEG SOS header")
            ns = seg[0]
            scan_comps = []  # (cid, dc_tab_id, ac_tab_id) in scan order
            for c in range(ns):
                cid, tids = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cid, tids >> 4, tids & 0xF))
            if not progressive:
                # undefined table ids are malformed DATA → the module's
                # ValueError contract, not a KeyError deep in the scan loop
                for cid, d, a in scan_comps:
                    if d not in dc_tabs:
                        raise ValueError(f"JPEG scan references undefined DC table {d}")
                    if a not in ac_tabs:
                        raise ValueError(f"JPEG scan references undefined AC table {a}")
                for _cid, _hs, _vs, qid in frame[2]:
                    if qid not in qts:
                        raise ValueError(
                            f"JPEG component references undefined quant table {qid}"
                        )
                return _decode_scan(
                    payload[i:], frame,
                    {cid: (d, a) for cid, d, a in scan_comps},
                    qts, dc_tabs, ac_tabs, restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0xF
            if ss == 0 and ah == 0:
                # first DC pass reads Huffman codes; refinement passes and
                # AC scans don't touch the DC tables (T.81 G.1.2)
                for cid, d, _a in scan_comps:
                    if d not in dc_tabs:
                        raise ValueError(f"JPEG scan references undefined DC table {d}")
            elif ss > 0:
                for cid, _d, a in scan_comps:
                    if a not in ac_tabs:
                        raise ValueError(f"JPEG scan references undefined AC table {a}")
            if prog is None:
                prog = _ProgState(frame)
            consumed = prog.decode_scan(
                payload[i:], scan_comps, ss, se, ah, al,
                dc_tabs, ac_tabs, restart_interval,
            )
            i += consumed
        # APPn / COM / others: skipped
    if prog is not None:
        return prog.reconstruct(qts)
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(data, frame, scan_tabs, qts, dc_tabs, ac_tabs, dri):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("unsupported JPEG sampling factor > 2")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for cid, hs, vs, _qid in comps:
        planes[cid] = np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)

    intervals, _ = _split_scan(data)
    part = 0
    br = _BitReader(intervals[0])
    preds = {cid: 0 for cid, *_ in comps}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and n_mcu and n_mcu % dri == 0:
                part += 1  # restart: next interval, reset DC predictors
                if part >= len(intervals):
                    raise ValueError("missing JPEG restart interval")
                br = _BitReader(intervals[part])
                preds = {cid: 0 for cid, *_ in comps}
            for cid, hs, vs, qid in comps:
                dct, act = scan_tabs[cid]
                for by in range(vs):
                    for bx in range(hs):
                        block, preds[cid] = _decode_block(
                            br, dc_tabs[dct], ac_tabs[act], qts[qid], preds[cid]
                        )
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
            n_mcu += 1

    return _planes_to_rgb(planes, comps, hmax, vmax, w, h)


def _planes_to_rgb(planes, comps, hmax, vmax, w, h):
    """Level shift, upsample each component plane to full resolution, crop,
    and apply the JFIF YCbCr→RGB transform (grayscale replicates)."""
    full = []
    for cid, hs, vs, _qid in comps:
        p = planes[cid] + 128.0
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.floor(full[0] + 0.5).clip(0, 255).astype(np.uint8)
        return w, h, np.repeat(y[..., None], 3, axis=2)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return w, h, np.floor(rgb + 0.5).clip(0, 255).astype(np.uint8)


class _ProgState:
    """Coefficient accumulator for a progressive (SOF2) frame — T.81 §G.

    Each scan deposits bits of the quantized DCT coefficients; the image
    exists only after all scans, so coefficients live here in zigzag order
    (index k = scan position, like the per-block decode above) as int32,
    one (padded-blocks-high, padded-blocks-wide, 64) array per component.
    The padded grid covers interleaved DC scans (MCU-rounded); AC scans are
    non-interleaved by definition (T.81 G.1.1.1: ns must be 1 when Ss > 0)
    and walk the component's OWN ceil(dim/8) block grid.
    """

    def __init__(self, frame):
        h, w, comps = frame
        self.frame = frame
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        if self.hmax > 2 or self.vmax > 2:
            raise ValueError("unsupported JPEG sampling factor > 2")
        self.mcux = -(-w // (8 * self.hmax))
        self.mcuy = -(-h // (8 * self.vmax))
        self.coefs: dict[int, np.ndarray] = {}
        self.nblocks: dict[int, tuple[int, int]] = {}  # non-interleaved grid
        self.by_id = {}
        for cid, hs, vs, qid in comps:
            self.coefs[cid] = np.zeros(
                (self.mcuy * vs, self.mcux * hs, 64), dtype=np.int32
            )
            cw = -(-w * hs // self.hmax)
            ch = -(-h * vs // self.vmax)
            self.nblocks[cid] = (-(-ch // 8), -(-cw // 8))
            self.by_id[cid] = (hs, vs, qid)

    # ---- scan drivers -----------------------------------------------------

    def decode_scan(self, data, scan_comps, ss, se, ah, al,
                    dc_tabs, ac_tabs, dri) -> int:
        """Decode one SOS's entropy data into the coefficient buffers.
        Returns the number of payload bytes consumed."""
        intervals, consumed = _split_scan(data)
        if ss == 0:
            if se != 0:
                raise ValueError("progressive DC scan with Se != 0")
            self._dc_scan(intervals, scan_comps, ah, al, dc_tabs, dri)
        else:
            if len(scan_comps) != 1:
                raise ValueError("progressive AC scan must be single-component")
            if not (1 <= ss <= se <= 63):
                raise ValueError("invalid progressive spectral band")
            self._ac_scan(intervals, scan_comps[0], ss, se, ah, al,
                          ac_tabs, dri)
        return consumed

    def _units(self, scan_comps):
        """MCU walk order for a DC scan: interleaved (all scan components,
        sampling-factor blocks per MCU) or single-component (one block per
        MCU over the component's own grid) — T.81 A.2."""
        if len(scan_comps) > 1:
            units = []
            for my in range(self.mcuy):
                for mx in range(self.mcux):
                    mcu = []
                    for cid, dct, _act in scan_comps:
                        hs, vs, _ = self.by_id[cid]
                        for by in range(vs):
                            for bx in range(hs):
                                mcu.append(
                                    (cid, dct, my * vs + by, mx * hs + bx)
                                )
                    units.append(mcu)
            return units
        cid, dct, _act = scan_comps[0]
        bh, bw = self.nblocks[cid]
        return [[(cid, dct, by, bx)] for by in range(bh) for bx in range(bw)]

    def _dc_scan(self, intervals, scan_comps, ah, al, dc_tabs, dri):
        part, br = 0, _BitReader(intervals[0])
        preds = {cid: 0 for cid, *_ in scan_comps}
        for n_mcu, mcu in enumerate(self._units(scan_comps)):
            if dri and n_mcu and n_mcu % dri == 0:
                part += 1
                if part >= len(intervals):
                    raise ValueError("missing JPEG restart interval")
                br = _BitReader(intervals[part])
                preds = {cid: 0 for cid, *_ in scan_comps}
            for cid, dct, row, col in mcu:
                coef = self.coefs[cid][row, col]
                if ah == 0:  # first DC scan: full (shifted) magnitude
                    t = br.decode(dc_tabs[dct])
                    preds[cid] += _extend(br.receive(t), t)
                    coef[0] = preds[cid] << al
                else:  # refinement: one bit per block (G.1.2.1)
                    if br.read_bit():
                        coef[0] = int(coef[0]) | (1 << al)

    def _ac_scan(self, intervals, scan_comp, ss, se, ah, al, ac_tabs, dri):
        cid, _dct, act = scan_comp
        tab = ac_tabs[act]
        bh, bw = self.nblocks[cid]
        part, br = 0, _BitReader(intervals[0])
        eobrun = 0
        n_mcu = 0
        for by in range(bh):
            for bx in range(bw):
                if dri and n_mcu and n_mcu % dri == 0:
                    part += 1
                    if part >= len(intervals):
                        raise ValueError("missing JPEG restart interval")
                    br = _BitReader(intervals[part])
                    eobrun = 0
                n_mcu += 1
                coef = self.coefs[cid][by, bx]
                if ah == 0:
                    eobrun = self._ac_first(br, tab, coef, ss, se, al, eobrun)
                else:
                    eobrun = self._ac_refine(br, tab, coef, ss, se, al, eobrun)

    @staticmethod
    def _ac_first(br, tab, coef, ss, se, al, eobrun):
        """First scan of an AC band (G.1.2.2): run-length coded nonzero
        coefficients at approximation Al, with EOBn codes spanning blocks."""
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = br.decode(tab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) - 1  # EOBn: this block ends now,
                if r:                  # run covers the NEXT eobrun blocks
                    eobrun += br.receive(r)
                break
            k += r
            if k > se:
                raise ValueError("JPEG AC run past spectral band")
            coef[k] = _extend(br.receive(s), s) << al
            k += 1
        return eobrun

    @staticmethod
    def _ac_refine(br, tab, coef, ss, se, al, eobrun):
        """Refinement scan of an AC band (G.1.2.3): one correction bit per
        already-nonzero coefficient on the path, ±1<<Al for newly nonzero
        ones, EOB runs carrying correction bits to the band end."""
        p1, m1 = 1 << al, -1 << al

        def correct(z):
            c = int(coef[z])
            if br.read_bit() and (c & p1) == 0:
                coef[z] = c + (p1 if c >= 0 else m1)

        k = ss
        if eobrun == 0:
            while k <= se:
                rs = br.decode(tab)
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r != 15:  # EOBn: sweep to band end below
                        eobrun = 1 << r
                        if r:
                            eobrun += br.receive(r)
                        break
                    # ZRL: advance past 16 zero-history coefficients
                elif s == 1:
                    val = p1 if br.read_bit() else m1
                else:
                    raise ValueError("invalid JPEG refinement magnitude")
                while k <= se:
                    if coef[k] != 0:
                        correct(k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    coef[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                if coef[k] != 0:
                    correct(k)
                k += 1
            eobrun -= 1
        return eobrun

    # ---- reconstruction ---------------------------------------------------

    def reconstruct(self, qts):
        h, w, comps = self.frame
        planes = {}
        for cid, hs, vs, qid in comps:
            grid = self.coefs[cid]
            bh, bw = grid.shape[0], grid.shape[1]
            if qid not in qts:
                raise ValueError(
                    f"JPEG component references undefined quant table {qid}"
                )
            qt = qts[qid]
            blocks = grid.reshape(-1, 64).astype(np.float64) * qt
            nat = np.zeros_like(blocks)
            nat[:, _ZIGZAG] = blocks
            nat = nat.reshape(-1, 8, 8)
            spatial = np.einsum("xu,nuv,yv->nxy", _A, nat, _A)
            planes[cid] = (
                spatial.reshape(bh, bw, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(bh * 8, bw * 8)
            )
        return _planes_to_rgb(planes, comps, self.hmax, self.vmax, w, h)
