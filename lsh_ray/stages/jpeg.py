"""Baseline JPEG (ITU-T T.81 / JFIF) codec in pure numpy + stdlib.

Closes the multimodal codec boundary for images: web-crawl JPEG
payloads decode natively with no external library. The decoder covers
baseline sequential DCT (SOF0): any valid DQT/DHT the stream declares,
1-component grayscale and 3-component YCbCr with 4:4:4 or 4:2:0
sampling, restart intervals (DRI/RSTn), FF-stuffed entropy data; it
rejects progressive (SOF2), arithmetic coding, 12-bit precision and
truncated payloads with ValueError. Entropy decoding is the spec's
canonical mincode/maxcode walk (per-bit Python — bounded by the small
per-actor batch sizes the binary stage uses); dequantize + inverse
zigzag + IDCT run vectorized over all blocks of a component at once
(one einsum against the orthonormal DCT-II basis).

The encoder is a valid-but-unoptimized baseline JFIF writer used as
the test-fixture generator (the reference analog: synthetic inputs for
decode plumbing): Annex-K quantization tables, FIXED-LENGTH canonical
Huffman tables built in code (12 DC categories at 4 bits, the 162
(run, size) AC symbols at 8 bits — a valid prefix code any conformant
decoder accepts, chosen over transcribing the optional Annex-K default
tables), optional 4:2:0 subsampling, restart-interval emission.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------- constants ----

# Annex K.1/K.2 quantization tables (quality ~50), natural row order
_QT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.uint16)
_QT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.uint16)


def _zigzag_order() -> np.ndarray:
    """Flat indices (row*8+col) in zigzag scan order, generated from the
    diagonal-walk definition instead of a transcribed table."""
    out = []
    for s in range(15):
        rng = range(s + 1)
        rows = rng if s % 2 else reversed(rng)
        for r in rows:
            c = s - r
            if r < 8 and c < 8:
                out.append(r * 8 + c)
    return np.array(out, dtype=np.int64)


_ZIGZAG = _zigzag_order()          # zigzag position -> natural index
_UNZIGZAG = np.argsort(_ZIGZAG)    # natural index -> zigzag position


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis A: FDCT = A @ x @ A.T."""
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    a = np.cos((2 * n + 1) * k * np.pi / 16) / 2.0
    a[0] /= np.sqrt(2.0)
    return a


_A = _dct_basis()


# ----------------------------------------------------- Huffman tables ----

class _HuffDecoder:
    """Canonical Huffman decoder from a DHT (BITS, HUFFVAL) pair —
    the spec's mincode/maxcode/valptr DECODE procedure."""

    def __init__(self, bits: list[int], huffval: bytes):
        if len(bits) != 16 or sum(bits) != len(huffval):
            raise ValueError("corrupt DHT segment")
        self.huffval = huffval
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        code = br.read_bit()
        ln = 1
        while code > self.maxcode[ln]:
            ln += 1
            if ln > 16:
                raise ValueError("invalid JPEG Huffman code")
            code = (code << 1) | br.read_bit()
        return self.huffval[self.valptr[ln] + code - self.mincode[ln]]


def _fixed_length_table(symbols: list[int], length: int
                        ) -> tuple[list[int], bytes]:
    """All ``symbols`` at one code ``length``: a valid canonical prefix
    code when len(symbols) < 2**length (the all-ones code stays
    unused, as T.81's table-building procedure guarantees)."""
    if len(symbols) >= (1 << length):
        raise ValueError("too many symbols for fixed code length")
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bits, bytes(symbols)


_DC_SYMBOLS = list(range(12))                       # categories 0..11
_AC_SYMBOLS = [0x00, 0xF0] + [                      # EOB, ZRL,
    (r << 4) | s for r in range(16) for s in range(1, 11)]  # (run, size)
_ENC_DC = _fixed_length_table(_DC_SYMBOLS, 4)
_ENC_AC = _fixed_length_table(_AC_SYMBOLS, 8)


def _codes_for(bits: list[int], huffval: bytes) -> dict[int, tuple[int, int]]:
    """(BITS, HUFFVAL) -> {symbol: (code, length)} for encoding."""
    out: dict[int, tuple[int, int]] = {}
    code, i = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[huffval[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return out


# --------------------------------------------------------- bit reader ----

class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00
    unstuffing; unexpected markers raise ValueError (truncation or
    corruption), restart markers are consumed only via ``restart()``."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.nbits = 0
        self.acc = 0

    def _fill(self) -> None:
        b = self.buf
        if self.pos >= len(b):
            raise ValueError("truncated JPEG entropy data")
        byte = b[self.pos]
        if byte == 0xFF:
            if self.pos + 1 >= len(b):
                raise ValueError("truncated JPEG entropy data")
            nxt = b[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} in entropy data")
        else:
            self.pos += 1
        # mask to the live bits: an unmasked Python-int accumulator
        # grows to the whole entropy stream and turns decode O(N^2)
        self.acc = ((self.acc & ((1 << self.nbits) - 1)) << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def _skip_stuffed_fill(self) -> None:
        # 1-padding can produce a literal 0xFF byte, which the writer
        # stuffs as FF00; consume any such pairs before a real marker
        b = self.buf
        while self.pos + 1 < len(b) and b[self.pos] == 0xFF \
                and b[self.pos + 1] == 0x00:
            self.pos += 2

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.nbits = 0
        self.acc = 0
        self._skip_stuffed_fill()
        b = self.buf
        if self.pos + 2 > len(b) or b[self.pos] != 0xFF \
                or not (0xD0 <= b[self.pos + 1] <= 0xD7):
            raise ValueError("missing JPEG restart marker")
        self.pos += 2

    def at_marker_end(self) -> int:
        """Byte-align; return position (the next marker starts here)."""
        self.nbits = 0
        self._skip_stuffed_fill()
        return self.pos


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map a t-bit magnitude to its signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


# ------------------------------------------------------------ decoder ----

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (H, W, 3) uint8 RGB (grayscale tripled)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None          # (h, w, [(cid, hs, vs, tq)])
    restart_interval = 0
    planes: dict = {}

    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG marker stream")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad the gap
        # before a marker code — skip to the LAST 0xFF of the run
        while pos + 2 <= len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:                      # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            # standalone markers (TEM, RSTn outside a scan, stray SOI)
            # carry no length field — advance past the two marker bytes
            pos += 2
            continue
        if pos + 4 > len(payload):
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4: pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:                      # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                n = 64 * (2 if prec else 1)
                if p + 1 + n > len(seg):
                    raise ValueError("truncated DQT")
                raw = np.frombuffer(
                    seg[p + 1: p + 1 + n],
                    dtype=">u2" if prec else np.uint8).astype(np.int32)
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = raw                # stored in zigzag order
                qt[tid] = tbl.reshape(8, 8)
                p += 1 + n
        elif marker == 0xC4:                    # DHT
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1: p + 17])
                n = sum(bits)
                vals = seg[p + 17: p + 17 + n]
                if len(vals) != n:
                    raise ValueError("truncated DHT")
                dec = _HuffDecoder(bits, bytes(vals))
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential JPEG (SOF0/1) supported")
        elif marker == 0xDD:                    # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:                    # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = struct.unpack_from(">BB", seg, 1 + 2 * i)
                scan.append((cs, tt >> 4, tt & 0xF))
            # a baseline file may carry one interleaved scan OR several
            # non-interleaved (single-component) scans — merge them
            scan_planes, pos = _decode_scan(
                payload, pos + 2 + seglen, frame, scan, qt,
                huff_dc, huff_ac, restart_interval)
            planes.update(scan_planes)
            continue
        pos += 2 + seglen

    if not planes or frame is None:
        raise ValueError("JPEG missing SOS scan")
    for cid, _hs, _vs, _tq in frame[2]:
        if cid not in planes:
            raise ValueError(
                "JPEG scans do not cover every frame component")
    return _planes_to_rgb(planes, frame)


def _decode_scan(buf: bytes, pos: int, frame, scan, qt,
                 huff_dc, huff_ac, restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError("JPEG scan references unknown component")
        cid, hs, vs, tq = by_id[cs]
        if td not in huff_dc or ta not in huff_ac or tq not in qt:
            raise ValueError("JPEG scan references missing table")
        order.append((cid, hs, vs, qt[tq], huff_dc[td], huff_ac[ta]))

    # coefficient stores: (n_blocks_y, n_blocks_x, 64) per component
    coeffs = {cid: np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32)
              for cid, hs, vs, _q, _d, _a in order}
    pred = {cid: 0 for cid, *_ in order}
    br = _BitReader(buf, pos)

    def decode_block(blk: np.ndarray, cid: int, hdc: _HuffDecoder,
                     hac: _HuffDecoder) -> None:
        t = hdc.decode(br)
        if t > 11:
            raise ValueError("invalid JPEG DC category")
        diff = _extend(br.receive(t), t)
        pred[cid] += diff
        blk[0] = pred[cid]
        k = 1
        while k < 64:
            rs = hac.decode(br)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:        # ZRL: 16 zeros
                    k += 16
                    continue
                break              # EOB
            k += r
            if k > 63:
                raise ValueError("JPEG AC index overflow")
            blk[k] = _extend(br.receive(s), s)
            k += 1

    def maybe_restart(m: int) -> None:
        if restart_interval and m and m % restart_interval == 0:
            br.restart()
            for cid in pred:
                pred[cid] = 0

    if len(order) > 1:                         # interleaved MCU walk
        for m in range(mcux * mcuy):
            maybe_restart(m)
            my, mx = divmod(m, mcux)
            for cid, hs, vs, _q, hdc, hac in order:
                store = coeffs[cid]
                for v in range(vs):
                    for hh in range(hs):
                        decode_block(store[my * vs + v, mx * hs + hh],
                                     cid, hdc, hac)
    else:
        # non-interleaved scan (T.81 A.2.2): the data-unit walk is the
        # COMPONENT's own block raster, not the MCU grid
        cid, hs, vs, _q, hdc, hac = order[0]
        store = coeffs[cid]
        comp_w = -((-w * hs) // hmax)          # ceil(w*hs/hmax)
        comp_h = -((-h * vs) // vmax)
        bx = -((-comp_w) // 8)                 # ceil(comp_w/8)
        by = -((-comp_h) // 8)
        for m in range(bx * by):
            maybe_restart(m)
            my, mx = divmod(m, bx)
            decode_block(store[my, mx], cid, hdc, hac)

    planes = {}
    for cid, hs, vs, q, _d, _a in order:
        zz = coeffs[cid]                        # (..., 64) zigzag order
        nat = np.zeros_like(zz)
        nat[..., _ZIGZAG] = zz                  # -> natural order
        blocks = nat.reshape(zz.shape[0], zz.shape[1], 8, 8)
        deq = blocks * q[None, None]
        # IDCT all blocks at once: x = A.T @ S @ A
        px = np.einsum("ab,yxbc,cd->yxad", _A.T, deq.astype(np.float64),
                       _A)
        px = np.clip(np.round(px) + 128, 0, 255).astype(np.uint8)
        # blocks -> plane
        plane = px.transpose(0, 2, 1, 3).reshape(
            zz.shape[0] * 8, zz.shape[1] * 8)
        planes[cid] = (plane, hs, vs)
    return planes, br.at_marker_end()


def _planes_to_rgb(planes, frame) -> np.ndarray:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for cid, hs, vs, _tq in comps:
        plane, _, _ = planes[cid]
        if hs != hmax or vs != vmax:            # upsample (nearest)
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                              hmax // hs, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.repeat(full[0][:, :, None], 3, axis=2)
    if len(full) != 3:
        raise ValueError("JPEG component count not 1 or 3")
    y = full[0].astype(np.float64)
    cb = full[1].astype(np.float64) - 128.0
    cr = full[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0,
                   255).astype(np.uint8)


# ------------------------------------------------------------ encoder ----

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:                   # byte stuffing
                self.out.append(0x00)
        # keep only the live bits (unbounded int => O(N^2) encode)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)    # pad with 1-bits


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_component_block(bw: _BitWriter, blk: np.ndarray, pred: int,
                            dc_codes, ac_codes) -> int:
    zz = blk.reshape(64)[_ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    nz = np.flatnonzero(zz[1:])
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]
        bw.write(code, ln)
    return dc


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) float plane (level-shifted) -> (by, bx, 8, 8) int32
    quantized DCT coefficients, all blocks at once."""
    hh, ww = plane.shape
    blocks = plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
    s = np.einsum("ab,yxbc,cd->yxad", _A, blocks, _A.T)
    return np.round(s / q[None, None]).astype(np.int32)


def encode_jpeg(img: np.ndarray, subsample: bool = False,
                restart_interval: int = 0,
                interleaved: bool = True) -> bytes:
    """(H, W, 3) uint8 RGB -> baseline JFIF bytes (4:4:4, or 4:2:0
    with ``subsample=True``). ``interleaved=False`` writes three
    single-component scans (T.81 A.2.2 non-interleaved order) instead
    of one interleaved scan."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_jpeg expects (H, W, 3) RGB")
    f = img.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] \
        + 0.5 * f[:, :, 2] + 128.0
    cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] \
        - 0.081312 * f[:, :, 2] + 128.0

    hs_y = vs_y = 2 if subsample else 1
    mcu_w, mcu_h = 8 * hs_y, 8 * vs_y
    ph = -(-h // mcu_h) * mcu_h
    pw = -(-w // mcu_w) * mcu_w

    def pad(p):
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

    y = pad(y)
    cb = pad(cb)
    cr = pad(cr)
    if subsample:
        cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    qy = _QT_LUMA.astype(np.float64)
    qc = _QT_CHROMA.astype(np.float64)
    cy = _fdct_quant(y - 128.0, qy)
    ccb = _fdct_quant(cb - 128.0, qc)
    ccr = _fdct_quant(cr - 128.0, qc)

    dc_codes = _codes_for(*_ENC_DC)
    ac_codes = _codes_for(*_ENC_AC)
    mcux = pw // mcu_w
    mcuy = ph // mcu_h

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    if interleaved:
        bw = _BitWriter()
        pred = {"y": 0, "cb": 0, "cr": 0}
        rst = 0
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                pred = {"y": 0, "cb": 0, "cr": 0}
            my, mx = divmod(m, mcux)
            for v in range(vs_y):
                for hh2 in range(hs_y):
                    pred["y"] = _encode_component_block(
                        bw, cy[my * vs_y + v, mx * hs_y + hh2],
                        pred["y"], dc_codes, ac_codes)
            pred["cb"] = _encode_component_block(
                bw, ccb[my, mx], pred["cb"], dc_codes, ac_codes)
            pred["cr"] = _encode_component_block(
                bw, ccr[my, mx], pred["cr"], dc_codes, ac_codes)
        bw.flush()
        scans = [seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00,
                                  0, 63, 0])) + bytes(bw.out)]
    else:
        # one scan per component; the data-unit walk covers exactly
        # ceil(comp_dim/8) blocks (NOT the MCU-padded raster)
        scans = []
        for comp_id, coef, hs, vs in ((1, cy, hs_y, vs_y),
                                      (2, ccb, 1, 1), (3, ccr, 1, 1)):
            comp_w = -((-w * hs) // hs_y)
            comp_h = -((-h * vs) // vs_y)
            bx = -((-comp_w) // 8)
            by = -((-comp_h) // 8)
            bw = _BitWriter()
            p = 0
            rst = 0
            for m in range(bx * by):
                if restart_interval and m \
                        and m % restart_interval == 0:
                    bw.flush()
                    bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
                    rst += 1
                    p = 0
                my, mx = divmod(m, bx)
                p = _encode_component_block(bw, coef[my, mx], p,
                                            dc_codes, ac_codes)
            bw.flush()
            scans.append(seg(0xDA, bytes([1, comp_id, 0x00, 0, 63, 0]))
                         + bytes(bw.out))

    def dqt(tid: int, q: np.ndarray) -> bytes:
        zz = q.reshape(64)[_ZIGZAG].astype(np.uint8)
        return seg(0xDB, bytes([tid]) + zz.tobytes())

    def dht(tc: int, th: int, table) -> bytes:
        bits, vals = table
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + vals)

    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, (hs_y << 4) | vs_y, 0,
                       2, 0x11, 1,
                       3, 0x11, 1]))
    dri = seg(0xDD, struct.pack(">H", restart_interval)) \
        if restart_interval else b""
    return (b"\xff\xd8" + app0 + dqt(0, _QT_LUMA) + dqt(1, _QT_CHROMA)
            + dht(0, 0, _ENC_DC) + dht(1, 0, _ENC_AC)
            + sof + dri + b"".join(scans) + b"\xff\xd9")
