"""Baseline JPEG codec — stdlib + numpy only (ITU-T T.81).

Scope: baseline sequential DCT (SOF0/SOF1), 8-bit, Huffman coded,
sampling factors 1x1..2x2 per component (4:4:4, 4:2:2, 4:4:0, 4:2:0 —
MCU-interleaved, nearest-neighbor chroma upsampling), 1 or 3
components, optional restart markers.  Progressive (SOF2), 12-bit, and
arithmetic-coded streams return None — those need a real codec
library.

The decoder reads its quantization and Huffman tables FROM THE STREAM
(DQT/DHT segments), per spec — nothing here depends on the encoder's
table constants being canonical.  The encoder emits the Annex-K example
tables and exists as the inverse fixture: JPEG is lossy, so roundtrip
tests assert bounded reconstruction error, plus exact tests for the
lossless layers (zigzag, Huffman, bit stuffing).

Adversarial bounds (same discipline as the PNG/GIF decoders):
``max_pixels`` rejects huge SOF dimensions before any allocation; the
entropy reader is length-clamped and returns None on truncation; a
Huffman walk caps at 16 bits by construction.
"""

from __future__ import annotations

import struct

import numpy as np

# --- shared constants -------------------------------------------------------

# zigzag scan order, generated (T.81 figure 5): diagonals of i+j, odd
# diagonals walk i-ascending, even ones i-descending.
ZIGZAG = [i * 8 + j
          for s in range(15)
          for (i, j) in sorted(((i, s - i) for i in range(max(0, s - 7),
                                                          min(8, s + 1))),
                               reverse=(s % 2 == 0))]
_UNZIG = np.argsort(np.array(ZIGZAG))

# Annex K example tables (encoder side only — the decoder parses DQT/DHT)
_QY = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32,
    dtype=np.int32).reshape(8, 8)

_DC_Y_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_Y_VALS = list(range(12))
_DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_C_VALS = list(range(12))
_AC_Y_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_Y_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
_AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def _dct_mat() -> np.ndarray:
    k = np.arange(8)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m[0, :] = 1.0
    m *= np.sqrt(2.0 / 8)
    m[0, :] /= np.sqrt(2.0)
    return m


_DCT = _dct_mat()            # forward: _DCT @ b @ _DCT.T; inverse: transpose


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via the canonical T.81 code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol (tiny tables, dict lookup is fine)."""
    out: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)       # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.write(0x7F, 8 - self.n)    # pad with 1-bits per spec

    def raw_marker(self, marker: int) -> None:
        self.align()
        self.buf += bytes([0xFF, marker])   # markers are never stuffed

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, surfaces restart
    markers, returns None from read() on truncation."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.i = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        while self.n < 25:
            if self.i >= len(self.d):
                return self.n > 0
            b = self.d[self.i]
            if b == 0xFF:
                if self.i + 1 >= len(self.d):
                    return self.n > 0
                nxt = self.d[self.i + 1]
                if nxt == 0x00:
                    self.i += 2
                elif 0xD0 <= nxt <= 0xD7:   # restart marker
                    self.marker = nxt
                    return self.n > 0
                else:                       # EOI or next segment
                    self.marker = nxt
                    return self.n > 0
            else:
                self.i += 1
            self.acc = (self.acc << 8) | b
            self.n += 8
        return True

    def bits(self, k: int) -> int | None:
        if k == 0:
            return 0
        while self.n < k:
            before = self.n
            if not self._fill() or self.n == before:
                return None
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int | None:
        code = 0
        for ln in range(1, 17):
            b = self.bits(1)
            if b is None:
                return None
            code = (code << 1) | b
            if (ln, code) in table:
                return table[(ln, code)]
        return None

    def restart(self) -> bool:
        """Consume the RSTn at an MCU boundary; discards fill bits.

        The prefetcher may not have reached the marker yet (it only
        stops AT a marker when a read forces it there), so seek forward
        to the next unstuffed 0xFF first."""
        self.acc = 0
        self.n = 0
        if self.marker is None:
            while self.i + 1 < len(self.d):
                if self.d[self.i] == 0xFF and self.d[self.i + 1] != 0x00:
                    self.marker = self.d[self.i + 1]
                    break
                self.i += 1
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.i += 2                     # skip FF Dn
            self.marker = None
            return True
        return False


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _extend(bits: int, cat: int) -> int:
    """T.81 EXTEND: map `cat` raw bits to the signed value."""
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


# --- encoder ---------------------------------------------------------------

def _encode_block(wtr, block, qtab, dc_tab, ac_tab, pred_val):
    """DCT + quantize + Huffman-emit one 8x8 block; returns new DC pred."""
    coef = _DCT @ block @ _DCT.T
    q = np.round(coef / qtab).astype(np.int32)
    zz = q.ravel()[ZIGZAG]
    diff = int(zz[0]) - pred_val
    cat = _category(diff)
    code, ln = dc_tab[cat]
    wtr.write(code, ln)
    if cat:
        wtr.write(diff if diff > 0 else diff + (1 << cat) - 1, cat)
    run = 0
    last_nz = max(np.nonzero(zz)[0]) if np.any(zz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            code, ln = ac_tab[0x00]                         # EOB
            wtr.write(code, ln)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]                         # ZRL
            wtr.write(code, ln)
            run -= 16
        cat = _category(v)
        code, ln = ac_tab[(run << 4) | cat]
        wtr.write(code, ln)
        wtr.write(v if v > 0 else v + (1 << cat) - 1, cat)
        run = 0
    return int(zz[0])


_SUBSAMPLING = {"444": [(1, 1), (1, 1), (1, 1)],
                "422": [(2, 1), (1, 1), (1, 1)],
                "420": [(2, 2), (1, 1), (1, 1)]}


def encode_jpeg(raster: np.ndarray, restart_interval: int = 0,
                subsampling: str = "444") -> bytes:
    """Baseline JFIF encoder: 8-bit gray (h, w)/(h, w, 1) or RGB
    (h, w, 3), Annex-K tables; ``subsampling`` in {444, 422, 420}
    (box-averaged chroma, MCU-interleaved); optional restart markers
    every ``restart_interval`` MCUs (exercises the decoder's DRI/RSTn
    resync path)."""
    a = np.asarray(raster, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch == 1:
        comps = [a[:, :, 0].astype(np.float64) - 128.0]
        qtabs, ncomp, factors = [_QY], 1, [(1, 1)]
    else:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y - 128.0, cb - 128.0, cr - 128.0]
        qtabs, ncomp = [_QY, _QC, _QC], 3
        factors = _SUBSAMPLING[subsampling]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    # per-component plane: box-downsample by (hmax/sh, vmax/sv), pad to
    # whole MCUs of sh x sv blocks
    padded = []
    for ci in range(ncomp):
        sh, sv = factors[ci]
        p = comps[ci]
        fx, fy = hmax // sh, vmax // sv
        if fx > 1 or fy > 1:
            cy = -(-p.shape[0] // fy) * fy
            cx = -(-p.shape[1] // fx) * fx
            p = np.pad(p, ((0, cy - p.shape[0]), (0, cx - p.shape[1])),
                       mode="edge")
            p = p.reshape(cy // fy, fy, cx // fx, fx).mean(axis=(1, 3))
        th, tw = mcuy * sv * 8, mcux * sh * 8
        padded.append(np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                             mode="edge"))

    dc_enc = [_huff_encode_table(_DC_Y_BITS, _DC_Y_VALS),
              _huff_encode_table(_DC_C_BITS, _DC_C_VALS)]
    ac_enc = [_huff_encode_table(_AC_Y_BITS, _AC_Y_VALS),
              _huff_encode_table(_AC_C_BITS, _AC_C_VALS)]

    wtr = _BitWriter()
    pred = [0] * ncomp
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                wtr.raw_marker(0xD0 + (mcu // restart_interval - 1) % 8)
                pred = [0] * ncomp
            mcu += 1
            for ci in range(ncomp):
                tid = 0 if ci == 0 else 1
                sh, sv = factors[ci]
                for r_ in range(sv):
                    for c_ in range(sh):
                        by, bx = (my * sv + r_) * 8, (mx * sh + c_) * 8
                        block = padded[ci][by:by + 8, bx:bx + 8]
                        pred[ci] = _encode_block(
                            wtr, block, qtabs[ci], dc_enc[tid], ac_enc[tid],
                            pred[ci])

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tid: int, tab: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(int(x) for x in
                                              tab.ravel()[ZIGZAG]))

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    out = b"\xff\xd8"                       # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, _QY)
    sof_comps = b""
    sos_comps = b""
    for ci in range(ncomp):
        tq = 0 if ci == 0 else 1
        sh, sv = factors[ci]
        sof_comps += bytes([ci + 1, (sh << 4) | sv, tq])
        td = 0 if ci == 0 else 1
        sos_comps += bytes([ci + 1, (td << 4) | td])
    if ncomp == 3:
        out += dqt(1, _QC)
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, ncomp) + sof_comps)
    out += dht(0, 0, _DC_Y_BITS, _DC_Y_VALS)
    out += dht(1, 0, _AC_Y_BITS, _AC_Y_VALS)
    if ncomp == 3:
        out += dht(0, 1, _DC_C_BITS, _DC_C_VALS)
        out += dht(1, 1, _AC_C_BITS, _AC_C_VALS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, bytes([ncomp]) + sos_comps + b"\x00\x3f\x00")
    out += wtr.flush()
    return out + b"\xff\xd9"                # EOI


# --- decoder ---------------------------------------------------------------

def decode_jpeg_pixels(payload: bytes,
                       max_pixels: int = 4_000_000
                       ) -> tuple[int, int, int, np.ndarray] | None:
    """REAL baseline JPEG decode (incl. 4:2:0/4:2:2 subsampling).
    Returns (width, height, channels, uint8 raster) or None for anything
    outside the supported envelope (progressive, 12-bit, arithmetic,
    factors > 2, corrupt, oversized)."""
    b = payload or b""
    if not b.startswith(b"\xff\xd8"):
        return None
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    dri = 0
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:                  # EOI before SOS: no image
            return None
        (ln,) = struct.unpack(">H", b[i + 2:i + 4])
        body = b[i + 4:i + 2 + ln]
        if len(body) != ln - 2:
            return None
        if marker == 0xDB:                  # DQT (possibly several tables)
            j = 0
            while j < len(body):
                prec, tid = body[j] >> 4, body[j] & 15
                if prec != 0:
                    return None             # 16-bit tables unsupported
                if j + 65 > len(body):
                    return None
                tab = np.zeros(64, np.int32)
                tab[ZIGZAG] = np.frombuffer(body[j + 1:j + 65], np.uint8)
                qt[tid] = tab.reshape(8, 8)
                j += 65
        elif marker == 0xC4:                # DHT (possibly several tables)
            j = 0
            while j + 17 <= len(body):
                cls, tid = body[j] >> 4, body[j] & 15
                bits = list(body[j + 1:j + 17])
                n = sum(bits)
                vals = list(body[j + 17:j + 17 + n])
                if len(vals) != n:
                    return None
                huff[(cls, tid)] = _huff_decode_table(bits, vals)
                j += 17 + n
        elif marker == 0xC0 or marker == 0xC1:   # baseline / ext sequential
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8 or nc not in (1, 3):
                return None
            if fw <= 0 or fh <= 0 or fw * fh > max_pixels:
                return None
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c:9 + 3 * c]
                sh, sv = samp >> 4, samp & 15
                if not (1 <= sh <= 2 and 1 <= sv <= 2):
                    return None             # only 1x1..2x2 factors
                comps.append((cid, sh, sv, tq))
            frame = (fw, fh, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None                     # progressive & friends
        elif marker == 0xDD:                # DRI
            (dri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:                # SOS: entropy data follows
            if frame is None:
                return None
            fw, fh, comps = frame
            ns = body[0]
            if ns != len(comps):
                return None
            tabsel = []
            for c in range(ns):
                _cid, tt = body[1 + 2 * c:3 + 2 * c]
                tabsel.append((tt >> 4, tt & 15))
            for (td, ta), (_cid, _sh, _sv, tq) in zip(tabsel, comps):
                if (0, td) not in huff or (1, ta) not in huff or tq not in qt:
                    return None
            return _decode_scan(b, i + 2 + ln, fw, fh, comps, tabsel,
                                qt, huff, dri)
        i += 2 + ln
    return None


def _decode_scan(b: bytes, pos: int, fw: int, fh: int, comps, tabsel,
                 qt, huff, dri: int) -> tuple[int, int, int, np.ndarray] | None:
    nc = len(comps)
    rdr = _BitReader(b, pos)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = -(-fw // (8 * hmax)), -(-fh // (8 * vmax))
    planes = [np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8), np.float64)
              for c in comps]
    pred = [0] * nc
    idct = _DCT.T
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu and mcu % dri == 0:
                if not rdr.restart():
                    return None
                pred = [0] * nc
            for ci in range(nc):
                td, ta = tabsel[ci]
                dtab, atab = huff[(0, td)], huff[(1, ta)]
                _cid, sh, sv, tq = comps[ci]
                q = qt[tq]
                # sh*sv data units per MCU for this component, raster order
                for r in range(sv):
                    for c in range(sh):
                        cat = rdr.huff(dtab)
                        if cat is None or cat > 15:
                            return None
                        raw = rdr.bits(cat)
                        if raw is None:
                            return None
                        pred[ci] += _extend(raw, cat)
                        zz = np.zeros(64, np.int32)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = rdr.huff(atab)
                            if sym is None:
                                return None
                            if sym == 0x00:         # EOB
                                break
                            run, cat = sym >> 4, sym & 15
                            if cat == 0:
                                if run != 15:       # only ZRL may have cat 0
                                    return None
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                return None
                            raw = rdr.bits(cat)
                            if raw is None:
                                return None
                            zz[k] = _extend(raw, cat)
                            k += 1
                        coef = np.zeros(64, np.float64)
                        coef[ZIGZAG] = zz * q.ravel()[ZIGZAG]
                        block = idct @ coef.reshape(8, 8) @ idct.T
                        py, px = (my * sv + r) * 8, (mx * sh + c) * 8
                        planes[ci][py:py + 8, px:px + 8] = block
            mcu += 1
    # crop each component to its own resolution, then nearest-neighbor
    # upsample to frame resolution (JFIF simple upsampling — matches the
    # box-downsampling encoder fixture, self-consistent round-trip)
    full = []
    for ci, (_cid, sh, sv, _tq) in enumerate(comps):
        cw, chh = -(-fw * sh // hmax), -(-fh * sv // vmax)
        p = planes[ci][:chh, :cw]
        if sh != hmax:
            p = np.repeat(p, hmax // sh, axis=1)
        if sv != vmax:
            p = np.repeat(p, vmax // sv, axis=0)
        full.append(p[:fh, :fw])
    planes = [p + 128.0 for p in full]
    if nc == 1:
        out = np.clip(planes[0], 0, 255).astype(np.uint8)[:, :, None]
        return fw, fh, 1, out
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    out = np.clip(np.stack([r, g, bl], axis=-1), 0, 255).astype(np.uint8)
    return fw, fh, 3, out
