"""JPEG codec (baseline + progressive) — stdlib + numpy only (ITU-T T.81).

Scope: baseline sequential DCT (SOF0/SOF1) AND progressive (SOF2 —
spectral selection + successive approximation, DC/AC first+refinement
passes, EOBRUN), 8-bit, Huffman coded, sampling factors 1x1..2x2 per
component (4:4:4, 4:2:2, 4:4:0, 4:2:0 — MCU-interleaved,
nearest-neighbor chroma upsampling), 1 or 3 components, optional
restart markers.  12-bit, lossless, and arithmetic-coded streams
return None — those need a real codec library.

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


# Progressive AC scans need EOBn symbols (0x10..0xE0) that the Annex-K
# baseline tables lack: one flat canonical table (all needed symbols at
# 8 bits, Kraft 176/256) serves encoder fixture + DHT emission.
_AC_PROG_VALS = sorted(
    [r << 4 for r in range(15)] + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_AC_PROG_BITS = [0] * 7 + [len(_AC_PROG_VALS)] + [0] * 8


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

    def end_pos(self) -> int:
        """Position of the next segment marker (the 0xFF byte) at/after
        the current read point — used between progressive scans."""
        j = self.i
        while j + 1 < len(self.d):
            if self.d[j] == 0xFF and self.d[j + 1] not in (0x00,):
                if 0xD0 <= self.d[j + 1] <= 0xD7:
                    j += 2
                    continue
                return j
            j += 1
        return len(self.d)

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
    """REAL JPEG decode: baseline AND progressive (SOF2), incl.
    4:2:0/4:2:2 subsampling.  Returns (width, height, channels, uint8
    raster) or None outside the supported envelope (12-bit, lossless,
    arithmetic, factors > 2, corrupt, oversized)."""
    b = payload or b""
    if not b.startswith(b"\xff\xd8"):
        return None
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    progressive = False
    coefs = None                            # progressive coefficient state
    dri = 0
    i = 2
    while i + 2 <= len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:                  # EOI
            if progressive and coefs is not None:
                fw, fh, comps = frame
                return _reconstruct(fw, fh, comps, qt, coefs)
            return None                     # EOI before SOS: no image
        if i + 4 > len(b):
            return None                     # truncated segment header
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
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / progressive
            progressive = marker == 0xC2
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
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None                     # lossless/arithmetic & friends
        elif marker == 0xDD:                # DRI
            (dri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:                # SOS: entropy data follows
            if frame is None:
                return None
            fw, fh, comps = frame
            ns = body[0]
            if progressive:
                if coefs is None:
                    coefs = _alloc_coefs(fw, fh, comps)
                nxt = _progressive_scan(b, i + 2 + ln, fw, fh, comps, body,
                                        qt, huff, dri, coefs)
                if nxt is None:
                    return None
                i = nxt
                continue
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


# --- progressive (SOF2) decoding -------------------------------------------

def _geom(fw: int, fh: int, comps):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = -(-fw // (8 * hmax)), -(-fh // (8 * vmax))
    return hmax, vmax, mcux, mcuy


def _alloc_coefs(fw: int, fh: int, comps):
    """Per-component (blocks_y, blocks_x, 64) zigzag-ordered coefficient
    store, MCU-padded so interleaved DC scans can address every block."""
    _hmax, _vmax, mcux, mcuy = _geom(fw, fh, comps)
    return [np.zeros((mcuy * sv, mcux * sh, 64), np.int32)
            for (_cid, sh, sv, _tq) in comps]


def _comp_blocks(fw: int, fh: int, comps, ci: int):
    """Non-interleaved scans cover the component's OWN block grid
    (T.81 A.2.2), not the MCU-padded one."""
    hmax, vmax, _x, _y = _geom(fw, fh, comps)
    _cid, sh, sv, _tq = comps[ci]
    cw, chh = -(-fw * sh // hmax), -(-fh * sv // vmax)
    return -(-chh // 8), -(-cw // 8)


def _refine_nonzero(rdr, blk, k, se, al) -> int | None:
    """Correction-bit sweep over nonzero coefficients in band k..se."""
    p = 1 << al
    while k <= se:
        if blk[k] != 0:
            bit = rdr.bits(1)
            if bit is None:
                return None
            if bit and not (blk[k] & p):
                blk[k] += p if blk[k] > 0 else -p
        k += 1
    return 0


def _progressive_scan(b: bytes, pos: int, fw: int, fh: int, comps, body,
                      qt, huff, dri: int, coefs) -> int | None:
    """One SOS of a progressive stream; mutates ``coefs``; returns the
    stream position of the next marker, or None on corruption."""
    ns = body[0]
    if not (1 <= ns <= len(comps)) or len(body) < 4 + 2 * ns:
        return None
    scomp, tabsel = [], []
    for c in range(ns):
        cid, tt = body[1 + 2 * c:3 + 2 * c]
        idx = next((j for j, cc in enumerate(comps) if cc[0] == cid), None)
        if idx is None:
            return None
        scomp.append(idx)
        tabsel.append((tt >> 4, tt & 15))
    ss, se, a = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
    ah, al = a >> 4, a & 15
    if not (0 <= ss <= se <= 63) or al > 13:
        return None
    rdr = _BitReader(b, pos)
    hmax, vmax, mcux, mcuy = _geom(fw, fh, comps)

    if ss == 0:                             # DC scan (Se must be 0)
        if se != 0:
            return None
        for ci, (td, _ta) in zip(scomp, tabsel):
            if ah == 0 and (0, td) not in huff:
                return None
        pred = [0] * len(scomp)
        units = []                          # (ci, by, bx) in scan order
        if ns > 1:                          # interleaved, MCU order
            for my in range(mcuy):
                for mx in range(mcux):
                    for si, ci in enumerate(scomp):
                        _cid, sh, sv, _tq = comps[ci]
                        for r in range(sv):
                            for c in range(sh):
                                units.append((si, my * sv + r, mx * sh + c))
        else:
            ci = scomp[0]
            nby, nbx = _comp_blocks(fw, fh, comps, ci)
            for by in range(nby):
                for bx in range(nbx):
                    units.append((0, by, bx))
        mcu_sz = (sum(comps[ci][1] * comps[ci][2] for ci in scomp)
                  if ns > 1 else 1)
        done = 0
        for (si, by, bx) in units:
            if dri and done and done % (dri * mcu_sz) == 0:
                if not rdr.restart():
                    return None
                pred = [0] * len(scomp)
            done += 1
            blk = coefs[scomp[si]][by, bx]
            if ah == 0:
                td = tabsel[si][0]
                cat = rdr.huff(huff[(0, td)])
                if cat is None or cat > 15:
                    return None
                raw = rdr.bits(cat)
                if raw is None:
                    return None
                pred[si] += _extend(raw, cat)
                blk[0] = pred[si] << al
            else:                           # DC refinement: 1 bit/block
                bit = rdr.bits(1)
                if bit is None:
                    return None
                if bit:
                    blk[0] |= 1 << al
        return rdr.end_pos()

    # AC scan: exactly one component, non-interleaved (T.81 B.2.3)
    if ns != 1:
        return None
    ci = scomp[0]
    ta = tabsel[0][1]
    if (1, ta) not in huff:
        return None
    atab = huff[(1, ta)]
    nby, nbx = _comp_blocks(fw, fh, comps, ci)
    eobrun = 0
    done = 0
    for by in range(nby):
        for bx in range(nbx):
            if dri and done and done % dri == 0:
                if not rdr.restart():
                    return None
                eobrun = 0
            done += 1
            blk = coefs[ci][by, bx]
            if eobrun > 0:
                eobrun -= 1
                if ah != 0:
                    if _refine_nonzero(rdr, blk, ss, se, al) is None:
                        return None
                continue
            if ah == 0:                     # first AC pass
                k = ss
                while k <= se:
                    sym = rdr.huff(atab)
                    if sym is None:
                        return None
                    r, s = sym >> 4, sym & 15
                    if s == 0:
                        if r == 15:
                            k += 16         # ZRL
                            continue
                        extra = rdr.bits(r)
                        if extra is None:
                            return None
                        eobrun = (1 << r) - 1 + extra
                        break
                    k += r
                    if k > se:
                        return None
                    raw = rdr.bits(s)
                    if raw is None:
                        return None
                    blk[k] = _extend(raw, s) << al
                    k += 1
            else:                           # AC refinement pass
                p = 1 << al
                k = ss
                ate_eob = False
                while k <= se:
                    sym = rdr.huff(atab)
                    if sym is None:
                        return None
                    r, s = sym >> 4, sym & 15
                    newval = 0
                    if s == 0:
                        if r < 15:
                            extra = rdr.bits(r)
                            if extra is None:
                                return None
                            eobrun = (1 << r) - 1 + extra
                            ate_eob = True
                            break
                        # r == 15: ZRL — skip 16 zero-history positions
                    else:
                        if s != 1:
                            return None
                        sign = rdr.bits(1)
                        if sign is None:
                            return None
                        newval = p if sign else -p
                    # walk: correct nonzeros, count down zero-history run
                    while k <= se:
                        if blk[k] != 0:
                            bit = rdr.bits(1)
                            if bit is None:
                                return None
                            if bit and not (blk[k] & p):
                                blk[k] += p if blk[k] > 0 else -p
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval and k <= se:
                        blk[k] = newval
                    k += 1
                if ate_eob:
                    # the EOB covers THIS block too: correction sweep
                    # over the rest of its band (then eobrun more
                    # whole blocks are swept at the loop top)
                    if _refine_nonzero(rdr, blk, k, se, al) is None:
                        return None
    return rdr.end_pos()


def _reconstruct(fw: int, fh: int, comps, qt, coefs):
    """Dequantize + IDCT the accumulated progressive coefficients."""
    hmax, vmax, _mcux, _mcuy = _geom(fw, fh, comps)
    idct = _DCT.T
    full = []
    for ci, (_cid, sh, sv, tq) in enumerate(comps):
        if tq not in qt:
            return None
        q = qt[tq].ravel()[ZIGZAG]
        arr = coefs[ci]
        nby, nbx, _ = arr.shape
        plane = np.zeros((nby * 8, nbx * 8), np.float64)
        for by in range(nby):
            for bx in range(nbx):
                coef = np.zeros(64, np.float64)
                coef[ZIGZAG] = arr[by, bx] * q
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                    idct @ coef.reshape(8, 8) @ idct.T
        cw, chh = -(-fw * sh // hmax), -(-fh * sv // vmax)
        p = plane[:chh, :cw]
        if sh != hmax:
            p = np.repeat(p, hmax // sh, axis=1)
        if sv != vmax:
            p = np.repeat(p, vmax // sv, axis=0)
        full.append(p[:fh, :fw] + 128.0)
    if len(comps) == 1:
        out = np.clip(full[0], 0, 255).astype(np.uint8)[:, :, None]
        return fw, fh, 1, out
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    out = np.clip(np.stack([r, g, bl], axis=-1), 0, 255).astype(np.uint8)
    return fw, fh, 3, out


# --- progressive (SOF2) encoder fixture -------------------------------------

def _quantized_blocks(raster: np.ndarray):
    """(comps planes -> per-comp (by, bx, 64) zigzag-ordered quantized
    coefficients, 4:4:4) + frame dims; shared DCT/quant with the
    baseline encoder so progressive and baseline streams carry the SAME
    coefficients — the bit-exact cross-check the tests rely on."""
    a = np.asarray(raster, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch == 1:
        comps = [a[:, :, 0].astype(np.float64) - 128.0]
        qtabs = [_QY]
    else:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y - 128.0, cb - 128.0, cr - 128.0]
        qtabs = [_QY, _QC, _QC]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    out = []
    for ci, p in enumerate(comps):
        p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        arr = np.zeros((ph // 8, pw // 8, 64), np.int32)
        for by in range(ph // 8):
            for bx in range(pw // 8):
                block = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                coef = _DCT @ block @ _DCT.T
                q = np.round(coef / qtabs[ci]).astype(np.int32)
                arr[by, bx] = q.ravel()[ZIGZAG]
        out.append(arr)
    return h, w, out


def _emit_ac_first(wtr, blocks, ss, se, al, ac_tab):
    """AC first pass (Ah=0) with cross-block EOBRUN accumulation."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        while eobrun > 0:
            r = min(14, eobrun.bit_length() - 1)
            code, ln = ac_tab[r << 4]
            wtr.write(code, ln)
            if r:
                wtr.write(eobrun - (1 << r), r)
            eobrun -= (1 << r) - 1 + (eobrun - (1 << r)) + 1

    for blk in blocks:
        band = blk[ss:se + 1]
        vals = [(int(v) >> al) if v >= 0 else -((-int(v)) >> al)
                for v in band]
        if not any(vals):
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        last = max(j for j, v in enumerate(vals) if v)
        for j, v in enumerate(vals):
            if j > last:
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tab[0xF0]
                wtr.write(code, ln)
                run -= 16
            cat = _category(v)
            code, ln = ac_tab[(run << 4) | cat]
            wtr.write(code, ln)
            wtr.write(v if v > 0 else v + (1 << cat) - 1, cat)
            run = 0
        if last < len(vals) - 1:
            eobrun += 1
    flush_eob()


def _emit_ac_refine(wtr, blocks, ss, se, ah, al, ac_tab):
    """AC refinement pass — SIMULATES the decoder's walk, emitting bits
    in exactly the order `_progressive_scan` consumes them (per-block
    EOB0, no cross-block EOBRUN: simpler and equally valid T.81)."""
    p = 1 << al
    for blk in blocks:
        sig = [(abs(int(v)) >> ah) != 0 for v in blk]      # prior passes
        corr = [(abs(int(v)) >> al) & 1 for v in blk]
        newpos = [k for k in range(ss, se + 1)
                  if not sig[k] and blk[k] != 0]
        k = ss
        for j in newpos:
            while True:
                # zero-history count from k to j (exclusive)
                nz = sum(1 for t in range(k, j) if not sig[t])
                if nz > 15:
                    code, ln = ac_tab[0xF0]                 # ZRL
                    wtr.write(code, ln)
                    # decoder walk: 16 zero-history skips + corrections
                    skipped = 0
                    while k <= se:
                        if sig[k]:
                            wtr.write(corr[k], 1)
                        else:
                            if skipped == 15:
                                break
                            skipped += 1
                        k += 1
                    k += 1
                    continue
                break
            code, ln = ac_tab[(nz << 4) | 1]
            wtr.write(code, ln)
            wtr.write(1 if blk[j] > 0 else 0, 1)            # sign of ±p
            while k < j:                                    # decoder walk
                if sig[k]:
                    wtr.write(corr[k], 1)
                k += 1
            k = j + 1
        # end of block: EOB0 + tail corrections — but ONLY if the walk
        # hasn't already consumed the whole band (after an insert at
        # k == se the decoder's loop exits without reading a symbol)
        if k <= se:
            code, ln = ac_tab[0x00]
            wtr.write(code, ln)
            for t in range(k, se + 1):
                if sig[t]:
                    wtr.write(corr[t], 1)


def encode_jpeg_progressive(raster: np.ndarray) -> bytes:
    """Progressive JFIF encoder fixture (SOF2, 4:4:4): DC first (Al=1),
    DC refinement, per-component AC first (Ss=1..63, Al=1) with EOBRUN,
    per-component AC refinement — the full successive-approximation
    shape libjpeg emits by default, over the SAME quantized
    coefficients as :func:`encode_jpeg`."""
    h, w, coefs = _quantized_blocks(raster)
    ncomp = len(coefs)
    dc_enc = [_huff_encode_table(_DC_Y_BITS, _DC_Y_VALS),
              _huff_encode_table(_DC_C_BITS, _DC_C_VALS)]
    ac_prog = _huff_encode_table(_AC_PROG_BITS, _AC_PROG_VALS)
    ac_enc = [ac_prog, ac_prog]

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sos(comp_sel: list[int], tds, tas, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_sel)])
        for ci, td, ta in zip(comp_sel, tds, tas):
            body += bytes([ci + 1, (td << 4) | ta])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(int(x) for x in
                                        _QY.ravel()[ZIGZAG]))
    if ncomp == 3:
        out += seg(0xDB, bytes([1]) + bytes(int(x) for x in
                                            _QC.ravel()[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC2, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_Y_BITS) + bytes(_DC_Y_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_PROG_BITS) + bytes(_AC_PROG_VALS))
    if ncomp == 3:
        out += seg(0xC4, bytes([0x01]) + bytes(_DC_C_BITS) + bytes(_DC_C_VALS))
        out += seg(0xC4, bytes([0x11]) + bytes(_AC_PROG_BITS) + bytes(_AC_PROG_VALS))

    nby, nbx, _ = coefs[0].shape

    # scan 1: DC first, interleaved (4:4:4 -> MCU == block), Al=1
    wtr = _BitWriter()
    pred = [0] * ncomp
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(ncomp):
                tid = 0 if ci == 0 else 1
                dc = int(coefs[ci][by, bx, 0]) >> 1     # arithmetic shift
                diff = dc - pred[ci]
                pred[ci] = dc
                cat = _category(diff)
                code, ln = dc_enc[tid][cat]
                wtr.write(code, ln)
                if cat:
                    wtr.write(diff if diff > 0 else diff + (1 << cat) - 1,
                              cat)
    out += sos(list(range(ncomp)), [0 if c == 0 else 1 for c in range(ncomp)],
               [0] * ncomp, 0, 0, 0, 1) + wtr.flush()

    # scan 2: DC refinement (1 bit per block), interleaved
    wtr = _BitWriter()
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(ncomp):
                wtr.write(int(coefs[ci][by, bx, 0]) & 1, 1)
    out += sos(list(range(ncomp)), [0] * ncomp, [0] * ncomp,
               0, 0, 1, 0) + wtr.flush()

    # scans 3..: per-component AC first (Al=1) then AC refinement
    blocks_of = [[coefs[ci][by, bx] for by in range(nby)
                  for bx in range(nbx)] for ci in range(ncomp)]
    for ci in range(ncomp):
        tid = 0 if ci == 0 else 1
        wtr = _BitWriter()
        _emit_ac_first(wtr, blocks_of[ci], 1, 63, 1, ac_enc[tid])
        out += sos([ci], [0], [tid], 1, 63, 0, 1) + wtr.flush()
    for ci in range(ncomp):
        tid = 0 if ci == 0 else 1
        wtr = _BitWriter()
        _emit_ac_refine(wtr, blocks_of[ci], 1, 63, 1, 0, ac_enc[tid])
        out += sos([ci], [0], [tid], 1, 63, 1, 0) + wtr.flush()
    return out + b"\xff\xd9"
