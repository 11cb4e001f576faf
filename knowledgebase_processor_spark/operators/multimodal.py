"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over ``mapInPandas``.

Decode status per kernel:

* **Container headers are REAL stdlib parses** — PNG IHDR, JPEG SOFn,
  GIF logical screen descriptor (``decode_image_dims``) and RIFF/WAVE
  fmt+data chunks (``decode_wav_meta``) need only ``struct``; they run
  on real file bytes and are tested against real fixtures.
* **PNG pixel decode is REAL** (``decode_png_pixels``): IDAT inflate is
  stdlib ``zlib`` and the five scanline filters (None/Sub/Up/Average/
  Paeth) are unfiltered per the PNG spec §9, including PLTE indexed
  color — so ``png_pixel_embedding`` pools ACTUAL pixels.  The inflate
  is length-capped at exactly the raster size (decompression bombs
  cannot expand past it) and ``max_pixels`` bounds the pure-Python
  unfilter work on adversarial dimensions.
* **WAV PCM decode is REAL** (``decode_wav_samples``): PCM8/PCM16
  frames via ``numpy.frombuffer``, channel-mixed to mono, frame-capped;
  ``wav_pcm_embedding`` is per-segment RMS + zero-crossing rate over
  the actual samples.
* **GIF pixel decode is REAL** (``decode_gif_pixels``): stdlib LZW
  (dynamic code width, deferred clear, output bounded by the
  descriptor's own pixel count), de-interlacing, palette mapping;
  ``encode_gif`` is the inverse fixture.
* **JPEG pixel decode is REAL for baseline AND progressive (SOF2)**
  (``operators/jpeg.py``: spectral selection + successive
  approximation, 8-bit, sampling factors up to 2x2 —
  4:4:4/4:2:2/4:2:0 — Huffman, restart markers; tables parsed from the
  stream).
* **Video frame decode is REAL for MJPEG-in-AVI**
  (``decode_avi_meta`` / ``iter_avi_mjpeg_frames`` + the JPEG codec):
  ``frame_sample`` reads fps/frame-count from the RIFF headers and
  decodes the ACTUAL sampled frames.  Only 12-bit/lossless/arithmetic
  JPEG and inter-frame video codecs (H.26x/VP9/AV1) remain disclosed
  STUBS (they need Pillow/pyav, not in this container).  The stub
  derives stable output from the content hash; ``embedding_kind`` /
  ``frame_kind`` in the outputs say per-row which path produced each
  vector/frame.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, LongType, StringType, StructField,
    StructType,
)

MEDIA = StructType([
    StructField("media_id", StringType()),
    StructField("kind", StringType()),          # image | audio | video
    StructField("payload", BinaryType()),
    StructField("mime", StringType()),
    StructField("meta_width", LongType()),
    StructField("meta_height", LongType()),
    StructField("meta_duration_s", DoubleType()),
])

IMAGE_FEATURES = StructType([
    StructField("media_id", StringType()),
    StructField("format", StringType()),        # png | jpeg | gif | unknown
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("embedding", ArrayType(DoubleType())),
    StructField("embedding_kind", StringType()),  # pixels | hash-stub
])

AUDIO_FEATURES = StructType([
    StructField("media_id", StringType()),
    StructField("format", StringType()),        # wav | unknown
    StructField("sample_rate", LongType()),
    StructField("channels", LongType()),
    StructField("duration_s", DoubleType()),
    StructField("embedding", ArrayType(DoubleType())),
    StructField("embedding_kind", StringType()),  # pcm | hash-stub
])

FRAME_SAMPLES = StructType([
    StructField("media_id", StringType()),
    StructField("frame_idx", LongType()),
    StructField("frame_ts_s", DoubleType()),
    StructField("frame_png", BinaryType()),
    StructField("frame_kind", StringType()),   # pixels | hash-stub
])

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG SOF markers that carry frame dimensions (all SOFn except the
# DHT/DAC/RST family C4/C8/CC)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def decode_image_dims(payload: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from real container headers — pure stdlib.

    PNG: IHDR is the mandatory first chunk, width/height big-endian at
    byte 16.  JPEG: walk the marker segments to the first SOFn frame
    header.  GIF: logical screen descriptor, little-endian at byte 6.
    Returns None for anything else (truncated, or a codec we cannot
    parse without real media libraries).
    """
    b = payload or b""
    if b.startswith(_PNG_SIG) and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return "png", w, h
    if b.startswith(b"\xff\xd8") and len(b) >= 4:
        i = 2
        while i + 9 <= len(b):
            if b[i] != 0xFF:            # desynchronized — not valid JPEG
                return None
            marker = b[i + 1]
            if marker == 0xFF:          # fill bytes
                i += 1
                continue
            if 0xD0 <= marker <= 0xD9:  # RST/SOI/EOI: no length field
                i += 2
                continue
            seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
            if marker in _JPEG_SOF:
                if i + 9 > len(b):
                    return None
                h, w = struct.unpack(">HH", b[i + 5:i + 9])
                return "jpeg", w, h
            i += 2 + seg_len
        return None
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", w, h
    return None


def decode_wav_meta(payload: bytes) -> tuple[int, int, float] | None:
    """(sample_rate, channels, duration_s) from a RIFF/WAVE header — pure
    stdlib.  Walks the chunk list to fmt (byte rate) and data (payload
    size); duration = data_size / byte_rate.  None if not a parseable WAV.
    """
    b = payload or b""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, rate, channels, byte_rate, data_size = 12, None, None, None, None
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        size = struct.unpack("<I", b[i + 4:i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(b):
            channels, rate, byte_rate = struct.unpack("<HII", b[i + 10:i + 20])
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)      # chunks are word-aligned
    if not (rate and channels and byte_rate and data_size is not None):
        return None
    return rate, channels, round(data_size / byte_rate, 6)


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png_pixels(payload: bytes,
                      max_pixels: int = 4_000_000
                      ) -> tuple[int, int, int, np.ndarray] | None:
    """REAL PNG raster decode — stdlib only (PNG spec §§5,9,11).

    Returns ``(width, height, channels, raster)`` with ``raster`` a
    ``uint8 (h, w, channels)`` array, or None for anything this no-deps
    path cannot or should not decode: non-8-bit depth, Adam7 interlace,
    corrupt streams, and rasters over ``max_pixels``.

    Adversarial bounds (the round-1 bug-class discipline):

    * the IDAT inflate uses ``zlib.decompressobj().decompress(data,
      expected)`` with ``expected`` = exact raster byte count — a
      crafted high-ratio stream can never allocate past the size its
      own IHDR admits to;
    * ``max_pixels`` rejects huge-dimension headers BEFORE any
      allocation, bounding the pure-Python unfilter loop (the honest
      no-Pillow cost, ~MB/s — swap a C decoder on a real cluster for
      throughput, the semantics here are the contract);
    * chunk walking is length-clamped, truncation returns None.
    """
    b = payload or b""
    if not b.startswith(_PNG_SIG):
        return None
    ihdr = None
    plte = b""
    idat: list[bytes] = []
    i = 8
    while i + 8 <= len(b):
        (size,) = struct.unpack(">I", b[i:i + 4])
        tag = b[i + 4:i + 8]
        data = b[i + 8:i + 8 + size]
        if len(data) < size:
            return None                     # truncated chunk
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"PLTE":
            plte = data
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        i += 12 + size                      # len + tag + data + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13])
    if (depth != 8 or color not in _PNG_CHANNELS or comp != 0
            or filt != 0 or interlace != 0 or w <= 0 or h <= 0
            or w * h > max_pixels):
        return None
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    expected = h * (1 + stride)
    try:
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), expected)
    except zlib.error:
        return None
    if len(raw) != expected or not d.eof:
        return None                         # short stream, or data past
                                            # the admitted raster (bomb)
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for y in range(h):
        base = y * (1 + stride)
        f = raw[base]
        line = bytearray(raw[base + 1:base + 1 + stride])
        if f == 0:
            pass
        elif f == 1:                        # Sub
            for k in range(ch, stride):
                line[k] = (line[k] + line[k - ch]) & 255
        elif f == 2:                        # Up
            for k in range(stride):
                line[k] = (line[k] + prev[k]) & 255
        elif f == 3:                        # Average
            for k in range(stride):
                a = line[k - ch] if k >= ch else 0
                line[k] = (line[k] + ((a + prev[k]) >> 1)) & 255
        elif f == 4:                        # Paeth
            for k in range(stride):
                a = line[k - ch] if k >= ch else 0
                up = prev[k]
                c = prev[k - ch] if k >= ch else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = up
                else:
                    pred = c
                line[k] = (line[k] + pred) & 255
        else:
            return None                     # invalid filter type
        out[y * stride:(y + 1) * stride] = line
        prev = line
    raster = np.frombuffer(bytes(out), np.uint8).reshape(h, w, ch)
    if color == 3:                          # indexed: map through PLTE
        if len(plte) < 3 or len(plte) % 3:
            return None
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = raster[:, :, 0]
        if int(idx.max()) >= len(pal):
            return None                     # index past palette: corrupt
        raster = pal[idx]
        ch = 3
    return w, h, ch, raster


def _pooled_pixel_embedding(w: int, h: int, ch: int,
                            raster: np.ndarray) -> list[float]:
    """8-dim pooled-PIXEL embedding from a decoded raster.

    Layout: ``[mean_r, mean_g, mean_b, std_luma, tl, tr, bl, br]`` —
    per-channel means, population std of luma, and the 2x2 quadrant luma
    means (an empty quadrant slice on 1-pixel-wide/tall images falls
    back to the global mean).  All values are /255 in [0, 1], rounded to
    6 decimals to match the driver's float normalization.
    """
    a = raster.astype(np.float64)
    if ch >= 3:
        r, g, bl_ = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    else:                                   # gray / gray+alpha
        r = g = bl_ = a[:, :, 0]
    luma = (r + g + bl_) / 3.0
    gm = float(luma.mean())

    def qmean(x: np.ndarray) -> float:
        return float(x.mean()) if x.size else gm

    qh, qw = (h + 1) // 2, (w + 1) // 2
    vals = [float(r.mean()), float(g.mean()), float(bl_.mean()),
            float(luma.std()),
            qmean(luma[:qh, :qw]), qmean(luma[:qh, qw:]),
            qmean(luma[qh:, :qw]), qmean(luma[qh:, qw:])]
    return [round(v / 255.0, 6) for v in vals]


def png_pixel_embedding(payload: bytes,
                        max_pixels: int = 4_000_000) -> list[float] | None:
    """Pooled-pixel embedding from a REAL PNG decode, or None when the
    raster is not decodable (then callers fall back to the disclosed
    hash stub and say so via ``embedding_kind``)."""
    dec = decode_png_pixels(payload, max_pixels)
    if dec is None:
        return None
    w, h, ch, raster = dec
    return _pooled_pixel_embedding(w, h, ch, raster)


def encode_png(raster: np.ndarray) -> bytes:
    """Minimal REAL PNG encoder (filter 0, 8-bit gray/RGB/RGBA) — the
    inverse fixture for ``decode_png_pixels`` and the emitter behind
    ``frame_sample``'s real-format frames.  ``raster``: uint8 (h, w) or
    (h, w, {1,3,4})."""
    a = np.asarray(raster, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 3: 2, 4: 6}[ch]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _gif_lzw_decode(min_code: int, data: bytes, max_out: int) -> bytes | None:
    """GIF-variant LZW decode (spec appendix F) — pure stdlib.

    LSB-first bitstream; dynamic code width from ``min_code``+1 to 12;
    clear/end codes; deferred-clear handling (dict caps at 4096 and the
    width stays 12 until the encoder sends clear).  ``max_out`` bounds
    the output to the pixel count the image descriptor admits to — a
    crafted stream cannot allocate past it (same bomb discipline as the
    PNG inflate bound).
    """
    if not 2 <= min_code <= 11:
        return None
    clear = 1 << min_code
    end = clear + 1
    literals = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(literals)
    code_size = min_code + 1
    out = bytearray()
    cur = nbits = pos = 0
    prev: bytes | None = None
    while True:
        while nbits < code_size:
            if pos >= len(data):
                return None                 # truncated stream
            cur |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = cur & ((1 << code_size) - 1)
        cur >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(literals)
            code_size = min_code + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
                new = prev + entry[:1]
            elif code == len(table):
                entry = new = prev + prev[:1]
            else:
                return None                 # code past the dictionary
            if len(table) < 4096:
                table.append(new)
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
        out += entry
        if len(out) > max_out:
            return None                     # more pixels than admitted
        if len(out) == max_out:
            return bytes(out)               # full raster: done
        prev = entry


# GIF interlace passes: (first row, step)
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_pixels(payload: bytes,
                      max_pixels: int = 4_000_000
                      ) -> tuple[int, int, int, np.ndarray] | None:
    """REAL GIF raster decode (first frame) — stdlib only (GIF89a spec).

    Walks the block structure (extensions skipped by their sub-block
    lengths), reads the global/local color table, LZW-decodes the index
    stream (``_gif_lzw_decode``, output bounded by the descriptor's own
    pixel count), de-interlaces if flagged, and maps indices through the
    palette.  Returns ``(width, height, 3, uint8 raster)`` or None for
    anything malformed/truncated/oversized.
    """
    b = payload or b""
    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        return None
    packed = b[10]
    i = 13
    gct = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = b[i:i + 3 * n]
        if len(gct) < 3 * n:
            return None
        i += 3 * n
    while i < len(b):
        block = b[i]
        if block == 0x21:                   # extension: label + sub-blocks
            i += 2
            while i < len(b) and b[i] != 0:
                i += 1 + b[i]
            i += 1
        elif block == 0x2C:                 # image descriptor
            if i + 10 > len(b):
                return None
            _, _, w, h = struct.unpack("<HHHH", b[i + 1:i + 9])
            ipacked = b[i + 9]
            i += 10
            lct = b""
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                lct = b[i:i + 3 * n]
                if len(lct) < 3 * n:
                    return None
                i += 3 * n
            if w <= 0 or h <= 0 or w * h > max_pixels:
                return None
            pal_bytes = lct or gct
            if len(pal_bytes) < 3:
                return None
            if i >= len(b):
                return None
            min_code = b[i]
            i += 1
            sub = bytearray()               # concatenate data sub-blocks
            while i < len(b) and b[i] != 0:
                ln = b[i]
                sub += b[i + 1:i + 1 + ln]
                if i + 1 + ln > len(b):
                    return None
                i += 1 + ln
            idx = _gif_lzw_decode(min_code, bytes(sub), w * h)
            if idx is None or len(idx) != w * h:
                return None
            arr = np.frombuffer(idx, np.uint8).reshape(h, w)
            if ipacked & 0x40:              # interlaced: reorder rows
                out = np.empty_like(arr)
                src = 0
                for first, step in _GIF_INTERLACE:
                    for row in range(first, h, step):
                        out[row] = arr[src]
                        src += 1
                arr = out
            pal = np.frombuffer(pal_bytes, np.uint8)[: 3 * (len(pal_bytes) // 3)]
            pal = pal.reshape(-1, 3)
            if int(arr.max()) >= len(pal):
                return None                 # index past palette: corrupt
            return w, h, 3, pal[arr]
        elif block == 0x3B:                 # trailer before any image
            return None
        else:
            return None                     # unknown block: corrupt
    return None


def gif_pixel_embedding(payload: bytes,
                        max_pixels: int = 4_000_000) -> list[float] | None:
    """Pooled-pixel embedding from a REAL GIF decode (shares the pooling
    kernel with PNG), or None when not decodable."""
    dec = decode_gif_pixels(payload, max_pixels)
    if dec is None:
        return None
    w, h, ch, raster = dec
    return _pooled_pixel_embedding(w, h, ch, raster)


def jpeg_pixel_embedding(payload: bytes,
                         max_pixels: int = 4_000_000) -> list[float] | None:
    """Pooled-pixel embedding from the REAL baseline JPEG decode
    (operators/jpeg.py), or None outside the baseline 4:4:4 envelope."""
    from .jpeg import decode_jpeg_pixels
    dec = decode_jpeg_pixels(payload, max_pixels)
    if dec is None:
        return None
    w, h, ch, raster = dec
    return _pooled_pixel_embedding(w, h, ch, raster)


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Minimal REAL GIF89a encoder — inverse fixture for
    ``decode_gif_pixels``.  ``indices``: uint8 (h, w) palette indices;
    ``palette``: uint8 (n<=256, 3).

    The LZW stage emits literal codes only, mirroring the decoder's
    dictionary growth to keep the code width in sync (and clearing
    before the table fills) — a valid, if uncompressed, GIF stream any
    conformant reader accepts.
    """
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    h, w = idx.shape
    bits = max(2, int(len(pal) - 1).bit_length())
    size_field = bits - 1
    pal_full = np.zeros((2 << size_field, 3), np.uint8)
    pal_full[:len(pal)] = pal
    min_code = bits
    clear, end = 1 << min_code, (1 << min_code) + 1

    out_codes = bytearray()
    cur = nbits = 0
    code_size = min_code + 1
    table_size = end + 1

    def emit(code: int) -> None:
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out_codes.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8

    emit(clear)
    first = True
    for v in idx.ravel():
        emit(int(v))
        if first:                           # decoder adds no entry for the
            first = False                   # first code after a clear
            continue
        table_size += 1                     # decoder grows its dict by one
        if table_size == (1 << code_size) and code_size < 12:
            code_size += 1
        if table_size >= 4095:              # reset well before overflow
            emit(clear)
            code_size = min_code + 1
            table_size = end + 1
            first = True
    emit(end)
    if nbits:
        out_codes.append(cur & 0xFF)

    header = (b"GIF89a" + struct.pack("<HH", w, h)
              + bytes([0x80 | size_field, 0, 0]) + pal_full.tobytes())
    desc = b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    body = bytes([min_code])
    for j in range(0, len(out_codes), 255):
        chunk = bytes(out_codes[j:j + 255])
        body += bytes([len(chunk)]) + chunk
    return header + desc + body + b"\x00\x3b"


def decode_wav_samples(payload: bytes,
                       max_frames: int = 2_000_000) -> np.ndarray | None:
    """REAL PCM sample decode for RIFF/WAVE (format 1, 8- or 16-bit):
    float64 mono samples in [-1, 1], channel-mixed by mean, capped at
    ``max_frames`` frames (a forged data-chunk size cannot force a large
    allocation — only bytes actually present are read).  None for
    non-PCM/compressed codecs (they need real audio libs)."""
    b = payload or b""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    fmt = None
    data = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        (size,) = struct.unpack("<I", b[i + 4:i + 8])
        if cid == b"fmt " and i + 24 <= len(b):
            fmt = struct.unpack("<HHIIHH", b[i + 8:i + 24])
        elif cid == b"data":
            data = b[i + 8:i + 8 + size]    # clamped by slicing
        i += 8 + size + (size & 1)
    if fmt is None or data is None:
        return None
    audio_format, channels, _rate, _br, block_align, bits = fmt
    if audio_format != 1 or channels < 1 or bits not in (8, 16):
        return None
    bps = bits // 8
    if block_align != channels * bps:
        return None
    n_frames = min(len(data) // block_align, max_frames)
    if n_frames == 0:
        return np.zeros(0)
    data = data[:n_frames * block_align]
    if bits == 16:
        s = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
    else:
        s = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 128.0
    return s.reshape(n_frames, channels).mean(axis=1)


def wav_pcm_embedding(payload: bytes, segments: int = 8) -> list[float] | None:
    """16-dim embedding from the REAL PCM stream: the track is split into
    ``segments`` equal spans and each contributes [RMS, zero-crossing
    rate] — the classic no-FFT envelope+pitch proxy pair.  None when the
    payload is not decodable PCM (caller falls back to the hash stub)."""
    s = decode_wav_samples(payload)
    if s is None:
        return None
    out: list[float] = []
    for seg in np.array_split(s, segments):
        if seg.size == 0:
            out += [0.0, 0.0]
            continue
        rms = float(np.sqrt(np.mean(seg * seg)))
        if seg.size > 1:
            signs = np.signbit(seg)
            zcr = float(np.mean(signs[1:] != signs[:-1]))
        else:
            zcr = 0.0
        out += [round(rms, 6), round(zcr, 6)]
    return out


def _pixel_embedding_stub(payload: bytes) -> list[float]:
    """STUB — now only the fallback for unknown formats and JPEGs
    outside the supported envelope (12-bit/lossless/arithmetic need
    Pillow): PNG, GIF, and baseline+progressive JPEG incl. 4:2:0/4:2:2
    take REAL pixel-decode paths.  Deterministic hash-derived fake."""
    h = hashlib.sha256(payload or b"").digest()
    return [round(x / 255.0, 6) for x in h[2:10]]


def _audio_embedding_stub(payload: bytes) -> list[float]:
    """STUB — now only the non-PCM fallback (PCM WAV takes the REAL
    ``wav_pcm_embedding`` path): compressed codecs need real audio libs.
    Deterministic hash-derived fake."""
    h = hashlib.sha256(payload or b"").digest()
    return [round(x / 255.0, 6) for x in h[:16]]


def encode_wav_pcm16(samples: np.ndarray, rate: int = 8000,
                     channels: int = 1) -> bytes:
    """Minimal REAL PCM16 WAV encoder — inverse fixture for
    ``decode_wav_samples``.  ``samples``: int16 array, frame-major."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# --- AVI (RIFF) MJPEG container: REAL encode/decode --------------------------
# Motion-JPEG-in-AVI is the one video format fully decodable with what is
# already in this module: the container walk is plain RIFF `struct`
# parsing (same family as WAV above) and every frame chunk is a baseline
# JPEG our own codec (operators/jpeg.py) reads.  This closes the video
# decode stub for MJPEG; inter-frame codecs (H.26x/VP9/AV1) still need
# pyav and keep the disclosed hash-stub fallback.

def _riff_chunk(tag: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return tag + struct.pack("<I", len(data)) + data + pad


def encode_avi_mjpeg(rasters: list, fps: float = 4.0) -> bytes:
    """Minimal REAL AVI writer: one MJPG 'vids' stream, one baseline-JPEG
    ``00dc`` chunk per raster — inverse fixture for ``decode_avi_meta`` /
    ``iter_avi_mjpeg_frames`` (any standard player reads the output)."""
    from .jpeg import encode_jpeg
    frames = [encode_jpeg(np.asarray(r, dtype=np.uint8)) for r in rasters]
    a0 = np.asarray(rasters[0])
    h, w = a0.shape[0], a0.shape[1]
    n, sugg = len(frames), max(len(f) for f in frames)
    scale, rate = 1000, int(round(fps * 1000))
    avih = struct.pack("<14I", int(round(1e6 / fps)), sugg * int(fps) + 1,
                       0, 0, n, 0, 1, sugg, w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIII4H", b"vids", b"MJPG", 0, 0, 0, 0,
                       scale, rate, 0, n, sugg, 10_000, 0, 0, 0, w, h)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    strl = _riff_chunk(b"LIST", b"strl" + _riff_chunk(b"strh", strh)
                       + _riff_chunk(b"strf", strf))
    hdrl = _riff_chunk(b"LIST", b"hdrl" + _riff_chunk(b"avih", avih) + strl)
    movi = _riff_chunk(b"LIST", b"movi"
                       + b"".join(_riff_chunk(b"00dc", f) for f in frames))
    return b"RIFF" + struct.pack("<I", len(b"AVI " + hdrl + movi)) \
        + b"AVI " + hdrl + movi


def _riff_walk(b: bytes, pos: int, end: int):
    """Yield (tag_or_listkind, body_start, body_end) for each chunk in
    [pos, end); tolerant of truncation (stops instead of raising)."""
    while pos + 8 <= end:
        tag = b[pos:pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        body = pos + 8
        stop = min(body + size, end)
        if tag == b"LIST" and body + 4 <= end:
            yield b[body:body + 4], body + 4, stop
        else:
            yield tag, body, stop
        pos = body + size + (size & 1)


def decode_avi_meta(payload: bytes
                    ) -> tuple[float, int, int, int] | None:
    """(fps, n_frames, width, height) from a RIFF AVI with an MJPG video
    stream, or None for anything else (caller falls back to the stub)."""
    b = payload or b""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    fps, n, w, h = 0.0, 0, 0, 0
    mjpg = False
    for kind, s, e in _riff_walk(b, 12, len(b)):
        if kind != b"hdrl":
            continue
        for tag, cs, ce in _riff_walk(b, s, e):
            if tag == b"avih" and ce - cs >= 40:
                vals = struct.unpack_from("<10I", b, cs)
                usec, n, w, h = vals[0], vals[4], vals[8], vals[9]
                if usec > 0 and fps == 0.0:
                    fps = 1e6 / usec
            elif tag == b"strl":
                for t2, ds, de in _riff_walk(b, cs, ce):
                    if t2 == b"strh" and de - ds >= 32:
                        fcc, hdl = b[ds:ds + 4], b[ds + 4:ds + 8]
                        scale, rate = struct.unpack_from("<II", b, ds + 20)
                        if fcc == b"vids":
                            mjpg = hdl in (b"MJPG", b"mjpg")
                            if scale > 0 and rate > 0:
                                fps = rate / scale
    if not mjpg or fps <= 0 or n <= 0 or w <= 0 or h <= 0:
        return None
    return fps, n, w, h


def iter_avi_mjpeg_frames(payload: bytes):
    """Yield the raw JPEG bytes of each ``00dc``/``00db`` frame chunk in
    stream order (single forward pass over the ``movi`` list)."""
    b = payload or b""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return
    for kind, s, e in _riff_walk(b, 12, len(b)):
        if kind != b"movi":
            continue
        for tag, cs, ce in _riff_walk(b, s, e):
            if tag in (b"00dc", b"00db"):
                yield b[cs:ce]


def media_from_documents(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Deterministic media synthesis: one REAL 8x8 PNG image, one REAL
    PCM16 WAV clip, and one REAL 6-frame MJPEG AVI per document,
    pixels/samples derived from the md5 of the document text.  This is
    how the multimodal path is exercised (and benchmarked, at any scale)
    in a corpus that has no binary media store — the payloads are genuine
    container files that any decoder reads, only their CONTENT is
    synthetic.  Runs as one Arrow-batched ``mapInPandas`` pass, three
    output rows per input row.
    """
    narrowed = docs.select(docs[id_col].alias("doc_id"),
                           docs[text_col].alias("text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for rec in batch.itertuples(index=False):
                digest = hashlib.md5(
                    (rec.text or "").encode("utf-8", "surrogatepass")).digest()
                raster = np.frombuffer((digest * 12)[:192],
                                       np.uint8).reshape(8, 8, 3)
                pcm = np.frombuffer((digest * 125)[:2000], "<i2")
                out.append({"media_id": f"{rec.doc_id}#img", "kind": "image",
                            "payload": encode_png(raster),
                            "mime": "image/png", "meta_width": 8,
                            "meta_height": 8, "meta_duration_s": None})
                out.append({"media_id": f"{rec.doc_id}#aud", "kind": "audio",
                            "payload": encode_wav_pcm16(pcm),
                            "mime": "audio/wav", "meta_width": None,
                            "meta_height": None,
                            "meta_duration_s": round(len(pcm) / 8000, 6)})
                vid = [np.frombuffer((hashlib.md5(digest + bytes([k])).digest()
                                      * 12)[:192], np.uint8).reshape(8, 8, 3)
                       for k in range(6)]
                out.append({"media_id": f"{rec.doc_id}#vid", "kind": "video",
                            "payload": encode_avi_mjpeg(vid, fps=2.0),
                            "mime": "video/x-msvideo", "meta_width": 8,
                            "meta_height": 8, "meta_duration_s": 3.0})
            yield pd.DataFrame(out, columns=[f.name for f in MEDIA.fields])

    return narrowed.mapInPandas(run, schema=MEDIA)


def image_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """media(kind='image') -> (media_id, format, width, height, embedding).

    Dimensions come from the REAL header parse (PNG/JPEG/GIF); unknown
    formats fall back to hash-derived pseudo-dimensions (format
    'unknown') so the pipeline shape stays total.  PNG, GIF, and
    baseline-JPEG embeddings come from the REAL pixel decodes;
    non-baseline JPEG/unknown fall back to the disclosed hash stub —
    ``embedding_kind`` records which path produced each row.
    """
    narrowed = media.filter(media.kind == "image").select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for rec in batch.itertuples(index=False):
                payload = rec.payload
                dims = decode_image_dims(payload)
                if dims is not None:
                    fmt, w, h = dims
                else:
                    d = hashlib.sha256(payload or b"").digest()
                    fmt, w, h = "unknown", 64 + d[0], 64 + d[1]
                emb = (png_pixel_embedding(payload) if fmt == "png"
                       else gif_pixel_embedding(payload) if fmt == "gif"
                       else jpeg_pixel_embedding(payload) if fmt == "jpeg"
                       else None)
                out.append({"media_id": rec.media_id, "format": fmt,
                            "width": w, "height": h,
                            "embedding": emb if emb is not None
                            else _pixel_embedding_stub(payload),
                            "embedding_kind": "pixels" if emb is not None
                            else "hash-stub"})
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_FEATURES.fields])

    return narrowed.mapInPandas(run, schema=IMAGE_FEATURES)


def frame_sample(media: DataFrame, every_s: float = 1.0,
                 max_frames: int = 10_000,
                 max_pixels: int = 4_000_000) -> DataFrame:
    """media(kind='video') -> sampled frames at ``every_s`` intervals.

    MJPEG-in-AVI payloads take the REAL path: the RIFF walk reads
    fps/frame-count from the headers, the sampled ``00dc`` chunks are
    decoded by our own JPEG codec, and each ``frame_png`` re-encodes the
    ACTUAL frame raster (``frame_kind`` = 'pixels').  Inter-frame codecs
    (H.26x/VP9/AV1 need pyav, not in this container) keep the disclosed
    deterministic stub: 8x8 pixels derived from (payload sha256, frame
    index), ``frame_kind`` = 'hash-stub'.  Both paths emit genuine PNGs
    that ``decode_png_pixels`` / any reader round-trips, and both bound
    the per-record fan-out by ``max_frames`` (a forged multi-year
    duration must not expand into an unbounded frame list — same
    adversarial discipline as max_pixels / max_chars elsewhere).
    """
    from .jpeg import decode_jpeg_pixels

    narrowed = media.filter(media.kind == "video") \
                    .select("media_id", "payload", "meta_duration_s")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for rec in batch.itertuples(index=False):
                payload = rec.payload or b""
                meta = decode_avi_meta(bytes(payload))
                if meta is not None:
                    fps, n_total, _w, _h = meta
                    dur = n_total / fps
                    n = min(max(1, int(dur / every_s)), max_frames)
                    # sample index per output slot, then ONE forward pass
                    # over movi decoding only the wanted frames
                    idx_of = [min(int(i * every_s * fps), n_total - 1)
                              for i in range(n)]
                    wanted = set(idx_of)
                    rasters = {}
                    for j, jb in enumerate(iter_avi_mjpeg_frames(bytes(payload))):
                        if j in wanted:
                            dec = decode_jpeg_pixels(jb, max_pixels)
                            if dec is not None:
                                rasters[j] = dec[3]
                        if j >= n_total - 1:
                            break
                    for i in range(n):
                        raster = rasters.get(idx_of[i])
                        if raster is None:        # corrupt frame chunk
                            raster, kind = _stub_raster(payload, i), "hash-stub"
                        else:
                            kind = "pixels"
                        out.append({
                            "media_id": rec.media_id, "frame_idx": i,
                            "frame_ts_s": round(i * every_s, 6),
                            "frame_png": encode_png(raster),
                            "frame_kind": kind,
                        })
                else:
                    # No decodable frames, but an ISO-BMFF moov still
                    # carries the REAL duration — prefer it over the
                    # catalog metadata so stub framing tracks the file.
                    mp4 = decode_mp4_meta(bytes(payload))
                    dur = (mp4[0] if mp4 is not None
                           else float(rec.meta_duration_s or 0.0))
                    n = min(max(1, int(dur / every_s)), max_frames)
                    for i in range(n):
                        out.append({
                            "media_id": rec.media_id, "frame_idx": i,
                            "frame_ts_s": round(i * every_s, 6),
                            "frame_png": encode_png(_stub_raster(payload, i)),
                            "frame_kind": "hash-stub",
                        })
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SAMPLES.fields])

    return narrowed.mapInPandas(run, schema=FRAME_SAMPLES)


def _stub_raster(payload: bytes, i: int) -> np.ndarray:
    seed = hashlib.sha256(payload or b"").digest()
    raw = (hashlib.sha256(seed + bytes([i % 256])).digest() * 6)[:8 * 8 * 3]
    return np.frombuffer(raw, np.uint8).reshape(8, 8, 3)


def audio_features(media: DataFrame) -> DataFrame:
    """media(kind='audio') -> (media_id, format, sample_rate, channels,
    duration_s, embedding).  RIFF/WAVE metadata is the REAL header parse;
    PCM WAV embeddings come from the REAL sample decode
    (``wav_pcm_embedding``), non-PCM payloads fall back to the disclosed
    hash stub — ``embedding_kind`` records which."""
    narrowed = media.filter(media.kind == "audio").select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for rec in batch.itertuples(index=False):
                payload = rec.payload
                meta = decode_wav_meta(payload)
                fmt, rate, ch, dur = ("wav", *meta) if meta else \
                    ("unknown", 0, 0, 0.0)
                emb = wav_pcm_embedding(payload) if fmt == "wav" else None
                out.append({"media_id": rec.media_id, "format": fmt,
                            "sample_rate": rate, "channels": ch,
                            "duration_s": dur,
                            "embedding": emb if emb is not None
                            else _audio_embedding_stub(payload),
                            "embedding_kind": "pcm" if emb is not None
                            else "hash-stub"})
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_FEATURES.fields])

    return narrowed.mapInPandas(run, schema=AUDIO_FEATURES)


# --- MP4 / ISO-BMFF container: REAL header parse -----------------------------
# Frame DECODE for MP4 video (H.26x/AV1) still needs pyav (disclosed stub),
# but the CONTAINER metadata — duration, fps, dimensions, codec fourcc —
# lives in plain big-endian `struct` boxes (ISO/IEC 14496-12): moov/mvhd
# for presentation duration, trak/tkhd for display width/height (16.16
# fixed point), mdia/mdhd for the media timescale, stbl/stsd for the
# sample-entry fourcc, and stbl/stts for the sample count.  Parsing them
# needs no codec work, so `video_container_features` reports REAL
# properties even where frames cannot be decoded.


def _bmff_walk(b: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for each ISO-BMFF box in
    [pos, end); tolerant of truncation/garbage (stops instead of raising
    or spinning — a zero/negative size ends the walk)."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", b, pos)
        four = b[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:                      # 64-bit largesize
            if pos + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", b, pos + 8)
            body = pos + 16
        elif size == 0:                    # box runs to end of file
            size = end - pos
        if size < body - pos:              # corrupt: would not advance
            return
        stop = min(pos + size, end)
        yield four, body, stop
        pos += size


def decode_mp4_meta(payload: bytes
                    ) -> tuple[float, float, int, int, int, str] | None:
    """(duration_s, fps, n_frames, width, height, codec) from an
    ISO-BMFF (MP4/MOV) ``moov`` header, or None if the bytes are not a
    parseable BMFF file with a video track.  Pure stdlib ``struct`` —
    no codec work, no media libraries.

    fps is derived as n_frames / track-duration (mdhd timescale), the
    same figure ffprobe reports for constant-rate streams; width/height
    are tkhd's 16.16 fixed-point display size.
    """
    b = payload or b""
    if len(b) < 16:
        return None
    boxes = dict()
    has_ftyp = False
    for four, s, e in _bmff_walk(b, 0, len(b)):
        if four == b"ftyp":
            has_ftyp = True
        boxes.setdefault(four, (s, e))
    if not has_ftyp or b"moov" not in boxes:
        return None
    moov_s, moov_e = boxes[b"moov"]

    def _fullbox(body_s: int) -> tuple[int, int]:
        """(version, first-field offset) of a FullBox body."""
        return b[body_s], body_s + 4

    dur_s = 0.0
    best = None                    # (dur, fps, n, w, h, codec) of video trak
    for four, s, e in _bmff_walk(b, moov_s, moov_e):
        if four == b"mvhd" and e - s >= 20:
            ver, p = _fullbox(s)
            if ver == 1 and e - s >= 28:
                ts, = struct.unpack_from(">I", b, p + 16)
                dur, = struct.unpack_from(">Q", b, p + 20)
            else:
                ts, dur = struct.unpack_from(">II", b, p + 8)
            if ts > 0:
                dur_s = dur / ts
        elif four == b"trak":
            w = h = 0
            md_ts, md_dur, n_frames = 0, 0, 0
            codec, is_video = "", False
            for t2, s2, e2 in _bmff_walk(b, s, e):
                if t2 == b"tkhd" and e2 - s2 >= 84:
                    ver, p = _fullbox(s2)
                    off = p + (84 if ver == 1 else 72)   # matrix end
                    if off + 8 <= e2:
                        wf, hf = struct.unpack_from(">II", b, off)
                        w, h = wf >> 16, hf >> 16
                elif t2 == b"mdia":
                    for t3, s3, e3 in _bmff_walk(b, s2, e2):
                        if t3 == b"mdhd" and e3 - s3 >= 20:
                            ver, p = _fullbox(s3)
                            if ver == 1 and e3 - s3 >= 28:
                                md_ts, = struct.unpack_from(">I", b, p + 16)
                                md_dur, = struct.unpack_from(">Q", b, p + 20)
                            else:
                                md_ts, md_dur = struct.unpack_from(
                                    ">II", b, p + 8)
                        elif t3 == b"hdlr" and e3 - s3 >= 12:
                            is_video |= b[s3 + 8:s3 + 12] == b"vide"
                        elif t3 == b"minf":
                            for t4, s4, e4 in _bmff_walk(b, s3, e3):
                                if t4 != b"stbl":
                                    continue
                                for t5, s5, e5 in _bmff_walk(b, s4, e4):
                                    if t5 == b"stsd" and e5 - s5 >= 16:
                                        codec = b[s5 + 12:s5 + 16].decode(
                                            "ascii", "replace").strip()
                                    elif t5 == b"stts" and e5 - s5 >= 8:
                                        cnt, = struct.unpack_from(
                                            ">I", b, s5 + 4)
                                        p5 = s5 + 8
                                        for _ in range(cnt):
                                            if p5 + 8 > e5:
                                                break
                                            c, = struct.unpack_from(
                                                ">I", b, p5)
                                            n_frames += c
                                            p5 += 8
            if is_video and w > 0 and h > 0 and best is None:
                # FIRST video trak wins on multi-track files (ffprobe
                # reports the first stream; keep reassigning and the
                # LAST would win).  An explicit md_ts test keeps a
                # legitimate zero track duration instead of silently
                # substituting the movie duration via `or` truthiness.
                tdur = (md_dur / md_ts) if md_ts > 0 else dur_s
                fps = (n_frames / tdur) if tdur > 0 else 0.0
                best = (tdur if md_ts > 0 else dur_s,
                        fps, n_frames, w, h, codec)
    if best is None:
        return None
    return best


def encode_mp4_stub(width: int, height: int, fps: float, n_frames: int,
                    codec: bytes = b"avc1") -> bytes:
    """Minimal structurally-valid ISO-BMFF writer: ftyp + moov
    (mvhd/trak(tkhd, mdia(mdhd, hdlr, minf(stbl(stsd, stts))))) + empty
    mdat.  The moov boxes carry REAL metadata that any BMFF parser
    (including ``decode_mp4_meta`` and ffprobe's box walk) reads; there
    is no sample payload — this is the header-only inverse fixture for
    the container-metadata path."""
    def box(four: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + four + body

    ts = 90_000                       # MPEG convention; exact for 24/25/30/60
    sdelta = max(1, int(round(ts / fps))) if fps > 0 else ts
    dur = sdelta * n_frames
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = box(b"mvhd", struct.pack(">B3x4I", 0, 0, 0, ts, dur)
               + struct.pack(">i2h2xQ", 0x00010000, 0x0100, 0, 0)
               + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                             0x40000000)
               + struct.pack(">6I", 0, 0, 0, 0, 0, 0) + struct.pack(">I", 2))
    tkhd = box(b"tkhd", struct.pack(">B3s5I", 0, b"\x00\x00\x07", 0, 0, 1,
                                    0, dur)
               + struct.pack(">2I2h2h", 0, 0, 0, 0, 0, 0)
               + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                             0x40000000)
               + struct.pack(">II", width << 16, height << 16))
    mdhd = box(b"mdhd", struct.pack(">B3x4I2H", 0, 0, 0, ts, dur,
                                    0x55C4, 0))
    hdlr = box(b"hdlr", b"\x00\x00\x00\x00\x00\x00\x00\x00vide"
               + b"\x00" * 12 + b"VideoHandler\x00")
    entry = box(codec[:4].ljust(4, b"\x00"),
                b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
                + struct.pack(">2H", width, height)
                + struct.pack(">2I", 0x00480000, 0x00480000)
                + struct.pack(">I", 0) + struct.pack(">H", 1)
                + b"\x00" * 32 + struct.pack(">Hh", 0x18, -1))
    stsd = box(b"stsd", struct.pack(">B3xI", 0, 1) + entry)
    stts = box(b"stts", struct.pack(">B3xI", 0, 1)
               + struct.pack(">II", n_frames, sdelta))
    stbl = box(b"stbl", stsd + stts
               + box(b"stsc", struct.pack(">B3xI", 0, 0))
               + box(b"stsz", struct.pack(">B3x2I", 0, 0, 0))
               + box(b"stco", struct.pack(">B3xI", 0, 0)))
    minf = box(b"minf",
               box(b"vmhd", struct.pack(">B3s4H", 0, b"\x00\x00\x01",
                                        0, 0, 0, 0))
               + box(b"dinf", box(b"dref", struct.pack(">B3xI", 0, 1)
                     + box(b"url ", b"\x00\x00\x00\x01")))
               + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + moov + box(b"mdat", b"")


VIDEO_CONTAINER_FEATURES = StructType([
    StructField("media_id", StringType()),
    StructField("container", StringType()),   # avi | mp4 | unknown
    StructField("codec", StringType()),
    StructField("fps", DoubleType()),
    StructField("n_frames", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("duration_s", DoubleType()),
    StructField("meta_kind", StringType()),   # headers | opaque
])


def video_container_features(media: DataFrame) -> DataFrame:
    """media(kind='video') -> one row of REAL container-level properties
    per payload: RIFF AVI headers (``decode_avi_meta``'s walk) or
    ISO-BMFF moov boxes (``decode_mp4_meta``).  ``meta_kind='headers'``
    marks a real parse; unparseable payloads keep their catalog
    metadata with ``meta_kind='opaque'`` (no fabricated numbers).  One
    Arrow-batched ``mapInPandas`` pass, no shuffle."""
    narrowed = media.filter(media.kind == "video") \
                    .select("media_id", "payload", "meta_duration_s")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for rec in batch.itertuples(index=False):
                payload = bytes(rec.payload or b"")
                avi = decode_avi_meta(payload)
                row = {"media_id": rec.media_id, "container": "unknown",
                       "codec": None, "fps": None, "n_frames": None,
                       "width": None, "height": None,
                       "duration_s": rec.meta_duration_s,
                       "meta_kind": "opaque"}
                if avi is not None:
                    fps, n, w, h = avi
                    row.update(container="avi", codec="MJPG",
                               fps=round(fps, 6), n_frames=n, width=w,
                               height=h, duration_s=round(n / fps, 6),
                               meta_kind="headers")
                else:
                    mp4 = decode_mp4_meta(payload)
                    if mp4 is not None:
                        dur, fps, n, w, h, codec = mp4
                        row.update(container="mp4", codec=codec or None,
                                   fps=round(fps, 6), n_frames=n,
                                   width=w, height=h,
                                   duration_s=round(dur, 6),
                                   meta_kind="headers")
                out.append(row)
            yield pd.DataFrame(
                out, columns=[f.name for f in
                              VIDEO_CONTAINER_FEATURES.fields])

    return narrowed.mapInPandas(run, schema=VIDEO_CONTAINER_FEATURES)
