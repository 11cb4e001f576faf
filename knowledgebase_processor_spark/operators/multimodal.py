"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over ``mapInPandas``.

Decode status per kernel:

* **Container headers are REAL stdlib parses** — PNG IHDR, JPEG SOFn,
  GIF logical screen descriptor (``decode_image_dims``) and RIFF/WAVE
  fmt+data chunks (``decode_wav_meta``) need only ``struct``; they run
  on real file bytes and are tested against real fixtures.
* **Pixel/sample decode stays a disclosed STUB** (``_pixel_embedding_stub``,
  ``_audio_embedding_stub``): producing the actual raster / PCM stream
  for arbitrary codecs needs Pillow/librosa/pyav, which are not in this
  container.  The fake derives a stable embedding from the content hash
  so tests exercise the real Arrow batch plumbing with stable outputs.
  Swapping in the codec libs on a real cluster changes ONLY those two
  function bodies.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

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
])

AUDIO_FEATURES = StructType([
    StructField("media_id", StringType()),
    StructField("format", StringType()),        # wav | unknown
    StructField("sample_rate", LongType()),
    StructField("channels", LongType()),
    StructField("duration_s", DoubleType()),
    StructField("embedding", ArrayType(DoubleType())),
])

FRAME_SAMPLES = StructType([
    StructField("media_id", StringType()),
    StructField("frame_idx", LongType()),
    StructField("frame_ts_s", DoubleType()),
    StructField("frame_png", BinaryType()),
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


def _pixel_embedding_stub(payload: bytes) -> list[float]:
    """STUB: pooled-pixel embedding requires a real raster decode
    (Pillow) — not in this container.  Deterministic hash-derived fake."""
    h = hashlib.sha256(payload or b"").digest()
    return [round(x / 255.0, 6) for x in h[2:10]]


def _audio_embedding_stub(payload: bytes) -> list[float]:
    """STUB: mel-spectrogram pooling requires PCM decode (librosa) — not
    in this container.  Deterministic hash-derived fake."""
    h = hashlib.sha256(payload or b"").digest()
    return [round(x / 255.0, 6) for x in h[:16]]


def image_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """media(kind='image') -> (media_id, format, width, height, embedding).

    Dimensions come from the REAL header parse (PNG/JPEG/GIF); unknown
    formats fall back to hash-derived pseudo-dimensions (format
    'unknown') so the pipeline shape stays total.  The embedding is the
    disclosed pixel-decode stub.
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
                out.append({"media_id": rec.media_id, "format": fmt,
                            "width": w, "height": h,
                            "embedding": _pixel_embedding_stub(payload)})
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_FEATURES.fields])

    return narrowed.mapInPandas(run, schema=IMAGE_FEATURES)


def frame_sample(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """media(kind='video') -> sampled frames at ``every_s`` intervals.

    STUB decode: frame bytes are a deterministic function of
    (payload sha256, frame index); the fan-out shape (one row per sampled
    frame, duration-driven) is real.
    """
    narrowed = media.filter(media.kind == "video") \
                    .select("media_id", "payload", "meta_duration_s")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for rec in batch.itertuples(index=False):
                dur = float(rec.meta_duration_s or 0.0)
                n = max(1, int(dur / every_s))
                seed = hashlib.sha256(rec.payload or b"").digest()
                for i in range(n):
                    out.append({
                        "media_id": rec.media_id, "frame_idx": i,
                        "frame_ts_s": round(i * every_s, 6),
                        "frame_png": hashlib.sha256(seed + bytes([i % 256])).digest(),
                    })
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SAMPLES.fields])

    return narrowed.mapInPandas(run, schema=FRAME_SAMPLES)


def audio_features(media: DataFrame) -> DataFrame:
    """media(kind='audio') -> (media_id, format, sample_rate, channels,
    duration_s, embedding).  RIFF/WAVE metadata is the REAL header parse;
    the embedding is the disclosed PCM-decode stub."""
    narrowed = media.filter(media.kind == "audio").select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for rec in batch.itertuples(index=False):
                payload = rec.payload
                meta = decode_wav_meta(payload)
                fmt, rate, ch, dur = ("wav", *meta) if meta else \
                    ("unknown", 0, 0, 0.0)
                out.append({"media_id": rec.media_id, "format": fmt,
                            "sample_rate": rate, "channels": ch,
                            "duration_s": dur,
                            "embedding": _audio_embedding_stub(payload)})
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_FEATURES.fields])

    return narrowed.mapInPandas(run, schema=AUDIO_FEATURES)
