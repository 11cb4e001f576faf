"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over ``mapInPandas``.  The image/audio codec libraries are not in this
container, so the decode kernels are STUBS — a deterministic fake keyed on
the content hash stands in, clearly marked — while everything Spark-side
(schemas, batch iteration, partitioning, output shapes) is real and
tested.  Swapping in Pillow/librosa/pyav on a real cluster changes ONLY
the bodies of ``_decode_image_stub`` / ``_decode_audio_stub``.
"""

from __future__ import annotations

import hashlib
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
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("embedding", ArrayType(DoubleType())),
])

FRAME_SAMPLES = StructType([
    StructField("media_id", StringType()),
    StructField("frame_idx", LongType()),
    StructField("frame_ts_s", DoubleType()),
    StructField("frame_png", BinaryType()),
])


def _decode_image_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB: deterministic fake decode (no Pillow in this container).

    Real implementation: ``Image.open(io.BytesIO(payload))`` ->
    (width, height, pooled-pixel embedding).  The fake derives stable
    pseudo-dimensions and an 8-dim embedding from the sha256 of the bytes
    so tests exercise real Arrow batch plumbing with stable outputs.
    """
    h = hashlib.sha256(payload or b"").digest()
    width = 64 + h[0]
    height = 64 + h[1]
    emb = [round(b / 255.0, 6) for b in h[2:10]]
    return width, height, emb


def image_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """media(kind='image') -> (media_id, width, height, embedding).

    The UDF signature, column pruning, and Arrow batch shape are the real
    production plumbing; only the decode kernel is stubbed.
    """
    narrowed = media.filter(media.kind == "image").select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for rec in batch.itertuples(index=False):
                w, h, emb = _decode_image_stub(rec.payload)
                out.append({"media_id": rec.media_id, "width": w,
                            "height": h, "embedding": emb})
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
    """media(kind='audio') -> (media_id, embedding).  STUB decode —
    real body would be librosa mel-spectrogram pooling."""
    narrowed = media.filter(media.kind == "audio").select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for rec in batch.itertuples(index=False):
                h = hashlib.sha256(rec.payload or b"").digest()
                out.append({"media_id": rec.media_id,
                            "embedding": [round(b / 255.0, 6) for b in h[:16]]})
            yield pd.DataFrame(out, columns=["media_id", "embedding"])

    return narrowed.mapInPandas(
        run, schema=StructType([StructField("media_id", StringType()),
                                StructField("embedding", ArrayType(DoubleType()))]))
