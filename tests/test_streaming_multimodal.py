"""Streaming watch job + multimodal decode plumbing."""

import hashlib
import struct
import zlib

from knowledgebase_processor_spark.operators.multimodal import (
    audio_features, decode_image_dims, decode_wav_meta, frame_sample,
    image_features,
)
from knowledgebase_processor_spark.streaming.jobs import (
    watch_documents, windowed_event_counts,
)


def _png_bytes(w: int, h: int) -> bytes:
    """A minimal REAL 1-bit grayscale PNG (valid chunks + CRCs)."""
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))
    ihdr = struct.pack(">IIBBBBB", w, h, 1, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x00" * ((w + 7) // 8) for _ in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _jpeg_bytes(w: int, h: int) -> bytes:
    """A REAL JPEG header prefix through SOF0 (marker walk must skip the
    APP0 and quantization segments before the frame header)."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", h, w) + b"\x01\x01\x11\x00")
    return b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"


def _wav_bytes(rate: int, channels: int, seconds: float) -> bytes:
    """A REAL little PCM16 WAV file."""
    bps = 2
    byte_rate = rate * channels * bps
    n_data = int(byte_rate * seconds)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate,
                      channels * bps, 16)
    data = b"\x00" * n_data
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _media(spark):
    return spark.createDataFrame(
        [("img1", "image", _png_bytes(320, 200), "image/png", None, None, None),
         ("img2", "image", b"not-an-image", "image/png", None, None, None),
         ("img3", "image", _jpeg_bytes(640, 480), "image/jpeg", None, None, None),
         ("vid1", "video", b"mp4bytes", "video/mp4", None, None, 3.5),
         ("aud1", "audio", _wav_bytes(8000, 1, 2.0), "audio/wav", None, None, None)],
        "media_id string, kind string, payload binary, mime string, "
        "meta_width long, meta_height long, meta_duration_s double")


def test_header_decoders_on_real_bytes():
    """The container-header kernels parse REAL file bytes (not stubs)."""
    assert decode_image_dims(_png_bytes(320, 200)) == ("png", 320, 200)
    assert decode_image_dims(_jpeg_bytes(640, 480)) == ("jpeg", 640, 480)
    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 6
    assert decode_image_dims(gif) == ("gif", 12, 34)
    assert decode_image_dims(b"junk") is None
    assert decode_image_dims(b"") is None
    assert decode_wav_meta(_wav_bytes(44100, 2, 1.5)) == (44100, 2, 1.5)
    assert decode_wav_meta(b"RIFFxxxxNOPE") is None
    # truncated headers must not raise
    assert decode_image_dims(_png_bytes(1, 1)[:20]) is None
    assert decode_wav_meta(_wav_bytes(8000, 1, 1.0)[:16]) is None


def test_header_decoders_hostile_bytes_fuzz():
    """Adversarial-probe lane (round-1 discipline): random and
    structure-adjacent hostile byte strings must never raise, never loop,
    and finish fast — including truncations at every prefix length of
    valid files and forged chunk/segment lengths."""
    import random
    import time

    rnd = random.Random(99)
    png, jpg, wav = _png_bytes(5, 7), _jpeg_bytes(9, 3), _wav_bytes(8000, 1, 0.5)
    cases = [bytes(rnd.randrange(256) for _ in range(n))
             for n in (0, 1, 7, 64, 4096) for _ in range(20)]
    cases += [png[:i] for i in range(len(png))]
    cases += [jpg[:i] for i in range(len(jpg))]
    cases += [wav[:i] for i in range(0, len(wav), 97)]
    # forged lengths: JPEG segment len 0 (must still terminate), WAV
    # chunk size 0 and 0xFFFFFFFF (must not loop / overread)
    cases.append(b"\xff\xd8\xff\xe0\x00\x00" + b"\xff" * 64)
    cases.append(b"RIFF\x10\x00\x00\x00WAVE" + b"junk\x00\x00\x00\x00" * 50)
    cases.append(b"RIFF\x10\x00\x00\x00WAVE" + b"fmt \xff\xff\xff\xff" + b"x" * 64)
    t0 = time.perf_counter()
    for b in cases:
        decode_image_dims(b)
        decode_wav_meta(b)
    assert time.perf_counter() - t0 < 5


def test_image_features_real_dims_and_stub_fallback(spark):
    feats = {r["media_id"]: r for r in image_features(_media(spark)).collect()}
    assert set(feats) == {"img1", "img2", "img3"}
    assert (feats["img1"]["format"], feats["img1"]["width"],
            feats["img1"]["height"]) == ("png", 320, 200)
    assert (feats["img3"]["format"], feats["img3"]["width"],
            feats["img3"]["height"]) == ("jpeg", 640, 480)
    # unparseable payload falls back to the disclosed hash stub
    h = hashlib.sha256(b"not-an-image").digest()
    assert feats["img2"]["format"] == "unknown"
    assert feats["img2"]["width"] == 64 + h[0]
    assert len(feats["img1"]["embedding"]) == 8


def test_frame_sampling_fanout(spark):
    frames = frame_sample(_media(spark), every_s=1.0).collect()
    assert len(frames) == 3          # 3.5s video @1fps -> 3 frames
    assert [f["frame_idx"] for f in sorted(frames, key=lambda r: r["frame_idx"])] == [0, 1, 2]


def test_audio_features_real_wav_meta(spark):
    out = audio_features(_media(spark)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["format"], r["sample_rate"], r["channels"], r["duration_s"]) == \
        ("wav", 8000, 1, 2.0)
    assert len(r["embedding"]) == 16


def test_watch_documents_streaming(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.md").write_text("# Title\n- [ ] task one\n")
    out_dir = str(tmp_path / "triples")
    q = watch_documents(spark, str(src), out_dir, str(tmp_path / "ckpt")).start()
    q.awaitTermination(120)
    t = spark.read.parquet(out_dir)
    assert t.filter("pred like '%isCompleted'").count() == 1

    # second batch: new file appears -> incremental processing
    (src / "b.md").write_text("- [x] done task\n")
    q2 = watch_documents(spark, str(src), out_dir, str(tmp_path / "ckpt")).start()
    q2.awaitTermination(120)
    t2 = spark.read.parquet(out_dir)
    assert t2.filter("pred like '%isCompleted'").count() == 2


def test_windowed_event_counts_batch_parity(spark):
    events = spark.createDataFrame(
        [("2024-01-01 10:05:00", "click", 1.0),
         ("2024-01-01 10:55:00", "click", 2.0),
         ("2024-01-01 11:05:00", "click", 4.0)],
        "ts string, event_type string, value double",
    ).selectExpr("cast(ts as timestamp) ts", "event_type", "value")
    out = {(str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
           for r in windowed_event_counts(events).collect()}
    assert out[("2024-01-01 10:00:00", "click")] == (2, 3.0)
    assert out[("2024-01-01 11:00:00", "click")] == (1, 4.0)


def test_dedup_crawl_stream(spark, tmp_path):
    """Streaming fingerprint-dedup with bounded (watermarked) state: three
    crawls of one url where two carry identical content keep 2 rows."""
    import datetime as dt

    from knowledgebase_processor_spark.streaming.jobs import dedup_crawl_stream

    t = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [("https://a", t, b"", "same content", "en"),
            ("https://a", t + dt.timedelta(hours=1), b"", "same content", "en"),
            ("https://a", t + dt.timedelta(hours=2), b"", "changed content", "en")]
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"

    # batch degeneration: plain dropDuplicates on (url, fingerprint)
    batch = dedup_crawl_stream(spark.createDataFrame(rows, schema))
    assert batch.count() == 2

    # streaming path: file source -> availableNow -> memory sink
    src = tmp_path / "crawl_in"
    src.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite") \
        .parquet(str(src / "batch0"))
    stream = spark.readStream.schema(schema).parquet(str(src / "batch0"))
    q = (dedup_crawl_stream(stream).writeStream.format("memory")
         .queryName("dedup_out").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT text FROM dedup_out").collect()
    assert sorted(r.text for r in got) == ["changed content", "same content"]
