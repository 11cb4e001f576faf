"""Streaming watch job + multimodal stub plumbing."""

import hashlib

from knowledgebase_processor_spark.operators.multimodal import (
    audio_features, frame_sample, image_features,
)
from knowledgebase_processor_spark.streaming.jobs import (
    watch_documents, windowed_event_counts,
)


def _media(spark):
    return spark.createDataFrame(
        [("img1", "image", b"pngbytes-1", "image/png", None, None, None),
         ("img2", "image", b"pngbytes-2", "image/png", None, None, None),
         ("vid1", "video", b"mp4bytes", "video/mp4", None, None, 3.5),
         ("aud1", "audio", b"wavbytes", "audio/wav", None, None, 2.0)],
        "media_id string, kind string, payload binary, mime string, "
        "meta_width long, meta_height long, meta_duration_s double")


def test_image_features_deterministic(spark):
    feats = {r["media_id"]: r for r in image_features(_media(spark)).collect()}
    assert set(feats) == {"img1", "img2"}
    h = hashlib.sha256(b"pngbytes-1").digest()
    assert feats["img1"]["width"] == 64 + h[0]
    assert len(feats["img1"]["embedding"]) == 8


def test_frame_sampling_fanout(spark):
    frames = frame_sample(_media(spark), every_s=1.0).collect()
    assert len(frames) == 3          # 3.5s video @1fps -> 3 frames
    assert [f["frame_idx"] for f in sorted(frames, key=lambda r: r["frame_idx"])] == [0, 1, 2]


def test_audio_features(spark):
    out = audio_features(_media(spark)).collect()
    assert len(out) == 1 and len(out[0]["embedding"]) == 16


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
