"""Stateful version tracking (applyInPandasWithState) + incremental snapshot."""

import datetime as dt

from pyspark.sql import functions as F

from knowledgebase_processor_spark.sources.web_pages import latest_snapshot


def _pages(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html string, text string, lang string")


def test_latest_snapshot_keeps_newest_crawl(spark):
    t = dt.datetime(2024, 11, 7, 12, 0)
    pages = _pages(spark, [
        ("u1", t, "<html>", "old text", "en"),
        ("u1", t + dt.timedelta(days=1), "<html>", "new text", "en"),
        ("u2", t, "<html>", "only", "en"),
    ])
    snap = {r["url"]: r["text"] for r in latest_snapshot(pages).collect()}
    assert snap == {"u1": "new text", "u2": "only"}


def test_stateful_version_tracking_streaming(spark, tmp_path):
    """Drive applyInPandasWithState through a real streaming query with two
    rate-limited file batches."""
    import json
    import os

    from knowledgebase_processor_spark.streaming.stateful import track_document_versions

    src = tmp_path / "in"
    src.mkdir()

    def write_batch(name, rows):
        with open(src / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    schema = "url string, warc_ts timestamp, text string"
    write_batch("b1.json", [
        {"url": "u1", "warc_ts": "2024-11-07 12:00:00", "text": "hello world"},
        {"url": "u2", "warc_ts": "2024-11-07 12:00:00", "text": "other page"},
    ])
    stream = spark.readStream.schema(schema).json(str(src))
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (track_document_versions(stream)
         .writeStream.format("parquet")
         .option("path", out_dir).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    # batch 2: u1 unchanged content, u2 changed
    write_batch("b2.json", [
        {"url": "u1", "warc_ts": "2024-11-08 12:00:00", "text": "hello   WORLD"},
        {"url": "u2", "warc_ts": "2024-11-08 12:00:00", "text": "other page v2"},
    ])
    q2 = (track_document_versions(spark.readStream.schema(schema).json(str(src)))
          .writeStream.format("parquet")
          .option("path", out_dir).option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)

    rows = {(r["url"], r["version"], r["changed"])
            for r in spark.read.parquet(out_dir).collect()}
    assert rows == {
        ("u1", 1, True),    # first crawl
        ("u1", 1, False),   # recrawl, whitespace/case-normalized identical
        ("u2", 1, True),
        ("u2", 2, True),    # content actually changed
    }
