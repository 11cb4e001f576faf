"""WARC/WET archive source (sources/warc.py): round-trip, damage
tolerance, charset handling, and the documents-table fixture builder."""

import gzip

from pyspark.sql import functions as F

from knowledgebase_processor_spark.sources.warc import (
    http_response_payload, iter_warc_records, pages_from_warc, warc_bytes,
    warc_from_documents, warc_records,
)

RECS = [
    ("response", "https://a.example/x", "2024-11-07T12:00:01Z",
     http_response_payload("hello <b>world</b>".encode())),
    ("response", "https://a.example/latin", "2024-11-07T12:00:02Z",
     http_response_payload("caf\xe9".encode("latin-1"),
                           content_type="text/html; charset=iso-8859-1")),
    ("conversion", "https://a.example/wet", "2024-11-07T12:00:03Z",
     "plain extracted text".encode()),
    ("metadata", "https://a.example/x", "2024-11-07T12:00:01Z",
     b"fetchTimeMs: 12"),
    ("response", "https://a.example/404", "2024-11-07T12:00:04Z",
     http_response_payload(b"gone", status=404)),
]


def _files_df(spark, buf, path="mem://t/0.warc.gz"):
    return spark.createDataFrame([(path, bytearray(buf))],
                                 "path string, content binary")


def test_roundtrip_gzip_members():
    buf = warc_bytes(RECS, compress=True)
    # per-record gzip members: N magics, and a mid-stream slice at the
    # 2nd member still inflates (what record-level random access needs)
    assert buf.count(b"\x1f\x8b\x08") == len(RECS)
    got = list(iter_warc_records(buf))
    assert [h["warc-type"] for _, h, _ in got] == [r[0] for r in RECS]
    assert [h["warc-target-uri"] for _, h, _ in got] == [r[1] for r in RECS]
    assert [p for _, _, p in got] == [r[3] for r in RECS]


def test_roundtrip_uncompressed_and_offsets():
    buf = warc_bytes(RECS, compress=False)
    got = list(iter_warc_records(buf))
    assert len(got) == len(RECS)
    for off, h, _ in got:
        assert buf.startswith(b"WARC/1.0\r\n", off)
    assert [h["content-length"] for _, h, _ in got] == \
        [str(len(r[3])) for r in RECS]


def test_truncated_tail_and_leading_garbage():
    buf = warc_bytes(RECS, compress=False)
    cut = buf[: buf.rfind(b"WARC/1.0") + 40]     # damaged last record
    got = list(iter_warc_records(b"garbage bytes\r\n" + cut))
    assert len(got) == len(RECS) - 1             # tail dropped, no raise
    assert list(iter_warc_records(b"")) == []
    assert list(iter_warc_records(b"no records here")) == []


def test_corrupt_gzip_member_keeps_clean_prefix():
    """A bit-flipped gzip member must not raise out of the parse (one
    damaged archive must not abort the task — Spark retries hit the
    same bytes deterministically): the records whose members inflated
    cleanly before the damage survive.  Regression for the round-2
    review finding (zlib.error propagated from _inflate)."""
    buf = bytearray(warc_bytes(RECS, compress=True))
    # find the 3rd member's magic and flip a byte well inside it
    pos = -1
    for _ in range(3):
        pos = buf.index(b"\x1f\x8b\x08", pos + 1)
    buf[pos + 20] ^= 0xFF
    got = list(iter_warc_records(bytes(buf)))
    assert 0 < len(got) <= len(RECS)            # no raise, prefix kept
    assert [h["warc-target-uri"] for _, h, _ in got] == \
        [r[1] for r in RECS[: len(got)]]
    # total garbage after the magic: empty result, still no raise
    assert list(iter_warc_records(b"\x1f\x8b\x08" + b"\x00" * 64)) == []


def test_records_and_pages(spark):
    recs = warc_records(_files_df(spark, warc_bytes(RECS)))
    assert recs.count() == len(RECS)
    pages = {r["url"]: r for r in pages_from_warc(recs).collect()}
    assert len(pages) == 4                       # metadata filtered out
    assert pages["https://a.example/x"]["text"] == "hello <b>world</b>"
    assert pages["https://a.example/x"]["http_status"] == 200
    assert pages["https://a.example/x"]["mime"] == "text/html"
    assert pages["https://a.example/latin"]["text"] == "caf\xe9"
    assert pages["https://a.example/wet"]["http_status"] is None
    assert pages["https://a.example/wet"]["text"] == "plain extracted text"
    assert pages["https://a.example/404"]["http_status"] == 404
    ts = pages["https://a.example/x"]["warc_ts"]
    assert (ts.year, ts.second) == (2024, 1)


def test_whole_file_gzip_also_inflates():
    # some mirrors recompress whole-file: the reader must not care
    raw = warc_bytes(RECS, compress=False)
    got = list(iter_warc_records(gzip.compress(raw, mtime=0)))
    assert len(got) == len(RECS)


def test_documents_fixture_roundtrip(spark):
    docs = spark.createDataFrame(
        [(i, f"text of doc {i} é") for i in range(10)],
        "doc_id long, text string")
    files = warc_from_documents(docs, files=3)
    assert files.count() == 3
    pages = pages_from_warc(warc_records(files))
    back = (pages.select(
                F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long")
                 .alias("doc_id"), "text", "http_status")
            .orderBy("doc_id").collect())
    assert [(r["doc_id"], r["text"]) for r in back] == \
        [(i, f"text of doc {i} é") for i in range(10)]
    assert all(r["http_status"] == 200 for r in back)
