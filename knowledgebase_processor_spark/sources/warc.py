"""WARC / WET web-archive source (and serializer) — the Common Crawl
ingestion path.

Common Crawl ships webtext as WARC files (raw HTTP responses framed by
ISO 28500 records) and WET files (extracted-text ``conversion``
records).  The reference engine has no archive path (it reads a
filesystem of markdown, cf. reference ``reader/reader.py:38-60``); a
web-scale corpus build starts from archives, so this module is part of
the beyond-reference training-data surface:

* ``read_warc(spark, path)`` — ``binaryFile`` scan -> Arrow-batched
  ``mapInPandas`` record parser.  **File-level parallelism**: a gzipped
  WARC member cannot be split without an external index, and Common
  Crawl sizes files (~1 GB) precisely so that one-file-per-task is the
  distribution unit — the same layout the public cc-pyspark readers
  use.  Peak memory per task is bounded by one inflated file, the
  standard trade-off at this layer.
* ``warc_records(df)`` — the same parser over any (path, content)
  binary frame (so synthetic in-memory archives test the real path).
* ``pages_from_warc(records)`` — ``response``/``conversion`` records ->
  the engine's page shape (url, warc_ts, http_status, mime, text): HTTP
  status line + headers split off, charset honoured from the
  Content-Type header with utf-8(replace) fallback.  Everything after
  the parser is plain JVM columns.
* ``warc_bytes(records)`` / ``warc_from_documents(docs)`` — the inverse
  (serializer): per-record gzip members (the WARC spec's recommended
  compression, what makes ``warcio``-style random access possible),
  deterministic record ids (md5 of url|date — no wall clock, no
  randomness).  Used by the archive sink tests and the driver's
  round-trip query q65.

Payloads stay ``binary`` until a projection asks for text, so media
records flow into operators/multimodal.py without a decode detour.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType)

WARC_VERSION = b"WARC/1.0"

RECORD_SCHEMA = StructType([
    StructField("path", StringType()),
    StructField("record_offset", LongType()),   # into the INFLATED stream
    StructField("warc_type", StringType()),
    StructField("url", StringType()),
    StructField("warc_date", StringType()),
    StructField("record_id", StringType()),
    StructField("content_type", StringType()),
    StructField("payload", BinaryType()),
])


def _inflate(buf: bytes) -> bytes:
    """Inflate a (possibly multi-member) gzip stream; passthrough if not
    gzip.  Per-record members simply concatenate.

    Tolerant like the record parser below: a corrupt member (bit-flipped
    deflate data, bad CRC trailer) keeps whatever inflated cleanly so
    far and stops — propagating ``zlib.error`` out of the mapInPandas
    generator would fail the task, Spark's retries would hit the same
    bytes deterministically, and one damaged archive would abort the
    whole read instead of skipping its damaged records."""
    if buf[:2] != b"\x1f\x8b":
        return buf
    out, pos = [], 0
    while pos < len(buf) and buf[pos:pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(buf[pos:]))
        except zlib.error:
            break                       # corrupt member: keep the prefix
        # unused_data is the remainder AFTER this member's trailer
        rest = d.unused_data
        pos = len(buf) - len(rest) if rest else len(buf)
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.decode("ascii", "replace").strip().lower()] = \
                v.decode("utf-8", "replace").strip()
    return headers


def iter_warc_records(buf: bytes) -> Iterator[tuple[int, dict[str, str], bytes]]:
    """(offset, headers, payload) per record of one (inflated) WARC
    stream.  Tolerant: skips leading garbage to the next ``WARC/`` line,
    stops at a truncated tail instead of raising — crawl archives do
    contain damaged records and one bad file must not kill a task."""
    raw = _inflate(buf)
    pos = 0
    n = len(raw)
    while pos < n:
        if not raw.startswith(b"WARC/", pos):
            nxt = raw.find(b"\r\nWARC/", pos)
            if nxt < 0:
                return
            pos = nxt + 2
        head_end = raw.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        headers = _parse_headers(raw[pos:head_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = head_end + 4
        if body_start + length > n:
            return                      # truncated tail
        yield pos, headers, raw[body_start:body_start + length]
        pos = body_start + length + 4   # trailing CRLF CRLF


def warc_records(files: DataFrame, path_col: str = "path",
                 content_col: str = "content") -> DataFrame:
    """Parse (path, content) binary rows into one row per WARC record.

    The only Python stage in the archive path: one Arrow batch pass,
    nothing collected; column pruning upstream keeps the exchange to
    exactly (path, content).
    """
    files = files.select(F.col(path_col).alias("path"),
                         F.col(content_col).alias("content"))

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for off, h, payload in iter_warc_records(bytes(content)):
                    rows.append((
                        path, off,
                        h.get("warc-type"),
                        h.get("warc-target-uri"),
                        h.get("warc-date"),
                        h.get("warc-record-id"),
                        h.get("content-type"),
                        payload,
                    ))
            yield pd.DataFrame(rows, columns=[f.name for f in RECORD_SCHEMA])

    return files.mapInPandas(gen, RECORD_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Archive scan: one task per file (see module docstring)."""
    return warc_records(
        spark.read.format("binaryFile").load(path)
        .select("path", "content"))


# --------------------------------------------------------------------------
# records -> pages

_PAGE_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_date", StringType()),
    StructField("http_status", LongType()),
    StructField("mime", StringType()),
    StructField("text", StringType()),
])


def _decode(body: bytes, charset: str | None) -> str:
    for cs in ([charset] if charset else []) + ["utf-8"]:
        try:
            return body.decode(cs)
        except (UnicodeDecodeError, LookupError):
            continue
    return body.decode("utf-8", "replace")


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) of an HTTP response payload."""
    head_end = payload.find(b"\r\n\r\n")
    if head_end < 0 or not payload.startswith(b"HTTP/"):
        return None, None, payload
    head = payload[:head_end]
    status_line = head.split(b"\r\n", 1)[0].split(b" ")
    try:
        status = int(status_line[1])
    except (IndexError, ValueError):
        status = None
    ctype = _parse_headers(head).get("content-type")
    return status, ctype, payload[head_end + 4:]


def pages_from_warc(records: DataFrame) -> DataFrame:
    """``response`` (WARC) and ``conversion`` (WET) records -> pages.

    The HTTP split runs in the same Python stage family as the record
    parse; filters on ``warc_type`` are pushed below it by selecting
    before ``mapInPandas`` (only the two page kinds reach Python).
    """
    recs = records.filter(F.col("warc_type").isin("response", "conversion")) \
                  .select("warc_type", "url", "warc_date", "content_type",
                          "payload")

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for wt, url, date, ctype, payload in zip(
                    pdf["warc_type"], pdf["url"], pdf["warc_date"],
                    pdf["content_type"], pdf["payload"]):
                payload = bytes(payload)
                if wt == "response":
                    status, http_ct, body = _split_http(payload)
                    mime = (http_ct or ctype or "").split(";")[0].strip() or None
                    charset = None
                    if http_ct and "charset=" in http_ct:
                        charset = http_ct.split("charset=", 1)[1].split(";")[0].strip()
                    rows.append((url, date, status, mime,
                                 _decode(body, charset)))
                else:                   # WET conversion: payload IS text
                    mime = (ctype or "").split(";")[0].strip() or None
                    rows.append((url, date, None, mime,
                                 _decode(payload, "utf-8")))
            yield pd.DataFrame(rows, columns=[f.name for f in _PAGE_SCHEMA])

    out = recs.mapInPandas(gen, _PAGE_SCHEMA)
    return out.select(
        "url",
        F.to_timestamp("warc_date", "yyyy-MM-dd'T'HH:mm:ss'Z'")
         .alias("warc_ts"),
        "http_status", "mime", "text")


# --------------------------------------------------------------------------
# serializer (sink / fixture side)

def _record_id(url: str, date: str) -> str:
    # deterministic engine: md5 of url|date, not a random uuid
    return "<urn:md5:%s>" % hashlib.md5(f"{url}|{date}".encode()).hexdigest()


def warc_record_bytes(warc_type: str, url: str, date: str, payload: bytes,
                      content_type: str = "application/http; msgtype=response",
                      compress: bool = True) -> bytes:
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: {warc_type}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\n"
            f"WARC-Record-ID: {_record_id(url, date)}\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n").encode()
    raw = head + payload + b"\r\n\r\n"
    if not compress:
        return raw
    # one gzip member per record, mtime pinned (deterministic bytes)
    out = io.BytesIO()
    with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
        gz.write(raw)
    return out.getvalue()


def http_response_payload(body: bytes, status: int = 200,
                          content_type: str = "text/html; charset=utf-8") -> bytes:
    reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently"}.get(
        status, "Status")
    return (f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode() + body


def warc_bytes(records: Iterable[tuple[str, str, str, bytes]],
               compress: bool = True) -> bytes:
    """Serialize (warc_type, url, date, payload) tuples to one archive."""
    return b"".join(
        warc_record_bytes(t, u, d, p,
                          content_type=("application/http; msgtype=response"
                                        if t == "response" else "text/plain"),
                          compress=compress)
        for t, u, d, p in records)


_EPOCH = "2024-11-07T12:00:00Z"


def warc_from_documents(docs: DataFrame, files: int = 4,
                        compress: bool = True) -> DataFrame:
    """Deterministic WARC archives from the documents table: one file
    per ``doc_id % files`` group (records doc_id-ordered inside each),
    every doc a 200 text/html response whose body is its text and whose
    WARC-Date is epoch + doc_id seconds — a pure function of the row, so
    a SQL oracle reconstructs every field without parsing anything."""
    import datetime as _dt
    epoch = _dt.datetime(2024, 11, 7, 12, 0, 0)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        recs = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            date = (epoch + _dt.timedelta(seconds=int(doc_id))) \
                .strftime("%Y-%m-%dT%H:%M:%SZ")
            recs.append((
                "response",
                f"https://corpus.example.org/doc/{int(doc_id)}",
                date,
                http_response_payload((text or "").encode("utf-8"))))
        name = int(pdf["doc_id"].iloc[0]) % files
        return pd.DataFrame(
            {"path": [f"mem://warc/{name:05d}.warc.gz"],
             "content": [warc_bytes(recs, compress=compress)]})

    return (docs.select("doc_id", "text")
            .withColumn("_f", F.pmod("doc_id", F.lit(files)))
            .groupBy("_f")
            .applyInPandas(build, "path string, content binary"))
