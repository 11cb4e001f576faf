"""Spark StructTypes for the engine's tables (SURVEY.md §1, FIXTURES.md §4)."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType, BooleanType, LongType, StringType, StructField, StructType,
    TimestampType,
)

# Production input shape (BASELINE.json input_hint): Common-Crawl-style pages.
WEB_PAGES = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", StringType()),   # binary at scale; UTF-8 here
    StructField("text", StringType()),
    StructField("lang", StringType()),
])

# One row per extracted KB entity (tall, nullable per-kind columns).
ENTITIES = StructType([
    StructField("kind", StringType()),
    StructField("kb_id", StringType()),
    StructField("label", StringType()),
    StructField("source_document_uri", StringType()),
    StructField("text", StringType()),
    StructField("description", StringType()),
    StructField("level", LongType()),
    StructField("is_completed", BooleanType()),
    StructField("ordered", BooleanType()),
    StructField("item_count", LongType()),
    StructField("row_count", LongType()),
    StructField("column_count", LongType()),
    StructField("line_count", LongType()),
    StructField("language", StringType()),
    StructField("code", StringType()),
    StructField("headers", ArrayType(StringType())),
    StructField("position_start", LongType()),
    StructField("position_end", LongType()),
    StructField("original_text", StringType()),
    StructField("target_path", StringType()),
    StructField("alias", StringType()),
    StructField("resolved_document_uri", StringType()),
    StructField("heading_uri", StringType()),
    StructField("parent_list_uri", StringType()),
    StructField("original_path", StringType()),
    StructField("path_without_extension", StringType()),
])

# Per-document pre-merged entities: every varying field is an
# ordered-distinct array (extract.core.extract_entities_merged).
ENTITIES_MERGED = StructType(
    [StructField("kind", StringType()),
     StructField("kb_id", StringType()),
     StructField("source_document_uri", StringType())] +
    [StructField(f.name,
                 f.dataType if f.name == "headers" else ArrayType(f.dataType))
     for f in ENTITIES.fields
     if f.name not in ("kind", "kb_id", "source_document_uri")])

# Primary correctness surface: deduplicated (subj, pred, obj) triples.
TRIPLES = StructType([
    StructField("subj", StringType()),
    StructField("pred", StringType()),
    StructField("obj", StringType()),
    StructField("obj_is_uri", BooleanType()),
    StructField("obj_datatype", StringType()),   # null for URIs
    StructField("source_doc", StringType()),
])
