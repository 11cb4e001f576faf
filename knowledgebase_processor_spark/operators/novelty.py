"""Corpus novelty rate: per-slice fraction of n-gram shingles never seen
in any earlier document (beyond-reference; SURVEY.md §2 round-2 surface
— the diversity twin of operators/decontaminate.py's overlap check).

Training-data curation tracks whether a crawl keeps contributing NEW
text or is re-crawling the same content: the novelty of a document is
the share of its distinct 3-gram shingles whose FIRST occurrence
(by ingest order = doc id) is the document itself.  Aggregated per
source this is the "is this feed saturated?" dashboard number; a
source whose novelty rate decays to ~0 can be deprioritized.

Spark-first, cross-engine-exact design: ONE shingle explode (the
shared portable tokenizer/shingler from functions/text.py, identical
ANSI formula in the oracle), a map-side-combinable min-aggregation for
first-occurrence, and exact integer counts — the per-source rate is
``novel * 1e6 DIV total`` in BIGINT ppm.  No joins back to the text:
the first-occurrence frame already carries the winning doc, so novelty
counts come from ONE groupBy over it, and per-doc totals from the
distinct shingle frame — two shuffles of (shingle | doc) keys total,
both combiner-friendly.  At 10^12 docs the shingle frame is the
dominant cost and is exactly the frame MinHash dedup already
materializes — in production the two share one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import shingles


def novelty_by_group(docs: DataFrame, group_col: str = "source",
                     id_col: str = "doc_id", text_col: str = "text",
                     n: int = 3) -> DataFrame:
    """docs -> (group, n_docs, total_shingles, novel_shingles,
    novelty_ppm): shingle first-occurrences attributed to the earliest
    doc id, totals per group exact BIGINTs."""
    sh = (docs.select(F.col(id_col).alias("doc"),
                      F.col(group_col).alias("grp"),
                      F.explode(F.array_distinct(
                          shingles(F.col(text_col), n))).alias("s")))
    # distinct (doc, shingle) — array_distinct above already dedups
    # within a doc, so `sh` IS the distinct per-doc shingle frame
    first = (sh.groupBy("s")
             .agg(F.min(F.struct("doc", "grp")).alias("w"))
             .select(F.col("w.doc").alias("doc"), F.col("w.grp").alias("grp")))
    novel = first.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("novel_shingles"))
    totals = sh.groupBy("grp").agg(
        F.countDistinct("doc").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("total_shingles"))
    return (totals.join(novel, "grp", "left")
            .select(F.col("grp").alias(group_col), "n_docs",
                    "total_shingles",
                    F.coalesce("novel_shingles", F.lit(0)).cast("long")
                    .alias("novel_shingles"))
            .withColumn("novelty_ppm",
                        F.expr("novel_shingles * 1000000 "
                               "DIV total_shingles").cast("long")))


def novelty_oracle_sql(docs_sql: str, n: int = 3) -> str:
    """EXACT ANSI replay of :func:`novelty_by_group` for DuckDB.
    ``docs_sql`` must select (doc_id, source, text); n is fixed at 3
    (the shared shingle formula)."""
    assert n == 3, "oracle replays the 3-gram shingle formula"
    return r"""
        WITH d0 AS ({docs_sql}),
        words AS (
          SELECT doc_id, source,
                 list_filter(string_split_regex(lower(trim(text)),
                                                '[ \t\n\r\f]+'),
                             w -> w <> '') AS ws
          FROM d0),
        sh0 AS (
          SELECT doc_id, source, CASE WHEN len(ws) >= 3
            THEN list_transform(range(1, len(ws) - 1),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
            ELSE [array_to_string(ws, ' ')] END AS gs
          FROM words),
        sh AS (
          SELECT DISTINCT doc_id AS doc, source AS grp, unnest(gs) AS s
          FROM sh0),
        first_ AS (
          SELECT s, MIN(doc) AS fdoc FROM sh GROUP BY s),
        novel AS (
          -- (s, doc) is unique in sh, so this join picks exactly the
          -- winning row per shingle
          SELECT sh.grp, COUNT(*)::BIGINT AS novel_shingles
          FROM first_ JOIN sh ON sh.s = first_.s AND sh.doc = first_.fdoc
          GROUP BY sh.grp),
        totals AS (
          SELECT grp, COUNT(DISTINCT doc)::BIGINT AS n_docs,
                 COUNT(*)::BIGINT AS total_shingles
          FROM sh GROUP BY grp)
        SELECT totals.grp AS source, n_docs, total_shingles,
               COALESCE(novel_shingles, 0)::BIGINT AS novel_shingles,
               (COALESCE(novel_shingles, 0) * 1000000
                // total_shingles)::BIGINT AS novelty_ppm
        FROM totals LEFT JOIN novel ON totals.grp = novel.grp
        """.replace("{docs_sql}", docs_sql)
