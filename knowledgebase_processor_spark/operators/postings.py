"""Posting-list compression planner: delta + varint size estimation for
an inverted index (beyond-reference; SURVEY.md §2 round-2 surface —
storage engineering for operators/index.py's positional index).

Before materializing a web-scale inverted index you size it: doc ids
sorted per term are stored gap-encoded (delta) + LEB128 varint — the
standard Lucene/PForDelta-family baseline.  This operator computes the
EXACT varint byte cost per term without building the index: high-df
terms (dense postings, tiny gaps) compress toward 1 byte/posting while
rare terms pay the absolute-id cost, and the report is what decides
stopword thresholds and dictionary splits.

Spark-first, cross-engine-exact design: one distinct (term, doc) frame
(map-side combinable), gaps via ``lag`` in a window PARTITIONED BY TERM
(bounded partitions — never a global window), varint bytes as a pure
integer CASE ladder over 2^(7k) thresholds, and BIGINT sums — every
number in the report is exact integer arithmetic any engine replays
bit-identically (q125).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import portable_words

# LEB128: k bytes encode values < 2^(7k)
_VARINT_CASE = ("CASE " + " ".join(
    f"WHEN {{v}} < {1 << (7 * k)} THEN {k}" for k in range(1, 9))
    + " ELSE 9 END")


def varint_bytes_sql(value_sql: str) -> str:
    """ANSI CASE ladder: LEB128 byte count of a non-negative BIGINT —
    shared verbatim by the Spark plan and the DuckDB oracle."""
    return _VARINT_CASE.format(v=value_sql)


def posting_sizes(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", min_df: int = 2) -> DataFrame:
    """docs -> one row per term with the gap+varint storage plan:
    (term, df, varint_bytes, raw_bytes, ratio_ppm).  ``raw_bytes`` is
    the uncompressed 8-byte-per-posting cost; ``ratio_ppm`` =
    varint_bytes * 1e6 DIV raw_bytes.  The first posting stores the
    absolute doc id, later ones the gap to the previous id."""
    postings = (docs.select(F.col(id_col).alias("doc"),
                            F.explode(portable_words(F.col(text_col)))
                            .alias("term"))
                .distinct())
    w = Window.partitionBy("term").orderBy("doc")
    gaps = postings.withColumn(
        "v", F.coalesce(F.col("doc") - F.lag("doc").over(w), F.col("doc")))
    per_term = (gaps.withColumn(
        "b", F.expr(varint_bytes_sql("v")).cast("long"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"),
             F.sum("b").cast("long").alias("varint_bytes")))
    return (per_term.filter(F.col("df") >= min_df)
            .withColumn("raw_bytes", (F.col("df") * 8).cast("long"))
            .withColumn("ratio_ppm",
                        F.expr("varint_bytes * 1000000 DIV raw_bytes")
                        .cast("long")))


def postings_oracle_sql(docs_sql: str, min_df: int = 2) -> str:
    """EXACT ANSI replay of :func:`posting_sizes` for DuckDB.
    ``docs_sql`` must select (doc_id, text)."""
    return fr"""
        WITH d AS ({docs_sql}),
        toks AS (
          SELECT doc_id AS doc,
                 unnest(list_filter(
                   string_split_regex(lower(trim(text)), '[ \t\n\r\f]+'),
                   w -> w <> '')) AS term
          FROM d),
        postings AS (SELECT DISTINCT term, doc FROM toks),
        gaps AS (
          SELECT term,
                 COALESCE(doc - lag(doc) OVER
                            (PARTITION BY term ORDER BY doc), doc) AS v
          FROM postings),
        per_term AS (
          SELECT term, COUNT(*)::BIGINT AS df,
                 SUM(({varint_bytes_sql('v')})::BIGINT)::BIGINT
                   AS varint_bytes
          FROM gaps GROUP BY term)
        SELECT term, df, varint_bytes, (df * 8)::BIGINT AS raw_bytes,
               (varint_bytes * 1000000 // (df * 8))::BIGINT AS ratio_ppm
        FROM per_term WHERE df >= {min_df}"""
