"""Readability scoring (beyond-reference text-quality surface; the
classic-formula companion to the Gopher/C4 quality gates (q40/q43) —
Flesch reading ease is public domain and still the most-read quality
number on any corpus data card).

Exactness contract: words come from the shared portable tokenizer,
sentences from a shared terminator regex, syllables from the standard
vowel-group heuristic (per word, count of ``[aeiouy]+`` runs, min 1 —
the textstat/public convention), and the ONE float step (the Flesch
formula over three exact integers) is micro-quantized SQL TEXT shared
verbatim with the DuckDB oracle (:data:`FLESCH_SQL`).

Plan shape: a single projection — tokenize, two regexp_extract_all
counts, one ``aggregate`` fold over the word array (element-local
lambda, no captured expression trees — the shingles O(n^2) trap
documented in functions/text.py) — all whole-stage codegen, no
shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import portable_words

# Flesch reading ease over exact integer (w, s, y) counts, micro-
# quantized; NULL guard for empty docs rides outside.  Shared verbatim
# with the q185 oracle.
FLESCH_SQL = ("CAST(round(1000000 * (206.835 "
              "- 1.015 * (w / CAST(s AS DOUBLE)) "
              "- 84.6 * (y / CAST(w AS DOUBLE)))) AS BIGINT)")

SENTENCE_RE = "[.!?]+"
VOWEL_RUN_RE = "[aeiouy]+"


def readability_report(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_words, n_sentences, n_syllables, flesch_micro)
    per document; flesch_micro is NULL for wordless documents,
    n_sentences floors at 1 whenever words exist (a fragment is one
    sentence)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = portable_words(t)
    syl = F.aggregate(
        F.transform(words,
                    lambda w: F.greatest(
                        F.lit(1),
                        F.size(F.regexp_extract_all(w, F.lit(VOWEL_RUN_RE),
                                                    0)))),
        F.lit(0), lambda acc, x: acc + x)
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).cast("long").alias("w"),
        F.greatest(F.lit(1),
                   F.size(F.regexp_extract_all(F.lower(t),
                                               F.lit(SENTENCE_RE), 0)))
        .cast("long").alias("s"),
        syl.cast("long").alias("y"))
    return out.selectExpr(
        "doc_id", "w AS n_words", "s AS n_sentences",
        "y AS n_syllables",
        f"CASE WHEN w = 0 THEN NULL ELSE {FLESCH_SQL} END"
        " AS flesch_micro")


# --------------------------------------------------------------------------
# Tokenizer fertility: bytes/chars per subword token by language — the
# number a multilingual-corpus data card reports next to its language
# mix (CJK languages tokenize at several bytes per token, and a
# fertility outlier inside one language is a mojibake/encoding flag,
# the q153 gate's statistical twin).  Counting uses the shared
# token_count regex run VERBATIM by the DuckDB oracle; sums are exact
# BIGINTs, ratios exact integer ppm.  One partial-agg groupBy(lang).

TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_fertility(docs: DataFrame, lang_col: str = "lang",
                    text_col: str = "text") -> DataFrame:
    """-> (lang, n_docs, sum_bytes, sum_chars, sum_tokens,
    bytes_per_token_ppm, chars_per_token_ppm) per language."""
    from ..functions.text import token_count

    t = F.coalesce(F.col(text_col), F.lit(""))
    agg = (docs.groupBy(F.col(lang_col).alias("lang"))
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(F.octet_length(t)).cast("long").alias("sum_bytes"),
                F.sum(F.length(t)).cast("long").alias("sum_chars"),
                F.sum(token_count(t)).cast("long").alias("sum_tokens")))
    return agg.selectExpr(
        "lang", "n_docs", "sum_bytes", "sum_chars", "sum_tokens",
        "sum_bytes * 1000000 DIV nullif(sum_tokens, 0)"
        " AS bytes_per_token_ppm",
        "sum_chars * 1000000 DIV nullif(sum_tokens, 0)"
        " AS chars_per_token_ppm")


def fertility_oracle_sql(table: str = "documents") -> str:
    """DuckDB replay: same token regex, octet_length via encode()."""
    return rf"""
        WITH d AS (SELECT lang, COALESCE(text, '') AS t FROM {table})
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(octet_length(encode(t))) AS BIGINT) AS sum_bytes,
               CAST(SUM(length(t)) AS BIGINT) AS sum_chars,
               CAST(SUM(len(regexp_extract_all(t,
                   '{TOKEN_RE}'))) AS BIGINT) AS sum_tokens,
               CAST(SUM(octet_length(encode(t))) * 1000000
                    // nullif(SUM(len(regexp_extract_all(t,
                       '{TOKEN_RE}'))), 0) AS BIGINT)
                   AS bytes_per_token_ppm,
               CAST(SUM(length(t)) * 1000000
                    // nullif(SUM(len(regexp_extract_all(t,
                       '{TOKEN_RE}'))), 0) AS BIGINT)
                   AS chars_per_token_ppm
        FROM d GROUP BY lang ORDER BY lang"""
