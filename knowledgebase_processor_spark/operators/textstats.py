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
