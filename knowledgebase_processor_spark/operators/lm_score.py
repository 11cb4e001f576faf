"""Corpus bigram-coverage scoring — an LM-lite fluency signal
(beyond-reference; SURVEY.md §2 round-2 surface).

CCNet-style pipelines score documents with a KenLM n-gram model; inside
this sandbox (no model artifacts) the same *shape* of signal is
computed from the corpus itself: the fraction of a document's word
bigrams that occur at least ``min_count`` times corpus-wide.  Gibberish,
lorem-ipsum, and character-noise pages score near 0 — their bigrams are
corpus-unique — while fluent text built from common collocations scores
high.  Deliberately count-ratio based (integers + ONE final division):
no log-probabilities, so the DuckDB oracle (q59) reproduces the scores
bit-identically rather than to libm tolerance.

Scale shape: the exploded (doc, bigram) frame feeds BOTH the corpus
count and the per-doc totals, so it is ``localCheckpoint``-ed once
(same double-tokenize lesson as TF-IDF, keywords.py); the corpus count
and the hit join are plain partial-aggregatable groupBys / hash joins
on the bigram string — stopword-dominated head bigrams collapse
map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bigrams(text) -> "F.Column":
    """Word bigrams, [] when fewer than 2 words; the portable
    whitespace-class split shared with the shingle oracles (q29/q30)."""
    words = F.filter(F.split(F.lower(F.trim(text)), r"[ \t\n\r\f]+"),
                     lambda x: x != "")
    shifted = F.slice(words, 2, F.greatest(F.size(words), F.lit(1)))
    grams = F.zip_with(words, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(F.size(words) < 2, F.array().cast("array<string>")) \
        .otherwise(F.slice(grams, 1, F.size(words) - 1))


def bigram_coverage(docs: DataFrame, min_count: int = 2) -> DataFrame:
    """docs(doc_id, text) -> (doc_id, n_bigrams, n_common, coverage):
    coverage = fraction of the document's bigram OCCURRENCES whose
    bigram appears >= ``min_count`` times corpus-wide (multiplicity
    counts on both sides); NULL when the document has no bigrams."""
    exploded = (docs.select("doc_id", F.explode(_bigrams(F.col("text")))
                            .alias("bg"))
                .localCheckpoint())
    common = (exploded.groupBy("bg").agg(F.count("*").alias("c"))
              .filter(F.col("c") >= min_count).select("bg"))
    totals = exploded.groupBy("doc_id").agg(F.count("*").alias("n_bigrams"))
    hits = (exploded.join(common, "bg")
            .groupBy("doc_id").agg(F.count("*").alias("n_common")))
    return (docs.select("doc_id")
            .join(totals, "doc_id", "left").join(hits, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    F.coalesce("n_common", F.lit(0)).alias("n_common"),
                    F.when(F.coalesce("n_bigrams", F.lit(0)) == 0,
                           F.lit(None).cast("double"))
                    .otherwise(F.coalesce("n_common", F.lit(0)).cast("double")
                               / F.col("n_bigrams").cast("double"))
                    .alias("coverage")))
