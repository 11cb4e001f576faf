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

from ..functions.text import portable_words


def _bigrams(text) -> "F.Column":
    """Word bigrams, [] when fewer than 2 words; the portable
    whitespace-class split shared with the shingle oracles (q29/q30)."""
    words = portable_words(text)
    shifted = F.slice(words, 2, F.greatest(F.size(words), F.lit(1)))
    grams = F.zip_with(words, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(F.size(words) < 2, F.array().cast("array<string>")) \
        .otherwise(F.slice(grams, 1, F.size(words) - 1))


def stupid_backoff(docs: DataFrame, model_docs: DataFrame,
                   alpha_ppm: int = 400000) -> DataFrame:
    """Stupid-backoff bigram scoring (Brants et al. 2007, "Large Language
    Models in Machine Translation") of ``docs`` against counts trained on
    ``model_docs`` — the real CCNet-shaped quality signal: held-out text
    scored by a corpus model, where BACKOFF actually fires (bigrams the
    model never saw fall back to alpha * unigram frequency).

    FIXED-POINT integer arithmetic throughout (parts-per-million, integer
    DIV — the dsir_weights lesson): per bigram occurrence (w1, w2)

        score_ppm = 1e6 * c(w1 w2) DIV c(w1)          if the model saw it
                  = alpha_ppm * c(w2) DIV N            else (backoff)
                  = 0                                  (w2 unseen too)

    summed per document as exact BIGINTs, so the DuckDB oracle (q80)
    replays every score bit-identically — no libm, no float-sum order.

    Scale shape: model counts are two partial-aggregatable groupBys over
    the model corpus (computed once, reusable); scoring is two hash
    joins on the bigram/unigram string — head-gram skew collapses
    map-side exactly as in bigram_coverage.
    """
    mwords = model_docs.select(
        F.explode(portable_words(F.col("text"))).alias("w")) \
        .localCheckpoint()
    uni = mwords.groupBy("w").agg(F.count("*").alias("c1"))
    big = (model_docs.select(F.explode(_bigrams(F.col("text"))).alias("bg"))
           .groupBy("bg").agg(F.count("*").alias("c12")))
    n_uni = mwords.count()  # one scalar (model size), not a hot-path collect

    ex = (docs.select("doc_id", F.explode(_bigrams(F.col("text"))).alias("bg"))
          .withColumn("w1", F.split(F.col("bg"), " ").getItem(0))
          .withColumn("w2", F.split(F.col("bg"), " ").getItem(1)))
    scored = (ex.join(big, "bg", "left")
              .join(uni.withColumnRenamed("w", "w1")
                       .withColumnRenamed("c1", "c_w1"), "w1", "left")
              .join(uni.withColumnRenamed("w", "w2")
                       .withColumnRenamed("c1", "c_w2"), "w2", "left")
              .withColumn("score_ppm", F.expr(f"""
                  CASE WHEN c12 IS NOT NULL
                       THEN CAST(1000000 AS BIGINT) * c12 DIV c_w1
                       WHEN c_w2 IS NOT NULL
                       THEN CAST({alpha_ppm} AS BIGINT) * c_w2
                            DIV CAST({n_uni} AS BIGINT)
                       ELSE CAST(0 AS BIGINT) END""")))
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("score_ppm").cast("bigint").alias("sum_score_ppm"))
    return (docs.select("doc_id").join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_bigrams", F.lit(0)).cast("bigint")
                     .alias("n_bigrams"),
                    F.coalesce("sum_score_ppm", F.lit(0)).cast("bigint")
                     .alias("sum_score_ppm"))
            .withColumn("avg_score_ppm",
                        F.expr("CASE WHEN n_bigrams > 0 THEN sum_score_ppm"
                               " DIV n_bigrams ELSE CAST(0 AS BIGINT) END")
                        .cast("bigint")))


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
