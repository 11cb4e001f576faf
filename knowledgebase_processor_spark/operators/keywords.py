"""Corpus TF-IDF keyword extraction (beyond-reference; SURVEY.md §2
round-2 surface).

The reference's topic analyzer (`analyzer/topics.py`) tags a document
from its own content only; a web-scale corpus can do better — weight
terms by corpus-wide rarity.  The top-k TF-IDF terms per document feed
search ranking (Q1), find_by_topic (Q3), and training-data domain
labelling.

Spark-first shape (the canonical four-exchange plan, every stage
partial-aggregatable):

1. explode words → groupBy(doc_id, term) count — map-side combine
   collapses each document's repeats before the shuffle, so the shuffle
   carries per-doc *distinct* terms, not raw tokens;
2. document frequency = count(*) over the (doc, term) frame grouped by
   term (already distinct per doc — no expensive countDistinct);
3. tf ⋈ df on term — df is |vocabulary|-sized; pass
   ``broadcast_vocab=True`` when the vocabulary fits the driver
   (~10M terms) to drop this exchange entirely, leave it False for
   open-web text where typo/URL tokens blow the vocabulary up;
4. top-k per doc via row_number over (score desc, term asc) — ties are
   broken lexically so output is deterministic.

Score is ``tf * (N / df)`` — raw inverse frequency, NOT log-damped:
``ln`` differs by ULPs between libm implementations, while multiply and
divide of IEEE doubles are exact-rounded everywhere, which keeps the
DuckDB oracle (q51) bit-identical rather than merely close.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def tfidf_top_terms(docs: DataFrame, k: int = 3, min_term_len: int = 1,
                    broadcast_vocab: bool = False,
                    materialize_tf: bool = True) -> DataFrame:
    """docs(doc_id, text) -> (doc_id, term, tf, df, score, rank) with the
    top-``k`` terms per document by ``tf * (N / df)``.  Tokenization is
    the engine-wide portable form (collapse whitespace, lowercase,
    split on single spaces) so cross-engine oracles reproduce it.

    ``materialize_tf`` (default on) ``localCheckpoint``s the (doc, term,
    tf) frame: it feeds BOTH the fact side of the score join and the
    document-frequency aggregation, and without materialization Catalyst
    plans the scan+tokenize+explode subtree TWICE (no automatic subtree
    reuse across branches) — at corpus scale tokenizing every document
    twice is the dominant cost, far above writing the much smaller
    distinct-terms frame to executor-local storage once."""
    n_docs = docs.count()  # one scalar; the corpus size constant
    words = F.filter(
        F.split(F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))),
                " "),
        lambda t: (F.length(t) >= min_term_len) & (t != ""))
    tf = (docs.select("doc_id", F.explode(words).alias("term"))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    if materialize_tf:
        tf = tf.localCheckpoint()
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    if broadcast_vocab:
        df_ = F.broadcast(df_)
    scored = (tf.join(df_, "term")
              .withColumn("score",
                          F.col("tf").cast("double")
                          * (F.lit(float(n_docs)) / F.col("df").cast("double"))))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("doc_id", "term", "tf", "df", "score", "rank"))
