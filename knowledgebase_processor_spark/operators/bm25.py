"""BM25 ranked retrieval over the corpus (Robertson-Sparck Jones /
Okapi BM25).

Beyond-reference: the reference's search (Q1/q05) is substring filter +
LIMIT (services/orchestrator.py) — fine for one vault, useless at
10^12 documents.  BM25 over an inverted-frequency layout is the
standard scale answer, and its statistics (df, dl, avgdl) are exactly
the partial-aggregatable counts this engine already computes everywhere.

Determinism / portability (the q95 oracle replays bit-for-bit):

* idf is quantized to MICRO-NATS PER TERM before anything sums:
  ``idf_micro = round(1e6 * ln(1 + (N - df + .5)/(df + .5)))`` — the
  dsir_weights precedent (decontaminate.py): one ln per DISTINCT df
  value, rounded to an integer before use, so float summation order
  never exists.
* the tf saturation is integer milli-arithmetic end-to-end
  (k1 = 1.2 -> 1200, b = 0.75 -> 750, avgdl in milli-tokens, integer
  DIV) — a quantized BM25 whose scores are exact integers.
* per-document scores are integer sums over the (few) query terms.

Scale shape: the tf frame filters to the QUERY terms before its
groupBy (predicate pushdown into the explode), df/dl/N/avgdl are
map-side-combinable counts, the df frame (one row per query term)
broadcasts, and the final top-k is TakeOrdered.  Nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import portable_words

K1_MILLI = 1200
B_MILLI = 750


def bm25_scores(docs: DataFrame, query_terms: list[str],
                id_col: str = "doc_id", text_col: str = "text",
                k: int = 20) -> DataFrame:
    """Top-``k`` documents for ``query_terms`` (OR semantics) by
    quantized-BM25: (doc_id, dl, score_micro), score descending with
    doc_id as tie-break."""
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        portable_words(F.col(text_col)).alias("ws"))
    toks = words.select("doc_id", F.explode("ws").alias("t"))
    dl = words.select("doc_id", F.size("ws").cast("bigint").alias("dl"))

    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                   F.sum("dl").alias("total_dl"))
    # avgdl in milli-tokens; kept as a 1-row frame (cross-joined, never
    # collected) so the whole plan stays lazy/distributed
    stats = stats.select(
        "n_docs",
        F.expr("total_dl * 1000 DIV n_docs").alias("avgdl_milli"))

    qt = toks.filter(F.col("t").isin(query_terms))
    tf = qt.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf"))
    df_t = qt.groupBy("t").agg(F.countDistinct("doc_id").alias("df"))

    scored = (tf.join(F.broadcast(df_t), "t")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(stats))
              .withColumn("idf_micro", F.round(
                  F.lit(1e6) * F.log(
                      F.lit(1.0)
                      + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                      / (F.col("df") + F.lit(0.5)))).cast("bigint"))
              .withColumn("norm_milli", F.expr(
                  f"(1000 - {B_MILLI}) + ({B_MILLI} * dl * 1000)"
                  " DIV avgdl_milli"))
              .withColumn("score_micro", F.expr(
                  f"idf_micro * (tf * ({K1_MILLI} + 1000))"
                  f" DIV (tf * 1000 + ({K1_MILLI} * norm_milli) DIV 1000)")))
    per_doc = (scored.groupBy("doc_id")
               .agg(F.sum("score_micro").cast("bigint").alias("score_micro"))
               .join(dl, "doc_id"))
    return (per_doc.orderBy(F.col("score_micro").desc(), F.col("doc_id"))
            .limit(k)
            .select("doc_id", "dl", "score_micro"))
