"""Term co-occurrence / collocation mining (beyond-reference;
SURVEY.md §2 round-2 surface).

The reference's `find_related` (services/orchestrator.py) relates
documents through shared explicit keys; a web-scale KG also wants the
*statistical* relation layer: which terms (and, downstream, which
entities) co-occur in documents far more often than chance.  The lift
score ``P(a,b) / (P(a)P(b))`` ranks candidate relations for the KG
enrichment stage (E12) without any language model.

Scale shape — the same discipline as the LSH family (dedup.py):

* candidate *terms* are bounded BEFORE any pair is formed: document
  frequency must sit in ``[min_df, max_df_frac·N]`` (kills stopwords,
  which would otherwise pair with everything, and hapax noise), and
  each document contributes at most ``max_terms_per_doc`` terms
  (deterministic keep: rarest df first, term asc tiebreak — the same
  mega-bucket-guard idea, a head document cannot go quadratic);
* pairs come from a self-join of the distinct (doc, term) frame on
  ``doc_id`` with ``term_a < term_b`` — a co-partitioned equi-join whose
  per-doc output is ≤ C(max_terms_per_doc, 2), then one
  partial-aggregatable count per pair;
* lift uses multiply/divide only (no log-PMI): IEEE doubles are
  exact-rounded under *·/÷*, so the DuckDB oracle (q52) reproduces the
  scores bit-identically — rank by lift, take ``log`` client-side if a
  PMI reading is wanted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def term_cooccurrence(docs: DataFrame, min_df: int = 2,
                      max_df_frac: float = 0.5,
                      max_terms_per_doc: int = 64,
                      min_pair_count: int = 2) -> DataFrame:
    """docs(doc_id, text) -> (term_a, term_b, n_docs_both, df_a, df_b,
    lift) for unordered term pairs co-occurring in ``min_pair_count``+
    documents.  ``lift > 1`` means the pair co-occurs more than
    independent terms would."""
    n_docs = docs.count()
    words = F.filter(
        F.split(F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))),
                " "),
        lambda t: t != "")
    doc_terms = (docs.select("doc_id", F.explode(words).alias("term"))
                 .distinct())
    df_ = doc_terms.groupBy("term").agg(F.count("*").alias("df"))
    kept = df_.filter((F.col("df") >= min_df)
                      & (F.col("df") <= F.lit(float(max_df_frac) * n_docs)))
    dt = doc_terms.join(kept, "term")
    # Per-doc guard: rarest-first keeps the informative terms and bounds
    # every document's pair fan-out at C(max_terms_per_doc, 2).
    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("term"))
    dt = (dt.withColumn("__r", F.row_number().over(w))
          .filter(F.col("__r") <= max_terms_per_doc)
          .select("doc_id", "term", "df"))
    a = dt.select("doc_id", F.col("term").alias("term_a"),
                  F.col("df").alias("df_a"))
    b = dt.select("doc_id", F.col("term").alias("term_b"),
                  F.col("df").alias("df_b"))
    pairs = (a.join(b, "doc_id")
             .filter(F.col("term_a") < F.col("term_b"))
             .groupBy("term_a", "term_b", "df_a", "df_b")
             .agg(F.count("*").alias("n_docs_both"))
             .filter(F.col("n_docs_both") >= min_pair_count))
    return pairs.select(
        "term_a", "term_b", "n_docs_both", "df_a", "df_b",
        ((F.col("n_docs_both").cast("double") * F.lit(float(n_docs)))
         / (F.col("df_a").cast("double") * F.col("df_b").cast("double")))
        .alias("lift"))
