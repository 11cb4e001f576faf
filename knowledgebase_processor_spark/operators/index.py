"""Positional inverted-index operators: postings construction and
phrase (adjacency) search.

Beyond-reference (retrieval family, with bm25.py): the reference's
search is a substring scan; at corpus scale retrieval runs off an
inverted index, and PHRASE queries need positions.  Two operators:

* ``build_postings`` — the persistable index table: one row per (term,
  doc) with tf and the (capped) position list, plus per-term df.  The
  boilerplate-term hazard is handled with the dedup-family guard
  discipline: per-(term,doc) position lists are capped by a
  WindowGroupLimit rank filter BEFORE collect_list materializes
  anything (count-first, never aggregate-then-drop), and the cap is
  recorded per row (``positions_capped``) so recall concessions are
  explicit.
* ``phrase_hits`` — exact adjacent-phrase matching as a chain of
  self-equi-joins on (doc, position): term_k at pos p matches term_k+1
  at p+1.  Each join is an equi-join keyed on (doc, pos) — hash joins,
  AQE-splittable; the position frames filter to the phrase terms before
  any shuffle (the bm25.py pushdown shape).

Positions are 1-based word offsets from the shared whitespace split, so
the q96 oracle replays them with DuckDB's zipped unnest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import portable_words


def _positions(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        portable_words(F.col(text_col)).alias("ws"))
    return base.select("doc_id",
                       F.posexplode("ws").alias("pos0", "w")) \
               .select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")


def build_postings(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   max_positions: int = 128) -> DataFrame:
    """(term, df, doc_id, tf, positions, positions_capped): the
    positional postings table, position lists capped at
    ``max_positions`` per (term, doc) BEFORE materialization."""
    pos = _positions(docs, id_col, text_col)
    w = Window.partitionBy("w", "doc_id").orderBy("pos")
    ranked = pos.withColumn("rn", F.row_number().over(w))
    per_doc = (ranked.groupBy("w", "doc_id")
               .agg(F.count(F.lit(1)).alias("tf"),
                    F.sort_array(F.collect_list(
                        F.when(F.col("rn") <= max_positions, F.col("pos"))))
                    .alias("positions")))
    per_doc = per_doc.withColumn(
        "positions_capped", F.col("tf") > max_positions)
    df_t = per_doc.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    return (per_doc.join(df_t, "w")
            .select(F.col("w").alias("term"), "df", "doc_id", "tf",
                    "positions", "positions_capped"))


def phrase_hits(docs: DataFrame, phrase: list[str],
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, n_hits) for documents containing the exact adjacent
    ``phrase``; n_hits counts distinct start positions."""
    pos = _positions(docs, id_col, text_col) \
        .filter(F.col("w").isin(phrase))
    cur = (pos.filter(F.col("w") == phrase[0])
           .select("doc_id", F.col("pos").alias("start")))
    for i, term in enumerate(phrase[1:], start=1):
        nxt = (pos.filter(F.col("w") == term)
               .select("doc_id", (F.col("pos") - i).alias("start")))
        cur = cur.join(nxt, ["doc_id", "start"], "left_semi")
    return (cur.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits")))
