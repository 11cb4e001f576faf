"""Crawl snapshot delta (beyond-reference; SURVEY.md §2 round-2
surface).

Between two crawl snapshots the incremental pipeline needs the change
set, not the corpus: which documents appeared, vanished, or changed
content.  Downstream, `added ∪ changed` feeds re-extraction
(kg_job/dedup_incremental) and `removed` feeds KG retraction
(sinks_sparql DELETE) — this operator is the trigger list for both.

One full outer join on the document key; change detection compares
content fingerprints (``functions.text.fingerprint`` — whitespace-
normalized sha256) so formatting-only recrawls don't re-trigger the
pipeline.  Partial-aggregation-free, AQE-splittable, and exactly
SQL-replicable (q60)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from knowledgebase_processor_spark.functions.text import fingerprint


def snapshot_delta(old: DataFrame, new: DataFrame,
                   key: str = "doc_id", text: str = "text") -> DataFrame:
    """-> (key, status) for every key in either snapshot, with status in
    {added, removed, changed, unchanged}."""
    o = old.select(F.col(key).alias("k"),
                   fingerprint(F.col(text)).alias("old_fp"))
    n = new.select(F.col(key).alias("k"),
                   fingerprint(F.col(text)).alias("new_fp"))
    j = o.join(n, "k", "full_outer")
    return j.select(
        F.col("k").alias(key),
        F.when(F.col("old_fp").isNull(), "added")
         .when(F.col("new_fp").isNull(), "removed")
         .when(F.col("old_fp") == F.col("new_fp"), "unchanged")
         .otherwise("changed").alias("status"))
