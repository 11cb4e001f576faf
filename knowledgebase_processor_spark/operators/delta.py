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


def latest_assertions(assertions: DataFrame) -> DataFrame:
    """Re-crawl KG merge: collapse a (subj, pred, obj, ts, op) assertion
    log to the live single-valued-predicate snapshot — the DataFrame twin
    of Iceberg ``MERGE INTO`` with latest-writer-wins semantics.

    Per (subj, pred) key the row with the greatest (ts, op, obj) wins
    (the op/obj legs make ties deterministic and engine-identical);
    a winning ``op='delete'`` tombstone removes the key from the
    snapshot entirely.

    Scale shape: ONE groupBy with a ``max(struct(...))`` aggregate —
    partial-agg combinable (each map task pre-reduces its partition, so
    a hot subject never ships more than one row per task), no window
    over the log, no join.  An hourly 100 TB assertion log collapses in
    a single shuffle on (subj, pred).
    """
    win = F.max(F.struct(F.col("ts"), F.col("op"), F.col("obj"))).alias("w")
    return (assertions.groupBy("subj", "pred").agg(win)
            .filter(F.col("w.op") != "delete")
            .select("subj", "pred", F.col("w.obj").alias("obj"),
                    F.col("w.ts").alias("ts")))
