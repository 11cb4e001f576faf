"""Slowly-changing-dimension (SCD type 2) history from snapshots
(beyond-reference; SURVEY.md §2 round-2 surface).

Turns a stream of per-key observations (crawl snapshots of a page's
metadata, user-state events, dimension extracts) into validity-ranged
history rows: one row per (key, consecutive run of an identical tracked
value) with ``effective_from`` / ``effective_to`` / ``is_current`` —
the standard warehouse dimension layout, and the crawl-history layout
("what did this page's language field say between March and May").

Implementation is pure window SQL over ONE shuffle on the key:

    lag(value) over (key order ts)   -> change flag
    sum(flag)  over (key order ts)   -> run id (the gaps-and-islands
                                        trick; no self-join, no loop)
    group by (key, run id)           -> min(ts) = effective_from
    lead(from) over (key order from) -> effective_to (NULL = current)

All aggregates are partial-aggregatable after the single key exchange;
ties in ``ts`` are broken by a caller-supplied tiebreak column so the
run assignment is deterministic.  Every step is replayed verbatim by
the q104 DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_history(snaps: DataFrame, key: str, ts: str, value: str,
                 tiebreak: str | None = None) -> DataFrame:
    """(key, value, effective_from, effective_to, is_current, n_obs).

    ``tiebreak`` orders equal-``ts`` observations (e.g. an event id);
    default is the value itself, which still makes runs deterministic.
    """
    tb = tiebreak or value
    order = [F.col(ts), F.col(tb)]
    w = Window.partitionBy(key).orderBy(*order)
    flagged = snaps.select(
        F.col(key).alias("key"), F.col(ts).alias("ts"),
        F.col(value).alias("value"), F.col(tb).alias("tb")).withColumn(
        "chg",
        F.when(F.lag("value").over(
            Window.partitionBy("key").orderBy("ts", "tb")).eqNullSafe(
            F.col("value")), F.lit(0)).otherwise(F.lit(1)))
    runs = flagged.withColumn(
        "run",
        F.sum("chg").over(Window.partitionBy("key").orderBy("ts", "tb")
                          .rowsBetween(Window.unboundedPreceding,
                                       Window.currentRow)))
    hist = (runs.groupBy("key", "run")
            .agg(F.max("value").alias("value"),     # constant per run
                 F.min("ts").alias("effective_from"),
                 F.count("*").alias("n_obs")))
    wk = Window.partitionBy("key").orderBy("effective_from", "run")
    return (hist.withColumn("effective_to",
                            F.lead("effective_from").over(wk))
            .select("key", "value", "effective_from", "effective_to",
                    F.col("effective_to").isNull().alias("is_current"),
                    "n_obs"))
