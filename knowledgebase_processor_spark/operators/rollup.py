"""Hypertable-style hierarchical time rollup (beyond-reference;
SURVEY.md §2 round-2 surface).

The continuous-aggregate pattern: maintain per-minute aggregates of the
raw event stream, then build each coarser level FROM THE NEXT FINER
LEVEL's partials rather than re-scanning raw data — hour rows fold 60
minute-rows, day rows fold 24 hour-rows.  At 100 TB of events this is
the difference between one raw scan total and one raw scan *per level*;
it is also the incremental-refresh shape (a late event touches one
minute partial, and the affected hour/day rows rebuild from ~60/24
partial rows, not from raw).

Correctness requires every aggregate to be *decomposable*: count is
summed, min/max are re-min/maxed.  Deliberately NOT included: float
sums (summation-order-dependent — materialize value sums as decimals if
needed) and distinct counts (not mergeable without sketches).  The q55
oracle verifies the defining invariant cross-engine: rollup-of-partials
equals direct aggregation of raw at EVERY level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: level name -> (date_trunc unit); ordered finest -> coarsest
LEVELS = ("minute", "hour", "day")


def hypertable_rollup(events: DataFrame, ts: str = "ts",
                      dims: tuple[str, ...] = ("event_type",),
                      value: str = "value",
                      levels: tuple[str, ...] = LEVELS) -> DataFrame:
    """-> (level, bucket_start, *dims, n_events, min_value, max_value):
    the union of all rollup levels, each coarser level aggregated from
    the previous level's rows."""
    base = (events
            .groupBy(F.date_trunc(levels[0], F.col(ts)).alias("bucket_start"),
                     *dims)
            .agg(F.count("*").alias("n_events"),
                 F.min(value).alias("min_value"),
                 F.max(value).alias("max_value"))
            .withColumn("level", F.lit(levels[0])))
    out = [base]
    prev = base
    for lvl in levels[1:]:
        prev = (prev
                .groupBy(F.date_trunc(lvl, F.col("bucket_start"))
                         .alias("bucket_start"), *dims)
                .agg(F.sum("n_events").alias("n_events"),
                     F.min("min_value").alias("min_value"),
                     F.max("max_value").alias("max_value"))
                .withColumn("level", F.lit(lvl)))
        out.append(prev)
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res.select("level", "bucket_start", *dims,
                      "n_events", "min_value", "max_value")
