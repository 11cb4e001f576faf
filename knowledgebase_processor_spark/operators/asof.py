"""As-of join (beyond-reference; SURVEY.md §2 round-2 surface).

The canonical timestamped-table join Spark's DataFrame API lacks: match
every left row to the single most recent right row with the same key at
or before the left timestamp (event→attribution, measurement→latest
config, crawl→latest robots.txt snapshot).

Spark-first design — the union + forward-fill formulation, NOT a range
join:

* a naive implementation joins on key with ``r.ts <= l.ts`` and takes a
  max — a shuffle join whose per-key output is |L|·|R| BEFORE the
  aggregation prunes it, quadratic on hot keys;
* instead both sides are unioned into one stream tagged by side, and a
  single window per key — ordered by (ts, side) — forward-fills the
  latest right-side values onto each left row with
  ``last(col, ignorenulls=True)`` over an unbounded-preceding frame.
  ONE shuffle on the key, running-frame state of O(|right columns|),
  per-key cost linear in |L|+|R| regardless of skew;
* right rows sort BEFORE left rows at equal timestamps, so the match is
  inclusive (``r.ts <= l.ts``) — the same "backward" default as DuckDB
  ``ASOF JOIN`` and pandas ``merge_asof``, which is what lets the q53
  oracle cross-check this implementation against DuckDB's *native*
  as-of algorithm rather than a window replay of our own plan.

Determinism contract: the right side must be unique per (key, ts) —
with duplicates, "the most recent row" is ill-defined in every engine.
``asof_join`` does not silently pick one; dedup upstream (see the q53
driver query for the idiom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _micros(col: str):
    """Epoch micros for timestamp AND timestamp_ntz (parquet default)."""
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"cast({col} as timestamp_ntz))")


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              suffix: str = "_right",
              tolerance_us: int | None = None) -> DataFrame:
    """For each left row: columns of the latest right row with the same
    ``on`` key and ``right.ts <= left.ts`` (nulls when none exists, or
    when it is older than ``tolerance_us``).  Right's non-key columns
    arrive suffixed; its timestamp as ``{ts}{suffix}``."""
    right = right.filter(F.col(ts).isNotNull())  # a null-ts right row is
    # not "before" anything; left null-ts rows keep all-null matches
    rcols = [c for c in right.columns if c not in (on, ts)]
    out_r = {c: f"{c}{suffix}" if c in left.columns else c for c in rcols}
    out_r[ts] = f"{ts}{suffix}"
    clash = set(out_r.values()) & set(left.columns)
    if clash:
        raise ValueError(f"suffixed right columns collide with left: {clash}")

    r_types = {f.name: f.dataType for f in right.schema.fields}
    l_side = left.withColumn("__side", F.lit(1))
    for c in rcols + [ts]:
        l_side = l_side.withColumn(out_r[c], F.lit(None).cast(r_types[c]))
    r_side = right.select(
        F.col(on),
        F.col(ts).alias("__rts_order"),
        *[F.col(c).alias(out_r[c]) for c in rcols],
        F.col(ts).alias(out_r[ts]),
    ).withColumn("__side", F.lit(0))
    for c in left.columns:
        if c != on:
            r_side = r_side.withColumn(c, F.lit(None).cast(
                dict((f.name, f.dataType) for f in left.schema.fields)[c]))
    l_side = l_side.withColumn("__rts_order", F.col(ts))

    unioned = l_side.unionByName(r_side.select(*l_side.columns))
    w = (Window.partitionBy(on).orderBy("__rts_order", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # Fill ONE struct holding the entire right row, not per-column fills:
    # last(col, ignorenulls=True) per column would mix columns from
    # DIFFERENT right rows whenever the latest right row carries a NULL
    # in some value column (that column would keep an older row's value
    # while the others advance — a row that never existed, and a
    # corrupted staleness check).  The struct is non-null for every
    # right row even when all its fields are null, so the whole latest
    # row moves atomically.  Bonus: one window state, not |rcols|.
    vals = list(out_r.values())
    filled = unioned.withColumn(
        "__rvals",
        F.when(F.col("__side") == 0, F.struct(*[F.col(c) for c in vals])))
    filled = filled.withColumn(
        "__rvals", F.last("__rvals", ignorenulls=True).over(w))
    result = filled.filter(F.col("__side") == 1)
    for c in vals:
        result = result.withColumn(c, F.col("__rvals")[c])
    result = result.drop("__side", "__rts_order", "__rvals")
    if tolerance_us is not None:
        # materialize staleness FIRST — nulling the suffixed ts column
        # in-loop would corrupt the predicate for later columns
        result = result.withColumn(
            "__stale",
            (_micros(ts) - _micros(out_r[ts])) > F.lit(int(tolerance_us)))
        for orig, c in out_r.items():
            result = result.withColumn(
                c, F.when(F.col("__stale"), F.lit(None).cast(r_types[orig]))
                .otherwise(F.col(c)))
        result = result.drop("__stale")
    return result
