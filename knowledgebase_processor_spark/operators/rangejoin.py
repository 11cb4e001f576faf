"""Grid-bucketized interval (range) join (beyond-reference; SURVEY.md
§2 round-2 surface).

Point-in-interval matching — events against sessions, crawl timestamps
against robots.txt validity windows, log lines against deploy windows.
Spark's optimizer turns a raw ``p.ts BETWEEN i.start AND i.end`` join
into BroadcastNestedLoopJoin (small side) or a key-only shuffle join
whose per-key output is |points|·|intervals| *before* the range filter
runs — quadratic on hot keys.

The scalable formulation is the standard spatial-grid trick:

* both sides are bucketized onto a fixed time grid: a point lands in
  exactly ONE bucket; an interval explodes to every bucket it covers
  (``sequence`` + ``explode`` — pure codegen, no Python);
* the join becomes an equi-join on (key, bucket) — shuffled, hashed,
  AQE-skew-splittable like any other — followed by the exact
  ``BETWEEN`` post-filter;
* because the join key uses the *point's* bucket, a matching interval
  is met exactly once (the one exploded row covering that bucket) —
  no distinct pass over the output;
* per-interval fan-out is interval_length/grid + 1 rows.  Pick the grid
  near the median interval length; ``max_buckets_per_interval`` is the
  mega-interval guard (same discipline as the LSH bucket caps): an
  adversarial [epoch, +∞) interval is REJECTED into the returned
  ``rejected`` frame instead of exploding 10^9 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from knowledgebase_processor_spark.operators.asof import _micros


def interval_join(points: DataFrame, intervals: DataFrame, on: str,
                  ts: str, start: str, end: str,
                  grid_us: int = 3_600_000_000,
                  max_buckets_per_interval: int = 8_784) -> tuple[
                      DataFrame, DataFrame]:
    """-> (matched, rejected).  ``matched`` pairs every points row with
    every intervals row of the same ``on`` key whose
    ``start <= ts <= end`` (inclusive ends, NULL-ts rows never match);
    all columns of both inputs are preserved (names must not collide
    apart from ``on``).  ``rejected`` holds intervals spanning more than
    ``max_buckets_per_interval`` grid cells (default: one year of 1-hour
    cells) — surfaced, never silently dropped."""
    p = points.withColumn(
        "__pb", F.floor(_micros(ts) / F.lit(int(grid_us))).cast("long"))
    b_lo = F.floor(_micros(start) / F.lit(int(grid_us))).cast("long")
    b_hi = F.floor(_micros(end) / F.lit(int(grid_us))).cast("long")
    iv = (intervals
          .withColumn("__lo", b_lo).withColumn("__hi", b_hi)
          .filter(F.col("__lo").isNotNull() & F.col("__hi").isNotNull()
                  & (F.col("__lo") <= F.col("__hi"))))
    oversized = F.col("__hi") - F.col("__lo") >= F.lit(
        int(max_buckets_per_interval))
    rejected = iv.filter(oversized).drop("__lo", "__hi")
    cells = (iv.filter(~oversized)
             .withColumn("__pb", F.explode(
                 F.sequence(F.col("__lo"), F.col("__hi"))))
             .drop("__lo", "__hi"))
    matched = (p.join(cells, [on, "__pb"])
               .filter(F.col(ts).between(F.col(start), F.col(end)))
               .drop("__pb"))
    return matched, rejected
