"""Fixed-width histogram quantiles — the one-pass scale path for
percentiles (beyond-reference; complements q57's exact
``percentile_disc``).

Exact per-group percentiles sort every group's values; at 10^12 rows
that is the single most expensive statistic a corpus report asks for.
The standard scale answer is a bounded HISTOGRAM: bucketize values into
``num_buckets`` fixed-width bins (one partial-aggregatable groupBy — the
exchange carries at most groups x buckets tiny rows), then read any
quantile off the cumulative counts.  The answer is exact-to-the-bucket
(error <= bin width, chosen by the caller), deterministic, and the
histogram itself is MERGEABLE across slices (cell-wise add — the same
partial-rollup contract as sketches.py / heavy.py).

All arithmetic is integer (bucket ids, counts, ceil-rank as
``(n * q_ppm + 999999) DIV 1e6`` in parts-per-million), so the DuckDB
oracle (q81) replays every histogram cell, every rank, and every picked
bucket bound bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def histogram_counts(df: DataFrame, group_cols: list[str], value_col: str,
                     lo: int, hi: int, num_buckets: int = 100) -> DataFrame:
    """(group..., bucket, cnt) with bucket = clamp((v - lo) DIV width);
    the persistable, mergeable sketch.  ``width`` = ceil((hi-lo)/buckets)
    so the bins cover [lo, hi] with integer bounds."""
    width = max(1, -(-(hi - lo) // num_buckets))
    b = F.expr(f"CAST(least(greatest(({value_col} - {lo}) DIV {width}, 0),"
               f" {num_buckets - 1}) AS INT)")
    return (df.select(*group_cols, b.alias("bucket"))
            .groupBy(*group_cols, "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def histogram_quantiles(df: DataFrame, group_cols: list[str], value_col: str,
                        lo: int, hi: int, qs_ppm: list[int],
                        num_buckets: int = 100) -> DataFrame:
    """Per group: n plus, for each quantile q (in ppm), the LOWER BOUND of
    the bucket containing the ceil(q*n)-th value — columns ``q<ppm>_lo``.

    The quantile read-off runs on the (groups x buckets)-sized histogram:
    one running-sum window over <= num_buckets rows per group, then a
    conditional min — negligible next to the single data pass.
    """
    width = max(1, -(-(hi - lo) // num_buckets))
    h = histogram_counts(df, group_cols, value_col, lo, hi, num_buckets)
    win = (Window.partitionBy(*group_cols).orderBy("bucket")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (h.withColumn("cum", F.sum("cnt").over(win))
           .withColumn("n", F.sum("cnt").over(Window.partitionBy(*group_cols))))
    aggs = [F.max("n").cast("bigint").alias("n")]
    for q in qs_ppm:
        rank = F.expr(f"(n * {q} + 999999) DIV 1000000")
        lo_bound = (F.lit(lo)
                    + F.col("bucket").cast("bigint") * F.lit(width))
        aggs.append(F.min(F.when(F.col("cum") >= rank, lo_bound))
                    .cast("bigint").alias(f"q{q}_lo"))
    return cum.groupBy(*group_cols).agg(*aggs)
