"""Rolling z-score anomaly flags in exact fixed point (beyond-reference;
SURVEY.md §2 round-2 surface).

Flags events whose value deviates from the TRAILING per-key window mean
by more than k standard deviations — the crawl/pipeline health monitor
(bytes-per-page spikes, latency cliffs) and the classic metric-stream
screen.

Exactness contract (q106 oracle replays every number): the value is
fixed-pointed to integer cents once (CAST(ROUND(value·100) AS BIGINT) —
round-half-away in both engines, and products of two-decimal data never
land on exact .5), then EVERYTHING is integer arithmetic.  The k·sigma
test is evaluated in squared, denominator-cleared form:

    |x - s/n| > k·sigma,  sigma² = (n·ss - s²)/n²
    ⇔ (x·n - s)² > k²·(n·ss - s²)

so no float mean, no sqrt, no division — bit-identical flags in any
engine.  Magnitudes: cents ≤ ~10⁶ and window ≤ 10³ keep every product
far inside BIGINT.

Spark shape: ONE shuffle on the key; three trailing-window aggregates
(count/sum/sum-of-squares) share a single window frame; everything else
is a projection.  The window excludes the current row (rowsBetween
(-window, -1)) — the score compares each event against its PAST only,
so the flag is computable in a streaming re-statement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rolling_zscore_flags(events: DataFrame, key: str, ts: str,
                         value: str, tiebreak: str,
                         window: int = 8, k_sigma: int = 3,
                         min_prior: int = 4) -> DataFrame:
    """(key, ts, tiebreak, cents, n_prior, sum_prior, ss_prior,
    is_anomaly) — is_anomaly NULL when fewer than ``min_prior`` prior
    events exist (cold start), boolean otherwise."""
    cents = F.round(F.col(value) * 100).cast("bigint")
    base = events.select(F.col(key).alias("key"), F.col(ts).alias("ts"),
                         F.col(tiebreak).alias("tb"),
                         cents.alias("cents"))
    w = (Window.partitionBy("key").orderBy("ts", "tb")
         .rowsBetween(-window, -1))
    stat = base.select(
        "key", "ts", "tb", "cents",
        F.count("cents").over(w).alias("n_prior"),
        F.coalesce(F.sum("cents").over(w), F.lit(0)).alias("sum_prior"),
        F.coalesce(F.sum(F.col("cents") * F.col("cents")).over(w),
                   F.lit(0)).alias("ss_prior"))
    n, s, ss, x = (F.col("n_prior"), F.col("sum_prior"),
                   F.col("ss_prior"), F.col("cents"))
    lhs = (x * n - s) * (x * n - s)
    rhs = F.lit(int(k_sigma) ** 2) * (n * ss - s * s)
    return stat.select(
        "key", "ts", "tb", "cents", "n_prior", "sum_prior", "ss_prior",
        F.when(n >= min_prior, lhs > rhs).alias("is_anomaly"))
