"""Neyman-optimal labeling-budget allocation across strata (the
missing step between the stratified sampler (q79) and the rater
pipeline (q129/q130): given B human labels to spend over language /
source strata, minimum-variance estimation allocates
n_h ∝ N_h·σ_h — big AND internally-diverse strata get the labels;
uniform or proportional-only splits waste budget on homogeneous
slices.  Apportionment uses the largest-remainder (Hamilton) method
so the integer allocations sum to B exactly and deterministically.

Exactness: per-stratum moments are exact BIGINTs; the ONE float step
(σ via sqrt of the integer variance numerator) lands in a
micro-quantized weight shared verbatim with the q205 oracle;
apportionment is then pure integer arithmetic with a deterministic
(remainder DESC, stratum) tie-break.

Scale shape: one partial-agg groupBy over the corpus, then windows
over the STRATA frame (languages/sources — thousands at most), the
corrstats.py small-frame discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# N_h * sigma_h in micro-units: population sigma = sqrt(n*ss - s^2)/n,
# so N_h*sigma_h = sqrt(n*ss - s^2) exactly; the variance numerator is
# an exact BIGINT and the sqrt is the one float step — shared verbatim
# with the oracle.
WEIGHT_MICRO_SQL = ("CAST(round(1000000 * sqrt("
                    "greatest(CAST(n_h AS DOUBLE) * ss_h - "
                    "CAST(s_h AS DOUBLE) * s_h, 0.0))) AS BIGINT)")


def neyman_allocation(df: DataFrame, stratum_col: str, metric_col: str,
                      budget: int) -> DataFrame:
    """-> (stratum, n_h, weight_micro, alloc): integer label budget
    per stratum by Neyman allocation with largest-remainder rounding;
    sum(alloc) == budget always: the post-rounding leftover is dealt
    round-robin as (leftover DIV n_strata) each plus one more to the
    first (leftover % n_strata) strata in tie-break order — for normal
    Hamilton rounding leftover < n_strata so this is the classic
    largest-remainder rule, and on degenerate corpora (all-zero
    weights, budget >> n_strata) the whole budget still lands."""
    x = F.col(metric_col).cast("long")
    strata = (df.groupBy(F.col(stratum_col).alias("stratum"))
              .agg(F.count(F.lit(1)).cast("long").alias("n_h"),
                   F.sum(x).cast("long").alias("s_h"),
                   F.sum(x * x).cast("long").alias("ss_h")))
    w = strata.withColumn("weight_micro", F.expr(WEIGHT_MICRO_SQL))
    tot = Window.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    sized = (w.withColumn("w_tot", F.sum("weight_micro").over(tot))
             .withColumn("base", F.expr(
                 f"CASE WHEN w_tot = 0 THEN CAST(0 AS BIGINT)"
                 f" ELSE CAST({budget} AS BIGINT) * weight_micro"
                 " DIV w_tot END"))
             .withColumn("rem", F.expr(
                 f"CASE WHEN w_tot = 0 THEN CAST(0 AS BIGINT)"
                 f" ELSE CAST({budget} AS BIGINT) * weight_micro"
                 " - base * w_tot END")))
    rank_w = Window.orderBy(F.col("rem").desc(), F.col("stratum"))
    alloc = (sized.withColumn("leftover", F.expr(
        f"CAST({budget} AS BIGINT) - sum(base) OVER ()"))
        .withColumn("n_strata", F.expr("count(*) OVER ()"))
        .withColumn("rk", F.row_number().over(rank_w))
        .withColumn("alloc", F.expr(
            "CAST(base + leftover DIV n_strata"
            " + (CASE WHEN rk <= leftover % n_strata THEN 1 ELSE 0 END)"
            " AS BIGINT)")))
    return alloc.select("stratum", "n_h", "weight_micro", "alloc")


def neyman_oracle_sql(table: str, stratum_sql: str, metric_sql: str,
                      budget: int, stratum_name: str = "stratum") -> str:
    """DuckDB replay: same shared weight formula, same Hamilton
    rounding with the same tie-break."""
    return f"""
        WITH strata AS (
          SELECT {stratum_sql} AS stratum,
                 CAST(COUNT(*) AS BIGINT) AS n_h,
                 CAST(SUM({metric_sql}) AS BIGINT) AS s_h,
                 CAST(SUM(CAST({metric_sql} AS BIGINT)
                          * {metric_sql}) AS BIGINT) AS ss_h
          FROM {table} GROUP BY 1),
        w AS (SELECT *, {WEIGHT_MICRO_SQL} AS weight_micro FROM strata),
        sized AS (SELECT *, SUM(weight_micro) OVER () AS w_tot FROM w),
        based AS (SELECT *,
                         CASE WHEN w_tot = 0 THEN 0
                              ELSE CAST({budget} AS BIGINT)
                                   * weight_micro // w_tot END AS base,
                         CASE WHEN w_tot = 0 THEN 0
                              ELSE CAST({budget} AS BIGINT) * weight_micro
                                   - (CAST({budget} AS BIGINT)
                                      * weight_micro // w_tot) * w_tot
                         END AS rem
                  FROM sized),
        ranked AS (SELECT *,
                          CAST({budget} AS BIGINT)
                          - SUM(base) OVER () AS leftover,
                          COUNT(*) OVER () AS n_strata,
                          ROW_NUMBER() OVER (ORDER BY rem DESC,
                                             stratum) AS rk
                   FROM based)
        SELECT stratum AS {stratum_name}, n_h, weight_micro,
               CAST(base + leftover // n_strata
                    + (CASE WHEN rk <= leftover % n_strata
                       THEN 1 ELSE 0 END)
                    AS BIGINT) AS alloc
        FROM ranked ORDER BY stratum"""
