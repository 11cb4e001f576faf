"""Split-conformal calibration for any corpus quality score
(beyond-reference eval surface; the q130 calibration/ECE report asks
"are the scores honest probabilities?" — conformal asks the more
deployable question: "give me a threshold with a DISTRIBUTION-FREE
1-α coverage guarantee", the standard way to turn an uncalibrated
quality/toxicity/lm score into a gate with a provable false-kill
bound (Vovk; Angelopoulos & Bates 2021 survey).

The split-conformal recipe: on a held-out calibration slice compute
the k-th smallest nonconformity score with k = ⌈(n_cal+1)(1-α)⌉;
any test point with score ≤ that quantile is covered with
probability ≥ 1-α.  Exchangeability is the only assumption.

Exactness + scale shape: the k-th order statistic comes from the
AUC/q191 idiom — reduce to DISTINCT integer score bins first (one
partial-agg groupBy), then a window over BINS (bounded by score
quantization, not corpus rows) finds the smallest bin whose
cumulative count reaches k.  No global row sort anywhere.  Counts
and the threshold are exact BIGINTs; coverage_ppm is integer
division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def conformal_threshold(df: DataFrame, score_col: str,
                        alpha_ppm: int = 100000) -> DataFrame:
    """-> one row (n_cal, k, q_hat): the split-conformal threshold at
    miscoverage alpha (ppm) over the calibration frame's integer
    nonconformity scores."""
    bins = (df.groupBy(F.col(score_col).cast("long").alias("s"))
            .agg(F.count(F.lit(1)).cast("long").alias("c")))
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    cum = bins.select("s", F.sum("c").over(w).alias("cum"),
                      F.sum("c").over(
                          Window.rowsBetween(Window.unboundedPreceding,
                                             Window.unboundedFollowing))
                      .alias("n_cal"))
    # k = ceil((n+1) * (1 - alpha)); ceil spelled (a + b - 1) DIV b —
    # positive operands make Spark's truncating DIV and DuckDB's
    # flooring // agree (the negated-floor trick does NOT).
    with_k = cum.withColumn(
        "k", F.expr(f"CAST(((n_cal + 1) * (1000000 - {alpha_ppm})"
                    " + 999999) DIV 1000000 AS BIGINT)"))
    return (with_k.filter(F.col("cum") >= F.col("k"))
            .groupBy("n_cal", "k")
            .agg(F.min("s").cast("long").alias("q_hat"))
            .select("n_cal", "k", "q_hat"))


def conformal_report(cal: DataFrame, test: DataFrame, score_col: str,
                     alpha_ppm: int = 100000) -> DataFrame:
    """-> one row (n_cal, k, q_hat, n_test, n_covered, coverage_ppm):
    calibrate on ``cal``, measure empirical coverage on ``test`` —
    the guarantee says coverage_ppm ≳ 1e6 - alpha_ppm.  An empty
    ``cal`` or ``test`` frame yields ZERO rows (grouping on the
    threshold keys, not a global agg) — the same contract as
    :func:`conformal_oracle_sql`'s GROUP BY."""
    thr = conformal_threshold(cal, score_col, alpha_ppm)
    t = test.select(F.col(score_col).cast("long").alias("s"))
    cov = (t.crossJoin(F.broadcast(thr))
           .groupBy("n_cal", "k", "q_hat")
           .agg(F.count(F.lit(1)).cast("long").alias("n_test"),
                F.sum(F.when(F.col("s") <= F.col("q_hat"), 1)
                      .otherwise(0)).cast("long").alias("n_covered")))
    return cov.withColumn(
        "coverage_ppm",
        F.expr("n_covered * 1000000 DIV nullif(n_test, 0)"))


def conformal_oracle_sql(cal_sql: str, test_sql: str, score_sql: str,
                         alpha_ppm: int = 100000) -> str:
    """DuckDB replay: ceil via negated floor-division, same bins."""
    return f"""
        WITH bins AS (SELECT CAST({score_sql} AS BIGINT) AS s,
                             CAST(COUNT(*) AS BIGINT) AS c
                      FROM ({cal_sql}) GROUP BY 1),
        cum AS (SELECT s, SUM(c) OVER (ORDER BY s) AS cum,
                       SUM(c) OVER () AS n_cal
                FROM bins),
        k AS (SELECT n_cal,
                     CAST(((n_cal + 1) * (1000000 - {alpha_ppm})
                           + 999999) // 1000000 AS BIGINT) AS k
              FROM cum LIMIT 1),
        thr AS (SELECT k.n_cal, k.k,
                       CAST(MIN(s) AS BIGINT) AS q_hat
                FROM cum CROSS JOIN k WHERE cum >= k.k
                GROUP BY k.n_cal, k.k),
        t AS (SELECT CAST({score_sql} AS BIGINT) AS s FROM ({test_sql}))
        SELECT CAST(n_cal AS BIGINT) AS n_cal, k, q_hat,
               CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(SUM(CASE WHEN s <= q_hat THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_covered,
               CAST(SUM(CASE WHEN s <= q_hat THEN 1 ELSE 0 END)
                    * 1000000 // nullif(COUNT(*), 0) AS BIGINT)
                   AS coverage_ppm
        FROM t CROSS JOIN thr GROUP BY n_cal, k, q_hat"""
