"""Rank-correlation and concentration statistics per group
(beyond-reference data-card surface; companions to the drift/entropy
reports — "do my two quality signals agree?" (Spearman) and "how
concentrated is this source's token budget?" (Gini) are the two
numbers a corpus data card (q100) wants next to the histograms).

Cross-engine exactness contract: ranks are ``row_number`` with a
DETERMINISTIC id tie-break (documented deviation from average-rank
Spearman under ties — every engine replays it bit-identically), the
d^2 / i*x sums are exact BIGINTs, and the single float step per group
(one multiply+round for rho) is shared SQL text, the drift.py idiom.

Scale shape: one window per group (spillable sort over group members;
groups are sources/languages — thousands, not billions) plus one
partial-agg groupBy.  No self-joins, no O(n^2) pair sums: Spearman
uses the closed d^2 form, Gini the sorted-index identity
``G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# rho = 1 - 6*sum_d2 / (n*(n^2-1)), quantized to ppm — shared verbatim
# with the q173 oracle.
RHO_PPM_SQL = ("CAST(round(1000000 * (1.0 - 6.0 * sum_d2 "
               "/ (CAST(n AS DOUBLE) * (n * n - 1)))) AS BIGINT)")


def spearman_by_group(df: DataFrame, group_col: str, id_col: str,
                      x_col: str, y_col: str) -> DataFrame:
    """-> (group, n, sum_d2, rho_ppm) per group with n >= 2 rows:
    Spearman rank correlation of (x, y) under deterministic
    row_number ranks (ties broken by id)."""
    wx = Window.partitionBy(group_col).orderBy(F.col(x_col),
                                               F.col(id_col))
    wy = Window.partitionBy(group_col).orderBy(F.col(y_col),
                                               F.col(id_col))
    ranked = df.select(
        F.col(group_col).alias("grp"),
        F.row_number().over(wx).cast("long").alias("rx"),
        F.row_number().over(wy).cast("long").alias("ry"))
    agg = (ranked.groupBy("grp")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.expr("(rx - ry) * (rx - ry)")).cast("long")
                .alias("sum_d2"))
           .filter(F.col("n") >= 2))
    return (agg.withColumn("rho_ppm", F.expr(RHO_PPM_SQL))
            .select(F.col("grp").alias(group_col), "n", "sum_d2",
                    "rho_ppm"))


def gini_by_group(df: DataFrame, group_col: str, id_col: str,
                  x_col: str) -> DataFrame:
    """-> (group, n, total, gini_ppm) per group: Gini concentration of
    the non-negative measure x (0 = perfectly even, ->1e6 = one row
    holds everything), via the sorted-index identity — exact integer
    end-to-end (tie order cannot change the sum of ranks over equal
    values, so the id tie-break does not affect the result)."""
    w = Window.partitionBy(group_col).orderBy(F.col(x_col),
                                              F.col(id_col))
    ranked = df.select(
        F.col(group_col).alias("grp"),
        F.col(x_col).cast("long").alias("x"),
        F.row_number().over(w).cast("long").alias("i"))
    return (ranked.groupBy("grp")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum("x").cast("long").alias("total"),
                 F.sum(F.expr("i * x")).cast("long").alias("__ix"))
            .selectExpr(
                f"grp AS {group_col}", "n", "total",
                "CAST(CASE WHEN total = 0 THEN 0 ELSE "
                "(2 * __ix - (n + 1) * total) * 1000000 "
                "DIV (n * total) END AS BIGINT) AS gini_ppm"))
