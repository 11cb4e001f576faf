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


# --------------------------------------------------------------------------
# Theil index with between/within decomposition (the q174 Gini tells
# you HOW unequal the token budget is; Theil — the entropy-based
# inequality measure — additionally tells you WHERE: T = T_between +
# sum_g s_g T_within_g exactly, so a corpus card can say 'the
# imbalance is across sources, not inside them' and the rebalancer
# (q42 downsampler, q134 quota) knows which knob to turn.  Gini does
# not decompose; Theil is the standard choice because it does).
#
# Exactness: per-row and per-group contributions are nano-quantized
# BIGINTs summed as integers (the entropy/chi-square discipline);
# the single ln per term is shared SQL text.  Zero-weight rows drop
# (lim x->0 x ln x = 0).

THEIL_BETWEEN_NANO_SQL = (
    "CAST(round(1000000000.0 * (CAST(sg AS DOUBLE) / s_tot)"
    " * ln((CAST(sg AS DOUBLE) * n_tot) / (CAST(s_tot AS DOUBLE)"
    " * ng))) AS BIGINT)")
THEIL_WITHIN_NANO_SQL = (
    "CAST(round(1000000000.0 * (CAST(x AS DOUBLE) / s_tot)"
    " * ln((CAST(x AS DOUBLE) * ng) / CAST(sg AS DOUBLE)))"
    " AS BIGINT)")


def theil_decomposition(df: DataFrame, group_col: str,
                        weight_col: str) -> DataFrame:
    """-> one row (n, n_groups, between_nano, within_nano,
    total_nano): Theil-T of the non-negative integer weight over
    rows, split into between-group and within-group components
    (total = between + within by construction)."""
    base = df.select(F.col(group_col).alias("g"),
                     F.col(weight_col).cast("long").alias("x")) \
        .filter(F.col("x") > 0)
    groups = (base.groupBy("g")
              .agg(F.count(F.lit(1)).cast("long").alias("ng"),
                   F.sum("x").cast("long").alias("sg")))
    totals = groups.agg(F.sum("ng").cast("long").alias("n_tot"),
                        F.sum("sg").cast("long").alias("s_tot"),
                        F.count(F.lit(1)).cast("long")
                        .alias("n_groups"))
    gt = groups.crossJoin(F.broadcast(totals))
    between = gt.agg(F.sum(F.expr(THEIL_BETWEEN_NANO_SQL))
                     .cast("long").alias("between_nano"))
    within = (base.join(F.broadcast(gt), "g")
              .agg(F.sum(F.expr(THEIL_WITHIN_NANO_SQL)).cast("long")
                   .alias("within_nano")))
    return (totals.crossJoin(F.broadcast(between))
            .crossJoin(F.broadcast(within))
            .selectExpr("n_tot AS n", "n_groups", "between_nano",
                        "within_nano",
                        "between_nano + within_nano AS total_nano"))


def theil_oracle_sql(table: str, group_sql: str,
                     weight_sql: str) -> str:
    return f"""
        WITH base AS (SELECT {group_sql} AS g,
                             CAST({weight_sql} AS BIGINT) AS x
                      FROM {table}
                      WHERE CAST({weight_sql} AS BIGINT) > 0),
        groups AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
                          CAST(SUM(x) AS BIGINT) AS sg
                   FROM base GROUP BY g),
        totals AS (SELECT CAST(SUM(ng) AS BIGINT) AS n_tot,
                          CAST(SUM(sg) AS BIGINT) AS s_tot,
                          CAST(COUNT(*) AS BIGINT) AS n_groups
                   FROM groups),
        gt AS (SELECT * FROM groups CROSS JOIN totals),
        b AS (SELECT CAST(SUM({THEIL_BETWEEN_NANO_SQL}) AS BIGINT)
                         AS between_nano FROM gt),
        w AS (SELECT CAST(SUM({THEIL_WITHIN_NANO_SQL}) AS BIGINT)
                         AS within_nano
              FROM base JOIN gt USING (g))
        SELECT n_tot AS n, n_groups, between_nano, within_nano,
               CAST(between_nano + within_nano AS BIGINT)
                   AS total_nano
        FROM totals CROSS JOIN b CROSS JOIN w"""
