"""Trend and fairness diagnostics for crawl operations: the
Mann-Kendall nonparametric trend test per entity (is this host's
fetch latency / page size / change rate MONOTONICALLY drifting? —
the rank-based complement to q216's EWMA level-shift detector: MK
needs no threshold, is distribution-free, and its S statistic is
pure integer arithmetic) and Jain's fairness index over the crawl's
per-host page allocation (the standard scheduler-fairness number:
1 = perfectly even, 1/n = one host gets everything — the politeness
family's q166/q184 budget check in one scalar).

Exactness: MK's S = Σ_{i<j} sgn(x_j - x_i) and its tie-corrected
variance numerator var18 = n(n-1)(2n+5) - Σ t(t-1)(2t+5) are exact
BIGINTs; the z-score's single float step is a shared SQL string.
Jain's sums are exact BIGINTs with the ratio in one shared float
step (sum² overflows int64 at 10^10+ rows, so the ratio is computed
in double from exact integer inputs — deterministic on both engines).

Scale shape: MK is an O(n²)-pairs statistic BY DEFINITION — the
self-join runs per entity on sequences that are per-host probe
histories (tens to hundreds of rows; the docstring contract, same as
q173's per-group windows).  For long series use EWMA or a regression
slope instead.  Jain is one partial-agg pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# z = (S - sgn(S)) / sqrt(var18 / 18), NULL when var18 = 0
MK_Z_MICRO_SQL = (
    "CASE WHEN var18 = 0 THEN NULL ELSE "
    "CAST(round(1000000 * (s_stat - (CASE WHEN s_stat > 0 THEN 1"
    " WHEN s_stat < 0 THEN -1 ELSE 0 END))"
    " / sqrt(CAST(var18 AS DOUBLE) / 18.0)) AS BIGINT) END")

JAIN_PPM_SQL = (
    "CASE WHEN n_hosts = 0 OR sum_sq = 0 THEN NULL ELSE "
    "CAST(round(1000000 * CAST(sum_x AS DOUBLE) * sum_x"
    " / (CAST(n_hosts AS DOUBLE) * sum_sq)) AS BIGINT) END")


def mann_kendall(df: DataFrame, key_col: str, order_col: str,
                 metric_col: str) -> DataFrame:
    """-> (key, n, s_stat, var18, z_micro) per entity over its
    sequence ordered by ``order_col`` (must be unique per key)."""
    base = df.select(F.col(key_col).alias("k"),
                     F.col(order_col).alias("o"),
                     F.col(metric_col).cast("long").alias("x"))
    pairs = (base.alias("a").join(base.alias("b"),
                                  (F.col("a.k") == F.col("b.k"))
                                  & (F.col("a.o") < F.col("b.o")))
             .select(F.col("a.k").alias("k"),
                     F.signum(F.col("b.x") - F.col("a.x"))
                     .cast("long").alias("sg")))
    s = pairs.groupBy("k").agg(F.sum("sg").cast("long").alias("s_stat"))
    counts = base.groupBy("k").agg(F.count(F.lit(1)).cast("long")
                                   .alias("n"))
    ties = (base.groupBy("k", "x")
            .agg(F.count(F.lit(1)).cast("long").alias("t"))
            .groupBy("k")
            .agg(F.sum(F.expr("t * (t - 1) * (2 * t + 5)"))
                 .cast("long").alias("tie_sum")))
    out = (counts.join(s, "k", "left").join(ties, "k")
           .select("k", "n",
                   F.coalesce("s_stat", F.lit(0)).cast("long")
                   .alias("s_stat"),
                   F.expr("n * (n - 1) * (2 * n + 5) - tie_sum")
                   .cast("long").alias("var18")))
    return (out.withColumn("z_micro", F.expr(MK_Z_MICRO_SQL))
            .withColumnRenamed("k", key_col))


def jain_fairness(df: DataFrame, host_col: str) -> DataFrame:
    """-> one row (n_hosts, sum_x, sum_sq, jain_ppm): fairness of the
    per-host row allocation."""
    per = df.groupBy(F.col(host_col).alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("x"))
    agg = per.agg(F.count(F.lit(1)).cast("long").alias("n_hosts"),
                  F.sum("x").cast("long").alias("sum_x"),
                  F.sum(F.expr("x * x")).cast("long").alias("sum_sq"))
    return agg.withColumn("jain_ppm", F.expr(JAIN_PPM_SQL))


def mk_oracle_sql(table: str, key_sql: str, order_sql: str,
                  metric_sql: str, key_name: str = "k") -> str:
    return f"""
        WITH base AS (SELECT {key_sql} AS k, {order_sql} AS o,
                             CAST({metric_sql} AS BIGINT) AS x
                      FROM {table}),
        pairs AS (SELECT a.k,
                         CAST(sign(b.x - a.x) AS BIGINT) AS sg
                  FROM base a JOIN base b
                    ON a.k = b.k AND a.o < b.o),
        s AS (SELECT k, CAST(SUM(sg) AS BIGINT) AS s_stat
              FROM pairs GROUP BY k),
        n AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n
              FROM base GROUP BY k),
        ties AS (SELECT k, CAST(SUM(t * (t - 1) * (2 * t + 5))
                               AS BIGINT) AS tie_sum
                 FROM (SELECT k, x, CAST(COUNT(*) AS BIGINT) AS t
                       FROM base GROUP BY k, x) GROUP BY k),
        out AS (SELECT n.k, n.n,
                       CAST(COALESCE(s_stat, 0) AS BIGINT) AS s_stat,
                       CAST(n.n * (n.n - 1) * (2 * n.n + 5) - tie_sum
                            AS BIGINT) AS var18
                FROM n LEFT JOIN s ON s.k = n.k
                JOIN ties ON ties.k = n.k)
        SELECT k AS {key_name}, n, s_stat, var18,
               {MK_Z_MICRO_SQL} AS z_micro
        FROM out ORDER BY {key_name}"""


def jain_oracle_sql(table: str, host_sql: str) -> str:
    return f"""
        WITH per AS (SELECT {host_sql} AS h,
                            CAST(COUNT(*) AS BIGINT) AS x
                     FROM {table} GROUP BY 1),
        agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hosts,
                       CAST(SUM(x) AS BIGINT) AS sum_x,
                       CAST(SUM(x * x) AS BIGINT) AS sum_sq
                FROM per)
        SELECT n_hosts, sum_x, sum_sq, {JAIN_PPM_SQL} AS jain_ppm
        FROM agg"""
