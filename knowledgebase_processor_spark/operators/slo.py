"""Multi-window SLO burn-rate alerting over the fetch/event log (the
SRE-workbook multiwindow-multi-burn-rate recipe: alert only when the
error rate breaches in BOTH a short window (still burning NOW) and
its enclosing long window (burned enough to matter) — single-window
alerts either page for blips or notice disasters late.  For a crawl
fleet this is the fetch-error budget; the q216 EWMA tracks level
drift, this enforces a hard budget).

Exactness: windows are integer epoch-second buckets (ts DIV seconds),
counts exact BIGINTs, rates exact ppm integer division — the whole
report is float-free.

Scale shape: two partial-agg groupBys (short and long buckets) + one
equi-join of short buckets onto their enclosing long bucket (integer
division of the bucket id — no range join needed when the long
window is a multiple of the short one, which the API enforces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def burn_rate_alerts(events: DataFrame, ts_col: str, error_col: str,
                     short_s: int = 600, long_s: int = 3600,
                     budget_ppm: int = 100000,
                     burn_factor_ppm: int = 2000000) -> DataFrame:
    """-> (short_bucket, long_bucket, n_short, err_short,
    short_ppm, n_long, err_long, long_ppm, alert): one row per short
    window, alert = both windows above budget * burn_factor.
    ``long_s`` must be a multiple of ``short_s``."""
    if long_s % short_s:
        raise ValueError("long_s must be a multiple of short_s")
    thr = budget_ppm * burn_factor_ppm // 1_000_000
    base = events.select(
        F.expr(f"CAST(unix_timestamp({ts_col}) AS BIGINT)"
               f" DIV {short_s}").alias("sb"),
        F.when(F.col(error_col), 1).otherwise(0).cast("long")
        .alias("e"))
    short = (base.groupBy("sb")
             .agg(F.count(F.lit(1)).cast("long").alias("n_short"),
                  F.sum("e").cast("long").alias("err_short"))
             .withColumn("lb", F.expr(f"sb DIV {long_s // short_s}")))
    long_w = (short.groupBy("lb")
              .agg(F.sum("n_short").cast("long").alias("n_long"),
                   F.sum("err_short").cast("long").alias("err_long")))
    joined = short.join(long_w, "lb")
    return (joined.select(
        F.col("sb").alias("short_bucket"),
        F.col("lb").alias("long_bucket"),
        "n_short", "err_short",
        F.expr("err_short * 1000000 DIV nullif(n_short, 0)")
        .alias("short_ppm"),
        "n_long", "err_long",
        F.expr("err_long * 1000000 DIV nullif(n_long, 0)")
        .alias("long_ppm"))
        .withColumn("alert", F.expr(
            f"coalesce(short_ppm >= {thr}, false)"
            f" AND coalesce(long_ppm >= {thr}, false)")))


def burn_oracle_sql(table: str, ts_sql: str, error_sql: str,
                    short_s: int = 600, long_s: int = 3600,
                    budget_ppm: int = 100000,
                    burn_factor_ppm: int = 2000000) -> str:
    thr = budget_ppm * burn_factor_ppm // 1_000_000
    ratio = long_s // short_s
    return f"""
        WITH base AS (SELECT CAST(floor(epoch({ts_sql})) AS BIGINT)
                             // {short_s} AS sb,
                             CAST(CASE WHEN {error_sql} THEN 1 ELSE 0
                                  END AS BIGINT) AS e
                      FROM {table}),
        short AS (SELECT sb, CAST(COUNT(*) AS BIGINT) AS n_short,
                         CAST(SUM(e) AS BIGINT) AS err_short,
                         sb // {ratio} AS lb
                  FROM base GROUP BY sb),
        long_w AS (SELECT lb, CAST(SUM(n_short) AS BIGINT) AS n_long,
                          CAST(SUM(err_short) AS BIGINT) AS err_long
                   FROM short GROUP BY lb)
        SELECT sb AS short_bucket, short.lb AS long_bucket,
               n_short, err_short,
               CAST(err_short * 1000000 // nullif(n_short, 0)
                    AS BIGINT) AS short_ppm,
               n_long, err_long,
               CAST(err_long * 1000000 // nullif(n_long, 0)
                    AS BIGINT) AS long_ppm,
               COALESCE(err_short * 1000000 // nullif(n_short, 0)
                        >= {thr}, false)
               AND COALESCE(err_long * 1000000 // nullif(n_long, 0)
                            >= {thr}, false) AS alert
        FROM short JOIN long_w ON long_w.lb = short.lb
        ORDER BY short_bucket"""
