"""Robust per-group outlier statistics — median / MAD / 3-MAD flags
(beyond-reference data-card surface; the q106 anomaly flags are
mean/σ z-scores, which a single 10 GB page drags arbitrarily — the
median/MAD pair is the standard robust replacement with a 50%
breakdown point, the number a crawl-health dashboard wants per
source: 'what is a NORMAL page here, and how many pages are wildly
off it?').

Exactness contract: the metric is integral; Spark's exact
``percentile`` and DuckDB's ``quantile_cont`` share the same linear-
interpolation definition (rank (n-1)p), so medians of BIGINTs are
exact .0/.5 doubles on both engines — micro-quantized to BIGINT
before anything compares them.  The outlier rule compares integer
micro deviations: |x - med|·1e6 > 3·mad_micro, one shared spelling.

Scale shape: two grouped aggregation passes (median, then MAD + flag
count with the tiny per-group median frame broadcast back) — exact
group-sorted percentiles are fine while groups are sources/hosts
(each group's values sort within an executor, spillable); at
per-corpus scale swap stage 1 for the q81 fixed-width histogram
quantiles — the downstream flag logic is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# |x - med| in micro vs 3*MAD in micro — shared verbatim with the
# q199 oracle (dev_micro = 1e6*|x| - is already integral).
OUTLIER_COND_SQL = "abs(x * 1000000 - median_micro) > 3 * mad_micro"


def robust_outliers(df: DataFrame, group_col: str,
                    metric_col: str) -> DataFrame:
    """-> (group, n, median_micro, mad_micro, n_outliers) per group."""
    x = F.col(metric_col).cast("long")
    base = df.select(F.col(group_col).alias("grp"), x.alias("x"))
    med = (base.groupBy("grp")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.round(F.expr("percentile(x, 0.5)") * 1000000)
                .cast("long").alias("median_micro")))
    mad = (base.join(F.broadcast(med), "grp")
           .groupBy("grp", "n", "median_micro")
           .agg(F.round(F.expr(
               "percentile(abs(x * 1000000 - median_micro), 0.5)"))
               .cast("long").alias("mad_micro")))
    out = (base.join(F.broadcast(mad), "grp")
           .groupBy("grp", "n", "median_micro", "mad_micro")
           .agg(F.sum(F.expr(f"CASE WHEN {OUTLIER_COND_SQL}"
                             " THEN 1 ELSE 0 END"))
                .cast("long").alias("n_outliers")))
    return out.select(F.col("grp").alias(group_col), "n",
                      "median_micro", "mad_micro", "n_outliers")


def robust_oracle_sql(table: str, group_sql: str, metric_sql: str,
                      group_name: str = "source") -> str:
    """DuckDB replay: quantile_cont == Spark percentile (both linear
    interpolation at rank (n-1)p)."""
    return f"""
        WITH base AS (SELECT {group_sql} AS grp,
                             CAST({metric_sql} AS BIGINT) AS x
                      FROM {table}),
        med AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(round(quantile_cont(x, 0.5) * 1000000)
                            AS BIGINT) AS median_micro
                FROM base GROUP BY grp),
        mad AS (SELECT grp, n, median_micro,
                       CAST(round(quantile_cont(
                           abs(x * 1000000 - median_micro), 0.5))
                            AS BIGINT) AS mad_micro
                FROM base JOIN med USING (grp)
                GROUP BY grp, n, median_micro)
        SELECT grp AS {group_name}, n, median_micro, mad_micro,
               CAST(SUM(CASE WHEN {OUTLIER_COND_SQL}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM base JOIN mad USING (grp)
        GROUP BY grp, n, median_micro, mad_micro ORDER BY grp"""
