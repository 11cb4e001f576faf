"""k-anonymity audit over quasi-identifier columns (beyond-reference;
SURVEY.md §2 round-2 surface — the privacy gate next to
functions/text.py::redact_pii: redaction removes direct identifiers,
this measures whether the REMAINING attribute combinations still
single people out before a corpus is published; Sweeney 2002, public).

``k_anonymity_report`` — for each requested k, one row: how many
quasi-identifier equivalence classes have fewer than k rows, and how
many rows sit in them (the re-identification exposure).  Exact BIGINT
counts, non-negative DIV ppm.

``class_size_histogram`` — the full equivalence-class-size
distribution (size, n_groups, n_rows), the long-tail view auditors
plot.

Scale shape: ONE partial-agg groupBy over the QI columns produces the
class-size frame; every report row is another partial agg over that
(already tiny relative to the data) frame.  No windows, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000


def _class_sizes(df: DataFrame, qi_cols: list[str]) -> DataFrame:
    return (df.groupBy(*qi_cols)
            .agg(F.count(F.lit(1)).cast("long").alias("sz")))


def k_anonymity_report(df: DataFrame, qi_cols: list[str],
                       ks: list[int]) -> DataFrame:
    """df + QI columns + k thresholds -> one row per k:
    (k, n_rows, n_groups, min_group_size, n_violating_groups,
    rows_at_risk, risk_ppm)."""
    sizes = _class_sizes(df, qi_cols)
    parts = []
    for k in ks:
        parts.append(sizes.agg(
            F.lit(int(k)).cast("long").alias("k"),
            F.sum("sz").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.min("sz").cast("long").alias("min_group_size"),
            F.sum(F.when(F.col("sz") < k, 1).otherwise(0)).cast("long")
            .alias("n_violating_groups"),
            F.sum(F.when(F.col("sz") < k, F.col("sz")).otherwise(0))
            .cast("long").alias("rows_at_risk")))
    out = parts[0]
    for more in parts[1:]:
        out = out.unionByName(more)
    return out.withColumn(
        "risk_ppm",
        F.expr(f"rows_at_risk * {SCALE} DIV n_rows").cast("long"))


def class_size_histogram(df: DataFrame,
                         qi_cols: list[str]) -> DataFrame:
    """df + QI columns -> (size, n_groups, n_rows) distribution."""
    return (_class_sizes(df, qi_cols)
            .groupBy(F.col("sz").alias("size"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_groups"),
                 F.sum("sz").cast("long").alias("n_rows")))


def kanon_oracle_sql(rows_sql: str, qi_sql: list[str],
                     ks: list[int]) -> str:
    """EXACT ANSI replay of :func:`k_anonymity_report` for DuckDB."""
    qi = ", ".join(qi_sql)
    parts = []
    for k in ks:
        parts.append(f"""
        SELECT {int(k)}::BIGINT AS k,
               SUM(sz)::BIGINT AS n_rows,
               COUNT(*)::BIGINT AS n_groups,
               MIN(sz)::BIGINT AS min_group_size,
               SUM(CASE WHEN sz < {k} THEN 1 ELSE 0 END)::BIGINT
                 AS n_violating_groups,
               SUM(CASE WHEN sz < {k} THEN sz ELSE 0 END)::BIGINT
                 AS rows_at_risk,
               (SUM(CASE WHEN sz < {k} THEN sz ELSE 0 END) * {SCALE}
                 // SUM(sz))::BIGINT AS risk_ppm
        FROM (SELECT {qi}, COUNT(*)::BIGINT AS sz
              FROM ({rows_sql}) GROUP BY {qi})""")
    return " UNION ALL ".join(parts)


def l_diversity_report(df: DataFrame, qi_cols: list[str],
                       sensitive_col: str,
                       ls: list[int]) -> DataFrame:
    """l-diversity audit (Machanavajjhala 2006, public — the companion
    gate to k-anonymity: a class can be large yet still leak if every
    member shares one sensitive value).  For each l, one row:
    (l, n_rows, n_groups, min_diversity, n_violating_groups,
    rows_at_risk, risk_ppm) where a group violates when its QI class
    carries fewer than l DISTINCT sensitive values.

    Same plan shape as the k report: one partial-agg groupBy over
    (QI..., count + countDistinct(sensitive)) then tiny rollups."""
    sizes = (df.groupBy(*qi_cols)
             .agg(F.count(F.lit(1)).cast("long").alias("sz"),
                  F.countDistinct(sensitive_col).cast("long")
                  .alias("div")))
    parts = []
    for lv in ls:
        parts.append(sizes.agg(
            F.lit(int(lv)).cast("long").alias("l"),
            F.sum("sz").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.min("div").cast("long").alias("min_diversity"),
            F.sum(F.when(F.col("div") < lv, 1).otherwise(0))
            .cast("long").alias("n_violating_groups"),
            F.sum(F.when(F.col("div") < lv, F.col("sz")).otherwise(0))
            .cast("long").alias("rows_at_risk")))
    out = parts[0]
    for more in parts[1:]:
        out = out.unionByName(more)
    return out.withColumn(
        "risk_ppm",
        F.expr(f"rows_at_risk * {SCALE} DIV n_rows").cast("long"))
