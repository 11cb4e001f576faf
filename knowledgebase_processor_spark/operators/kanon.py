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


def kanon_generalization_ladder(df: DataFrame, qi_cols: list,
                                ks: list | None = None) -> DataFrame:
    """Generalization ladder for k-anonymity (the REPAIR view the
    q139 audit lacks: if the full quasi-identifier set fails k, which
    suffix of the generalization lattice — dropping the most
    identifying column per level — first satisfies it, and at what
    row cost?).  Level 0 keeps all QI columns; level i drops the
    LAST i columns of ``qi_cols`` (caller orders them most-
    identifying-last); the final level is full suppression (one
    group).

    -> (level, n_qi_cols, n_groups, min_group, rows_below_k ... per k)
    with one column ``below_k{k}`` per requested k.  One partial-agg
    groupBy per level over the same frame — levels are few.
    """
    ks = ks or [5]
    out = None
    for level in range(len(qi_cols) + 1):
        keep = qi_cols[: len(qi_cols) - level]
        grouped = (df.groupBy(*keep) if keep else df.groupBy(F.lit(1)))
        sizes = grouped.agg(F.count(F.lit(1)).cast("long").alias("sz"))
        agg = [F.lit(level).cast("long").alias("level"),
               F.lit(len(keep)).cast("long").alias("n_qi_cols"),
               F.count(F.lit(1)).cast("long").alias("n_groups"),
               F.min("sz").cast("long").alias("min_group")]
        for k in ks:
            agg.append(F.sum(F.when(F.col("sz") < k, F.col("sz"))
                             .otherwise(0)).cast("long")
                       .alias(f"below_k{k}"))
        row = sizes.agg(*agg[2:]).select(*[F.lit(level).cast("long")
                                           .alias("level"),
                                           F.lit(len(keep)).cast("long")
                                           .alias("n_qi_cols"), "*"])
        out = row if out is None else out.unionByName(row)
    return out


def kanon_ladder_oracle_sql(table: str, qi_sqls: list,
                            ks: list | None = None) -> str:
    """DuckDB replay of :func:`kanon_generalization_ladder`."""
    ks = ks or [5]
    selects = []
    for level in range(len(qi_sqls) + 1):
        keep = qi_sqls[: len(qi_sqls) - level]
        # no GROUP BY at the full-suppression level — 'GROUP BY 1' is
        # an ordinal in DuckDB and binds to the aggregate
        grp = f" GROUP BY {', '.join(keep)}" if keep else ""
        below = ", ".join(
            f"CAST(SUM(CASE WHEN sz < {k} THEN sz ELSE 0 END)"
            f" AS BIGINT) AS below_k{k}" for k in ks)
        selects.append(f"""
          SELECT CAST({level} AS BIGINT) AS level,
                 CAST({len(keep)} AS BIGINT) AS n_qi_cols,
                 CAST(COUNT(*) AS BIGINT) AS n_groups,
                 CAST(MIN(sz) AS BIGINT) AS min_group, {below}
          FROM (SELECT COUNT(*) AS sz FROM {table}{grp})""")
    return (" UNION ALL ".join(selects)) + " ORDER BY level"
