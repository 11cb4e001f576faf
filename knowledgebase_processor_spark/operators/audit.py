"""Functional-dependency violation audit (beyond-reference; SURVEY.md
§2 round-2 surface — the data-quality-rules half of the one-pass table
profiler, reference parity anchor `services/sqlite_service.py`'s schema
assumptions: the reference TRUSTS doc_id -> path/title uniqueness, this
operator measures it).

``fd_violations`` checks declared rules "X determines Y" on a table:
for each FD, group by (X, Y), then per X take n_rows, the majority-Y
count and the distinct-Y count.  A group violates the FD when it has
more than one Y; the minimal repair cost (rows to fix) is
n_rows - majority_count summed over groups.  Everything is exact
BIGINT counts + a ppm rate (non-negative DIV, engine-portable).

Scale shape: per FD two partial-agg ``groupBy``s keyed on the FD
columns (map-side combine, no windows, no driver loops); the per-FD
one-row summaries union into a tiny report frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000


def fd_violations(df: DataFrame,
                  fds: list[tuple[str, str]]) -> DataFrame:
    """df + [(lhs, rhs), ...] -> one row per FD:
    (fd, n_groups, n_violating_groups, violating_rows, total_rows,
    violation_ppm)."""
    parts = []
    for lhs, rhs in fds:
        g = (df.groupBy(F.col(lhs).alias("x"), F.col(rhs).alias("y"))
             .agg(F.count(F.lit(1)).cast("long").alias("c")))
        per_x = g.groupBy("x").agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.max("c").cast("long").alias("majority"),
            F.count(F.lit(1)).cast("long").alias("n_y"))
        parts.append(per_x.agg(
            F.lit(f"{lhs}->{rhs}").alias("fd"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(F.col("n_y") > 1, 1).otherwise(0))
            .cast("long").alias("n_violating_groups"),
            F.sum(F.col("n_rows") - F.col("majority"))
            .cast("long").alias("violating_rows"),
            F.sum("n_rows").cast("long").alias("total_rows")))
    out = parts[0]
    for more in parts[1:]:
        out = out.unionByName(more)
    return out.withColumn(
        "violation_ppm",
        F.expr(f"violating_rows * {SCALE} DIV total_rows").cast("long"))


def fd_oracle_sql(rows_sql: str, fds: list[tuple[str, str]]) -> str:
    """EXACT ANSI replay of :func:`fd_violations` for DuckDB."""
    parts = []
    for lhs, rhs in fds:
        parts.append(f"""
        SELECT '{lhs}->{rhs}' AS fd,
               COUNT(*)::BIGINT AS n_groups,
               SUM(CASE WHEN n_y > 1 THEN 1 ELSE 0 END)::BIGINT
                 AS n_violating_groups,
               SUM(n_rows - majority)::BIGINT AS violating_rows,
               SUM(n_rows)::BIGINT AS total_rows,
               (SUM(n_rows - majority) * {SCALE}
                 // SUM(n_rows))::BIGINT AS violation_ppm
        FROM (
          SELECT x, SUM(c)::BIGINT AS n_rows, MAX(c)::BIGINT AS majority,
                 COUNT(*)::BIGINT AS n_y
          FROM (SELECT {lhs} AS x, {rhs} AS y, COUNT(*)::BIGINT AS c
                FROM ({rows_sql}) GROUP BY 1, 2)
          GROUP BY x)""")
    return " UNION ALL ".join(parts)
