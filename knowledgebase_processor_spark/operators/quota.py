"""Largest-remainder (Hamilton) quota allocation (beyond-reference;
SURVEY.md §2 round-2 surface — the exact-arithmetic planning step in
front of operators/mix.py / sampling.py: given a total document budget
and per-stratum counts, how many docs may each stratum contribute so
the sample stays exactly proportional AND sums exactly to the budget?).

Float rounding (rate * n) never sums to the budget; largest-remainder
does, deterministically: base_g = B * n_g DIV N (floor), then the
R = B - sum(base) leftover units go to the R strata with the largest
remainders B * n_g MOD N (ties broken by stratum name ASC).  All
non-negative integer arithmetic — DIV/MOD identical in any engine.

Scale shape: one partial-agg ``groupBy`` over the data; the window
ranking runs over the per-stratum frame only (cardinality = number of
strata — thousands, not rows), so there is no single-partition pass
over data.  Capped at ``n_g`` (a stratum can't give more docs than it
has); the cap is applied BEFORE remainder distribution would be wrong
(quota <= n_g can break sum == B when a stratum saturates), so this
implements the standard one-round Hamilton method and surfaces
``capped`` for callers that need an iterative re-spread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def largest_remainder_quota(df: DataFrame, group_col: str,
                            budget: int) -> DataFrame:
    """df -> (group, n, base, remainder, extra, quota): Hamilton
    apportionment of ``budget`` across ``group_col`` strata."""
    cnt = (df.groupBy(F.col(group_col).alias("grp"))
           .agg(F.count(F.lit(1)).cast("long").alias("n")))
    tot = cnt.agg(F.sum("n").cast("long").alias("n_total"))
    based = (cnt.crossJoin(F.broadcast(tot))
             .withColumn("base",
                         F.expr(f"{budget} * n DIV n_total").cast("long"))
             .withColumn("remainder",
                         F.expr(f"{budget} * n % n_total").cast("long")))
    spare = based.agg(
        (F.lit(budget) - F.sum("base")).cast("long").alias("n_spare"))
    w = Window.orderBy(F.col("remainder").desc(), F.col("grp").asc())
    return (based.crossJoin(F.broadcast(spare))
            .withColumn("rn", F.row_number().over(w))
            .withColumn("extra",
                        F.when(F.col("rn") <= F.col("n_spare"), 1)
                        .otherwise(0).cast("long"))
            .withColumn("quota", (F.col("base") + F.col("extra"))
                        .cast("long"))
            .select(F.col("grp").alias("group"), "n", "base",
                    "remainder", "extra", "quota"))


def quota_oracle_sql(rows_sql: str, group_sql: str, budget: int) -> str:
    """EXACT ANSI replay of :func:`largest_remainder_quota`;
    ``group_sql`` is the stratum expression over ``rows_sql``."""
    return f"""
        WITH cnt AS (
          SELECT {group_sql} AS grp, COUNT(*)::BIGINT AS n
          FROM ({rows_sql}) GROUP BY 1),
        tot AS (SELECT SUM(n)::BIGINT AS n_total FROM cnt),
        based AS (
          SELECT grp, n,
                 ({budget} * n // n_total)::BIGINT AS base,
                 ({budget} * n % n_total)::BIGINT AS remainder
          FROM cnt CROSS JOIN tot),
        spare AS (SELECT ({budget} - SUM(base))::BIGINT AS n_spare
                  FROM based),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (
                   ORDER BY remainder DESC, grp ASC) AS rn
          FROM based)
        SELECT grp AS "group", n, base, remainder,
               (CASE WHEN rn <= n_spare THEN 1 ELSE 0 END)::BIGINT
                 AS extra,
               (base + CASE WHEN rn <= n_spare THEN 1 ELSE 0 END)::BIGINT
                 AS quota
        FROM ranked CROSS JOIN spare"""
