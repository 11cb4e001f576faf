"""Zone-map pruning effectiveness — the MEASURED payoff of a file
layout (companion to zorder.py/q98 and hilbert.py/q197: those produce
layout keys; this operator answers "so how many blocks does a typical
predicate now skip?", the number that justifies rewriting 100 TB.
Parquet row-group min/max stats, Delta/Iceberg file skipping and
ClickHouse sparse indexes all prune by exactly this simulation).

Given an ordering expression, a block size (the row-group analog) and
a value column with a range predicate [lo, hi]: rows are laid out in
order, cut into blocks, and a block is PRUNED when its [min, max]
zone misses the predicate interval entirely.

Exactness: block assignment uses row_number with a deterministic id
tie-break; counts are BIGINTs; prune_ppm is integer division.  The
global row_number is the honest cost of simulating a total layout —
the simulation sorts once like the writer it models would; at corpus
scale you run it on a per-partition sample (the layout decision needs
ratios, not exact counts — same trade as the q150 skew advisor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def zonemap_pruning(df: DataFrame, layout_name: str, order_col: str,
                    id_col: str, value_col: str, lo: int, hi: int,
                    block_rows: int = 100) -> DataFrame:
    """-> one row (layout, n_rows, n_blocks, n_pruned, prune_ppm):
    fraction of ``block_rows``-row blocks whose [min, max] of
    ``value_col`` misses [lo, hi] under the given ordering."""
    blocks = (df.select(F.col(value_col).cast("long").alias("v"),
                        F.col(order_col).alias("o"),
                        F.col(id_col).alias("i"))
              .withColumn("rn", F.row_number().over(
                  Window.orderBy(F.col("o"), F.col("i"))))
              .withColumn("blk", F.expr(f"(rn - 1) DIV {block_rows}"))
              .groupBy("blk")
              .agg(F.count(F.lit(1)).cast("long").alias("rows"),
                   F.min("v").alias("mn"), F.max("v").alias("mx")))
    return (blocks.agg(
        F.sum("rows").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(F.when((F.col("mx") < lo) | (F.col("mn") > hi), 1)
              .otherwise(0)).cast("long").alias("n_pruned"))
        .selectExpr(f"'{layout_name}' AS layout", "n_rows", "n_blocks",
                    "n_pruned",
                    "n_pruned * 1000000 DIV n_blocks AS prune_ppm"))


def zonemap_oracle_sql(table_sql: str, layout_name: str, order_sql: str,
                       id_sql: str, value_sql: str, lo: int, hi: int,
                       block_rows: int = 100) -> str:
    """DuckDB replay: same tie-break, same block cut, same ppm."""
    return f"""
        WITH src AS (SELECT CAST({value_sql} AS BIGINT) AS v,
                            {order_sql} AS o, {id_sql} AS i
                     FROM {table_sql}),
        numbered AS (SELECT v, ROW_NUMBER() OVER (ORDER BY o, i) AS rn
                     FROM src),
        blocks AS (SELECT (rn - 1) // {block_rows} AS blk,
                          CAST(COUNT(*) AS BIGINT) AS rows_,
                          MIN(v) AS mn, MAX(v) AS mx
                   FROM numbered GROUP BY 1),
        agg AS (SELECT CAST(SUM(rows_) AS BIGINT) AS n_rows,
                       CAST(COUNT(*) AS BIGINT) AS n_blocks,
                       CAST(SUM(CASE WHEN mx < {lo} OR mn > {hi}
                                THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned
                FROM blocks)
        SELECT '{layout_name}' AS layout, n_rows, n_blocks, n_pruned,
               CAST(n_pruned * 1000000 // n_blocks AS BIGINT) AS prune_ppm
        FROM agg"""
