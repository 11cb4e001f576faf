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


# --------------------------------------------------------------------------
# Bloom zone maps: per-block Bloom membership for EQUALITY pruning —
# the complement of the min/max simulation above (min/max zones prune
# ranges but are useless for point lookups over high-cardinality
# scattered keys; a tiny per-block Bloom of k portable-hash bit
# positions prunes those — exactly Parquet's bloom_filter column
# option and Delta's bloom index, simulated so the layout decision
# has the number before anyone rewrites 100 TB).

BLOOM_K = 3
BLOOM_BITS = 256


def _bloom_pos_exprs(value_sql: str) -> list:
    """k portable bit positions — the heavy.py md5 family."""
    return [(f"CAST(conv(substring(md5(concat('bz{r}|',"
             f" CAST({value_sql} AS STRING))), 1, 15), 16, 10)"
             f" AS BIGINT) % {BLOOM_BITS}") for r in range(BLOOM_K)]


def bloom_pos_python(value, r: int) -> int:
    import hashlib
    h = hashlib.md5(f"bz{r}|{value}".encode()).hexdigest()[:15]
    return int(h, 16) % BLOOM_BITS


def bloom_zonemap_pruning(df: DataFrame, order_col: str, id_col: str,
                          value_col: str, probe,
                          block_rows: int = 100) -> DataFrame:
    """-> one row (n_blocks, n_pruned, prune_ppm, probe_present):
    fraction of blocks whose Bloom set cannot contain ``probe`` (an
    equality predicate) under the given layout; probe_present reports
    whether the value exists at all (sanity: blocks holding it are
    NEVER pruned — Bloom has no false negatives)."""
    pos_exprs = _bloom_pos_exprs("v")
    probe_pos = sorted({bloom_pos_python(probe, r)
                        for r in range(BLOOM_K)})
    numbered = (df.select(F.col(value_col).cast("string").alias("v"),
                          F.col(order_col).alias("o"),
                          F.col(id_col).alias("i"))
                .withColumn("rn", F.row_number().over(
                    Window.orderBy(F.col("o"), F.col("i"))))
                .withColumn("blk", F.expr(f"(rn - 1) DIV {block_rows}")))
    bits = numbered.select(
        "blk", "v",
        F.explode(F.array(*[F.expr(e) for e in pos_exprs]))
        .alias("pos")).dropDuplicates(["blk", "pos"])
    hits = (bits.filter(F.col("pos").isin(*probe_pos))
            .groupBy("blk")
            .agg(F.countDistinct("pos").alias("nhit")))
    blocks = numbered.select("blk").distinct()
    per = (blocks.join(hits, "blk", "left")
           .select("blk", (F.coalesce("nhit", F.lit(0))
                           < len(probe_pos)).alias("pruned")))
    present = df.filter(
        F.col(value_col).cast("string") == str(probe)).limit(1).count()
    return (per.agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(F.when(F.col("pruned"), 1).otherwise(0)).cast("long")
        .alias("n_pruned"))
        .selectExpr("n_blocks", "n_pruned",
                    "n_pruned * 1000000 DIV n_blocks AS prune_ppm",
                    f"CAST({present} AS BOOLEAN) AS probe_present"))


def bloom_zonemap_oracle_sql(table_sql: str, order_sql: str,
                             id_sql: str, value_sql: str, probe,
                             block_rows: int = 100) -> str:
    probe_pos = sorted({bloom_pos_python(probe, r)
                        for r in range(BLOOM_K)})
    pos_list = ", ".join(
        f"((('0x' || substr(md5('bz{r}|' || CAST(v AS VARCHAR)), 1, 15))"
        f"::BIGINT) % {BLOOM_BITS})" for r in range(BLOOM_K))
    in_probe = ", ".join(str(p) for p in probe_pos)
    return f"""
        WITH src AS (SELECT CAST({value_sql} AS VARCHAR) AS v,
                            {order_sql} AS o, {id_sql} AS i
                     FROM {table_sql}),
        numbered AS (SELECT v, ROW_NUMBER() OVER (ORDER BY o, i) AS rn
                     FROM src),
        bits AS (SELECT DISTINCT (rn - 1) // {block_rows} AS blk,
                        unnest([{pos_list}]) AS pos
                 FROM numbered),
        hits AS (SELECT blk, COUNT(DISTINCT pos) AS nhit
                 FROM bits WHERE pos IN ({in_probe}) GROUP BY blk),
        blocks AS (SELECT DISTINCT blk FROM bits),
        per AS (SELECT blocks.blk,
                       COALESCE(nhit, 0) < {len(probe_pos)} AS pruned
                FROM blocks LEFT JOIN hits ON hits.blk = blocks.blk),
        agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
                       CAST(SUM(CASE WHEN pruned THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_pruned FROM per)
        SELECT n_blocks, n_pruned,
               CAST(n_pruned * 1000000 // n_blocks AS BIGINT)
                   AS prune_ppm,
               EXISTS (SELECT 1 FROM src
                       WHERE v = CAST('{probe}' AS VARCHAR))
                   AS probe_present
        FROM agg"""
