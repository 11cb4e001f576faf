"""Small-file compaction planner — the OPTIMIZE/rewrite-data-files
planning step for an Iceberg/Delta-style table (beyond-reference;
SURVEY.md §2 round-2 surface, table-maintenance family with
operators/zorder.py).

A streaming ingest (the reference's "watch" re-scan at web scale) leaves
thousands of tiny files per partition; readers then pay one task + one
open per file.  The maintenance job plans REWRITE GROUPS: consecutive
files (commit order — preserves any cluster/z-order locality the writer
established) packed into target-sized bins.

Spark-first, cross-engine-exact design: the bin of a file is

    bin = (cumulative bytes strictly before it) DIV target_bytes

i.e. next-fit over the running total — one pass, no greedy loop.  Each
bin's payload lands in [target - max_file + 1, target + max_file - 1]
(a file straddling a boundary joins the bin its first byte falls in),
the standard bounded-overshoot guarantee of sort-based packing.  The
running total is computed WITHOUT a single-partition window (the
rank.py::global_rank trap): range-repartition on the order key, local
cumulative sums, then per-partition byte offsets inlined from a
#partitions-row collect.  Integer arithmetic end-to-end, so any ANSI
engine replays the plan bit-identically (q124's oracle is a plain
window cumsum — tiny data there, same semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def compaction_plan(files: DataFrame, target_bytes: int,
                    id_col: str = "file_id",
                    bytes_col: str = "bytes") -> DataFrame:
    """files(id, bytes) -> one row per file with its rewrite-group
    assignment: (file_id, bytes, cum_before, bin)."""
    n = files.sparkSession.sparkContext.defaultParallelism
    parts = (files.select(F.col(id_col).alias("file_id"),
                          F.col(bytes_col).cast("long").alias("bytes"))
             .repartitionByRange(n, F.col("file_id"))
             .withColumn("__pid", F.spark_partition_id()))
    local = (Window.partitionBy("__pid").orderBy("file_id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = parts.withColumn("__lc", F.sum("bytes").over(local)) \
               .localCheckpoint()
    counts = {r["__pid"]: r["b"] for r in
              cum.groupBy("__pid").agg(F.sum("bytes").alias("b")).collect()}
    # size contract: one row per range-partition id, never file-count-sized
    assert len(counts) <= n
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if not offsets:
        return cum.drop("__pid", "__lc") \
                  .withColumn("cum_before", F.lit(0).cast("long")) \
                  .withColumn("bin", F.lit(0).cast("long"))
    off = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(p) for p in sorted(offsets)]),
            F.array(*[F.lit(offsets[p]) for p in sorted(offsets)])),
        F.col("__pid"))
    return (cum.withColumn("cum_before",
                           (off + F.col("__lc") - F.col("bytes"))
                           .cast("long"))
            .withColumn("bin", F.expr(f"cum_before DIV {target_bytes}")
                        .cast("long"))
            .drop("__pid", "__lc"))


def compaction_summary(files: DataFrame, target_bytes: int,
                       id_col: str = "file_id",
                       bytes_col: str = "bytes") -> DataFrame:
    """Per rewrite group: (bin, n_files, group_bytes, first_file,
    last_file, fill_ppm) — ``fill_ppm`` = bytes * 1e6 DIV target, the
    occupancy the maintenance job alerts on."""
    plan = compaction_plan(files, target_bytes, id_col, bytes_col)
    return (plan.groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n_files"),
                 F.sum("bytes").cast("long").alias("group_bytes"),
                 F.min("file_id").alias("first_file"),
                 F.max("file_id").alias("last_file"))
            .withColumn("fill_ppm",
                        F.expr(f"group_bytes * 1000000 DIV {target_bytes}")
                        .cast("long")))


def compaction_oracle_sql(files_sql: str, target_bytes: int) -> str:
    """EXACT ANSI replay of :func:`compaction_summary` for DuckDB.
    ``files_sql`` must select (file_id, bytes)."""
    return f"""
        WITH f AS ({files_sql}),
        c AS (
          SELECT file_id, bytes::BIGINT AS bytes,
                 (SUM(bytes::BIGINT) OVER (ORDER BY file_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - bytes)::BIGINT AS cum_before
          FROM f),
        p AS (SELECT *, (cum_before // {target_bytes})::BIGINT AS bin
              FROM c)
        SELECT bin, COUNT(*)::BIGINT AS n_files,
               SUM(bytes)::BIGINT AS group_bytes,
               MIN(file_id) AS first_file, MAX(file_id) AS last_file,
               (SUM(bytes) * 1000000 // {target_bytes})::BIGINT AS fill_ppm
        FROM p GROUP BY bin"""
