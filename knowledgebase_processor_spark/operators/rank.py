"""Distributed global ranking, sorted-neighborhood blocking, and
reciprocal-rank fusion.

Beyond-reference (SURVEY.md §2 round-2 surface).  Three related tools a
web-scale curation pipeline keeps reaching for:

* ``global_rank`` — a contiguous 1..N rank under a TOTAL order without
  the classic trap of ``row_number() OVER (ORDER BY ...)`` with no
  partition key, which Spark executes as a SINGLE-partition window (one
  task sorts the world).  Instead: range-repartition on the order key,
  rank locally per partition, then add per-partition offsets computed
  from a partition-count side table (rows = #partitions — a one-time
  tiny collect, the zipWithIndex contract re-expressed on DataFrames).
  The result is partitioning-independent because the order is total
  (callers must include a tie-break column, e.g. the id).
* ``sorted_neighborhood_pairs`` — the classic entity-resolution blocking
  method (Hernandez & Stolfo 1995): order records by a blocking key and
  emit every pair within a rank window w.  Candidate generation is an
  equi-join on rank DIV w buckets (each row joins its own and the next
  bucket), so the pair fan-out is exactly N*w — linear, never quadratic,
  whatever the key distribution (contrast: equality blocking explodes on
  skewed keys).
* ``rrf_fuse`` — reciprocal-rank fusion (Cormack et al. 2009):
  sum_i 1/(k + rank_i) across ranked lists; the standard score-free way
  to merge heterogeneous retrieval signals (BM25-ish text rank + ANN
  embedding rank).  Two-term float addition of exactly-rounded
  reciprocals is deterministic, so the DuckDB oracle (q84) matches
  bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def global_rank(df: DataFrame, order_cols: list[str],
                rank_col: str = "rank",
                num_partitions: int | None = None) -> DataFrame:
    """Append a contiguous global 1..N ``rank_col`` under the total order
    ``order_cols`` (include a unique tie-break column!) — distributed:
    no single-partition window anywhere.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parts = df.repartitionByRange(n, *[F.col(c) for c in order_cols]) \
              .withColumn("__pid", F.spark_partition_id())
    local = Window.partitionBy("__pid").orderBy(*[F.col(c)
                                                  for c in order_cols])
    # materialize ONCE: the offsets collect below and every downstream
    # consumer (sorted_neighborhood_pairs reads this frame twice,
    # rrf_fuse's callers once each) would otherwise re-execute the
    # range-repartition + per-partition sort per use — measured 3x the
    # wall cost on q83 before this localCheckpoint
    ranked = parts.withColumn("__lr", F.row_number().over(local)) \
                  .localCheckpoint()
    # one tiny collect: rows-per-partition -> cumulative offsets
    counts = {r["__pid"]: r["c"] for r in
              ranked.groupBy("__pid").agg(F.count(F.lit(1)).alias("c"))
                    .collect()}
    # size contract: one row per range-partition id, never corpus-sized
    assert len(counts) <= n
    if not counts:  # empty input: no offsets to inline
        return ranked.drop("__pid", "__lr") \
                     .withColumn(rank_col, F.lit(0).cast("bigint"))
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(p) for p in sorted(offsets)]),
            F.array(*[F.lit(offsets[p]) for p in sorted(offsets)])),
        F.col("__pid"))
    return (ranked.withColumn(rank_col,
                              (off + F.col("__lr")).cast("bigint"))
            .drop("__pid", "__lr"))


def sorted_neighborhood_pairs(df: DataFrame, id_col: str,
                              order_cols: list[str],
                              w: int = 3) -> DataFrame:
    """All pairs whose global ranks under ``order_cols`` differ by at
    most ``w`` (id_a = lower rank).  Returns
    (id_a, id_b, rank_a, rank_b) — the blocking candidate set.
    """
    ranked = global_rank(df, order_cols).select(
        F.col(id_col).alias("rid"), "rank",
        (F.col("rank") / w).cast("bigint").alias("b"))
    # a pair (rank_a < rank_b <= rank_a + w) has bucket_b in
    # {bucket_a, bucket_a + 1}: explode the LOWER side to both buckets
    # and join the upper side on its own bucket (each (a, b) matches on
    # exactly one key, so no dedup pass is needed)
    a_side = ranked.select(F.col("rid").alias("id_a"),
                           F.col("rank").alias("rank_a"),
                           F.explode(F.array(F.col("b"), F.col("b") + 1))
                           .alias("bkt"))
    b_side = ranked.select(F.col("rid").alias("id_b"),
                           F.col("rank").alias("rank_b"),
                           F.col("b").alias("bkt"))
    return (a_side.join(b_side, "bkt")
            .filter((F.col("rank_b") > F.col("rank_a"))
                    & (F.col("rank_b") - F.col("rank_a") <= w))
            .select("id_a", "id_b", "rank_a", "rank_b"))


def rrf_fuse(rankings: list[DataFrame], id_col: str,
             k: int = 60) -> DataFrame:
    """Fuse ranked lists (each: id_col + ``rank``) by reciprocal-rank
    fusion; ids missing from a list contribute nothing (the standard
    convention).  Returns (id, rrf_score, n_lists) sorted by score
    descending with id as the deterministic tie-break."""
    parts = [r.select(F.col(id_col).alias("rid"),
                      (F.lit(1.0) / (F.lit(float(k)) + F.col("rank")
                                     .cast("double"))).alias("s"))
             for r in rankings]
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    return (un.groupBy("rid")
            .agg(F.sum("s").alias("rrf_score"),
                 F.count(F.lit(1)).alias("n_lists"))
            .select(F.col("rid").alias(id_col), "rrf_score", "n_lists")
            .orderBy(F.col("rrf_score").desc(), F.col(id_col)))
