"""Entity-resolution blocking-quality report (beyond-reference
KG-construction surface; the eval companion to the blocking generators
— LSH bands (dedup.py), sorted neighborhood (q83), and the q150 skew
advisor all emit (block_key, record_id) frames, and an ER pipeline
needs to know BEFORE running the match step whether the blocking is
any good).

Standard metrics (Christen's ER textbook, public):

* reduction ratio — how much of the naive n^2 comparison space the
  blocking removed; comparisons are counted per block as c*(c-1)/2
  (records co-occurring in several blocks count once per block — the
  work the matcher actually does);
* pair completeness — share of GOLD matching pairs that share at
  least one block (recall upper bound of the whole pipeline);
* block-size skew — max block and the comparison share of the single
  largest block (the straggler bound).

All exact integers/ppm: two partial-agg groupBys over the block frame
and, when gold pairs ride in, two hash joins of the (small) gold frame
against per-record block sets — no window, no quadratic expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def blocking_quality(blocks: DataFrame,
                     gold: DataFrame | None = None) -> DataFrame:
    """blocks (block_key, record_id) [+ gold (rec_a, rec_b)] -> ONE
    row: (n_records, n_blocks, n_comparisons, max_block,
    max_block_share_ppm, reduction_ppm, n_gold, pc_ppm).

    ``reduction_ppm = 1e6 - n_comparisons*1e6 DIV (n*(n-1)/2)`` (0 when
    the blocking is WORSE than naive); ``pc_ppm`` is gold-pair recall
    (NULL without gold).  Self-pairs and duplicate gold rows are
    tolerated: pairs are normalized to (least, greatest) and
    deduplicated before scoring."""
    b = blocks.select("block_key", "record_id").distinct()
    per = b.groupBy("block_key").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    stats = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.coalesce(F.sum(F.expr("c * (c - 1) DIV 2")), F.lit(0))
        .cast("long").alias("n_comparisons"),
        F.coalesce(F.max("c"), F.lit(0)).cast("long").alias("max_block"),
        F.coalesce(F.max(F.struct(F.expr("c * (c - 1) DIV 2").alias("p"),
                                  F.col("c"))).getField("p"), F.lit(0))
        .alias("__maxp"))
    n_rec = b.select("record_id").distinct().count()
    stats = (stats.withColumn("n_records", F.lit(n_rec).cast("long"))
             .withColumn("__naive",
                         F.lit(n_rec * (n_rec - 1) // 2).cast("long"))
             .selectExpr(
                 "n_records", "n_blocks", "n_comparisons", "max_block",
                 "CASE WHEN n_comparisons = 0 THEN 0 ELSE "
                 "__maxp * 1000000 DIV n_comparisons END "
                 "AS max_block_share_ppm",
                 "CASE WHEN __naive = 0 THEN 0 "
                 "WHEN n_comparisons >= __naive THEN 0 "
                 "ELSE 1000000 - n_comparisons * 1000000 DIV __naive "
                 "END AS reduction_ppm"))
    if gold is None:
        return stats.selectExpr("*", "CAST(NULL AS BIGINT) AS n_gold",
                                "CAST(NULL AS BIGINT) AS pc_ppm")
    g = (gold.select(F.least("rec_a", "rec_b").alias("a"),
                     F.greatest("rec_a", "rec_b").alias("b"))
         .filter(F.col("a") != F.col("b")).distinct())
    ba = b.select(F.col("record_id").alias("a"), "block_key")
    bb = b.select(F.col("record_id").alias("b"), "block_key")
    cob = (g.join(ba, "a").join(bb, ["b", "block_key"])
           .select("a", "b").distinct())
    gstat = g.agg(F.count(F.lit(1)).cast("long").alias("n_gold")) \
             .crossJoin(cob.agg(F.count(F.lit(1)).cast("long")
                                .alias("__hit")))
    return (stats.crossJoin(gstat)
            .selectExpr("n_records", "n_blocks", "n_comparisons",
                        "max_block", "max_block_share_ppm",
                        "reduction_ppm", "n_gold",
                        "CASE WHEN n_gold = 0 THEN 0 ELSE "
                        "__hit * 1000000 DIV n_gold END AS pc_ppm"))
