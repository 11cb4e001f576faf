"""Margin-based parallel-pair mining (Artetxe & Schwenk 2019 — the
CCMatrix/LASER bitext-mining recipe; beyond-reference training-data
surface over the embeddings table).

Mining translation pairs (or any cross-corpus aligned pairs) by raw
cosine fails because some sentences are "hubs" — similar to everything.
The margin criterion rescales each candidate cosine by the mean cosine
of BOTH endpoints' k-nearest neighborhoods:

    margin(x, y) = cos(x, y) / ((avg_k(x) + avg_k(y)) / 2)

and keeps the best target per source when the margin clears a
threshold (ratio > 1 = closer than either side's typical neighbor).

Exactness contract: the per-pair cosine is rounded to 6 decimals and
scaled to integer MICRO units (the q17 float-reconciliation convention);
everything after — neighborhood sums, the margin ratio in ppm, ranking —
is exact BIGINT arithmetic, so aggregation order and engine cannot
change a result.  margin_ppm = c_micro * 2k * 1e6 DIV (sum_k(x) +
sum_k(y)) — the k-division folded away so no intermediate rounding.

Scale shape: candidate generation here is the exact all-pairs baseline
(one join, fine for the 10^3-10^5 per-language-shard blocks the mining
pipelines actually score); at corpus scale feed candidates from
`similarity.cosine_lsh_buckets` instead — the scoring path (two window
top-ks on the candidate frame + one join back) is unchanged.  No
collect, no Python row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .similarity import cosine_sim, cosine_sim_flat


def margin_mine(src: DataFrame, tgt: DataFrame, k: int = 4,
                dim: int | None = None,
                min_margin_ppm: int = 1_000_000,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """src x tgt -> (src_id, tgt_id, cos_micro, margin_ppm): the best
    target per source by margin, kept when margin_ppm >= the threshold.
    Ties break to the smallest tgt_id (window order), margin ties to the
    largest cosine."""
    s = src.select(F.col(id_col).alias("src_id"),
                   F.col(vec_col).cast("array<double>").alias("__sv"))
    t = tgt.select(F.col(id_col).alias("tgt_id"),
                   F.col(vec_col).cast("array<double>").alias("__tv"))
    # dim known -> flat codegen cosine (identical float path); else the
    # generic interpreted fold
    _cos = (cosine_sim_flat("__sv", "__tv", dim) if dim
            else cosine_sim(F.col("__sv"), F.col("__tv")))
    pairs = (s.crossJoin(t)
             .select("src_id", "tgt_id",
                     F.round(F.round(_cos, 6)
                             * 1_000_000, 0).cast("long").alias("c_micro")))

    w_s = Window.partitionBy("src_id") \
        .orderBy(F.col("c_micro").desc(), F.col("tgt_id"))
    w_t = Window.partitionBy("tgt_id") \
        .orderBy(F.col("c_micro").desc(), F.col("src_id"))
    ranked = pairs.withColumn("__rs", F.row_number().over(w_s)) \
                  .withColumn("__rt", F.row_number().over(w_t))

    sum_s = (ranked.filter(F.col("__rs") <= k)
             .groupBy("src_id").agg(F.sum("c_micro").alias("__ks")))
    sum_t = (ranked.filter(F.col("__rt") <= k)
             .groupBy("tgt_id").agg(F.sum("c_micro").alias("__kt")))

    # guard: an all-non-positive neighborhood (orthogonal/antipodal
    # corpus) zeroes the denominator — ANSI DIV would throw; such
    # sources mine nothing.
    scored = (pairs.join(sum_s, "src_id").join(sum_t, "tgt_id")
              .withColumn("margin_ppm",
                          F.when(F.col("__ks") + F.col("__kt") > 0,
                                 F.expr(f"c_micro * {2 * k} * 1000000 "
                                        "DIV (__ks + __kt)"))
                          .cast("long")))
    best = Window.partitionBy("src_id").orderBy(
        F.col("margin_ppm").desc(), F.col("c_micro").desc(), F.col("tgt_id"))
    return (scored.withColumn("__rb", F.row_number().over(best))
            .filter((F.col("__rb") == 1)
                    & (F.col("margin_ppm") >= min_margin_ppm))
            .select("src_id", "tgt_id", "c_micro", "margin_ppm"))


def hubness_report(src: DataFrame, tgt: DataFrame, k: int = 4,
                   dim: int | None = None,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """k-occurrence hubness diagnostic (Radovanovic et al. 2010): per
    target, how many sources rank it inside their top-k — the skew this
    statistic reveals is exactly why margin rescaling exists.  Targets
    never retrieved keep n_k = 0 (anti-hubs matter for the diagnosis).

    Same exactness/scale contract as :func:`margin_mine` (micro-unit
    cosines, one window rank per source, partial-agg count).
    """
    s = src.select(F.col(id_col).alias("src_id"),
                   F.col(vec_col).cast("array<double>").alias("__sv"))
    t = tgt.select(F.col(id_col).alias("tgt_id"),
                   F.col(vec_col).cast("array<double>").alias("__tv"))
    # dim known -> flat codegen cosine (identical float path); else the
    # generic interpreted fold
    _cos = (cosine_sim_flat("__sv", "__tv", dim) if dim
            else cosine_sim(F.col("__sv"), F.col("__tv")))
    pairs = (s.crossJoin(t)
             .select("src_id", "tgt_id",
                     F.round(F.round(_cos, 6)
                             * 1_000_000, 0).cast("long").alias("c_micro")))
    w_s = Window.partitionBy("src_id") \
        .orderBy(F.col("c_micro").desc(), F.col("tgt_id"))
    occ = (pairs.withColumn("__rs", F.row_number().over(w_s))
           .filter(F.col("__rs") <= k)
           .groupBy("tgt_id").agg(F.count(F.lit(1)).alias("n_k")))
    return (t.select("tgt_id").join(occ, "tgt_id", "left")
            .select("tgt_id",
                    F.coalesce("n_k", F.lit(0)).cast("long").alias("n_k")))
