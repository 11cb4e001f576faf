"""Candidate entity disambiguation: popularity prior + context overlap
(north-star column: "candidate entity linking via broadcast
alias-dictionary join plus context-similarity scoring").

`mentions.detect_mentions` finds surface forms and scores them against
ONE dictionary context; this operator ranks MULTIPLE candidate entities
per surface form — the actual disambiguation step of an EL pipeline
(Milne-Witten commonness prior + context relatedness, the baseline
every linker starts from):

    score = prior_ppm + 2 * jaccard_ppm(mention ctx, candidate ctx)

Everything is exact integer arithmetic (ppm units, integer DIV), so the
ranking is aggregation-order- and engine-independent; the q147 oracle
replays every score.  Jaccard uses |A| + |B| - |A∩B| for the union so
only one array intersection is evaluated.

Scale shape: candidates (the alias dictionary with priors — millions of
rows at most) BROADCAST into a single equi-join on the surface form;
top-1 per mention is a partial-agg ``max(struct(score, entity))``, not
a window over the mention frame.  No explode of the context arrays, no
per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PPM = 1_000_000


def disambiguate(mentions: DataFrame, candidates: DataFrame,
                 prior_weight: int = 1, ctx_weight: int = 2) -> DataFrame:
    """mentions(mention_id, alias, ctx: array<string>) x
    candidates(alias, entity, ctx: array<string>, prior_ppm) ->
    (mention_id, alias, entity, prior_ppm, jaccard_ppm, score): the
    best-scoring candidate per mention (ties: lexicographically last
    entity — the struct-max leg, deterministic everywhere).  Mentions
    whose alias has no candidates are dropped (no-link)."""
    cand = F.broadcast(candidates.select(
        "alias", "entity", F.col("ctx").alias("__cctx"), "prior_ppm"))
    j = mentions.select("mention_id", "alias",
                        F.col("ctx").alias("__mctx")).join(cand, "alias")

    inter = F.size(F.array_intersect(F.col("__mctx"), F.col("__cctx")))
    union = (F.size(F.col("__mctx")) + F.size(F.col("__cctx")) - inter)
    # integer DIV for exactness; guard union=0 (both ctx empty) -> 0.
    j = j.withColumn("__inter", inter.cast("long")) \
         .withColumn("__union", union.cast("long")) \
         .withColumn("jaccard_ppm",
                     F.when(F.col("__union") > 0,
                            F.expr(f"__inter * {PPM} DIV __union"))
                     .otherwise(F.lit(0)).cast("long")) \
         .withColumn("score",
                     (F.lit(prior_weight) * F.col("prior_ppm")
                      + F.lit(ctx_weight) * F.col("jaccard_ppm"))
                     .cast("long"))

    win = F.max(F.struct(F.col("score"), F.col("entity"),
                         F.col("prior_ppm"), F.col("jaccard_ppm"))).alias("w")
    return (j.groupBy("mention_id", "alias").agg(win)
            .select("mention_id", "alias", F.col("w.entity").alias("entity"),
                    F.col("w.prior_ppm").alias("prior_ppm"),
                    F.col("w.jaccard_ppm").alias("jaccard_ppm"),
                    F.col("w.score").alias("score")))
