"""Hard-negative mining over an embedding column (beyond-reference;
SURVEY.md §2 round-2 surface).

Contrastive / reranker training needs, per anchor, the most similar
vectors with a DIFFERENT label — "hard" negatives.  Brute force is
O(n²) cosine; the scale path reuses the engine's hyperplane-LSH
bucketing (similarity.cosine_lsh_buckets): candidates are only
same-bucket pairs (highly similar vectors collide with high
probability), label-filtered, exactly rescored, top-k per anchor.

Scale shape:

* ONE self-join on the bucket key — candidate volume is Σ n_b², kept
  bounded by ``max_bucket`` (count-first guard, the dedup mega-bucket
  pattern: a degenerate bucket is dropped whole BEFORE the join).
* top-k per anchor is a WindowGroupLimit (rank <= k pushed into the
  window), never a global sort.
* Recall is the LSH trade: a negative in another bucket is missed;
  more tables/fewer bits raise recall (the engine's lsh_topk multi-probe
  machinery applies).  Brute force on the same inputs is the verify
  path (`hard_negatives_bruteforce`), equivalence-tested per bucket.

Determinism: buckets come from seeded hyperplane literals; cosine is
the engine's left-fold formula; ties break on neg_id — the q111 oracle
replays buckets, candidate set, scores and ranks exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .similarity import cosine_lsh_buckets, cosine_sim, cosine_sim_flat


def hard_negatives(vecs: DataFrame, dim: int, k: int = 3, bits: int = 4,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label", seed: int = 42,
                   max_bucket: int = 10_000) -> DataFrame:
    """(anchor_id, neg_id, anchor_label, neg_label, cosine, rank) —
    per anchor, the ``k`` most-cosine-similar SAME-BUCKET vectors with a
    different label, rank 1 = hardest."""
    b = cosine_lsh_buckets(vecs, dim, bits, id_col, vec_col, seed)
    lab = vecs.select(F.col(id_col).alias("vec_id"),
                      F.col(label_col).alias("lbl"))
    bl = b.join(lab, "vec_id")
    ok = (bl.groupBy("bucket").agg(F.count(F.lit(1)).alias("_n"))
          .filter(F.col("_n") <= max_bucket).select("bucket"))
    side_a = (bl.join(ok, "bucket")
              .select("bucket", F.col("vec_id").alias("anchor_id"),
                      F.col("v").alias("va"),
                      F.col("lbl").alias("anchor_label")))
    side_b = (bl.join(ok, "bucket")
              .select("bucket", F.col("vec_id").alias("neg_id"),
                      F.col("v").alias("vb"),
                      F.col("lbl").alias("neg_label")))
    pairs = (side_a.join(side_b, "bucket")
             .filter((F.col("anchor_id") != F.col("neg_id"))
                     & (F.col("anchor_label") != F.col("neg_label"))))
    # flat codegen cosine over the pre-cast double arrays — identical
    # float path to the interpreted zip_with form it replaces
    scored = (pairs
              .withColumn("_vad", F.col("va").cast("array<double>"))
              .withColumn("_vbd", F.col("vb").cast("array<double>"))
              .select("anchor_id", "neg_id", "anchor_label", "neg_label",
                      F.round(cosine_sim_flat("_vad", "_vbd", dim), 6)
                      .alias("cosine")))
    w = Window.partitionBy("anchor_id").orderBy(F.desc("cosine"),
                                                F.asc("neg_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def hard_negatives_bruteforce(vecs: DataFrame, k: int = 3,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              label_col: str = "label") -> DataFrame:
    """O(n²) exact variant (verify path / small corpora): same output
    shape, candidates = ALL cross-label pairs."""
    a = vecs.select(F.col(id_col).alias("anchor_id"),
                    F.col(vec_col).alias("va"),
                    F.col(label_col).alias("anchor_label"))
    bb = vecs.select(F.col(id_col).alias("neg_id"),
                     F.col(vec_col).alias("vb"),
                     F.col(label_col).alias("neg_label"))
    pairs = (a.crossJoin(bb)
             .filter((F.col("anchor_id") != F.col("neg_id"))
                     & (F.col("anchor_label") != F.col("neg_label"))))
    scored = pairs.select(
        "anchor_id", "neg_id", "anchor_label", "neg_label",
        F.round(cosine_sim(F.col("va").cast("array<double>"),
                           F.col("vb").cast("array<double>")), 6)
        .alias("cosine"))
    w = Window.partitionBy("anchor_id").orderBy(F.desc("cosine"),
                                                F.asc("neg_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
