"""Multi-source shortest paths, bounded rounds (beyond-reference;
SURVEY.md §2 round-2 surface).

Distance-from-seed-set over the crawl/KG link graph — the "how many
hops from a trusted seed" signal (TrustRank-style crawl prioritization,
KG neighborhood radius, link-spam distance).  Bellman-Ford relaxation
with INTEGER edge weights, run for a bounded number of rounds: after
round r every node whose true shortest path uses <= r edges holds its
final distance, so ``rounds`` is an explicit horizon (distance beyond
the horizon = unreached, NULL), not an approximation knob hidden in the
operator.

Spark shape (the CC/PageRank iteration pattern, components.py):

* one round = one equi-join edges⋈dist on the edge source + one
  partial-aggregatable ``min`` groupBy — two exchanges, both on node
  keys, AQE-splittable; head-node skew collapses map-side because min()
  partial-aggregates.
* ``localCheckpoint`` per round truncates the exponentially growing
  lineage (mandatory for iterative DataFrame jobs).
* early exit when a round improves nothing (count of improved rows ==
  0 — one cheap action per round on the small frontier frame).

Exactness: weights and distances are BIGINT end-to-end, and the q107
oracle replays the same bounded relaxation as a recursive CTE with a
round counter + final min — bit-exact in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def shortest_paths(edges: DataFrame, seeds: DataFrame,
                   src: str = "src", dst: str = "dst",
                   weight: str | None = None,
                   rounds: int = 10) -> DataFrame:
    """edges(src, dst[, weight]), seeds(node) -> (node, dist) for every
    node reachable from ANY seed within ``rounds`` relaxation rounds
    (<= ``rounds`` edges on the path).  ``weight`` NULL/omitted = hop
    count (weight 1); weights must be non-negative integers.
    """
    w = (F.col(weight).cast("bigint") if weight
         else F.lit(1).cast("bigint"))
    e = (edges.select(F.col(src).alias("es"), F.col(dst).alias("ed"),
                      w.alias("ew"))
         .filter(F.col("es").isNotNull() & F.col("ed").isNotNull()
                 & (F.col("ew") >= 0))
         .localCheckpoint())
    dist = seeds.select(F.col(seeds.columns[0]).alias("node"),
                        F.lit(0).cast("bigint").alias("dist")) \
                .distinct().localCheckpoint()
    for _ in range(rounds):
        relaxed = (e.join(dist.withColumnRenamed("node", "es"), "es")
                   .select(F.col("ed").alias("node"),
                           (F.col("dist") + F.col("ew")).alias("dist")))
        new = (dist.unionByName(relaxed)
               .groupBy("node").agg(F.min("dist").alias("dist"))
               .localCheckpoint())
        # early exit: a round that shrinks no distance and adds no node
        # has converged (distances only ever decrease)
        improved = (new.join(dist.withColumnRenamed("dist", "old"),
                             "node", "left")
                    .filter(F.col("old").isNull()
                            | (F.col("dist") < F.col("old"))).count())
        dist = new
        if improved == 0:
            break
    return dist
