"""Deterministic random walks over the link graph (beyond-reference;
SURVEY.md §2 round-2 surface).

DeepWalk/node2vec-style corpus generation: emit, per seed node, a
fixed-length walk whose "random" next hop is a HASH of
(walk_id, step, node) modulo the node's out-degree — not an RNG.  This
is the distributed-sampling determinism contract shared with the
engine's samplers and splits: re-runs, retries, partitionings and other
ENGINES reproduce the identical walks (the q111 oracle replays every
hop), yet across (walk, step) the picks distribute like uniform draws,
which is all DeepWalk needs.

Spark shape:

* Neighbor indexing happens ONCE: `row_number` per src (sorted by dst)
  + out-degree — one exchange, spillable window, checkpointed; every
  step then reuses it.
* One step = join state⋈degree on the node (to compute the pick) then
  state⋈adjacency on (node, idx=pick) — both equi-joins with EXACTLY
  one match per walk, so the state never fans out.  AQE splits a hub
  key if millions of walks sit on one node.
* `localCheckpoint` per step truncates the iterative lineage; walks
  ending on a sink (no out-edges) simply stop (the join drops them).

Output: (walk_id, step, node) rows — step 0 is the seed; feed
`collect_list` over a (walk_id, step-sorted) window, or the sequence
packer, to materialize training sentences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _h60(col) -> "F.Column":
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def random_walks(edges: DataFrame, seeds: DataFrame, walk_len: int = 6,
                 src: str = "src", dst: str = "dst") -> DataFrame:
    """(walk_id, step, node): one walk per seed, ``walk_len`` hops max,
    hash-deterministic next-hop picks (see module docstring)."""
    adj = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
           .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
           .distinct())
    w = Window.partitionBy("src").orderBy("dst")
    indexed = adj.withColumn("idx", F.row_number().over(w) - 1) \
                 .localCheckpoint()
    deg = indexed.groupBy("src").agg(F.count(F.lit(1)).alias("deg")) \
                 .localCheckpoint()

    cur = seeds.select(F.col(seeds.columns[0]).alias("walk_id"),
                       F.lit(0).alias("step"),
                       F.col(seeds.columns[0]).alias("node")).distinct()
    parts = [cur]
    for s in range(walk_len):
        pick = _h60(F.concat_ws(
            "|", F.col("walk_id"), F.lit(s), F.col("node"))) % F.col("deg")
        stepped = (cur.join(deg.withColumnRenamed("src", "node"), "node")
                   .withColumn("__pick", pick)
                   .join(indexed.select(F.col("src").alias("node"),
                                        F.col("idx").alias("__pick"),
                                        F.col("dst")),
                         ["node", "__pick"])
                   .select("walk_id", F.lit(s + 1).alias("step"),
                           F.col("dst").alias("node"))
                   .localCheckpoint())
        parts.append(stepped)
        cur = stepped
        if stepped.isEmpty():
            break
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
