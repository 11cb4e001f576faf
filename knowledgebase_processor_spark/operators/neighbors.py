"""Deterministic k-hop neighbor sampling (GraphSAGE minibatch corpora;
beyond-reference training-data surface, companion to walks.py).

GNN training over a web-scale KG samples, per seed node, a bounded
fan-out neighborhood per hop (GraphSAGE, Hamilton et al. 2017) instead
of the full ego net — hubs with 10^7 neighbors would otherwise blow up
every minibatch.  As with `random_walks`, the "random" choice is a HASH
rank, not an RNG: neighbor (src, dst) gets rank
``row_number() over (partition by hop-frontier node order by
md5-hash(node|dst), dst)`` and the top ``fanout[h]`` survive.  Re-runs,
retries, other partitionings, and other ENGINES reproduce the identical
sample (the driver oracle replays every rank in DuckDB), yet across
nodes the picks distribute uniformly.

Spark shape: per hop, one equi-join frontier⋈adjacency and one
spillable window rank partitioned by (seed, node) — no collect, no
per-row Python.  The frontier is seeds at hop 1, then the DISTINCT
sampled (seed, dst) pairs at hop 2+, so fan-out is capped at
``prod(fanout)`` edges per seed by construction.  ``localCheckpoint``
truncates the per-hop lineage.

Output: (seed, hop, src, dst) sampled edges — feed the (seed-grouped)
frame to the feature gatherer / SGC diffusion (gnnprop.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _h60(col) -> "F.Column":
    # shared portable-hash convention (walks.py, shards.py): first 60
    # bits of md5, replayable as ('0x' || substr(md5(..),1,15))::BIGINT.
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def sample_neighbors(edges: DataFrame, seeds: DataFrame,
                     fanout: tuple[int, ...] = (3, 2),
                     src: str = "src", dst: str = "dst") -> DataFrame:
    """edges(src,dst) + seeds(one column) -> (seed, hop, src, dst):
    hash-deterministic fan-out-bounded sampled neighborhood edges,
    hop = 1..len(fanout)."""
    adj = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
           .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
           .distinct().localCheckpoint())

    frontier = seeds.select(F.col(seeds.columns[0]).alias("seed")) \
        .distinct().withColumn("node", F.col("seed"))
    parts = []
    for h, k in enumerate(fanout, start=1):
        cand = frontier.join(adj.withColumnRenamed("src", "node"), "node")
        rk = F.row_number().over(
            Window.partitionBy("seed", "node")
            .orderBy(_h60(F.concat_ws("|", F.col("node"), F.col("dst"))),
                     F.col("dst")))
        picked = (cand.withColumn("__rk", rk)
                  .filter(F.col("__rk") <= k)
                  .select("seed", F.lit(h).alias("hop"),
                          F.col("node").alias("src"), "dst")
                  .localCheckpoint())
        parts.append(picked)
        frontier = picked.select("seed", F.col("dst").alias("node")).distinct()

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
