"""Strongly connected components of a directed web graph — the
directed sibling of components.py's union-find (north-rule J9):
redirect rings, mutually-linking spam farms and crawl traps are
exactly the non-trivial SCCs of the redirect/link graph (the q163
pointer-doubling resolver assumes acyclic chains; this operator finds
the cycles that break that assumption, and q179's trap gate flags the
hosts it names).

Algorithm: Orzan's forward-coloring / backward-certification, the
standard Pregel-style SCC (also FW-BW without recursion):

  repeat until every node is assigned
    1. color(u) := max id that can REACH u  (forward max-propagation
       to fixpoint along edge direction; initialized to u itself)
    2. pivots := nodes with color(u) = u
    3. certify: flag propagates from each pivot BACKWARD along edges
       restricted to its own color class; flagged nodes form the
       pivot's SCC (proof sketch in code: any v in SCC(c) must have
       color c, and its path back to c stays inside color c)
    4. assign flagged nodes, drop them and their edges, loop.

Every DAG-like region resolves in ONE outer round (each such node is
its own pivot), so outer rounds are bounded by the depth of NESTED
cycle structure, not by n; inner fixpoints are bounded by the graph
diameter.  Per inner step: one join edges⋈colors + one partial-agg
groupBy(dst) max + one join back — all shuffles on the node key, with
``localCheckpoint`` truncating lineage each step (the components.py
idiom).  Hub skew rides the same AQE skew-join config as the rest of
the pipeline.  At true web scale one adds trimming and pivot
sampling; the coloring core here is the load-bearing part.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _fixpoint_color(nodes: DataFrame, edges: DataFrame,
                    max_iter: int) -> DataFrame:
    """Forward max-propagation: color(u) = max id reaching u."""
    colors = nodes.select("node", F.col("node").alias("color")) \
        .localCheckpoint()
    for _ in range(max_iter):
        incoming = (edges.join(colors, edges.src == colors.node)
                    .groupBy(F.col("dst").alias("node"))
                    .agg(F.max("color").alias("in_color")))
        nxt = (colors.join(incoming, "node", "left")
               .select("node", F.greatest(
                   "color", F.coalesce("in_color", "color"))
                   .alias("color"))
               .localCheckpoint())
        changed = (nxt.join(colors.withColumnRenamed("color", "old"),
                            "node")
                   .filter(F.col("color") != F.col("old")).count())
        colors = nxt
        if changed == 0:
            break
    return colors


def strongly_connected_components(edges: DataFrame, src: str = "src",
                                  dst: str = "dst",
                                  max_iter: int = 40) -> DataFrame:
    """-> (node, scc): every node labeled with its SCC representative
    (the max member id, the pivot).  Nodes appearing only as isolated
    endpoints are their own singleton SCCs.
    """
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .dropDuplicates(["src", "dst"]).localCheckpoint())
    active = (e.select(F.col("src").alias("node"))
              .unionByName(e.select(F.col("dst").alias("node")))
              .distinct().localCheckpoint())
    out = None
    for _ in range(max_iter):
        if active.isEmpty():
            break
        colors = _fixpoint_color(active, e, max_iter)
        # backward certification: flag spreads from the pivot along
        # REVERSED edges, both endpoints in the same color class.
        flagged = colors.filter(F.col("node") == F.col("color")) \
            .localCheckpoint()
        for _ in range(max_iter):
            # v gets flagged if v -> w, w flagged, color(v) == color(w)
            step = (e.join(flagged.select(F.col("node").alias("dst"),
                                          F.col("color")), "dst")
                    .select(F.col("src").alias("node"), "color")
                    .join(colors.withColumnRenamed("color", "own"),
                          "node")
                    .filter(F.col("color") == F.col("own"))
                    .select("node", "color"))
            nxt = flagged.unionByName(step).dropDuplicates(["node"]) \
                .localCheckpoint()
            if nxt.count() == flagged.count():
                flagged = nxt
                break
            flagged = nxt
        scc = flagged.select("node", F.col("color").alias("scc"))
        out = scc if out is None else out.unionByName(scc)
        out = out.localCheckpoint()
        active = active.join(scc.select("node"), "node", "left_anti") \
            .localCheckpoint()
        e = (e.join(active.select(F.col("node").alias("src")), "src")
             .join(active.select(F.col("node").alias("dst")), "dst")
             .select("src", "dst").localCheckpoint())
    if out is None:
        return active.select("node", F.col("node").alias("scc"))
    return out


def scc_summary(assign: DataFrame) -> DataFrame:
    """-> (scc_size, n_sccs, n_nodes): the ring-size histogram — the
    crawl-ops view ('how many 5-page redirect rings do we have?')."""
    sizes = assign.groupBy("scc").agg(
        F.count(F.lit(1)).cast("long").alias("scc_size"))
    return (sizes.groupBy("scc_size")
            .agg(F.count(F.lit(1)).cast("long").alias("n_sccs"))
            .withColumn("n_nodes",
                        F.expr("scc_size * n_sccs").cast("long")))
