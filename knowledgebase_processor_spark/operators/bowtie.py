"""Broder bowtie decomposition of the web graph (the classic
macro-structure result — Broder et al., WWW 2000: a giant strongly
connected CORE, an IN set that reaches it, an OUT set it reaches,
and the rest.  For crawl ops this is the strategic map: seeds in IN
discover the core, pages stuck in OUT never lead anywhere new, and
the 'other' mass measures how much of the crawl is disconnected
tendrils — the number that justifies seed-list investment).

Composition: SCC (operators/scc.py, Orzan coloring) finds the core
(largest component, ties broken by min representative); IN/OUT are
backward/forward reachability fixpoints from the core — the same
join + partial-agg + localCheckpoint propagation loop as everything
else in the graph family, bounded by graph diameter / ``max_iter``.
The full Broder taxonomy also splits tendrils/tubes out of 'other';
that refinement is two more reachability passes over the same frame
and is intentionally left as 'other' here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .scc import strongly_connected_components


def _reach(edges: DataFrame, seeds: DataFrame, forward: bool,
           max_iter: int) -> DataFrame:
    """Nodes reachable from ``seeds`` along (forward ? src->dst :
    dst->src) edges, seeds excluded from the frontier result only if
    not re-reached; returns distinct (node)."""
    a, b = ("src", "dst") if forward else ("dst", "src")
    reached = seeds.select("node").distinct().localCheckpoint()
    for _ in range(max_iter):
        step = (edges.join(reached.withColumnRenamed("node", a), a)
                .select(F.col(b).alias("node")).distinct())
        nxt = reached.unionByName(step).distinct().localCheckpoint()
        if nxt.count() == reached.count():
            return nxt
        reached = nxt
    return reached


def bowtie(edges: DataFrame, src: str = "src", dst: str = "dst",
           max_iter: int = 40) -> DataFrame:
    """-> (node, region) with region in {'core', 'in', 'out',
    'other'}: largest-SCC bowtie over the directed edge set."""
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .dropDuplicates(["src", "dst"]).localCheckpoint())
    assign = strongly_connected_components(e).localCheckpoint()
    core_id = (assign.groupBy("scc")
               .agg(F.count(F.lit(1)).alias("sz"))
               .orderBy(F.col("sz").desc(), F.col("scc").asc())
               .limit(1))
    core = assign.join(F.broadcast(core_id), "scc", "left_semi") \
        .select("node").localCheckpoint()
    fwd = _reach(e, core, forward=True, max_iter=max_iter)
    bwd = _reach(e, core, forward=False, max_iter=max_iter)
    lab = (assign.select("node")
           .join(core.withColumn("c", F.lit(1)), "node", "left")
           .join(fwd.withColumn("f", F.lit(1)), "node", "left")
           .join(bwd.withColumn("b", F.lit(1)), "node", "left"))
    return lab.select(
        "node",
        F.expr("CASE WHEN c = 1 THEN 'core'"
               " WHEN b = 1 THEN 'in'"
               " WHEN f = 1 THEN 'out'"
               " ELSE 'other' END").alias("region"))


def bowtie_full(edges: DataFrame, src: str = "src", dst: str = "dst",
                max_iter: int = 40) -> DataFrame:
    """-> (node, region) over the COMPLETE Broder taxonomy:
    {'core', 'in', 'out', 'tube', 'tendril', 'disconnected'}.

    Refines :func:`bowtie`'s 'other' mass with two more reachability
    passes: nodes touched forward from IN and backward from OUT —
    both = a TUBE (an IN→OUT path bypassing the core), exactly one =
    a TENDRIL, neither = DISCONNECTED.  Same propagation loop, same
    bounds; the crawl-ops reading of the three masses: tendrils are
    wasted fetches, tubes are rare shortcuts, disconnected is the
    seed-list gap.
    """
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .dropDuplicates(["src", "dst"]).localCheckpoint())
    base = bowtie(e, max_iter=max_iter).localCheckpoint()
    in_seed = base.filter(F.col("region") == "in").select("node")
    out_seed = base.filter(F.col("region") == "out").select("node")
    from_in = _reach(e, in_seed, forward=True, max_iter=max_iter)
    to_out = _reach(e, out_seed, forward=False, max_iter=max_iter)
    lab = (base
           .join(from_in.withColumn("fi", F.lit(1)), "node", "left")
           .join(to_out.withColumn("to", F.lit(1)), "node", "left"))
    return lab.select(
        "node",
        F.expr("CASE WHEN region <> 'other' THEN region"
               " WHEN fi = 1 AND to = 1 THEN 'tube'"
               " WHEN fi = 1 OR to = 1 THEN 'tendril'"
               " ELSE 'disconnected' END").alias("region"))


def bowtie_summary(regions: DataFrame) -> DataFrame:
    """-> (region, n_nodes): the four-mass report."""
    return regions.groupBy("region").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"))
