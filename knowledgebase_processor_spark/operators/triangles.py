"""Triangle counting with degree orientation (beyond-reference;
SURVEY.md §2 round-2 surface).

Triangles are the unit of graph clustering coefficient — for a KG, a
density/quality signal over the entity link structure (spam link farms
are triangle-poor stars; organic topic clusters are triangle-rich).

The naive 3-way self-join explodes on hubs: a degree-d node contributes
C(d, 2) wedges, quadratic for the exact head entities a web KG always
has.  The standard fix is DEGREE ORIENTATION: point every edge from its
lower-(degree, id) endpoint to the higher one.  The resulting DAG has
max out-degree O(√m) regardless of hub size — a degree-10⁶ hub becomes
a node with *in*-edges only, and the wedge join's per-key fan-out is
bounded by the orientation, not by the hub.  Triangles are then wedges
(u→v, u→w) closed by the oriented edge v→w, and each triangle is found
exactly once (u is its orientation-minimal corner).

All joins are equi-joins on node ids (shuffle, hash, AQE-splittable);
counts are integers, so the DuckDB oracle (q58) replays the identical
orientation + wedge + closure and must agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _oriented(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set -> DAG oriented by (degree, node) ascending."""
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .filter(F.col("a").isNotNull() & F.col("b").isNotNull()
                   & (F.col("a") != F.col("b"))))
    und = (sym.select(F.least("a", "b").alias("u"),
                      F.greatest("a", "b").alias("v"))
           .distinct())
    deg = (und.select(F.col("u").alias("n"))
           .union(und.select(F.col("v").alias("n")))
           .groupBy("n").agg(F.count("*").alias("deg")))
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    j = und.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    return j.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("hi"))


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """edges(src, dst), treated undirected -> one row per node that
    participates in ≥1 triangle: (node, n_triangles)."""
    o = _oriented(edges, src, dst).localCheckpoint()
    w1 = o.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    w2 = o.select(F.col("lo").alias("u"), F.col("hi").alias("w"))
    wedges = w1.join(w2, "u").filter(F.col("v") < F.col("w"))
    # close the wedge: the third edge is oriented too, but v<w does not
    # imply its orientation — check both (deg order decides, so probe
    # the oriented set symmetrically)
    closer = o.select(F.col("lo").alias("v"), F.col("hi").alias("w")) \
        .union(o.select(F.col("hi").alias("v"), F.col("lo").alias("w")))
    tris = wedges.join(closer, ["v", "w"])
    per_node = (tris.select(F.col("u").alias("node"))
                .union(tris.select(F.col("v").alias("node")))
                .union(tris.select(F.col("w").alias("node")))
                .groupBy("node").agg(F.count("*").alias("n_triangles")))
    return per_node
