"""k-truss decomposition of the entity link graph (beyond-reference
graph surface; the density gate one notch above triangles (q58):
an edge is in the k-truss iff it participates in ≥ k-2 triangles that
themselves survive the same rule — the standard community-core
definition (Cohen 2008).  For a web KG this separates organically
dense topic cores from star-shaped link farms far more sharply than
degree or raw triangle counts, and it is the classic seed filter for
community detection over 10^11-edge link graphs).

Algorithm: iterative support-and-peel —

    repeat:  support(e) = # triangles through e (degree-oriented
             wedge join, the triangles.py idiom — per-key fan-out
             bounded O(√m) regardless of hub degree);
             drop edges with support < k-2
    until the edge set is stable.

Every round is two equi-joins + one explode + one partial-agg groupBy
on edge keys, `localCheckpoint` cutting lineage between rounds
(components.py idiom).  Round count is bounded by the peeling depth
(small for real graphs — each round must delete at least one edge to
continue), capped by ``max_iter``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _support(edges: DataFrame) -> DataFrame:
    """-> (a, b, support) triangle counts per normalized edge (a<b)."""
    deg = (edges.select(F.col("a").alias("n"))
           .unionByName(edges.select(F.col("b").alias("n")))
           .groupBy("n").agg(F.count(F.lit(1)).alias("deg")))
    # orient each edge from its (deg, id)-smaller endpoint
    e = (edges
         .join(deg.withColumnRenamed("n", "a")
               .withColumnRenamed("deg", "da"), "a")
         .join(deg.withColumnRenamed("n", "b")
               .withColumnRenamed("deg", "db"), "b"))
    o = e.select(
        F.when((F.col("da") < F.col("db")) |
               ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
               F.struct(F.col("a").alias("u"), F.col("b").alias("v"),
                        F.col("db").alias("dv")))
        .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v"),
                            F.col("da").alias("dv")))
        .alias("e")).select("e.u", "e.v", "e.dv")
    # wedge endpoints are ordered by the ORIENTATION key (deg, id), not
    # by raw id — the closure edge below is oriented by that same key,
    # so an id-ordered filter would silently drop triangles whose
    # endpoints have decreasing degrees.
    wedges = (o.alias("x").join(o.alias("y"), F.col("x.u") == F.col("y.u"))
              .filter(F.struct(F.col("x.dv"), F.col("x.v")) <
                      F.struct(F.col("y.dv"), F.col("y.v")))
              .select(F.col("x.u").alias("u"), F.col("x.v").alias("v"),
                      F.col("y.v").alias("w")))
    tris = wedges.join(
        o.select(F.col("u").alias("v"), F.col("v").alias("w")),
        ["v", "w"])
    sides = tris.select(F.explode(F.array(
        F.struct(F.least("u", "v").alias("a"),
                 F.greatest("u", "v").alias("b")),
        F.struct(F.least("u", "w").alias("a"),
                 F.greatest("u", "w").alias("b")),
        F.struct(F.least("v", "w").alias("a"),
                 F.greatest("v", "w").alias("b")))).alias("s")) \
        .select("s.a", "s.b")
    counts = sides.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("support"))
    return (edges.join(counts, ["a", "b"], "left")
            .select("a", "b", F.coalesce("support", F.lit(0))
                    .cast("long").alias("support")))


def ktruss(edges: DataFrame, k: int, src: str = "src", dst: str = "dst",
           max_iter: int = 30) -> DataFrame:
    """-> (a, b) the k-truss edge set (a < b).  Self-loops dropped,
    direction ignored, duplicates collapsed."""
    e = (edges.select(F.least(src, dst).alias("a"),
                      F.greatest(src, dst).alias("b"))
         .filter(F.col("a").isNotNull() & (F.col("a") != F.col("b")))
         .dropDuplicates(["a", "b"]).localCheckpoint())
    n = e.count()
    for _ in range(max_iter):
        if n == 0:
            break
        e2 = (_support(e).filter(F.col("support") >= k - 2)
              .select("a", "b").localCheckpoint())
        n2 = e2.count()
        e = e2
        if n2 == n:
            break
        n = n2
    return e
