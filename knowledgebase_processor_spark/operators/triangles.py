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


def node_clustering(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Per-node local clustering coefficient (Watts-Strogatz 1998):
    (node, deg, n_triangles, lcc_num = 2·tri, lcc_den = deg·(deg−1),
    lcc) for EVERY node (degree-1 nodes get lcc NULL), plus a summary
    row ``node = -1`` whose ratio is the global TRANSITIVITY
    3·triangles / wedges (= Σ2·tri / Σdeg·(deg−1) — same columns, exact
    BIGINT numerator/denominator, one double division)."""
    o = _oriented(edges, src, dst)
    deg = (o.select(F.col("lo").alias("node"))
           .union(o.select(F.col("hi").alias("node")))
           .groupBy("node").agg(F.count("*").cast("long").alias("deg")))
    tri = triangle_count(edges, src, dst)
    per = (deg.join(tri, "node", "left")
           .na.fill({"n_triangles": 0})
           .select("node", "deg",
                   F.col("n_triangles").cast("long").alias("n_triangles"),
                   (2 * F.col("n_triangles")).cast("long").alias("lcc_num"),
                   (F.col("deg") * (F.col("deg") - 1)).cast("long")
                   .alias("lcc_den")))
    summary = per.agg(F.lit(-1).cast("long").alias("node"),
                      F.sum("deg").cast("long").alias("deg"),
                      F.sum("n_triangles").cast("long").alias("n_triangles"),
                      F.sum("lcc_num").cast("long").alias("lcc_num"),
                      F.sum("lcc_den").cast("long").alias("lcc_den"))
    return per.unionByName(summary).select(
        "*", F.when(F.col("lcc_den") > 0,
                    F.col("lcc_num").cast("double")
                    / F.col("lcc_den").cast("double")).alias("lcc"))


def clustering_oracle_sql(edges_sql: str) -> str:
    """EXACT ANSI replay of :func:`node_clustering` for DuckDB —
    degrees from the undirected simple graph, triangles via the naive
    u<v<w 3-way join (independent of the orientation trick)."""
    return f"""
        WITH raw AS ({edges_sql}),
        und AS (
          SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
          FROM raw WHERE src IS NOT NULL AND dst IS NOT NULL
            AND src <> dst),
        deg AS (
          SELECT node, COUNT(*)::BIGINT AS deg FROM (
            SELECT u AS node FROM und UNION ALL SELECT v FROM und)
          GROUP BY node),
        tri AS (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM und e1
          JOIN und e2 ON e2.u = e1.v
          JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
        tcnt AS (
          SELECT node, COUNT(*)::BIGINT AS n_triangles FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri)
          GROUP BY node),
        per AS (
          SELECT d.node, d.deg,
                 COALESCE(t.n_triangles, 0)::BIGINT AS n_triangles,
                 (2 * COALESCE(t.n_triangles, 0))::BIGINT AS lcc_num,
                 (d.deg * (d.deg - 1))::BIGINT AS lcc_den
          FROM deg d LEFT JOIN tcnt t ON d.node = t.node),
        allrows AS (
          SELECT * FROM per
          UNION ALL
          SELECT -1::BIGINT, SUM(deg)::BIGINT, SUM(n_triangles)::BIGINT,
                 SUM(lcc_num)::BIGINT, SUM(lcc_den)::BIGINT FROM per)
        SELECT node, deg, n_triangles, lcc_num, lcc_den,
               CASE WHEN lcc_den > 0
                    THEN lcc_num::DOUBLE / lcc_den::DOUBLE END AS lcc
        FROM allrows"""
