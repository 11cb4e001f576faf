"""Conductance sweep cut — local community quality over a node
ordering (the evaluation half of local clustering: given any affinity
score (PPR from a seed (q117), a classifier score, or just a
candidate ordering), the sweep computes the conductance
φ(S_k) = cut(S_k) / min(vol(S_k), vol(V\\S_k)) of EVERY prefix S_k of
the score order in one pass, and the argmin prefix is the
Andersen-Chung-Lang local community.  Modularity (q131) grades a
FIXED partition; the sweep FINDS the best prefix community — the
missing piece between PPR scores and an actual seed-expansion set).

Exact and window-cheap: rank nodes once (score DESC, id tie-break);
vol(S_k) is a cumulative degree sum over ranks; cut(S_k) uses the
interval identity — an edge with endpoint ranks (lo, hi) crosses the
prefix boundary exactly for k in [lo, hi), so cut(k) is the running
sum of (+1 at lo, -1 at hi) events — one groupBy(rank) + one ordered
cumsum, never a per-k edge scan.  All BIGINTs; conductance is ppm
integer division.

Scale shape: two windows over the RANKED NODE frame (the sweep is
over candidate nodes — seed neighborhoods of thousands, or the top-m
score prefix at web scale, the q202 sampling note) and one
partial-agg groupBy over edges.  Self-loops are dropped; direction is
ignored (volume = undirected degree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def conductance_sweep(edges: DataFrame, scores: DataFrame,
                      src: str = "src", dst: str = "dst",
                      node_col: str = "node",
                      score_col: str = "score") -> DataFrame:
    """-> (rank, node, cut, vol, cond_ppm) for every prefix of the
    (score DESC, node ASC) order.  Nodes absent from ``scores`` are
    excluded from the sweep (and their edges with them)."""
    und = (edges.select(F.least(src, dst).alias("a"),
                        F.greatest(src, dst).alias("b"))
           .filter(F.col("a").isNotNull() & (F.col("a") != F.col("b")))
           .dropDuplicates(["a", "b"]))
    ranked = scores.select(F.col(node_col).alias("node"),
                           F.col(score_col).alias("s")) \
        .withColumn("rank", F.row_number().over(
            Window.orderBy(F.col("s").desc(), F.col("node").asc())))
    e = (und.join(ranked.selectExpr("node AS a", "rank AS ra"), "a")
         .join(ranked.selectExpr("node AS b", "rank AS rb"), "b")
         .select(F.least("ra", "rb").alias("lo"),
                 F.greatest("ra", "rb").alias("hi")))
    deg = (e.select(F.col("lo").alias("r"))
           .unionByName(e.select(F.col("hi").alias("r")))
           .groupBy("r").agg(F.count(F.lit(1)).cast("long")
                             .alias("deg")))
    events = (e.select(F.col("lo").alias("r"), F.lit(1).alias("d"))
              .unionByName(e.select(F.col("hi").alias("r"),
                                    F.lit(-1).alias("d")))
              .groupBy("r").agg(F.sum("d").cast("long").alias("delta")))
    cum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding,
                                             Window.currentRow)
    tot = Window.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    swept = (ranked
             .join(deg.withColumnRenamed("r", "rank"), "rank", "left")
             .join(events.withColumnRenamed("r", "rank"), "rank", "left")
             .select("rank", "node",
                     F.coalesce("deg", F.lit(0)).alias("dg"),
                     F.coalesce("delta", F.lit(0)).alias("dl"))
             .withColumn("cut", F.sum("dl").over(cum).cast("long"))
             .withColumn("vol", F.sum("dg").over(cum).cast("long"))
             .withColumn("vol_tot", F.sum("dg").over(tot).cast("long")))
    return (swept.select(
        F.col("rank").cast("long").alias("rank"), "node", "cut", "vol",
        F.expr("cut * 1000000 DIV nullif(least(vol, vol_tot - vol), 0)")
        .alias("cond_ppm")))


def conductance_oracle_sql(edges_sql: str, scores_sql: str) -> str:
    """DuckDB replay: same rank, same interval identity, same ppm."""
    return f"""
        WITH und AS (SELECT DISTINCT least(src, dst) AS a,
                                     greatest(src, dst) AS b
                     FROM ({edges_sql})
                     WHERE src IS NOT NULL AND dst IS NOT NULL
                       AND src <> dst),
        ranked AS (SELECT node, ROW_NUMBER() OVER
                          (ORDER BY score DESC, node ASC) AS rank
                   FROM ({scores_sql})),
        e AS (SELECT least(ra.rank, rb.rank) AS lo,
                     greatest(ra.rank, rb.rank) AS hi
              FROM und
              JOIN ranked ra ON ra.node = und.a
              JOIN ranked rb ON rb.node = und.b),
        deg AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS dg
                FROM (SELECT lo AS r FROM e
                      UNION ALL SELECT hi FROM e) GROUP BY r),
        ev AS (SELECT r, CAST(SUM(d) AS BIGINT) AS dl
               FROM (SELECT lo AS r, 1 AS d FROM e
                     UNION ALL SELECT hi, -1 FROM e) GROUP BY r),
        swept AS (SELECT ranked.rank, ranked.node,
                         COALESCE(dg, 0) AS dg, COALESCE(dl, 0) AS dl
                  FROM ranked
                  LEFT JOIN deg ON deg.r = ranked.rank
                  LEFT JOIN ev ON ev.r = ranked.rank),
        cums AS (SELECT rank, node,
                        CAST(SUM(dl) OVER (ORDER BY rank) AS BIGINT)
                            AS cut,
                        CAST(SUM(dg) OVER (ORDER BY rank) AS BIGINT)
                            AS vol,
                        CAST(SUM(dg) OVER () AS BIGINT) AS vol_tot
                 FROM swept)
        SELECT CAST(rank AS BIGINT) AS rank, node, cut, vol,
               CAST(cut * 1000000
                    // nullif(least(vol, vol_tot - vol), 0) AS BIGINT)
                   AS cond_ppm
        FROM cums ORDER BY rank"""
