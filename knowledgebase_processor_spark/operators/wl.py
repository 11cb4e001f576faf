"""Weisfeiler-Lehman color refinement over the link graph (the
1-WL/color-refinement kernel: iteratively re-hash every node with the
sorted multiset of its neighbors' colors.  Two uses at corpus scale:
(a) structural fingerprints — site-template subgraphs (nav bars,
pagination ladders) refine to identical color histograms however the
URLs differ, complementing the content-side template miner (q171);
(b) the color histogram is the standard graph-kernel feature and the
expressiveness ceiling of message-passing GNNs (q121's SGC layer
computes a linear version of exactly this aggregation).

Colors are 16-hex md5 prefixes of ``old_color | sorted neighbor
colors`` — the portable-hash family, so the q217 oracle replays every
round bit-identically (Spark ``concat_ws(',', sort_array(
collect_list(c)))`` == DuckDB ``array_to_string(list_sort(list(c)),
',')``: same string, same md5).

Scale shape: per round ONE edge⋈color join + ONE groupBy(node) with a
sorted collect_list — fan-in is the node degree, so ``max_degree``
drops hub nodes from the edge set first (disclosed truncation, the
LSH max_bucket contract; a 10^6-degree hub would otherwise buffer a
10^6-element list and its color is meaningless 'HUB' structure
anyway).  Rounds are a small constant (1-WL stabilizes in diameter
rounds; 3 suffices for template work).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def wl_colors(edges: DataFrame, rounds: int = 3,
              src: str = "src", dst: str = "dst",
              max_degree: int | None = 1000) -> DataFrame:
    """-> (node, color) after ``rounds`` refinements over the
    SYMMETRIZED edge set; initial color is the constant 'c0'."""
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .unionByName(edges.select(F.col(dst).alias("a"),
                                     F.col(src).alias("b")))
           .filter(F.col("a").isNotNull() & F.col("b").isNotNull()
                   & (F.col("a") != F.col("b")))
           .dropDuplicates(["a", "b"]))
    if max_degree is not None:
        big = (sym.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
               .filter(F.col("d") > max_degree).select("a"))
        sym = (sym.join(F.broadcast(big), "a", "left_anti")
               .join(F.broadcast(big.withColumnRenamed("a", "b")),
                     "b", "left_anti"))
    sym = sym.localCheckpoint()
    nodes = (sym.select(F.col("a").alias("node")).distinct())
    colors = nodes.withColumn("color", F.lit("c0")).localCheckpoint()
    for _ in range(rounds):
        msgs = (sym.join(colors.withColumnRenamed("node", "b"), "b")
                .select(F.col("a").alias("node"), "color"))
        nbh = (msgs.groupBy("node")
               .agg(F.concat_ws(",", F.sort_array(
                   F.collect_list("color"))).alias("nb")))
        colors = (colors.join(nbh, "node", "left")
                  .select("node", F.substring(F.md5(F.concat_ws(
                      "|", "color", F.coalesce("nb", F.lit("")))),
                      1, 16).alias("color"))
                  .localCheckpoint())
    return colors


def wl_histogram(colors: DataFrame) -> DataFrame:
    """-> (color, n_nodes): the graph-kernel feature vector."""
    return colors.groupBy("color").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"))


def wl_oracle_sql(edges_sql: str, rounds: int = 3,
                  histogram: bool = True) -> str:
    """DuckDB replay: same symmetrization, same sorted-multiset md5."""
    ctes = [f"""e0 AS (SELECT src AS a, dst AS b FROM ({edges_sql})
                UNION SELECT dst, src FROM ({edges_sql})),
        sym AS (SELECT DISTINCT a, b FROM e0
                WHERE a IS NOT NULL AND b IS NOT NULL AND a <> b),
        c0 AS (SELECT DISTINCT a AS node, 'c0' AS color FROM sym)"""]
    prev = "c0"
    for r in range(1, rounds + 1):
        ctes.append(f"""n{r} AS (
            SELECT sym.a AS node,
                   array_to_string(list_sort(list(c.color)), ',') AS nb
            FROM sym JOIN {prev} c ON c.node = sym.b
            GROUP BY sym.a),
        c{r} AS (SELECT p.node,
                        substr(md5(p.color || '|' ||
                                   COALESCE(n{r}.nb, '')), 1, 16)
                            AS color
                 FROM {prev} p LEFT JOIN n{r} ON n{r}.node = p.node)""")
        prev = f"c{r}"
    body = (f"SELECT color, CAST(COUNT(*) AS BIGINT) AS n_nodes"
            f" FROM {prev} GROUP BY color ORDER BY color"
            if histogram else
            f"SELECT node, color FROM {prev} ORDER BY node")
    return f"WITH {', '.join(ctes)} {body}"
