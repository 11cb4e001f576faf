"""Co-citation and bibliographic coupling over the web link graph
(beyond-reference graph surface; the two classic link-based
similarity signals that predate PageRank: pages CITED TOGETHER by
many documents (co-citation) are topically related even with zero
shared text — the structural complement to the content-based dedup
and ANN families — and pages CITING the same set (coupling) identify
mirrored boilerplate and citation-stuffing farms.  SALSA/HITS (q116)
run on the same bipartite structure; these are its raw pair counts).

Scale shape: ONE self-join on the shared endpoint then a partial-agg
groupBy on the pair — identical architecture to the rule-mining body
join.  The quadratic hazard is the pivot node's degree (a directory
page linking 10^5 targets contributes C(10^5, 2) pairs), so
``max_fanout`` drops pivot nodes above the cap BEFORE pairing — the
LSH ``max_bucket`` disclosure applied to link hubs; the count-first /
anti-join / pair-second ordering means an oversized hub never reaches
the join, let alone a buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _shared_endpoint_pairs(edges: DataFrame, pivot: str, other: str,
                           max_fanout: int | None) -> DataFrame:
    e = (edges.select(F.col(pivot).alias("p"), F.col(other).alias("o"))
         .filter(F.col("p").isNotNull() & F.col("o").isNotNull())
         .dropDuplicates(["p", "o"]))
    if max_fanout is not None:
        big = (e.groupBy("p").agg(F.count(F.lit(1)).alias("c"))
               .filter(F.col("c") > max_fanout).select("p"))
        e = e.join(F.broadcast(big), "p", "left_anti")
    pairs = (e.alias("x").join(e.alias("y"), F.col("x.p") == F.col("y.p"))
             .filter(F.col("x.o") < F.col("y.o"))
             .select(F.col("x.o").alias("a"), F.col("y.o").alias("b")))
    return pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n_common"))


def cocitation_pairs(edges: DataFrame, src: str = "src",
                     dst: str = "dst",
                     max_fanout: int | None = 1000) -> DataFrame:
    """-> (a, b, n_common): target pairs by shared CITING documents
    (common in-neighbors), a < b.  Pivot = the citing page; its
    out-degree is the capped fan-out."""
    return _shared_endpoint_pairs(edges, src, dst, max_fanout)


def coupling_pairs(edges: DataFrame, src: str = "src",
                   dst: str = "dst",
                   max_fanout: int | None = 1000) -> DataFrame:
    """-> (a, b, n_common): citing pairs by shared TARGETS (common
    out-neighbors), a < b.  Pivot = the cited page; its in-degree is
    the capped fan-out."""
    return _shared_endpoint_pairs(edges, dst, src, max_fanout)


def cocite_oracle_sql(edges_sql: str, pivot: str = "src",
                      other: str = "dst") -> str:
    """DuckDB replay (uncapped — callers pass bounded graphs)."""
    return f"""
        WITH e AS (SELECT DISTINCT {pivot} AS p, {other} AS o
                   FROM ({edges_sql})
                   WHERE {pivot} IS NOT NULL AND {other} IS NOT NULL)
        SELECT x.o AS a, y.o AS b, CAST(COUNT(*) AS BIGINT) AS n_common
        FROM e x JOIN e y ON x.p = y.p AND x.o < y.o
        GROUP BY x.o, y.o ORDER BY a, b"""
