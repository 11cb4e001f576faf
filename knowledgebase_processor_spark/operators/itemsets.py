"""Frequent itemset mining, A-priori staged (the market-basket view
of the corpus: which tags / hosts / vocabulary items CO-OCCUR in the
same document beyond pairs — q52's co-occurrence matrix is the k=2
level; the k=3 level finds template fingerprints (three boilerplate
tokens that always travel together) and topic triads, and is the
classic demonstration that anti-monotonicity, not brute force, is
what makes itemsets tractable at corpus scale).

A-priori staging in DataFrame terms:

    L1 = items with support >= s                 (one groupBy)
    L2 = pairs of L1 items co-occurring >= s     (semi-join-pruned
                                                  self-join per doc)
    C3 = L2 ⋈ L2 on a shared prefix item         (candidate gen —
                                                  BOTH sub-pairs must
                                                  be frequent)
    L3 = C3 verified against transactions >= s

Every candidate triple has all three sub-pairs in L2 by construction
(join on prefix + anti-monotone prune of the third pair), so the
count join touches |C3| candidates, not C(n,3).  Per-doc item lists
are deduplicated (set semantics) and the per-doc fan-out is capped by
``max_items`` (largest-docs disclosure, the LSH max_bucket contract:
a 10^4-item transaction would otherwise contribute C(10^4, 2) pair
rows).  All counts exact BIGINTs; the q213 oracle replays the same
staged joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def frequent_triples(tx: DataFrame, doc_col: str = "doc",
                     item_col: str = "item", min_support: int = 5,
                     max_items: int | None = 1000) -> DataFrame:
    """-> (i1, i2, i3, support) with i1 < i2 < i3, support >=
    ``min_support``, over (doc, item) transaction rows."""
    t = tx.select(F.col(doc_col).alias("doc"),
                  F.col(item_col).alias("item")).dropDuplicates()
    if max_items is not None:
        big = (t.groupBy("doc").agg(F.count(F.lit(1)).alias("c"))
               .filter(F.col("c") > max_items).select("doc"))
        t = t.join(F.broadcast(big), "doc", "left_anti")
    l1 = (t.groupBy("item").agg(F.count(F.lit(1)).alias("c"))
          .filter(F.col("c") >= min_support).select("item"))
    t1 = t.join(F.broadcast(l1), "item", "left_semi")
    pairs = (t1.alias("a").join(t1.alias("b"), "doc")
             .filter(F.col("a.item") < F.col("b.item"))
             .select("doc", F.col("a.item").alias("i1"),
                     F.col("b.item").alias("i2")))
    l2 = (pairs.groupBy("i1", "i2")
          .agg(F.count(F.lit(1)).cast("long").alias("c"))
          .filter(F.col("c") >= min_support))
    # candidate gen: join L2 with itself on the FIRST item; prune by
    # requiring the (i2, i3) pair frequent too (full anti-monotone)
    c3 = (l2.alias("x").join(l2.alias("y"),
                             F.col("x.i1") == F.col("y.i1"))
          .filter(F.col("x.i2") < F.col("y.i2"))
          .select(F.col("x.i1").alias("i1"), F.col("x.i2").alias("i2"),
                  F.col("y.i2").alias("i3"))
          .join(l2.selectExpr("i1 AS i2", "i2 AS i3"), ["i2", "i3"],
                "left_semi"))
    triples = (pairs.join(t1.selectExpr("doc", "item AS i3"), "doc")
               .filter(F.col("i2") < F.col("i3"))
               .join(c3, ["i1", "i2", "i3"], "left_semi")
               .groupBy("i1", "i2", "i3")
               .agg(F.count(F.lit(1)).cast("long").alias("support"))
               .filter(F.col("support") >= min_support))
    return triples


def triples_oracle_sql(tx_sql: str, min_support: int = 5) -> str:
    """DuckDB replay of the staged joins (uncapped — callers pass
    bounded transactions).  ``tx_sql`` selects (doc, item)."""
    return f"""
        WITH t AS (SELECT DISTINCT doc, item FROM ({tx_sql})),
        l1 AS (SELECT item FROM t GROUP BY item
               HAVING COUNT(*) >= {min_support}),
        t1 AS (SELECT t.* FROM t SEMI JOIN l1 ON t.item = l1.item),
        pairs AS (SELECT a.doc, a.item AS i1, b.item AS i2
                  FROM t1 a JOIN t1 b
                    ON a.doc = b.doc AND a.item < b.item),
        l2 AS (SELECT i1, i2, CAST(COUNT(*) AS BIGINT) AS c
               FROM pairs GROUP BY i1, i2
               HAVING COUNT(*) >= {min_support}),
        c3 AS (SELECT x.i1, x.i2, y.i2 AS i3
               FROM l2 x JOIN l2 y
                 ON x.i1 = y.i1 AND x.i2 < y.i2
               SEMI JOIN l2 z ON z.i1 = x.i2 AND z.i2 = y.i2),
        cand AS (SELECT pairs.doc, pairs.i1, pairs.i2, t1.item AS i3
                 FROM pairs JOIN t1 ON t1.doc = pairs.doc
                 WHERE pairs.i2 < t1.item)
        SELECT cand.i1, cand.i2, cand.i3,
               CAST(COUNT(*) AS BIGINT) AS support
        FROM cand SEMI JOIN c3
          ON c3.i1 = cand.i1 AND c3.i2 = cand.i2 AND c3.i3 = cand.i3
        GROUP BY cand.i1, cand.i2, cand.i3
        HAVING COUNT(*) >= {min_support}
        ORDER BY i1, i2, i3"""
