"""Redirect-chain resolution over a crawl's redirect map
(beyond-reference webtext surface; the canonicalization step between
`canonical_urls` (q28) and page dedup — a crawler stores one
(src_url -> dst_url) row per 3xx response and needs every URL mapped to
its FINAL destination before urls can key joins, dedup, or PageRank).

Spark-first design — pointer doubling (a.k.a. path halving), the same
O(log n)-round contraction the connected-components operator uses
(components.py): after r rounds every chain of length <= 2^r has
collapsed to its terminal, so 10^12 urls with the crawler-typical <=8
hop chains need 3 self-joins, not 8 sequential ones.  Cycles (redirect
loops, the classic crawler trap) and chains longer than the budget stay
unresolved and are flagged, exactly like a production fetcher that caps
redirects-per-url.

Scale shape: each round is ONE equi-join of the pointer frame with
itself on the current target (shuffle on url — AQE-planned, no window,
no collect) plus a localCheckpoint to cut the lineage, mirroring
components.py.  The final terminal check is one more left join against
the (deduplicated) edge map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def resolve_redirects(edges: DataFrame, rounds: int = 4,
                      checkpoint: bool = True) -> DataFrame:
    """(src, dst) redirect rows -> one row per redirecting url:
    (url, final_url, n_hops, resolved).

    * chains of length <= 2**rounds resolve: ``final_url`` is the first
      target with no outgoing redirect, ``n_hops`` the exact chain
      length;
    * redirect LOOPS and over-budget chains emit ``resolved=false``
      with NULL final_url/n_hops — the fetcher's "too many redirects"
      verdict;
    * a src with several recorded targets (re-crawl drift) is
      normalized to the lexicographically smallest dst first, so the
      result is deterministic and every engine replays it.
    """
    emap = edges.groupBy(F.col("src").alias("url")) \
                .agg(F.min("dst").alias("nxt"))
    ptr = emap.select("url", F.col("nxt").alias("cur"),
                      F.lit(1).cast("long").alias("hops"))
    hop2 = emap.select(F.col("url").alias("cur"), "nxt")
    for _ in range(rounds):
        # follow cur's own pointer if cur redirects too: the pointer
        # frame doubles its reach each round (1, 2, 4, ... hops).
        p2 = ptr.select(F.col("url").alias("cur"),
                        F.col("cur").alias("cur2"),
                        F.col("hops").alias("hops2"))
        ptr = (ptr.join(p2, "cur", "left")
               .select("url",
                       F.coalesce("cur2", "cur").alias("cur"),
                       (F.col("hops") + F.coalesce("hops2", F.lit(0)))
                       .alias("hops")))
        if checkpoint:
            ptr = ptr.localCheckpoint(eager=False)
    budget = 2 ** rounds
    out = (ptr.join(hop2, "cur", "left")
           .withColumn("resolved",
                       F.col("nxt").isNull() & (F.col("hops") <= budget)))
    return out.select(
        "url",
        F.when(F.col("resolved"), F.col("cur")).alias("final_url"),
        F.when(F.col("resolved"), F.col("hops")).cast("long")
        .alias("n_hops"),
        "resolved")
