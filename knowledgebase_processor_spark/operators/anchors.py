"""Anchor-text aggregation per link target (web-graph surface;
the popularity-prior source for operators/linking.py).

The classic web-IR/EL signal: what the web CALLS a page.  Per link
target, aggregate incoming links into n_links / distinct sources /
distinct anchors / the modal anchor text — the "commonness" statistics
entity linkers (Milne-Witten) and search rankers read.  The reference
extracts wikilinks per document (E5/E9); this is the corpus-level
inversion of that frame.

Scale shape: two partial-agg groupBys — (target, anchor) counts, then
one per-target reduce where the modal anchor rides a ``max(struct)``
(count, anchor) leg — plus one distinct-count pass.  No window over the
link frame, no collect; anchor-text skew ("click here" × 10^9) is
absorbed by map-side combine on the (target, anchor) key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def anchor_profile(links: DataFrame, src_col: str = "src_doc",
                   target_col: str = "target",
                   anchor_col: str = "anchor") -> DataFrame:
    """links -> (target, n_links, n_sources, n_anchors, top_anchor,
    top_anchor_n): modal anchor breaks count ties to the
    lexicographically last text (struct-max leg, engine-deterministic)."""
    t = links.select(F.col(src_col).alias("src"),
                     F.col(target_col).alias("target"),
                     F.col(anchor_col).alias("anchor"))
    per_anchor = t.groupBy("target", "anchor").agg(
        F.count(F.lit(1)).alias("n"))
    mode = (per_anchor.groupBy("target")
            .agg(F.sum("n").alias("n_links"),
                 F.count(F.lit(1)).alias("n_anchors"),
                 F.max(F.struct(F.col("n"), F.col("anchor"))).alias("m"))
            .select("target", F.col("n_links").cast("long").alias("n_links"),
                    F.col("n_anchors").cast("long").alias("n_anchors"),
                    F.col("m.anchor").alias("top_anchor"),
                    F.col("m.n").cast("long").alias("top_anchor_n")))
    srcs = t.groupBy("target").agg(
        F.countDistinct("src").cast("long").alias("n_sources"))
    return (mode.join(srcs, "target")
            .select("target", "n_links", "n_sources", "n_anchors",
                    "top_anchor", "top_anchor_n"))
