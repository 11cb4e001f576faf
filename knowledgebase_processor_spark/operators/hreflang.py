"""hreflang translation-cluster assembly (webtext surface: Common
Crawl pages carry ``<link rel="alternate" hreflang=..>`` edges; the
translation *cluster* — all language variants of one logical page — is
the connected component of that edge graph, because real sites declare
partial, asymmetric alternate sets (A lists B, B lists C, C lists
nobody).  Clusters feed the bitext miner (q154/q151) with candidate
pages and the dedup family with "same page, different language"
groups that must NOT be collapsed as near-dups).

Built by composition: the edge graph goes through the north-rule
connected-components operator (components.py — label propagation with
pointer jumping + localCheckpoint), then two partial-agg groupBys
roll members up to per-cluster language profiles.  No new wide
machinery; the report shuffles cluster-count rows, not page rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .components import connected_components


def translation_clusters(edges: DataFrame, page_langs: DataFrame,
                         url_col: str = "url",
                         lang_col: str = "lang") -> DataFrame:
    """-> (cluster, size, n_langs): connected components of the
    hreflang alternate graph, labeled with member count and distinct
    declared languages.  ``edges`` needs (src, dst) url pairs;
    ``page_langs`` maps url -> lang.  Pages never mentioned in an edge
    are absent (a page with no alternates is not a cluster).
    """
    assign = connected_components(edges)
    member = assign.select(F.col("node").alias(url_col),
                           F.col("component").alias("cluster"))
    labeled = member.join(page_langs.select(url_col, lang_col),
                          url_col, "left")
    return (labeled.groupBy("cluster")
            .agg(F.count(F.lit(1)).cast("long").alias("size"),
                 F.countDistinct(lang_col).cast("long").alias("n_langs")))


def translation_report(clusters: DataFrame) -> DataFrame:
    """-> (size, n_langs, n_clusters): the shape histogram — 'how many
    4-language-complete clusters do we have, and how many are missing
    variants?' (size > n_langs means duplicate-language members, the
    canonical-url bug signature q28 hunts)."""
    return (clusters.groupBy("size", "n_langs")
            .agg(F.count(F.lit(1)).cast("long").alias("n_clusters")))
