"""Host-level web-graph rollup (beyond-reference webtext surface; the
site-granularity companion to the page-level PageRank/HITS/clustering
operators — crawl planners and spam pipelines reason about HOSTS, so
the 10^12-edge page graph must first collapse to the ~10^8-node host
graph).

`host_link_graph` rolls page links up to weighted host edges;
`host_reciprocity` computes, per host, how much of its out-linking is
reciprocated (mutual host pairs — the classic TKC/link-farm signal:
organic sites have moderate reciprocity, link farms approach 1.0).

Scale shape: the rollup is ONE partial-agg groupBy over the edge list
(hub hosts absorbed map-side); reciprocity is a self-join of the host
edge list on the REVERSED key — hash join on (src,dst), no window, no
expansion beyond the host-edge count; self-loops (intra-host links)
are excluded from reciprocity, as the literature does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def host_link_graph(links: DataFrame) -> DataFrame:
    """(src_host, dst_host[, src_page]) page-link rows -> one row per
    directed host pair: (src_host, dst_host, n_links, n_src_pages).
    ``n_src_pages`` counts the distinct linking pages when a
    ``src_page`` column rides in (1-page spam sites emit many links
    from few pages), else equals n_links."""
    has_page = "src_page" in links.columns
    return (links.groupBy("src_host", "dst_host")
            .agg(F.count(F.lit(1)).cast("long").alias("n_links"),
                 (F.countDistinct("src_page") if has_page
                  else F.count(F.lit(1))).cast("long")
                 .alias("n_src_pages")))


def host_reciprocity(host_edges: DataFrame) -> DataFrame:
    """host edge frame (src_host, dst_host[, n_links]) -> one row per
    host: (host, out_hosts, in_hosts, mutual_hosts, reciprocity_ppm)
    where reciprocity = mutual / out (exact ppm) over DISTINCT host
    pairs, self-loops excluded."""
    e = (host_edges.select("src_host", "dst_host")
         .filter(F.col("src_host") != F.col("dst_host")).distinct())
    rev = e.select(F.col("dst_host").alias("src_host"),
                   F.col("src_host").alias("dst_host"))
    mutual = (e.join(rev, ["src_host", "dst_host"])
              .groupBy("src_host")
              .agg(F.count(F.lit(1)).cast("long").alias("mutual_hosts")))
    outs = e.groupBy("src_host").agg(
        F.count(F.lit(1)).cast("long").alias("out_hosts"))
    ins = (e.groupBy("dst_host")
           .agg(F.count(F.lit(1)).cast("long").alias("in_hosts"))
           .withColumnRenamed("dst_host", "src_host"))
    return (outs.join(ins, "src_host", "full_outer")
            .join(mutual, "src_host", "left")
            .select(F.col("src_host").alias("host"),
                    F.coalesce("out_hosts", F.lit(0)).cast("long")
                    .alias("out_hosts"),
                    F.coalesce("in_hosts", F.lit(0)).cast("long")
                    .alias("in_hosts"),
                    F.coalesce("mutual_hosts", F.lit(0)).cast("long")
                    .alias("mutual_hosts"))
            .withColumn("reciprocity_ppm",
                        F.expr("CASE WHEN out_hosts = 0 THEN 0 ELSE "
                               "mutual_hosts * 1000000 DIV out_hosts "
                               "END").cast("long")))
