"""owl:sameAs canonicalization — rewrite a triple set through identity
clusters (north rule: "canonicalization through connected-components
clustering ... before materializing deduplicated entity/relation
tables").

`kg_job` already runs coreference-CC over mention/wikilink edges; this
is the standalone triple-level form a KG ingest needs when identity
links arrive as data (owl:sameAs assertions, ER match decisions,
external id crosswalks):

1. connected components over the (undirected) sameAs edge set — the
   O(log n) min-label propagation of ``components.py``, skew-safe
   because min is partial-agg combinable;
2. every cluster elects its minimum member as canonical id
   (deterministic, engine-independent);
3. subjects AND objects of the instance triples are rewritten through
   the node->canonical map with two joins, then set-deduplicated —
   coalescing the duplicate assertions that distinct aliases carried.

Scale shape: the sameAs graph is orders of magnitude smaller than the
triple set (identity links are sparse), so the CC iteration never
touches the 100 TB side; the rewrite is two equi-joins on the triple
frame (broadcast when the label map is small enough, AQE decides) and
one distinct.  URI-only rewrite: literal objects pass through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .components import connected_components


def sameas_labels(sameas_edges: DataFrame, src: str = "src",
                  dst: str = "dst", max_iterations: int = 20) -> DataFrame:
    """sameAs edges -> (node, canonical) with canonical = min member of
    the node's identity cluster."""
    return (connected_components(sameas_edges, src=src, dst=dst,
                                 max_iterations=max_iterations)
            .withColumnRenamed("component", "canonical"))


def canonicalize_triples(triples: DataFrame, sameas_edges: DataFrame,
                         max_iterations: int = 20) -> DataFrame:
    """(subj, pred, obj[, obj_is_uri]) + sameAs edges -> the rewritten,
    deduplicated triple set (same columns, minus duplicates that the
    rewrite coalesced).  Nodes outside any cluster keep their own id."""
    labels = sameas_labels(sameas_edges, max_iterations=max_iterations) \
        .localCheckpoint()
    return rewrite_with_labels(triples, labels)


def rewrite_with_labels(triples: DataFrame, labels: DataFrame) -> DataFrame:
    """The rewrite half: (node, canonical) labels from ANY clustering
    (sameAs CC here; kg_job feeds its coreference-CC entity table) map
    subjects and URI objects to their canonical ids, then set-dedup."""
    has_uri_flag = "obj_is_uri" in triples.columns
    labels = labels.select("node", "canonical").distinct()

    s_map = labels.select(F.col("node").alias("subj"),
                          F.col("canonical").alias("__s_can"))
    o_map = labels.select(F.col("node").alias("obj"),
                          F.col("canonical").alias("__o_can"))

    t = (triples.join(s_map, "subj", "left")
         .withColumn("subj", F.coalesce(F.col("__s_can"), F.col("subj")))
         .drop("__s_can"))
    # literals never rewrite: join only the URI objects when the flag
    # column exists (the join key equality is then guarded post-join).
    t = t.join(o_map, "obj", "left")
    keep_obj = (F.col("__o_can").isNull() |
                (~F.col("obj_is_uri") if has_uri_flag else F.lit(False)))
    t = (t.withColumn("obj", F.when(keep_obj, F.col("obj"))
                      .otherwise(F.col("__o_can")))
         .drop("__o_can"))
    return t.distinct()
