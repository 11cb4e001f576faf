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


def ifp_sameas_candidates(triples: DataFrame,
                          min_inv_functionality_ppm: int = 900_000,
                          max_bucket: int = 100) -> DataFrame:
    """Inverse-functional-property entity matching (OWL IFP semantics,
    the classic silk/LIMES ER signal): two subjects asserting the SAME
    object under a (near-)inverse-functional predicate — email,
    homepage, ISBN — are sameAs candidates; the output edge frame feeds
    :func:`sameas_labels` / the kg_job coreference CC.

    -> (subj_a, subj_b, n_evidence) with subj_a < subj_b: the number of
    distinct (pred, obj) keys the pair shares across qualifying
    predicates (multi-key agreement = stronger evidence).

    Predicates qualify when their inverse functionality —
    ``|distinct obj| * 1e6 DIV |distinct (subj, obj)|`` (the PARIS
    signal, same convention as q144/q169) — meets the bar.  Candidate
    generation is the dedup.py capped-bucket shape: hot objects
    (``mailto:info@`` shared by 10^6 subjects) are TRUNCATED in a
    spillable window BEFORE any aggregation buffer materializes the
    member list, then dropped whole via the sentinel row — a
    boilerplate object can never go quadratic.
    """
    pairs_frame = triples.select("subj", "pred", "obj").distinct()
    fstats = (pairs_frame.groupBy("pred")
              .agg(F.countDistinct("obj").alias("__no"),
                   F.count(F.lit(1)).alias("__np"))
              .withColumn("__ifp", F.expr("__no * 1000000 DIV __np"))
              .filter(F.col("__ifp") >= min_inv_functionality_ppm)
              .select("pred"))
    keyed = pairs_frame.join(F.broadcast(fstats), "pred") \
                       .select(F.col("pred").alias("band"),
                               F.col("obj").alias("bucket"),
                               F.col("subj"))
    from .dedup import _capped_bucket_members, _expand_bucket_pairs
    members = _capped_bucket_members(keyed, max_bucket, payload="subj")
    return (_expand_bucket_pairs(members)
            .select(F.col("p.doc_a").alias("subj_a"),
                    F.col("p.doc_b").alias("subj_b"))
            .groupBy("subj_a", "subj_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_evidence")))
