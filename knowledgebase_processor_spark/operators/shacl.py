"""SHACL-lite cardinality validation (beyond-reference KG-curation
surface; the constraint-driven sibling of the fill-rate (q157) /
domain-conformance (q159) audits — SHACL is the W3C's public shape
language, and min/max-count per (class, predicate) is the subset
every production KG actually gates releases on).

`cardinality_report` validates a triple frame against a shapes frame
(cls, pred, min_count, max_count): for every instance of cls, the
number of pred assertions must lie in [min_count, max_count]
(NULL max = unbounded).  Output is per (cls, pred): how many instances
conform, violate under, violate over — the release-gate roll-up — with
exact integer ppm.

Scale shape: class membership joins the per-(subj, pred) assertion
counts once on subj (shuffle keyed on the instance id, AQE-split), the
shapes frame BROADCASTS into the roll-up, and instances missing the
predicate entirely are counted via the membership side of a LEFT join
(no full-outer over the triple set).  Two partial-agg groupBys, no
window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .rdfs import RDF_TYPE


def cardinality_report(triples: DataFrame, shapes: DataFrame,
                       type_pred: str = RDF_TYPE) -> DataFrame:
    """triples x shapes (cls, pred, min_count, max_count) ->
    (cls, pred, n_instances, n_conforming, n_under, n_over,
    conforming_ppm), one row per shape."""
    sh = F.broadcast(shapes.select(
        "cls", "pred",
        F.col("min_count").cast("long").alias("min_count"),
        F.col("max_count").cast("long").alias("max_count")))
    members = (triples.filter(F.col("pred") == type_pred)
               .select("subj", F.col("obj").alias("cls")).distinct())
    counts = (triples.filter(F.col("pred") != type_pred)
              .groupBy("subj", "pred")
              .agg(F.count(F.lit(1)).cast("long").alias("c")))
    # fan each instance out to its class's shapes, then LEFT join the
    # actual assertion count (absent -> 0).
    inst = members.join(sh, "cls")
    got = inst.join(counts, ["subj", "pred"], "left") \
              .withColumn("c", F.coalesce("c", F.lit(0)))
    verdict = got.withColumn(
        "state",
        F.when(F.col("c") < F.col("min_count"), F.lit("under"))
        .when(F.col("max_count").isNotNull()
              & (F.col("c") > F.col("max_count")), F.lit("over"))
        .otherwise(F.lit("ok")))
    return (verdict.groupBy("cls", "pred")
            .agg(F.count(F.lit(1)).cast("long").alias("n_instances"),
                 F.sum((F.col("state") == "ok").cast("long"))
                 .cast("long").alias("n_conforming"),
                 F.sum((F.col("state") == "under").cast("long"))
                 .cast("long").alias("n_under"),
                 F.sum((F.col("state") == "over").cast("long"))
                 .cast("long").alias("n_over"))
            .withColumn("conforming_ppm",
                        F.expr("n_conforming * 1000000 DIV n_instances")
                        .cast("long")))


def fact_lifespan(observations: DataFrame) -> DataFrame:
    """Temporal fact tracking over crawl snapshots: (subj, pred, obj,
    warc_ts) observation rows -> one row per distinct fact:
    (subj, pred, obj, first_seen, last_seen, n_obs, is_current) where
    ``is_current`` marks facts observed in the corpus-wide LATEST
    snapshot — the "still true as of the last crawl" flag an
    incremental KG build uses to retire stale assertions.

    ONE partial-agg groupBy on the fact key plus a broadcast of the
    single max-ts row; no window, no self-join."""
    per = (observations.groupBy("subj", "pred", "obj")
           .agg(F.min("warc_ts").alias("first_seen"),
                F.max("warc_ts").alias("last_seen"),
                F.count(F.lit(1)).cast("long").alias("n_obs")))
    latest = observations.agg(F.max("warc_ts").alias("__latest"))
    return (per.crossJoin(F.broadcast(latest))
            .withColumn("is_current",
                        F.col("last_seen") == F.col("__latest"))
            .drop("__latest"))


def property_graph_nodes(triples: DataFrame) -> DataFrame:
    """Property-graph NODE export (the LPG shape GraphFrames / Neo4j
    loaders consume): literal-object triples fold into per-subject
    property lists, URI objects stay edges (see the companion edge
    frame = ``triples.filter(obj_is_uri)``).

    -> (subj, n_props, n_edges_out, props): ``props`` is the
    deterministic sorted ``pred=value`` list joined with ``\\x1f`` —
    byte-identical across engines/partitionings (string_agg ORDER BY
    replays it), so downstream exact-dedup and the DuckDB oracle both
    hash it directly.  Requires an ``obj_is_uri`` column; one
    partial-agg groupBy, no window."""
    lit = F.when(~F.col("obj_is_uri"),
                 F.concat_ws("=", "pred", "obj"))
    return (triples.groupBy("subj")
            .agg(F.sum((~F.col("obj_is_uri")).cast("long")).cast("long")
                 .alias("n_props"),
                 F.sum(F.col("obj_is_uri").cast("long")).cast("long")
                 .alias("n_edges_out"),
                 F.array_join(F.sort_array(F.collect_list(lit)),
                              "\x1f").alias("props")))
