"""KG completeness profiling (beyond-reference KG-curation surface;
companion to stats.predicate_profile).

`predicate_fill_rate` computes, per (class, predicate), the share of
the class's instances that assert the predicate at least once — the
ReCoIn-style "schema completeness" report KG curators read to find
under-populated predicates ("38% of persons have birthPlace").  Input
is the same triple frame the pipeline materializes: rdf:type rows
define class membership, everything else defines predicate presence.

Plan shape: class membership (subj, cls) joins the DISTINCT (subj,
pred) presence frame on subj — one shuffle join keyed on the instance
id (AQE splits hub instances), then one partial-agg groupBy (cls,
pred).  Exact integer ppm; no window, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .rdfs import RDF_TYPE


def predicate_fill_rate(triples: DataFrame,
                        type_pred: str = RDF_TYPE) -> DataFrame:
    """(subj, pred, obj) -> (cls, pred, n_instances, n_with_pred,
    fill_ppm), one row per (class, predicate observed on any of its
    instances)."""
    members = (triples.filter(F.col("pred") == type_pred)
               .select("subj", F.col("obj").alias("cls")).distinct())
    sizes = members.groupBy("cls").agg(
        F.count(F.lit(1)).alias("n_instances"))
    presence = (triples.filter(F.col("pred") != type_pred)
                .select("subj", "pred").distinct())
    filled = (members.join(presence, "subj")
              .groupBy("cls", "pred")
              .agg(F.count(F.lit(1)).alias("n_with_pred")))
    return (filled.join(sizes, "cls")
            .select("cls", "pred",
                    F.col("n_instances").cast("long").alias("n_instances"),
                    F.col("n_with_pred").cast("long").alias("n_with_pred"),
                    F.expr("n_with_pred * 1000000 DIV n_instances")
                    .alias("fill_ppm")))


def dangling_objects(triples: DataFrame,
                     type_pred: str = RDF_TYPE) -> DataFrame:
    """Referential-integrity audit: per predicate, how many of its URI
    objects are DANGLING — referenced but never described (no type, no
    outgoing assertion).  The post-ingest signal that entity resolution
    missed targets or the crawl frontier hasn't reached them.

    One distinct (pred, obj) projection left-anti-joined against the
    described-subject set, then a partial-agg rollup against per-pred
    object totals.  Needs `obj_is_uri` when literals are present
    (literals are never dangling).
    """
    has_uri = "obj_is_uri" in triples.columns
    objs = (triples.filter(F.col("obj_is_uri") if has_uri else F.lit(True))
            .select("pred", "obj").distinct())
    described = triples.select(F.col("subj").alias("obj")).distinct()
    dangling = (objs.join(described, "obj", "left_anti")
                .groupBy("pred").agg(F.count(F.lit(1)).alias("n_dangling")))
    totals = objs.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_objects"))
    return (totals.join(dangling, "pred", "left")
            .select("pred", F.col("n_objects").cast("long").alias("n_objects"),
                    F.coalesce("n_dangling", F.lit(0)).cast("long")
                    .alias("n_dangling"))
            .withColumn("dangling_ppm",
                        F.expr("n_dangling * 1000000 DIV n_objects")))


def domain_violations(triples: DataFrame, schema: DataFrame,
                      type_pred: str = RDF_TYPE) -> DataFrame:
    """Validation twin of `rdfs.rdfs_closure`: where the closure ADDS
    the domain type, this REPORTS assertions whose subject does not
    already carry it — per (pred, domain class): asserting subjects vs
    subjects missing the type.  Curators run the audit BEFORE deciding
    whether to materialize the entailment or fix the data (a high
    violation rate usually means a mis-modeled predicate, not 10^9
    missing type rows).

    ``schema``: (pred, domain_cls) rows — broadcast.  Two distinct
    projections + one anti-join against the type table; exact ppm.
    """
    dom = F.broadcast(schema.select("pred", "domain_cls").distinct())
    asserting = (triples.filter(F.col("pred") != type_pred)
                 .select("subj", "pred").distinct().join(dom, "pred"))
    typed = (triples.filter(F.col("pred") == type_pred)
             .select("subj", F.col("obj").alias("domain_cls")).distinct())
    viol = (asserting.join(typed, ["subj", "domain_cls"], "left_anti")
            .groupBy("pred", "domain_cls")
            .agg(F.count(F.lit(1)).alias("n_violating")))
    totals = asserting.groupBy("pred", "domain_cls").agg(
        F.count(F.lit(1)).alias("n_subjects"))
    return (totals.join(viol, ["pred", "domain_cls"], "left")
            .select("pred", "domain_cls",
                    F.col("n_subjects").cast("long").alias("n_subjects"),
                    F.coalesce("n_violating", F.lit(0)).cast("long")
                    .alias("n_violating"))
            .withColumn("violation_ppm",
                        F.expr("n_violating * 1000000 DIV n_subjects")))


def class_hierarchy_counts(triples: DataFrame,
                           type_pred: str = RDF_TYPE) -> DataFrame:
    """Faceted-browse class counts: per class, DIRECT instances and
    TOTAL instances including every subclass (the number a KG browser
    shows next to each tree node).

    The subclass closure runs on the tiny schema side
    (`rdfs.subClassOf` rows, doubling joins) and broadcasts into one
    join against the distinct (instance, class) membership frame;
    totals are countDistinct over the lifted memberships — an instance
    typed by two subclasses of C counts ONCE toward C.  Two partial-agg
    shuffles total on the instance side.
    """
    from .graph_query import transitive_closure
    from .rdfs import RDFS_SUBCLASS

    members = (triples.filter(F.col("pred") == type_pred)
               .select("subj", F.col("obj").alias("cls")).distinct())
    sc_edges = (triples.filter(F.col("pred") == RDFS_SUBCLASS)
                .select(F.col("subj").alias("src"),
                        F.col("obj").alias("dst")))
    sc_plus = transitive_closure(sc_edges)
    # reflexive lift: every membership also counts toward the class
    # itself, plus every ancestor from the closure.
    lifted = members.unionByName(
        members.join(F.broadcast(sc_plus.withColumnRenamed("src", "cls")),
                     "cls")
        .select("subj", F.col("dst").alias("cls"))).distinct()
    direct = members.groupBy("cls").agg(
        F.count(F.lit(1)).alias("n_direct"))
    total = lifted.groupBy("cls").agg(
        F.count(F.lit(1)).alias("n_total"))
    return (total.join(direct, "cls", "left")
            .select("cls",
                    F.coalesce("n_direct", F.lit(0)).cast("long")
                    .alias("n_direct"),
                    F.col("n_total").cast("long").alias("n_total")))
