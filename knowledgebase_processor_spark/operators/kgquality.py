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


def entity_summaries(triples: DataFrame, k: int = 5,
                     type_pred: str = RDF_TYPE) -> DataFrame:
    """Per-entity fact summarization (the LinkSUM / FACES problem,
    integer-exact): pick each subject's top-k most informative facts
    for entity cards and KG browsers.

    Informativeness of a fact = how selective its predicate is:
    ``score_ppm = N_subjects * 1e6 DIV n_subjects_using_pred`` — the
    exact-ratio twin of predicate IDF (same ordering as ln(N/n), no
    float), so rare predicates ("birthPlace") outrank boilerplate ones
    ("type", "label").  Deterministic tie-break (pred, obj).

    Plan: one partial-agg groupBy for per-predicate subject counts
    (tiny — broadcast back), then ONE row_number window per subject
    truncated at k — the capped-bucket idiom, so a 10^6-fact hub
    entity costs its cap, not its fan-out, in the output.
    """
    facts = triples.filter(F.col("pred") != type_pred) \
                   .select("subj", "pred", "obj")
    n_subj = facts.select("subj").distinct().count()
    pstats = (facts.select("subj", "pred").distinct()
              .groupBy("pred")
              .agg(F.count(F.lit(1)).alias("__np")))
    scored = (facts.join(F.broadcast(pstats), "pred")
              .withColumn("score_ppm",
                          # BIGINT literal: an INT n_subj overflows ANSI
                          # multiply past ~2k subjects (stress-tested)
                          F.expr(f"CAST({n_subj} AS BIGINT) * 1000000 "
                                 "DIV __np")))
    from pyspark.sql import Window
    w = Window.partitionBy("subj").orderBy(
        F.col("score_ppm").desc(), F.col("pred"), F.col("obj"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("subj", F.col("rk").cast("int").alias("rk"),
                    "pred", "obj",
                    F.col("score_ppm").cast("long").alias("score_ppm")))


def infer_types(triples: DataFrame, schema: DataFrame,
                type_pred: str = RDF_TYPE) -> DataFrame:
    """Type inference for UNTYPED subjects from predicate domains (the
    completion twin of :func:`domain_violations`): every use of a
    predicate whose ``rdfs:domain`` is declared casts one vote for the
    domain class; the majority class wins (struct-max, count then
    class-name tie-break — the q148 modal-anchor idiom, deterministic
    across engines).

    -> (subj, inferred_cls, votes, n_votes_total) for subjects with no
    rdf:type assertion and at least one vote.  Plan: broadcast the
    (pred, domain_cls) schema into the distinct (subj, pred) usage
    frame, anti-join the typed subjects out, two partial-agg groupBys
    — no window.
    """
    sch = schema.select("pred", "domain_cls").distinct()
    typed = triples.filter(F.col("pred") == type_pred) \
                   .select("subj").distinct()
    usage = (triples.filter(F.col("pred") != type_pred)
             .select("subj", "pred").distinct()
             .join(typed, "subj", "left_anti")
             .join(F.broadcast(sch), "pred"))
    votes = usage.groupBy("subj", "domain_cls").agg(
        F.count(F.lit(1)).alias("votes"))
    return (votes.groupBy("subj")
            .agg(F.max(F.struct("votes", F.col("domain_cls")))
                 .alias("__top"),
                 F.sum("votes").alias("n_votes_total"))
            .select("subj",
                    F.col("__top.domain_cls").alias("inferred_cls"),
                    F.col("__top.votes").cast("long").alias("votes"),
                    F.col("n_votes_total").cast("long")
                    .alias("n_votes_total")))


def functional_conflicts(triples: DataFrame,
                         min_functionality_ppm: int = 900_000,
                         type_pred: str = RDF_TYPE) -> DataFrame:
    """Contradiction mining on NEAR-FUNCTIONAL predicates: a predicate
    that is >=X functional (one object per subject for almost every
    subject — PARIS's merge-key signal, q144) should not assert two
    different objects for the same subject; the subjects where it does
    are data conflicts to adjudicate (extraction noise, vandalism,
    stale recrawls).

    -> (pred, functionality_ppm, subj, n_obj, min_obj, max_obj) for
    every conflicted subject of a qualifying predicate.  Plan: one
    partial-agg groupBy (pred, subj) carrying count + min/max object,
    one tiny per-pred rollup joined back broadcast — no window, no
    second scan.
    """
    per = (triples.filter(F.col("pred") != type_pred)
           .groupBy("pred", "subj")
           .agg(F.countDistinct("obj").alias("n_obj"),
                F.min("obj").alias("min_obj"),
                F.max("obj").alias("max_obj")))
    fstats = (per.groupBy("pred")
              .agg(F.count(F.lit(1)).alias("__ns"),
                   F.sum("n_obj").alias("__npairs"))
              .withColumn("functionality_ppm",
                          F.expr("__ns * 1000000 DIV __npairs"))
              .filter(F.col("functionality_ppm")
                      >= min_functionality_ppm)
              .select("pred", "functionality_ppm"))
    return (per.filter(F.col("n_obj") >= 2)
            .join(F.broadcast(fstats), "pred")
            .select("pred",
                    F.col("functionality_ppm").cast("long")
                    .alias("functionality_ppm"),
                    "subj", F.col("n_obj").cast("long").alias("n_obj"),
                    "min_obj", "max_obj"))
