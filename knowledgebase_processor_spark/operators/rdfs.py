"""RDFS entailment materialization (beyond-reference KG surface).

The reference stores extracted triples verbatim (rdf_converter.py emits
instance triples only); a production KG additionally materializes the
RDFS closure so SPARQL consumers see inherited types and super-property
assertions without per-query reasoning.  This implements the rho-df
rule subset — the fragment every large triple store (Jena RDFS,
Virtuoso, Oxigraph) materializes:

* rdfs5/11 — ``subPropertyOf`` / ``subClassOf`` are transitive;
* rdfs7    — (x p y), (p sp q)      ->  (x q y);
* rdfs2    — (x p y), (p domain C)  ->  (x type C);
* rdfs3    — (x p y), (p range  C)  ->  (y type C)   [y a URI];
* rdfs9    — (x type C), (C sc D)   ->  (x type D).

Scale shape — the whole point of the implementation: the SCHEMA (the
``subClassOf``/``subPropertyOf``/``domain``/``range`` triples) is tiny
(thousands of rows for real ontologies) while the INSTANCE data is the
100 TB side.  So the fixpoint iteration runs ONLY on the schema frame
(``transitive_closure`` doubling joins over a few thousand rows), and
the instance side is touched by exactly ONE pass of broadcast joins —
no iteration, no instance self-join, and the only wide operations are
the final set-semantics ``distinct``s (shuffle on the triple key,
partial-agg combinable).  Effective domain/range
(``p sp* q, q domain C  =>  p effectively-domain C``) is folded into
the broadcast maps so derived property triples never need a second
domain/range pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .graph_query import transitive_closure

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
RDFS_SUBPROP = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
RDFS_DOMAIN = "http://www.w3.org/2000/01/rdf-schema#domain"
RDFS_RANGE = "http://www.w3.org/2000/01/rdf-schema#range"

_SCHEMA_PREDS = [RDFS_SUBCLASS, RDFS_SUBPROP, RDFS_DOMAIN, RDFS_RANGE]


def _pairs(schema: DataFrame, pred: str) -> DataFrame:
    return (schema.filter(F.col("pred") == pred)
            .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
            .distinct())


def rdfs_closure(triples: DataFrame, max_rounds: int = 20) -> DataFrame:
    """(subj, pred, obj[, obj_is_uri]) -> the RDFS closure triple set.

    Schema triples (the four rdfs vocabulary predicates) are split off,
    closed transitively on the driver-small side, and broadcast; the
    instance side gets one join pass.  If an ``obj_is_uri`` column is
    present, rdfs3 (range) only types URI objects — literals cannot be
    class instances.  Output columns: (subj, pred, obj), set-deduplicated.
    """
    has_uri_flag = "obj_is_uri" in triples.columns
    t = triples.select(
        "subj", "pred", "obj",
        (F.col("obj_is_uri") if has_uri_flag else F.lit(True)).alias("__uri"))

    schema = t.filter(F.col("pred").isin(_SCHEMA_PREDS)) \
              .select("subj", "pred", "obj").localCheckpoint()
    inst = t.filter(~F.col("pred").isin(_SCHEMA_PREDS))

    # --- schema fixpoint (tiny frames; doubling joins) ----------------
    sc_plus = transitive_closure(_pairs(schema, RDFS_SUBCLASS),
                                 max_rounds=max_rounds).localCheckpoint()
    sp_plus = transitive_closure(_pairs(schema, RDFS_SUBPROP),
                                 max_rounds=max_rounds).localCheckpoint()
    dom = _pairs(schema, RDFS_DOMAIN)
    rng = _pairs(schema, RDFS_RANGE)
    # effective domain/range: p sp* q, q domain C  =>  p domain-eff C.
    # (sp* = sp_plus + identity, realized as the UNION with the direct map.)
    dom_eff = (dom.unionByName(
        sp_plus.alias("s").join(dom.alias("d"),
                                F.col("s.dst") == F.col("d.src"))
        .select(F.col("s.src").alias("src"), F.col("d.dst").alias("dst")))
        .distinct().localCheckpoint())
    rng_eff = (rng.unionByName(
        sp_plus.alias("s").join(rng.alias("d"),
                                F.col("s.dst") == F.col("d.src"))
        .select(F.col("s.src").alias("src"), F.col("d.dst").alias("dst")))
        .distinct().localCheckpoint())

    # --- one broadcast pass over the instance side ---------------------
    types = inst.filter(F.col("pred") == RDF_TYPE).select("subj", F.col("obj").alias("cls"))
    props = inst.filter(F.col("pred") != RDF_TYPE)

    # rdfs7: super-property assertions.
    derived = (props.join(F.broadcast(sp_plus.withColumnRenamed("src", "pred")),
                          "pred")
               .select("subj", F.col("dst").alias("pred"), "obj", "__uri"))
    all_props = (props.unionByName(derived)
                 .select("subj", "pred", "obj", "__uri").distinct())

    # rdfs2/rdfs3 on the ORIGINAL predicates: dom_eff/rng_eff already
    # absorb the sp* paths, so derived triples need no second pass.
    t_dom = (props.join(F.broadcast(dom_eff.withColumnRenamed("src", "pred")),
                        "pred")
             .select("subj", F.col("dst").alias("cls")))
    t_rng = (props.filter(F.col("__uri"))
             .join(F.broadcast(rng_eff.withColumnRenamed("src", "pred")),
                   "pred")
             .select(F.col("obj").alias("subj"), F.col("dst").alias("cls")))
    types_all = types.unionByName(t_dom).unionByName(t_rng).distinct()

    # rdfs9: inherited types via the closed subclass map.
    t_up = (types_all.join(F.broadcast(sc_plus.withColumnRenamed("src", "cls")),
                           "cls")
            .select("subj", F.col("dst").alias("cls")))
    types_full = types_all.unionByName(t_up).distinct()

    def _as_triples(pairs: DataFrame, pred: str) -> DataFrame:
        return pairs.select(F.col("src").alias("subj"), F.lit(pred).alias("pred"),
                            F.col("dst").alias("obj"))

    out = (all_props.select("subj", "pred", "obj")
           .unionByName(types_full.select(
               "subj", F.lit(RDF_TYPE).alias("pred"), F.col("cls").alias("obj")))
           .unionByName(schema)
           .unionByName(_as_triples(sc_plus, RDFS_SUBCLASS))
           .unionByName(_as_triples(sp_plus, RDFS_SUBPROP)))
    return out.distinct()
