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
