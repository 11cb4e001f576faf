"""Batch-27 round-2 operators: SHACL-lite cardinality validation,
temporal fact lifespan, property-graph node export
(operators/shacl.py)."""

from knowledgebase_processor_spark.operators.rdfs import RDF_TYPE
from knowledgebase_processor_spark.operators.shacl import (
    cardinality_report, fact_lifespan, property_graph_nodes)


def test_cardinality_report_under_over_ok(spark):
    triples = spark.createDataFrame(
        [("a", RDF_TYPE, "Person"), ("b", RDF_TYPE, "Person"),
         ("c", RDF_TYPE, "Person"),
         ("a", "name", "A"),                      # exactly 1: ok
         ("b", "name", "B1"), ("b", "name", "B2"),  # 2 > max 1: over
         # c has no name: under
         ("a", "email", "a@x"), ("b", "email", "b@x")],
        "subj string, pred string, obj string")
    shapes = spark.createDataFrame(
        [("Person", "name", 1, 1),
         ("Person", "email", 0, None)],           # optional, unbounded
        "cls string, pred string, min_count int, max_count int")
    out = {(r.cls, r.pred): r
           for r in cardinality_report(triples, shapes).collect()}
    name = out[("Person", "name")]
    assert (name.n_instances, name.n_conforming, name.n_under,
            name.n_over) == (3, 1, 1, 1)
    assert name.conforming_ppm == 1_000_000 // 3
    email = out[("Person", "email")]
    assert (email.n_conforming, email.n_under, email.n_over) == (3, 0, 0)
    assert email.conforming_ppm == 1_000_000


def test_cardinality_report_shape_for_absent_class(spark):
    triples = spark.createDataFrame([("a", RDF_TYPE, "Person")],
                                    "subj string, pred string, obj string")
    shapes = spark.createDataFrame([("Ghost", "p", 1, None)],
                                   "cls string, pred string,"
                                   " min_count int, max_count int")
    assert cardinality_report(triples, shapes).collect() == []


def test_fact_lifespan(spark):
    obs = spark.createDataFrame(
        [("s", "p", "o", 10), ("s", "p", "o", 30), ("s", "p", "o", 20),
         ("s", "p", "old", 10),
         ("t", "q", "v", 30)],
        "subj string, pred string, obj string, warc_ts long")
    out = {(r.subj, r.pred, r.obj): r for r in fact_lifespan(obs).collect()}
    cur = out[("s", "p", "o")]
    assert (cur.first_seen, cur.last_seen, cur.n_obs,
            cur.is_current) == (10, 30, 3, True)
    stale = out[("s", "p", "old")]
    assert (stale.last_seen, stale.is_current) == (10, False)
    assert out[("t", "q", "v")].is_current is True


def test_property_graph_nodes(spark):
    triples = spark.createDataFrame(
        [("a", "name", "Alice", False),
         ("a", "age", "33", False),
         ("a", "knows", "b", True),
         ("b", "knows", "a", True)],
        "subj string, pred string, obj string, obj_is_uri boolean")
    out = {r.subj: r for r in property_graph_nodes(triples).collect()}
    assert (out["a"].n_props, out["a"].n_edges_out) == (2, 1)
    assert out["a"].props == "age=33\x1fname=Alice"   # sorted, joined
    assert (out["b"].n_props, out["b"].props) == (0, "")
