"""Batch-49 round-2: OWL-lite property-axiom materialization
(operators/owl.py)."""

from knowledgebase_processor_spark.operators.owl import (
    OWL_INVERSE, OWL_SYMMETRIC, OWL_TRANSITIVE, RDF_TYPE,
    owl_property_closure)


def _schema(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_owl_inverse_both_directions(spark):
    inst = spark.createDataFrame(
        [("a", "contains", "b"), ("c", "partOf", "d")],
        "subj string, pred string, obj string")
    sch = _schema(spark, [("contains", OWL_INVERSE, "partOf")])
    got = {(r.subj, r.pred, r.obj)
           for r in owl_property_closure(inst, sch).collect()}
    assert got == {("b", "partOf", "a"), ("d", "contains", "c")}


def test_owl_symmetric_flip_excludes_asserted(spark):
    inst = spark.createDataFrame(
        [("a", "adj", "b"), ("b", "adj", "a"), ("b", "adj", "c")],
        "subj string, pred string, obj string")
    sch = _schema(spark, [("adj", RDF_TYPE, OWL_SYMMETRIC)])
    got = {(r.subj, r.pred, r.obj)
           for r in owl_property_closure(inst, sch).collect()}
    # a-adj-b both ways already asserted; only c->b is new
    assert got == {("c", "adj", "b")}


def test_owl_transitive_chain_closure(spark):
    inst = spark.createDataFrame(
        [("a", "in", "b"), ("b", "in", "c"), ("c", "in", "d")],
        "subj string, pred string, obj string")
    sch = _schema(spark, [("in", RDF_TYPE, OWL_TRANSITIVE)])
    got = {(r.subj, r.obj)
           for r in owl_property_closure(inst, sch).collect()}
    assert got == {("a", "c"), ("a", "d"), ("b", "d")}


def test_owl_axioms_compose_inverse_feeds_transitive(spark):
    # contains inverseOf partOf; partOf transitive: x contains y and
    # y partOf z must entail x... check: (b partOf a) derived from
    # (a contains b), with (a partOf z) asserted -> b partOf z
    inst = spark.createDataFrame(
        [("a", "contains", "b"), ("a", "partOf", "z")],
        "subj string, pred string, obj string")
    sch = _schema(spark, [("contains", OWL_INVERSE, "partOf"),
                          ("partOf", RDF_TYPE, OWL_TRANSITIVE)])
    got = {(r.subj, r.pred, r.obj)
           for r in owl_property_closure(inst, sch).collect()}
    assert ("b", "partOf", "a") in got
    assert ("b", "partOf", "z") in got     # via the derived edge
    assert ("z", "contains", "a") in got


def test_owl_no_axioms_empty(spark):
    inst = spark.createDataFrame([("a", "p", "b")],
                                 "subj string, pred string, obj string")
    sch = _schema(spark, [])
    assert owl_property_closure(inst, sch).collect() == []
