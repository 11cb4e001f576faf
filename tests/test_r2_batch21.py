"""Batch-21 round-2 operators: HTML tag-density profile
(operators/webclean.py::tag_density_report), KG predicate fill-rate
(operators/kgquality.py)."""

from knowledgebase_processor_spark.operators.kgquality import (
    predicate_fill_rate)
from knowledgebase_processor_spark.operators.rdfs import RDF_TYPE
from knowledgebase_processor_spark.operators.webclean import (
    tag_density_report)


# -------------------------------------------------------- tag density ----

def test_tag_density_counts(spark):
    html = "<html><body><p>Hello</p><a href=x>link</a><A>two</A></body>"
    pages = spark.createDataFrame([(1, html), (2, "plain text only")],
                                  "doc_id long, html string")
    out = {r.doc_id: r for r in tag_density_report(pages).collect()}
    h = out[1]
    # <html> <body> <p> </p> <a href=x> </a> <A> </A> </body> = 9
    assert h.n_tags == 9
    assert h.n_anchor_tags == 2       # <a href> and <A>
    assert h.text_chars == len("Hellolinktwo")
    p = out[2]
    assert (p.n_tags, p.n_anchor_tags) == (0, 0)
    assert p.text_ppm == 1_000_000


def test_tag_density_empty_and_unclosed(spark):
    pages = spark.createDataFrame(
        [(1, ""), (2, "<div unclosed forever")],
        "doc_id long, html string")
    out = {r.doc_id: r for r in tag_density_report(pages).collect()}
    assert out[1].text_ppm == 0       # empty html, guard denominator
    # unclosed tag never matches <[^>]*> -> counts as text
    assert out[2].n_tags == 0 and out[2].text_ppm == 1_000_000


# ---------------------------------------------------- predicate fill ----

def _t3(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_predicate_fill_rate_basic(spark):
    rows = [
        ("a", RDF_TYPE, "Person"), ("b", RDF_TYPE, "Person"),
        ("c", RDF_TYPE, "Person"), ("x", RDF_TYPE, "Org"),
        ("a", "born", "1990"), ("b", "born", "1991"),
        ("a", "name", "A"), ("x", "name", "X"),
        ("a", "born", "1990-dup"),      # second assertion: still 1 instance
    ]
    out = {(r.cls, r.pred): r for r in
           predicate_fill_rate(_t3(spark, rows)).collect()}
    born = out[("Person", "born")]
    assert (born.n_instances, born.n_with_pred) == (3, 2)
    assert born.fill_ppm == 666_666
    assert out[("Person", "name")].n_with_pred == 1
    assert out[("Org", "name")].fill_ppm == 1_000_000
    # predicates never asserted by a class's instances produce no row
    assert ("Org", "born") not in out


def test_predicate_fill_rate_multi_typed_instance(spark):
    rows = [("a", RDF_TYPE, "Person"), ("a", RDF_TYPE, "Author"),
            ("a", "wrote", "Book")]
    out = {(r.cls, r.pred): r.fill_ppm for r in
           predicate_fill_rate(_t3(spark, rows)).collect()}
    # membership is per class: the instance fills both classes
    assert out == {("Person", "wrote"): 1_000_000,
                   ("Author", "wrote"): 1_000_000}


def test_predicate_fill_rate_untyped_subjects_ignored(spark):
    rows = [("a", "p", "x")]
    assert predicate_fill_rate(_t3(spark, rows)).count() == 0


# ------------------------------------------------------ dangling audit ----

def test_dangling_objects_counts(spark):
    from knowledgebase_processor_spark.operators.kgquality import (
        dangling_objects)
    rows = [
        ("a", "knows", "b", True), ("b", RDF_TYPE, "Person", True),
        ("a", "knows", "ghost", True),      # referenced, never described
        ("a", "label", "lit", False),        # literal: never dangling
    ]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_uri boolean")
    out = {r.pred: r for r in dangling_objects(t).collect()}
    knows = out["knows"]
    assert (knows.n_objects, knows.n_dangling) == (2, 1)
    assert knows.dangling_ppm == 500_000
    assert "label" not in out                 # literal-only predicate
    assert out[RDF_TYPE].n_dangling == 1      # 'Person' itself undescribed


def test_domain_violations_counts(spark):
    from knowledgebase_processor_spark.operators.kgquality import (
        domain_violations)
    rows = [
        ("a", RDF_TYPE, "Person"), ("a", "born", "1990"),
        ("b", "born", "1991"),                 # b untyped -> violation
        ("c", RDF_TYPE, "Org"), ("c", "born", "1970"),  # wrong type
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    schema = spark.createDataFrame([("born", "Person")],
                                   "pred string, domain_cls string")
    r = domain_violations(t, schema).collect()[0]
    assert (r.pred, r.domain_cls) == ("born", "Person")
    assert (r.n_subjects, r.n_violating) == (3, 2)
    assert r.violation_ppm == 666_666


def test_domain_violations_zero_after_closure(spark):
    from knowledgebase_processor_spark.operators.kgquality import (
        domain_violations)
    from knowledgebase_processor_spark.operators.rdfs import (
        RDFS_DOMAIN, rdfs_closure)
    rows = [("born", RDFS_DOMAIN, "Person"),
            ("a", "born", "1990"), ("b", "born", "1991")]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    closed = rdfs_closure(t)
    schema = spark.createDataFrame([("born", "Person")],
                                   "pred string, domain_cls string")
    # materializing the entailment clears every domain violation
    assert domain_violations(closed, schema) \
        .agg({"n_violating": "sum"}).collect()[0][0] == 0


def test_class_hierarchy_counts(spark):
    from knowledgebase_processor_spark.operators.kgquality import (
        class_hierarchy_counts)
    from knowledgebase_processor_spark.operators.rdfs import RDFS_SUBCLASS
    rows = [
        ("Dog", RDFS_SUBCLASS, "Mammal"), ("Cat", RDFS_SUBCLASS, "Mammal"),
        ("Mammal", RDFS_SUBCLASS, "Animal"),
        ("rex", RDF_TYPE, "Dog"), ("tom", RDF_TYPE, "Cat"),
        ("generic", RDF_TYPE, "Animal"),
        # multi-typed: counts ONCE toward each ancestor
        ("chimera", RDF_TYPE, "Dog"), ("chimera", RDF_TYPE, "Cat"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = {r.cls: (r.n_direct, r.n_total)
           for r in class_hierarchy_counts(t).collect()}
    assert out["Dog"] == (2, 2)
    assert out["Cat"] == (2, 2)
    assert out["Mammal"] == (0, 3)     # rex, tom, chimera (once)
    assert out["Animal"] == (1, 4)     # + generic


def test_class_hierarchy_no_schema_equals_direct(spark):
    from knowledgebase_processor_spark.operators.kgquality import (
        class_hierarchy_counts)
    t = spark.createDataFrame([("a", RDF_TYPE, "C"), ("b", RDF_TYPE, "C")],
                              "subj string, pred string, obj string")
    out = class_hierarchy_counts(t).collect()
    assert [(r.cls, r.n_direct, r.n_total) for r in out] == [("C", 2, 2)]
