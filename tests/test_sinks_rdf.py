"""Export-format sinks: JSON-LD and RDF/XML beside Turtle (S4b).

The reference's export endpoint offers turtle | json-ld | xml
(webapp/backend/main.py:254-281).  All three sinks here share the
per-document applyInPandas shape; each format parses back (stdlib
readers) into the identical (subj, pred, obj, 'uri'|datatype) tuple set,
so the formats are isomorphism-checked against each other on real
extracted triples."""

import json

from knowledgebase_processor_spark.goldens import parse_turtle
from knowledgebase_processor_spark.pipeline import documents_to_triples
from knowledgebase_processor_spark.sinks_rdf import (
    parse_jsonld, parse_rdfxml, to_jsonld, to_rdfxml)
from knowledgebase_processor_spark.sinks_ttl import to_turtle


def _triples(spark, n_docs=6):
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .orderBy("doc_id").limit(n_docs)
            .selectExpr("CAST(doc_id AS STRING) AS doc_id", "text"))
    return documents_to_triples(docs)


def test_three_formats_isomorphic(spark):
    t = _triples(spark).cache()
    ttl = {r["source_doc"]: r["ttl"] for r in to_turtle(t).collect()}
    jld = {r["source_doc"]: r["jsonld"] for r in to_jsonld(t).collect()}
    xml = {r["source_doc"]: r["rdfxml"] for r in to_rdfxml(t).collect()}
    assert set(ttl) == set(jld) == set(xml) and len(ttl) == 6
    for doc in ttl:
        from_ttl = parse_turtle(ttl[doc])
        assert parse_jsonld(jld[doc]) == from_ttl
        assert parse_rdfxml(xml[doc]) == from_ttl
        assert len(from_ttl) > 0


def test_jsonld_structure_deterministic(spark):
    t = _triples(spark, n_docs=2)
    a = {r["source_doc"]: r["jsonld"] for r in to_jsonld(t).collect()}
    b = {r["source_doc"]: r["jsonld"]
         for r in to_jsonld(t.repartition(7)).collect()}
    assert a == b  # byte-identical under any partitioning
    doc = json.loads(next(iter(a.values())))
    assert isinstance(doc, list) and all("@id" in n for n in doc)
    # expanded form: every predicate value is a list of node/value objects
    for n in doc:
        for k, v in n.items():
            if k != "@id":
                assert isinstance(v, list)
                assert all(("@id" in o) != ("@value" in o) for o in v)


def test_rdfxml_adversarial_values(spark):
    """Literals and IRIs containing XML/Turtle metacharacters survive
    the round trip in both new formats."""
    rows = [
        ("d1", "http://ex/s<>", "https://schema.org/name",
         'a & b < c > "d"\n\ttab', False, None),
        ("d1", "http://ex/s<>", "https://schema.org/url",
         "http://ex/o?x=1&y=2", True, None),
        ("d1", "http://ex/s<>", "http://example.org/kb/vocab#count",
         "42", False, "http://www.w3.org/2001/XMLSchema#integer"),
    ]
    t = spark.createDataFrame(
        rows, "source_doc string, subj string, pred string, obj string,"
              " obj_is_uri boolean, obj_datatype string")
    jld = to_jsonld(t).collect()[0]["jsonld"]
    xml = to_rdfxml(t).collect()[0]["rdfxml"]
    got_j = parse_jsonld(jld)
    got_x = parse_rdfxml(xml)
    assert got_j == got_x
    # the IRI normalizer percent-encodes the forbidden <> exactly like
    # the Turtle sink, and literals come back byte-identical
    assert ("http://ex/s%3C%3E", "https://schema.org/name",
            'a & b < c > "d"\n\ttab',
            "http://www.w3.org/2001/XMLSchema#string") in got_j
    assert ("http://ex/s%3C%3E", "http://example.org/kb/vocab#count",
            "42", "http://www.w3.org/2001/XMLSchema#integer") in got_x


def test_rdfxml_unknown_namespace_gets_stable_prefix(spark):
    rows = [("d", "http://ex/s", "http://other.org/voc/p", "v",
             False, None),
            ("d", "http://ex/s", "http://zzz.org/ns#q", "http://ex/o",
             True, None)]
    t = spark.createDataFrame(
        rows, "source_doc string, subj string, pred string, obj string,"
              " obj_is_uri boolean, obj_datatype string")
    xml = to_rdfxml(t).collect()[0]["rdfxml"]
    assert 'xmlns:ns1="http://other.org/voc/"' in xml
    assert 'xmlns:ns2="http://zzz.org/ns#"' in xml
    assert parse_rdfxml(xml) == {
        ("http://ex/s", "http://other.org/voc/p", "v",
         "http://www.w3.org/2001/XMLSchema#string"),
        ("http://ex/s", "http://zzz.org/ns#q", "http://ex/o", "uri")}
