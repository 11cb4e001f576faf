"""S6/S7 SPARQL Update statement sink (sinks_sparql.py)."""

import os
import re

from knowledgebase_processor_spark.pipeline import documents_to_triples
from knowledgebase_processor_spark.sinks_sparql import (
    to_sparql_updates, write_sparql_update_files,
)

NT_LINE = re.compile(r"^  <\S+> <\S+> (<\S+>|\"(?:[^\"\\]|\\.)*\"(\^\^<\S+>)?) \.$")


def _triples(spark):
    docs = spark.createDataFrame(
        [("docs/a", "# Title A\n\n- [ ] task \"quoted\"\n"),
         ("docs/b", "plain text")],
        "doc_id string, text string")
    return documents_to_triples(docs)


def test_upsert_statement_shape(spark):
    ups = {r.source_doc: r.update for r in to_sparql_updates(_triples(spark)).collect()}
    assert set(ups) == {"docs/a", "docs/b"}
    u = ups["docs/a"]
    # reference shape: prefix, per-document DELETE..WHERE, then INSERT DATA
    assert u.startswith("PREFIX kb: <http://example.org/kb/>")
    assert "DELETE {" in u and "WHERE {" in u and "INSERT DATA {" in u
    assert u.index("DELETE {") < u.index("INSERT DATA {")
    # the DELETE targets exactly this document's entities, with the SAME
    # predicate + absolutized doc URI the emitter stores — so it actually
    # matches previously-inserted rows (review fix)
    from knowledgebase_processor_spark.rdf_schema import KB_SOURCE_DOC
    from knowledgebase_processor_spark.uris import resolve_uri
    delete_part = u.split("INSERT DATA")[0]
    assert f"<{KB_SOURCE_DOC}> <{resolve_uri('docs/a')}>" in delete_part
    # and the INSERT stores exactly that object for the sourceDocument rows
    assert f"<{resolve_uri('docs/a')}>" in u.split("INSERT DATA")[1]
    # every INSERT line is valid N-Triples; escaped quote survives
    body = u.split("INSERT DATA {", 1)[1].rsplit("}", 1)[0].strip("\n")
    for line in body.splitlines():
        assert NT_LINE.match(line), line
    assert '\\"quoted\\"' in u


def test_plain_insert_and_named_graph(spark):
    t = _triples(spark)
    plain = to_sparql_updates(t, upsert=False).collect()[0].update
    assert "DELETE" not in plain and "INSERT DATA {" in plain
    g = to_sparql_updates(t, graph_uri="http://g.example/kb").collect()[0].update
    assert "GRAPH <http://g.example/kb>" in g.split("INSERT DATA")[1]
    assert "GRAPH <http://g.example/kb>" in g.split("INSERT DATA")[0]  # delete too


def test_write_update_files(spark, tmp_path):
    from knowledgebase_processor_spark.sinks_ttl import doc_stem

    out = str(tmp_path / "ru")
    n = write_sparql_update_files(_triples(spark), out)
    files = sorted(os.listdir(out))
    # hash-suffixed stems: 'docs/a' and a hypothetical 'docs_a' sanitize
    # to the same prefix but get distinct suffixes (review fix)
    assert n == 2
    assert files == sorted(doc_stem(d) + ".ru" for d in ("docs/a", "docs/b"))
    assert doc_stem("docs/a") != doc_stem("docs_a")
    assert "INSERT DATA" in open(os.path.join(out, doc_stem("docs/a") + ".ru")).read()


def test_iri_injection_is_neutralized(spark):
    """An adversarial doc id with '>', whitespace, and SPARQL Update text
    must not escape the <...> IRI term: every generated line still parses
    as N-Triples and the injected DELETE never appears as a clause."""
    evil = 'docs/x> . } ; DELETE WHERE { ?s ?p ?o } ; INSERT DATA { <u'
    docs = spark.createDataFrame([(evil, "# T\n")], "doc_id string, text string")
    u = to_sparql_updates(documents_to_triples(docs)).collect()[0].update
    body = u.split("INSERT DATA {", 1)[1].rsplit("}", 1)[0].strip("\n")
    for line in body.splitlines():
        assert NT_LINE.match(line), line
    # exactly the one structural DELETE clause emitted by the upsert
    # template (the injected text survives only percent-encoded inside
    # an IRI, so it can never form a 'DELETE {' / 'DELETE WHERE' clause)
    assert u.count("DELETE {") == 1 and "DELETE WHERE" not in u
    # no IRI term contains a raw illegal character
    for m in re.finditer(r"<([^>]*)>", u):
        assert not re.search(r'[\x00-\x20"{}|^`\\]', m.group(1)), m.group(0)


def test_iri_stray_percent_and_stable_escapes():
    """Well-formed %XX sequences pass through byte-identically (rdflib
    parity on legitimate URLs); a stray % that starts no escape is
    encoded; raw forbidden chars normalize to the escaped form the same
    URI would have after percent-decoding (documented normalization)."""
    from knowledgebase_processor_spark.sinks_ttl import _iri
    assert _iri("http://h/a%20b") == "http://h/a%20b"
    assert _iri("http://h/100%") == "http://h/100%25"
    assert _iri("http://h/a%zqb") == "http://h/a%25zqb"
    assert _iri("http://h/a>b") == _iri("http://h/a%3Eb") == "http://h/a%3Eb"
