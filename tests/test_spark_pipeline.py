"""End-to-end Spark pipeline vs golden TTLs — the primary correctness gate.

All 66 fixture documents go through ONE DataFrame job (mapInPandas
extraction -> SQL triple emission -> dedup), then per-document triple sets
are compared against the goldens exactly like the reference's own
isomorphism tests (tests/test_specifications.py:80-128; set equality
suffices — no blank nodes in the goldens).
"""

import pytest

from knowledgebase_processor_spark.goldens import load_golden, spec_cases
from knowledgebase_processor_spark.pipeline import documents_to_triples

CASES = spec_cases()
CORPUS_KINDS_PREDS = None  # corpus handled separately below


@pytest.fixture(scope="module")
def triples_by_doc(spark):
    docs = spark.createDataFrame(
        [(doc_id, md.read_text(encoding="utf-8")) for doc_id, md, _ in CASES],
        "doc_id string, text string",
    )
    out = documents_to_triples(docs).collect()
    by_doc = {}
    for r in out:
        flag = "uri" if r.obj_is_uri else r.obj_datatype
        by_doc.setdefault(r.source_doc, set()).add((r.subj, r.pred, r.obj, flag))
    return by_doc


@pytest.mark.parametrize(
    "doc_id,md,ttl",
    [c for c in CASES if c[0].startswith("test_cases/")],
    ids=[c[0] for c in CASES if c[0].startswith("test_cases/")])
def test_spark_unit_case_exact(triples_by_doc, doc_id, md, ttl):
    expected = load_golden(ttl)
    got = triples_by_doc.get(doc_id, set())
    assert got == expected, (
        f"extra={sorted(got - expected)[:5]} missing={sorted(expected - got)[:5]}")


def test_spark_corpus_aggregate_pr(triples_by_doc):
    corpus = [c for c in CASES if c[0].startswith("test_corpus/")]
    corpus_kinds = {"Document", "TodoItem", "WikiLink"}
    inter = exp_n = got_n = 0
    for doc_id, _, ttl in corpus:
        expected = load_golden(ttl)
        got_all = triples_by_doc.get(doc_id, set())
        # project to the kinds the stale corpus goldens contain: keep
        # subjects whose rdf:type intersects the corpus kinds
        keep = {s for (s, p, o, f) in got_all
                if p.endswith("#type") and o.rsplit("#", 1)[-1] in corpus_kinds}
        got = {t for t in got_all if t[0] in keep}
        inter += len(expected & got)
        exp_n += len(expected)
        got_n += len(got)
    precision, recall = inter / got_n, inter / exp_n
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)


def test_spark_matches_python_reference_impl(spark, triples_by_doc):
    """The SQL emitter and the pure-Python oracle agree triple-for-triple."""
    from knowledgebase_processor_spark.extract.core import extract_entities
    from knowledgebase_processor_spark.extract.triples_py import entities_triples

    for doc_id, md, _ in CASES[:10]:
        ents = extract_entities(doc_id, md.read_text(encoding="utf-8"))
        py = entities_triples(ents)
        assert triples_by_doc.get(doc_id, set()) == py, doc_id
