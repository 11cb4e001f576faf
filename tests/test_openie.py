"""OpenIE-style relation extraction (operators/openie.py)."""

from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.openie import (
    openie_to_kg_triples, openie_triples,
)


def test_openie_capitalized_default(spark):
    docs = spark.createDataFrame(
        [("d1", "Ada Lovelace wrote Analytical Engine Notes.  "
                "Charles Babbage invented The Analytical Engine."),
         ("d2", "london is a city"),                  # lowercase: no match
         ("d3", "Turing    was born in Maida Vale")], # whitespace-normalized
        "doc_id string, text string")
    rows = {(r.subj, r.rel, r.obj)
            for r in openie_triples(docs).collect()}
    assert ("Ada Lovelace", "wrote", "Analytical Engine Notes") in rows
    assert ("Charles Babbage", "invented", "The Analytical Engine") in rows
    assert ("Turing", "was_born_in", "Maida Vale") in rows
    assert not any(s == "london" for s, _, _ in rows)


def test_openie_matches_do_not_cross_sentences(spark):
    docs = spark.createDataFrame(
        [("d1", "Alice founded. Bob works at Carol Inc")],
        "doc_id string, text string")
    rows = {(r.subj, r.rel, r.obj) for r in openie_triples(docs).collect()}
    # the period breaks the space-separated pattern: no "Alice founded Bob"
    assert rows == {("Bob", "works_at", "Carol Inc")}


def test_openie_to_kg_triples_schema(spark):
    docs = spark.createDataFrame(
        [("doc-9", "Ada Lovelace wrote Notes"),
         ("doc-9", "Ada Lovelace wrote Notes")],   # dup collapses
        "doc_id string, text string")
    kg = openie_to_kg_triples(openie_triples(docs))
    rows = kg.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.subj.endswith("entity/ada_lovelace")
    assert r.pred.endswith("rel/wrote")
    assert r.obj.endswith("entity/notes")
    assert r.obj_is_uri and r.obj_datatype is None and r.source_doc == "doc-9"
    assert [f.name for f in kg.schema.fields] == [
        "subj", "pred", "obj", "obj_is_uri", "obj_datatype", "source_doc"]


def test_openie_plan_is_jvm_only(spark):
    docs = spark.createDataFrame([("d", "x")], "doc_id string, text string")
    plan = openie_triples(docs)._jdf.queryExecution().executedPlan().toString()
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan


def test_openie_survives_giant_capitalized_runs(spark):
    """A crawl page that is one long capitalized token run used to kill
    the executor with StackOverflowError (Java regex recursion per token
    under an unbounded NP continuation); the bounded NP must scan it."""
    from knowledgebase_processor_spark.operators.openie import openie_triples
    docs = spark.createDataFrame(
        [("caps", "Word " * 200_000),
         ("hits", "Ada Lovelace wrote Notes. " * 1_000)],
        "doc_id string, text string")
    counts = {r.doc_id: r["count"] for r in
              openie_triples(docs).groupBy("doc_id").count().collect()}
    assert counts.get("caps") is None and counts["hits"] == 1_000
