"""A-family statistics operators + the Turtle sink round-trip."""

from pyspark.sql import functions as F

from knowledgebase_processor_spark.goldens import parse_turtle
from knowledgebase_processor_spark.operators.extract_udf import (
    extract_entities_df, extract_merged_entities_df,
)
from knowledgebase_processor_spark.operators.stats import (
    content_statistics, entity_statistics, extraction_statistics,
    processing_statistics, related_documents, todo_statistics,
    triple_statistics, wikilink_statistics,
)
from knowledgebase_processor_spark.operators.wikilink_resolve import (
    documents_paths, resolve_by_suffix,
)
from knowledgebase_processor_spark.pipeline import documents_to_triples
from knowledgebase_processor_spark.sinks_ttl import to_turtle


def _docs(spark):
    return spark.createDataFrame(
        [("d1", "# H\n- [ ] a\n- [x] b\n- [x] c\n\n[[Target]] [[d2]]\n\npara two\n"),
         ("d2", "plain text only")],
        "doc_id string, text string")


def test_todo_statistics(spark):
    ents = extract_entities_df(_docs(spark))
    row = todo_statistics(ents).collect()[0]
    # reference semantics over entity list: parser + regex extractor each
    # emit every todo -> 6 todo entities, 4 completed (doubled b, c)
    assert row["total"] == 6 and row["completed"] == 4
    assert abs(row["completion_rate"] - 4 / 6) < 1e-9
    # merged frame: 3 logical todos, 2 completed
    merged = extract_merged_entities_df(_docs(spark))
    row2 = todo_statistics(merged).collect()[0]
    assert row2["total"] == 3 and row2["completed"] == 2


def test_wikilink_statistics_and_suffix_fallback(spark):
    merged = extract_merged_entities_df(_docs(spark))
    row = wikilink_statistics(merged).collect()[0]
    assert row["total"] == 2 and row["resolved"] == 0

    links = merged.filter(F.col("kind") == "wikilink") \
                  .select(F.try_element_at("label", F.lit(1)).alias("label"), "kb_id")
    dim = documents_paths(
        spark.createDataFrame([("docA", "notes/Target.md")], "doc_id string, path string"),
        path_col="path")
    out = {r["label"]: r["suffix_resolved_uri"]
           for r in resolve_by_suffix(links, dim).collect()}
    assert out["Target"] == "docA"       # 'notes/Target'.endswith('Target')
    assert out["d2"] is None


def test_entity_extraction_processing_stats(spark):
    ents = extract_entities_df(_docs(spark))
    kinds = {r["kind"]: r["n"] for r in entity_statistics(ents).collect()}
    assert kinds["document"] == 2 and kinds["todo"] == 6 and kinds["wikilink"] == 2
    ex = extraction_statistics(ents)
    assert ex.filter("source_document_uri = 'd1' and kind = 'todo'") \
             .collect()[0]["n_elements"] == 6
    p = processing_statistics(ents).collect()[0]
    assert p["total_documents"] == 2 and p["processing_errors"] == 0


def test_content_and_triple_statistics(spark):
    c = {r["doc_id"]: r for r in content_statistics(_docs(spark)).collect()}
    assert c["d2"]["word_count"] == 3
    assert c["d1"]["paragraph_count"] == 3
    t = documents_to_triples(_docs(spark))
    row = triple_statistics(t).collect()[0]
    assert row["n_triples"] > 0 and row["n_graphs"] == 2


def test_related_documents(spark):
    dt = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "y")], "doc_id string, tag string")
    pairs = {(r["doc_id"], r["related_doc_id"]) for r in related_documents(dt).collect()}
    assert pairs == {("a", "b"), ("b", "a")}


def test_turtle_roundtrip(spark):
    triples = documents_to_triples(_docs(spark))
    want = {(r.subj, r.pred, r.obj, "uri" if r.obj_is_uri else r.obj_datatype)
            for r in triples.collect()}
    ttl_rows = to_turtle(triples).collect()
    assert len(ttl_rows) == 2
    got = set()
    for r in ttl_rows:
        got |= parse_turtle(r["ttl"])
    assert got == want
