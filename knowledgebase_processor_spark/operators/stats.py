"""Aggregation operators A1–A9 (SURVEY.md §2.4).

The reference computes these as driver-side dict aggregations over entity
lists; here each is one DataFrame aggregation (partial+final agg handled
by Catalyst).  They work over either the flat ENTITIES frame or the
pre-merged ENTITIES_MERGED frame (array-valued fields) — detected per
column type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import char_count, line_count, word_count


def _scalar(df: DataFrame, col: str):
    """First element when the frame is pre-merged (array fields)."""
    if dict(df.dtypes)[col].startswith("array"):
        return F.try_element_at(F.col(col), F.lit(1))
    return F.col(col)


def todo_statistics(entities: DataFrame) -> DataFrame:
    """A1 (todo_processor.py:94-124): total/completed/incomplete/rate."""
    todos = entities.filter(F.col("kind") == "todo")
    done = _scalar(todos, "is_completed")
    return todos.agg(
        F.count("*").alias("total"),
        F.coalesce(F.sum(F.when(done, 1).otherwise(0)), F.lit(0)).alias("completed"),
        F.coalesce(F.sum(F.when(done, 0).otherwise(1)), F.lit(0)).alias("incomplete"),
        F.coalesce(F.try_divide(F.sum(F.when(done, 1).otherwise(0)), F.count("*")),
                   F.lit(0.0)).alias("completion_rate"))


def wikilink_statistics(entities: DataFrame) -> DataFrame:
    """A2 (wikilink_processor.py:147-180): total/resolved/broken/rate."""
    links = entities.filter(F.col("kind") == "wikilink")
    resolved = _scalar(links, "resolved_document_uri").isNotNull()
    return links.agg(
        F.count("*").alias("total"),
        F.coalesce(F.sum(F.when(resolved, 1).otherwise(0)), F.lit(0)).alias("resolved"),
        F.coalesce(F.sum(F.when(resolved, 0).otherwise(1)), F.lit(0)).alias("broken"),
        F.coalesce(F.try_divide(F.sum(F.when(resolved, 1).otherwise(0)), F.count("*")),
                   F.lit(0.0)).alias("resolution_rate"))


def entity_statistics(entities: DataFrame) -> DataFrame:
    """A3/A4/A9 (named_entity_processor.py:189-230,
    markdown_structure_processor.py:391-430): counts per entity kind."""
    return entities.groupBy("kind").agg(F.count("*").alias("n")).orderBy("kind")


def content_statistics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """A5 (metadata_processor.py:101-119): per-doc char/line/word counts +
    paragraph and empty-line counts."""
    t = F.col(text_col)
    paragraphs = F.size(F.filter(F.split(t, r"\n\s*\n"), lambda p: F.trim(p) != ""))
    empty_lines = F.size(F.filter(F.split(t, "\n"), lambda l: F.trim(l) == ""))
    return docs.withColumn("char_count", char_count(t)) \
               .withColumn("line_count", line_count(t)) \
               .withColumn("word_count", word_count(t)) \
               .withColumn("paragraph_count", paragraphs) \
               .withColumn("empty_line_count", empty_lines)


def extraction_statistics(entities: DataFrame) -> DataFrame:
    """A6 (element_extraction_processor.py:44-73): per-document, per-kind
    extraction counts — the per-partition extraction metrics row of the
    north rule."""
    return (entities.groupBy("source_document_uri", "kind")
            .agg(F.count("*").alias("n_elements")))


def processing_statistics(entities: DataFrame) -> DataFrame:
    """A7 (pipeline_orchestrator.py:24-42): totals over the run — docs,
    ok, errors (error rows are emitted by the extraction UDF on
    per-document failure)."""
    return entities.agg(
        F.countDistinct("source_document_uri").alias("total_documents"),
        F.countDistinct(F.when(F.col("kind") != "error",
                               F.col("source_document_uri"))).alias("processed_successfully"),
        F.countDistinct(F.when(F.col("kind") == "error",
                               F.col("source_document_uri"))).alias("processing_errors"))


def triple_statistics(triples: DataFrame) -> DataFrame:
    """A8 (sparql_interface.py:457-486): COUNT(*) + per-graph distinct."""
    return triples.agg(
        F.count("*").alias("n_triples"),
        F.countDistinct("subj").alias("n_subjects"),
        F.countDistinct("source_doc").alias("n_graphs"))


def related_documents(doc_tags: DataFrame) -> DataFrame:
    """E12/J6 (enricher/relationships.py:25-103, query_interface/query.py:69-102):
    shared-tag document pairs with the shared tag, excluding self-pairs."""
    a, b = doc_tags.alias("a"), doc_tags.alias("b")
    return (a.join(b, (F.col("a.tag") == F.col("b.tag"))
                   & (F.col("a.doc_id") != F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_id"),
                    F.col("b.doc_id").alias("related_doc_id"),
                    F.lit("shared_tag").alias("relation"),
                    F.col("a.tag").alias("tag"))
            .distinct())
