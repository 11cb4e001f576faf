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


def predicate_profile(triples: DataFrame, ppm: int = 1_000_000) -> DataFrame:
    """Per-predicate KG profile (beyond-reference; the schema-discovery
    report entity linking and ER read before choosing blocking keys):

    * ``functionality_ppm``     = |distinct subj| / |triples| — a
      functional predicate (≈1.0) is a strong merge key (PARIS, VLDB'12
      uses exactly this signal);
    * ``inv_functionality_ppm`` = |distinct obj| / |triples|;
    * ``literal_ppm``           — share of literal objects (needs an
      ``obj_is_uri`` column; all-URI assumed otherwise);
    * ``max_fanout``            — worst per-subject multiplicity (the
      skew bound a join planner wants);
    * ``top_datatype``          — modal object datatype, count-then-name
      tie-break (deterministic across engines).

    Two partial-agg groupBys ((pred, subj) then pred) plus one tiny
    (pred, datatype) mode frame — no window over the full triple set,
    integer ppm so the report is aggregation-order exact.
    """
    has_uri = "obj_is_uri" in triples.columns
    has_dt = "obj_datatype" in triples.columns
    t = triples.select(
        "subj", "pred", "obj",
        (F.col("obj_is_uri") if has_uri else F.lit(True)).alias("__uri"),
        (F.col("obj_datatype") if has_dt else F.lit(None).cast("string"))
        .alias("__dt"))

    per_subj = t.groupBy("pred", "subj").agg(F.count("*").alias("n"))
    fanout = per_subj.groupBy("pred").agg(F.max("n").alias("max_fanout"))

    base = t.groupBy("pred").agg(
        F.count("*").alias("n_triples"),
        F.countDistinct("subj").alias("n_subj"),
        F.countDistinct("obj").alias("n_obj"),
        F.sum(F.when(~F.col("__uri"), 1).otherwise(0)).alias("__lit"))

    dt_mode = (t.filter(F.col("__dt").isNotNull())
               .groupBy("pred", "__dt").agg(F.count("*").alias("c"))
               .groupBy("pred")
               .agg(F.max(F.struct(F.col("c"), F.col("__dt"))).alias("m"))
               .select("pred", F.col("m.__dt").alias("top_datatype")))

    # integer DIV, not float division + cast: exact and engine-identical.
    return (base.join(fanout, "pred").join(dt_mode, "pred", "left")
            .select(
                "pred", "n_triples", "n_subj", "n_obj",
                F.expr(f"n_subj * {ppm} DIV n_triples")
                .alias("functionality_ppm"),
                F.expr(f"n_obj * {ppm} DIV n_triples")
                .alias("inv_functionality_ppm"),
                F.expr(f"__lit * {ppm} DIV n_triples").alias("literal_ppm"),
                "max_fanout", "top_datatype"))
