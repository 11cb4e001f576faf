"""Wikilink -> document resolution as a broadcast join (SURVEY.md §2.3 J1).

The reference resolves each wikilink with three in-memory dict lookups on a
corpus-wide registry (utils/document_registry.py:45-74): exact
original_path, then path-without-extension, then
basename-without-extension.  The registry is tiny relative to the corpus
text (one row per document), so at any scale this is a classic broadcast
dimension join: three left joins collapsed into one join against a
key-exploded dimension with a precedence-ranked coalesce.

Registration order ties break "first registered wins" in the reference
(register_document skips re-registration, document_registry.py:25-27); we
reproduce that with a min-by over a stable registration rank when the
dimension is built from a DataFrame (its row order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def documents_dimension(entities: DataFrame) -> DataFrame:
    """(match_key, priority, kb_id) dimension from document entities.

    priority: 0 = original_path, 1 = path_without_extension, 2 = basename.
    Duplicate keys keep the first-seen document (registry semantics).
    """
    docs = (
        entities.filter(F.col("kind") == "document")
        .select(
            "kb_id", "original_path", "path_without_extension",
            F.regexp_extract(
                F.element_at(F.split(F.col("original_path"), "/"), -1),
                r"^(.*?)(?:\.[^.]*)?$", 1).alias("basename_without_extension"),
            F.monotonically_increasing_id().alias("reg_rank"),
        )
    )
    keyed = docs.select(
        F.explode(F.array(
            F.struct(F.col("original_path").alias("match_key"), F.lit(0).alias("priority")),
            F.struct(F.col("path_without_extension").alias("match_key"), F.lit(1).alias("priority")),
            F.struct(F.col("basename_without_extension").alias("match_key"), F.lit(2).alias("priority")),
        )).alias("k"),
        "kb_id", "reg_rank",
    ).select("k.match_key", "k.priority", "kb_id", "reg_rank")
    # first-registered wins per (match_key, priority) — dict overwrite is
    # last-wins for basename? No: register_document returns early only for
    # duplicate kb_id; same basename from different docs overwrites, i.e.
    # LAST registered wins (document_registry.py:30-37 plain dict assign).
    w = Window.partitionBy("match_key", "priority").orderBy(F.col("reg_rank").desc())
    return (keyed
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn", "reg_rank"))


def resolve_wikilinks(entities: DataFrame) -> DataFrame:
    """Fill wikilink.resolved_document_uri via broadcast 3-key lookup.

    Three chained broadcast left joins (exact path, path-sans-ext,
    basename) with a precedence coalesce — shuffle-free on the fact side,
    exactly the lookup cascade of find_document_by_path
    (document_registry.py:58-74).
    """
    dim = documents_dimension(entities)
    links = entities.filter(F.col("kind") == "wikilink").drop("resolved_document_uri")
    others = entities.filter(F.col("kind") != "wikilink")

    for prio in (0, 1, 2):
        side = (dim.filter(F.col("priority") == prio)
                   .select(F.col("match_key").alias(f"mk{prio}"),
                           F.col("kb_id").alias(f"target{prio}")))
        links = links.join(F.broadcast(side),
                           on=F.col("target_path") == F.col(f"mk{prio}"),
                           how="left").drop(f"mk{prio}")
    resolved = links.withColumn(
        "resolved_document_uri",
        F.coalesce("target0", "target1", "target2"),
    ).drop("target0", "target1", "target2")
    return others.unionByName(resolved.select(*others.columns))
