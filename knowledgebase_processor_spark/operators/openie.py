"""OpenIE-style (subj, pred, obj) triple extraction — pure Spark SQL.

The north-star pipeline (BASELINE.json north_star) calls for "OpenIE-style
(subj, pred, obj) triple extraction" alongside the reference's structural
extractors.  The reference has no OpenIE stage (its triples all come from
markdown structure, cf. processor/rdf_processor.py), so this operator is a
from-scratch addition: rule-based relation extraction in the classic
ReVerb/PATTY shape — a noun-phrase pattern, a relation-verb lexicon, and a
noun-phrase object pattern matched within whitespace-normalized text.

Everything is JVM-side (`regexp_extract_all` + `explode`); no Python UDF
touches the hot path, so the stage is whole-stage-codegen'd and scales
like any other narrow projection: no shuffle, pushdown-friendly, and the
pattern is a per-executor compiled regex.  The pattern language is kept in
the RE2-compatible subset (no lookaround, no backreferences) so the exact
same pattern string runs on DuckDB for the oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Default noun-phrase: capitalized token sequences ("Ada Lovelace",
# "New York").  Hyphens/digits allowed after the initial capital.
# The continuation is BOUNDED ({0,5} -> max 6 words): an unbounded
# (...)* recurses per token in Java's regex engine and a crawl page
# containing a 200k-word capitalized run kills the executor with
# StackOverflowError; NPs longer than 6 words are junk anyway.
NP_CAPITALIZED = r"[A-Z][A-Za-z0-9_-]*(?: [A-Z][A-Za-z0-9_-]*){0,5}"

# Default relation lexicon: copular + a small set of high-precision verb
# frames (the ReVerb observation: a short verb lexicon covers most of the
# high-confidence relations in web text).
REL_DEFAULT = (
    r"is an?|was an?|are|was born in|lives in|works at|works for|founded|"
    r"acquired|created|wrote|invented|discovered|leads|owns|uses|contains|"
    r"references|links to|depends on|is located in|is part of|is a part of"
)


def openie_pattern(np: str = NP_CAPITALIZED, rel: str = REL_DEFAULT) -> str:
    """The full SVO pattern with groups (1 subj, 2 rel, 3 obj)."""
    return rf"\b({np}) ({rel}) ({np})\b"


def openie_triples(docs: DataFrame,
                   doc_id_col: str = "doc_id",
                   text_col: str = "text",
                   np: str = NP_CAPITALIZED,
                   rel: str = REL_DEFAULT) -> DataFrame:
    """documents -> (doc_id, subj, rel, obj, match) relation rows.

    Non-overlapping left-to-right matches over whitespace-normalized text;
    one output row per match.  `rel` is normalized to a snake_case slug so
    downstream grouping/linking does not depend on surface spacing.
    """
    pattern = openie_pattern(np, rel)
    norm = F.regexp_replace(F.col(text_col), r"\s+", " ")
    return (docs
            .select(F.col(doc_id_col).alias("doc_id"), norm.alias("_t"))
            .select("doc_id",
                    F.explode(F.regexp_extract_all("_t", F.lit(pattern), 0))
                    .alias("match"))
            .select(
                "doc_id",
                F.regexp_extract("match", pattern, 1).alias("subj"),
                F.regexp_replace(F.regexp_extract("match", pattern, 2), " ", "_")
                .alias("rel"),
                F.regexp_extract("match", pattern, 3).alias("obj"),
                "match"))


def openie_to_kg_triples(relations: DataFrame) -> DataFrame:
    """OpenIE relation rows -> the TRIPLES schema (subj, pred, obj,
    obj_is_uri, obj_datatype, source_doc).

    Subjects/objects become kb entity URIs via the same slug scheme the
    mention detector uses (uris.py); predicates live under ``kb:rel/`` so
    OpenIE output is namespace-disjoint from the reference's structural
    predicates — a consumer comparing against the reference's triple set
    (P/R gate) filters them with one predicate-prefix predicate.
    """
    from ..uris import BASE_URL, KB
    slug = lambda c: F.lower(F.regexp_replace(c, r"[^A-Za-z0-9]+", "_"))
    # instance entities live under BASE_URL (like mention/wikilink entities,
    # mentions.py:111) so canonicalization can join them; only the
    # PREDICATE sits in the vocab namespace (kb:rel/...).
    return relations.select(
        F.concat(F.lit(BASE_URL + "entity/"), slug(F.col("subj"))).alias("subj"),
        F.concat(F.lit(KB + "rel/"), F.col("rel")).alias("pred"),
        F.concat(F.lit(BASE_URL + "entity/"), slug(F.col("obj"))).alias("obj"),
        F.lit(True).alias("obj_is_uri"),
        F.lit(None).cast("string").alias("obj_datatype"),
        F.col("doc_id").alias("source_doc"),
    ).dropDuplicates(["source_doc", "subj", "pred", "obj"])
