"""Composed training-data preparation pipeline.

``prepare_corpus`` chains the individual hygiene operators in the order
production web pipelines run them (C4 / Gopher / RefinedWeb lineage):

  1. corpus dedup        — exact fingerprint + MinHash-LSH near-dup
                           collapse to one canonical page per cluster
                           (``dedup.dedup_corpus``)
  2. line-level clean    — C4 rules produce ``clean_text``
                           (``quality.c4_line_filter``)
  3. quality filter      — all 14 Gopher rules on the CLEANED text
                           (``quality.gopher_quality_flags``)
  4. cross-corpus line dedup — boilerplate lines surviving the page
                           filters are removed corpus-wide, first
                           occurrence wins (``dedup.line_dedup``)
  5. PII scrub           — typed placeholder redaction
                           (``functions.text.redact_pii``)

Returns ``(docs, stats)``: the cleaned documents ``(doc_id, text)`` and
a small per-stage counts DataFrame ``(stage, n_docs)`` — the lineage
row the north rule requires from every stage, here at pipeline grain.

Scale shape: stages 2/3/5 are narrow (zero shuffle); stage 1 is the
bucketed filter-verify dedup (never a cross product); stage 4 is one
partial-aggregable groupBy + one hash join.  Nothing in the chain
collects to the driver; the stats frame is a union of count aggregates
the optimizer evaluates per stage.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from ..functions.text import redact_pii
from .dedup import dedup_corpus, line_dedup
from .quality import c4_line_filter, gopher_quality_flags


def prepare_corpus(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   jaccard_threshold: float = 0.6,
                   portable_line_hash: bool = False,
                   span_dedup_n: int | None = None,
                   benchmark: DataFrame | None = None,
                   contamination_n: int = 8
                   ) -> tuple[DataFrame, DataFrame]:
    """Run the full hygiene chain; see module docstring.

    ``portable_line_hash`` switches stage 4 to the md5 twin so external
    engines can recompute the line-dedup winners (used by the q45
    oracle); the default xxhash64 is ~2x faster in-pipeline.

    Two opt-in stages extend the chain to the RefinedWeb/GPT-3 shape
    (both off by default, so existing callers and the q45 oracle are
    unchanged):

    * ``span_dedup_n`` — ExactSubstr pass (span_dedup.py) between line
      dedup and the scrub: every >=n-word span duplicated corpus-wide
      is cut out of the surviving text.
    * ``benchmark`` — decontamination (decontaminate.py): documents
      sharing any ``contamination_n``-gram with the benchmark frame's
      ``text`` column are DROPPED (the strict GPT-3 rule).
    """
    spark = docs.sparkSession
    d0 = docs.select(F.col(id_col).alias("doc_id"),
                     F.col(text_col).alias("text"))

    # 1. corpus dedup: keep each cluster's canonical document
    verdicts = dedup_corpus(d0, jaccard_threshold=jaccard_threshold)
    kept_ids = verdicts.filter(F.col("reason") == "kept").select("doc_id")
    d1 = d0.join(kept_ids, "doc_id")

    # 2. C4 line clean (page-level rules included)
    c4 = c4_line_filter(d1)
    d2 = (c4.filter(F.col("page_keep"))
          .select("doc_id", F.col("clean_text").alias("text")))

    # 3. Gopher quality rules on the cleaned text
    flags = gopher_quality_flags(d2)
    d3 = d2.join(flags.filter(F.col("keep")).select("doc_id"), "doc_id")

    # 4. corpus-wide line dedup over survivors
    d4 = line_dedup(d3, portable=portable_line_hash).select("doc_id", "text")
    d4_line = d4
    extra_stages = []

    # 4b. opt-in ExactSubstr span dedup
    if span_dedup_n:
        from .span_dedup import remove_duplicate_spans
        d4 = (remove_duplicate_spans(d4, n=span_dedup_n)
              .select("doc_id", F.col("text_clean").alias("text")))
        extra_stages.append(("span_deduped", d4))

    # 4c. opt-in benchmark decontamination (strict drop-on-any-hit)
    if benchmark is not None:
        from .decontaminate import contamination
        clean_ids = (contamination(d4, benchmark, n=contamination_n)
                     .filter(F.col("n_hits") == 0).select("doc_id"))
        d4 = d4.join(clean_ids, "doc_id")
        extra_stages.append(("decontaminated", d4))

    # 5. PII scrub
    d5 = d4.select("doc_id", redact_pii(F.col("text")).alias("text"))

    stages = [("input", d0), ("deduped", d1), ("line_cleaned", d2),
              ("quality_kept", d3), ("line_deduped", d4_line)] + \
        extra_stages + [("scrubbed", d5)]
    stats = reduce(DataFrame.unionByName,
                   [df.agg(F.lit(name).alias("stage"),
                           F.count("*").alias("n_docs"))
                    for name, df in stages])
    return d5, stats
