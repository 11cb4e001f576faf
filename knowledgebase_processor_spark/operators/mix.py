"""Token-budget corpus mixing (beyond-reference; SURVEY.md §2 round-2
surface).

The pretraining-mix step: given target proportions over a source tag
(web / books / code / ...) and a global token budget, compute each
source's deterministic sampling rate and draw the sample — the
DoReMi/Pile-style "mixture weights" mechanic, with the same
reproducibility contract as the engine's other samplers.

* rate_s = min(1, budget · weight_s / tokens_s) — a source short of its
  quota keeps everything (the standard behavior; re-weighting the
  shortfall is the caller's policy decision, surfaced in the summary).
* keep ⇔ portable md5 hash(id) < rate_s · 2⁶⁰ — the sampling.py
  membership rule: deterministic across runs/retries/partitionings and
  monotone under corpus growth.

Spark shape: ONE pass computes per-doc token counts, one tiny groupBy
builds the per-source totals (20-ish rows — broadcast back), and the
keep filter is a codegen projection.  No window, no per-source scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .sampling import _HASH_RANGE, portable_id_hash
from ..functions.text import token_count


def token_budget_mix(docs: DataFrame, weights: dict[str, float],
                     budget_tokens: int, id_col: str = "doc_id",
                     text_col: str = "text",
                     source_col: str = "source") -> DataFrame:
    """Per-source mix summary: (source, weight, total_docs, total_tokens,
    target_tokens, rate, kept_docs, kept_tokens).  Sources absent from
    ``weights`` are excluded (weight 0).  ``sampled_docs`` (below)
    returns the rows themselves."""
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(source_col).alias("source"),
                       token_count(F.col(text_col)).cast("bigint")
                       .alias("toks"))
    wmap = F.create_map(*[x for k, v in sorted(weights.items())
                          for x in (F.lit(k), F.lit(float(v)))])
    scoped = base.withColumn("weight", wmap[F.col("source")]) \
                 .filter(F.col("weight").isNotNull())
    totals = (scoped.groupBy("source", "weight")
              .agg(F.count(F.lit(1)).alias("total_docs"),
                   F.sum("toks").alias("total_tokens")))
    rate = F.least(
        F.lit(1.0),
        (F.lit(float(budget_tokens)) * F.col("weight"))
        / F.col("total_tokens").cast("double"))
    tot = totals.withColumn("rate", rate).withColumn(
        "target_tokens",
        F.floor(F.lit(float(budget_tokens)) * F.col("weight"))
         .cast("bigint"))
    kept = (scoped.join(F.broadcast(tot.select("source", "rate")), "source")
            .filter(portable_id_hash(F.col("doc_id")).cast("double")
                    < F.col("rate") * F.lit(_HASH_RANGE))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("kept_docs"),
                 F.sum("toks").alias("kept_tokens")))
    return (tot.join(kept, "source", "left")
            .select("source", "weight", "total_docs", "total_tokens",
                    "target_tokens", "rate",
                    F.coalesce("kept_docs", F.lit(0)).alias("kept_docs"),
                    F.coalesce("kept_tokens", F.lit(0))
                    .alias("kept_tokens")))


def sampled_docs(docs: DataFrame, weights: dict[str, float],
                 budget_tokens: int, id_col: str = "doc_id",
                 text_col: str = "text",
                 source_col: str = "source") -> DataFrame:
    """The sampled rows themselves (same membership rule as the
    summary): original columns, filtered."""
    summary = token_budget_mix(docs, weights, budget_tokens, id_col,
                               text_col, source_col)
    rates = F.broadcast(summary.select("source", "rate"))
    return (docs.join(rates.withColumnRenamed("source", source_col),
                      source_col)
            .filter(portable_id_hash(F.col(id_col)).cast("double")
                    < F.col("rate") * F.lit(_HASH_RANGE))
            .drop("rate"))
