"""Hashed-feature linear classifier inference (fastText-style quality
filter, CCNet/RefinedWeb architecture).

Beyond-reference (quality family, next to quality.py's rule filters and
lm_score.py's fluency scores): production corpus curation scores every
page with a trained linear model over hashed bag-of-words features
(fastText: Joulin et al. 2016; the "quality classifier" of GPT-3/LLaMA
data pipelines).  No trained artifact ships in this sandbox, so the
WEIGHTS are a disclosed deterministic surrogate — a salted-md5 formula
per feature index — while the inference mechanism (the part that has to
scale) is real:

    idx(word)  = h60("f|" + word) % dims          (feature hashing)
    w(idx)     = h60("w|" + idx) % 2001 - 1000    (integer weights)
    margin(doc)= sum over word occurrences of w(idx(word))

Swapping real trained weights in means replacing the ``w`` formula with
a broadcast lookup array — the plan shape is identical.

Scale shape: margin is computed INSIDE one projection — the word array
materializes once per row, the fold is a codegen higher-order aggregate,
no explode, no shuffle (one narrow map stage; the only exchange in q94
is the final top-k TakeOrdered).  All integer arithmetic — the DuckDB
oracle replays every margin bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import portable_words

HEX_DIGITS = 15


def linear_margin(docs: DataFrame, dims: int = 1024,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_tokens, margin): the integer decision margin of the
    hashed linear model; empty docs score 0."""
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        portable_words(F.col(text_col)).alias("ws"))

    def h60(col):
        return F.conv(F.substring(F.md5(col), 1, HEX_DIGITS), 16, 10) \
                .cast("bigint")

    def weight(word):
        idx = h60(F.concat(F.lit("f|"), word)) % dims
        return h60(F.concat(F.lit("w|"), idx.cast("string"))) % 2001 - 1000

    margin = F.aggregate(F.col("ws"), F.lit(0).cast("bigint"),
                         lambda acc, w: acc + weight(w))
    # null-text docs carry a NULL word array: score them 0, not NULL
    return base.select("doc_id",
                       F.coalesce(F.size("ws"), F.lit(0)).cast("bigint")
                        .alias("n_tokens"),
                       F.coalesce(margin, F.lit(0)).alias("margin"))
