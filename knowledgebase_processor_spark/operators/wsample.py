"""Deterministic weighted sampling without replacement (Efraimidis-
Spirakis via integer max-hash keys).

No reference anchor (the reference processes every document, cf.
/root/reference/src/knowledgebase_processor/services/processing_service.py
— no sampling path) — but a 10^12-document crawl is curated by sampling:
"take 1B documents, quality-weighted" is the canonical training-data
downsizing step (complements ``operators/sampling.py``'s uniform
hash-rate downsampler and exact per-domain cap).

Algorithm.  Efraimidis & Spirakis (2006): draw key_i = u_i^(1/w_i) with
u_i ~ U(0,1) and keep the k largest keys — that is exactly a
w_i-weighted sample without replacement.  For INTEGER weights there is
an equivalent formulation that needs no floats at all:

    max of w_i i.i.d. uniforms  ~  U^(1/w_i)

so the key is simply the MAXIMUM of w_i independent salted hashes of the
item.  All arithmetic is 60-bit integer (the repo's salted-md5 family),
which makes the sample BIT-REPRODUCIBLE across engines and runs — a
training-data release can publish (salt, k) and anyone can re-derive the
exact membership (q74's DuckDB oracle does).

Scale shape:

* The replicate explode multiplies rows by the CAPPED weight (weights
  are clamped to ``max_weight``, default 16 — a sampling weight is a
  small quality/importance integer, not a free magnitude), then
  ``groupBy(id).max`` folds map-side, so the exchange carries one row
  per item.
* Top-k is ``orderBy(key).limit(k)`` = TakeOrdered: each partition
  forwards at most k rows to the driver-side heap; no global sort.
* Ties: two items tie only on a 60-bit hash collision; the (key, id)
  ordering makes even that deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HEX_DIGITS = 15  # 60-bit salted-md5 family shared with dedup.py


def weighted_sample_per_group(df: DataFrame, group_cols: list[str],
                              id_col: str, weight_col: str, k: int,
                              salt: str = "ws",
                              max_weight: int = 16) -> DataFrame:
    """Stratified variant: an independent k-item ES sample inside every
    group (per language, per domain, per quality bucket — the standard
    corpus-balancing sampler).

    Same integer max-hash keys as :func:`weighted_sample`; the top-k per
    group runs through a rank window instead of a global limit, which
    Catalyst executes as WindowGroupLimit — each partition forwards at
    most k rows per group before the single group-key shuffle, so the
    stratified sample costs one exchange however many strata exist.
    """
    from pyspark.sql import Window
    wgt = F.least(F.greatest(F.coalesce(F.col(weight_col).cast("int"),
                                        F.lit(1)), F.lit(1)),
                  F.lit(max_weight))
    rep = df.select(*group_cols, F.col(id_col).alias("sid"),
                    wgt.alias("w")) \
            .select(*group_cols, "sid", "w",
                    F.explode(F.sequence(F.lit(1), F.col("w"))).alias("r"))
    hv = F.conv(F.substring(
        F.md5(F.concat(F.lit(salt + "|"), F.col("sid").cast("string"),
                       F.lit("|"), F.col("r").cast("string"))),
        1, HEX_DIGITS), 16, 10).cast("bigint")
    keyed = rep.select(*group_cols, "sid", "w", hv.alias("hv")) \
               .groupBy(*group_cols, "sid") \
               .agg(F.max("hv").alias("sample_key"),
                    F.first("w").alias("weight_used"))
    win = Window.partitionBy(*group_cols).orderBy(
        F.col("sample_key").desc(), F.col("sid"))
    return (keyed.withColumn("rnk", F.row_number().over(win))
            .filter(F.col("rnk") <= k)
            .select(*group_cols, F.col("sid").alias(id_col),
                    "weight_used", "sample_key",
                    F.col("rnk").cast("int").alias("rnk")))


def weighted_sample(df: DataFrame, id_col: str, weight_col: str,
                    k: int, salt: str = "ws", max_weight: int = 16) -> DataFrame:
    """k-item weighted sample without replacement; returns
    (id, weight_used, sample_key) ordered by key descending.

    ``weight_used`` is the clamped integer weight actually applied
    (``least(greatest(weight, 1), max_weight)``) so the caller can audit
    the clamping; rows with NULL weight sample at weight 1.
    """
    wgt = F.least(F.greatest(F.coalesce(F.col(weight_col).cast("int"),
                                        F.lit(1)), F.lit(1)),
                  F.lit(max_weight))
    rep = df.select(F.col(id_col).alias("sid"), wgt.alias("w")) \
            .select("sid", "w",
                    F.explode(F.sequence(F.lit(1), F.col("w"))).alias("r"))
    hv = F.conv(F.substring(
        F.md5(F.concat(F.lit(salt + "|"), F.col("sid").cast("string"),
                       F.lit("|"), F.col("r").cast("string"))),
        1, HEX_DIGITS), 16, 10).cast("bigint")
    keyed = rep.select("sid", "w", hv.alias("hv")) \
               .groupBy("sid").agg(F.max("hv").alias("sample_key"),
                                   F.first("w").alias("weight_used"))
    return (keyed.orderBy(F.col("sample_key").desc(), F.col("sid"))
                 .limit(k)
                 .select(F.col("sid").alias(id_col), "weight_used",
                         "sample_key"))
