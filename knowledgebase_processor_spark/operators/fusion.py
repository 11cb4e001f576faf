"""Truth discovery / knowledge fusion (beyond-reference KG surface;
the resolution step AFTER :func:`kgquality.functional_conflicts` finds
contradictions — Dong et al.'s knowledge-fusion setting, public: many
sources assert (subj, pred, obj) with different obj; pick one value
per (subj, pred) by weighted source vote).

`fuse_facts` is the deterministic integer core of that family:
per candidate object, sum the trust weights of the sources asserting
it (each distinct source votes once); the object with the highest
total wins, ties break by recency then object id — so re-runs and
other engines replay the identical fused KG.

Scale shape: two partial-agg groupBys — (subj, pred, obj) vote
accumulation (map-side combinable; hot subjects absorbed), then a
struct-max election per (subj, pred).  Trust weights BROADCAST (the
source catalog is thousands of rows).  No window over the assertion
log, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def fuse_facts(assertions: DataFrame, trust: DataFrame | None = None,
               default_weight: int = 1) -> DataFrame:
    """(subj, pred, obj, source, warc_ts) [+ trust (source, weight)]
    -> one row per (subj, pred): (subj, pred, obj, weight_total,
    last_ts, n_sources, n_candidates) — the elected object, its vote
    total, the latest supporting observation, how many distinct
    sources back it and how many candidate objects competed."""
    a = assertions.select("subj", "pred", "obj", "source", "warc_ts") \
                  .distinct()
    if trust is not None:
        t = trust.select("source", F.col("weight").cast("long"))
        a = a.join(F.broadcast(t), "source", "left")
        a = a.withColumn("__w", F.coalesce("weight",
                                           F.lit(int(default_weight))))
    else:
        a = a.withColumn("__w", F.lit(int(default_weight)))
    per_obj = (a.groupBy("subj", "pred", "obj")
               .agg(F.sum("__w").cast("long").alias("w"),
                    F.max("warc_ts").alias("last_ts"),
                    F.countDistinct("source").cast("long")
                    .alias("n_sources")))
    elected = (per_obj.groupBy("subj", "pred")
               .agg(F.max(F.struct("w", "last_ts", "obj", "n_sources"))
                    .alias("__top"),
                    F.count(F.lit(1)).cast("long")
                    .alias("n_candidates")))
    return elected.select(
        "subj", "pred",
        F.col("__top.obj").alias("obj"),
        F.col("__top.w").alias("weight_total"),
        F.col("__top.last_ts").alias("last_ts"),
        F.col("__top.n_sources").alias("n_sources"),
        "n_candidates")
