"""Skew-handling utilities (north rule: "salted keys for head-entity skew").

At web scale a handful of entities (head entities: popular pages, common
names) attract millions of edges/mentions; a plain groupBy/join on the
entity key puts them all in one reducer.  Two complementary remedies:

* **AQE skew-join splitting** — enabled session-wide (pipeline.session);
  handles join-side skew at runtime with no code changes.
* **Explicit salting** — for aggregations whose function is associative,
  a two-phase salted aggregate splits each hot key across ``salt``
  sub-keys, partially aggregates, then combines; for joins of a skewed
  fact against a dimension, the dimension is replicated ``salt`` ways.

Exposed as generic operators for extension pipelines.  The built-in
canonicalization stage avoids the hot-key aggregate entirely instead
(components.coreference_edges: min-representative + join-back rather
than collect_set), which beats salting when the aggregate can be
reformulated; use these when it cannot (exact sets, percentiles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, salt: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic per-row salt in [0, salt): hash of the whole row —
    no RNG, so retried tasks reproduce identical output."""
    return df.withColumn(col_name, F.pmod(F.xxhash64(*df.columns), F.lit(salt)))


def salted_count(df: DataFrame, key: str, salt: int = 16) -> DataFrame:
    """Two-phase count per key: groupBy (key, salt) -> groupBy key.
    (Catalyst's partial aggregation already does this for count/sum; the
    explicit form matters for aggregates without map-side combine, e.g.
    collect_list or exact percentile sketches.)"""
    salted = with_salt(df, salt)
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("n"))


def salted_collect_set(df: DataFrame, key: str, value: str,
                       salt: int = 16) -> DataFrame:
    """collect_set per key with hot keys split across salted sub-groups
    first — each reducer buffers at most ~1/salt of a hot key's values."""
    salted = with_salt(df, salt)
    partial = (salted.groupBy(key, "_salt")
               .agg(F.collect_set(value).alias("_vs")))
    return (partial.groupBy(key)
            .agg(F.array_distinct(F.flatten(F.collect_list("_vs"))).alias("values")))


def replicated_join(fact: DataFrame, dim: DataFrame, key: str | list[str],
                    salt: int = 16, how: str = "inner") -> DataFrame:
    """Join a skewed fact table against a small dimension by replicating
    the dimension ``salt`` ways and salting the fact side — every hot key
    spreads over ``salt`` reducers.  Use when the dimension is too large
    to broadcast but tiny relative to the fact table.  ``key`` may be a
    single column name or a list (composite equi-join key)."""
    keys = [key] if isinstance(key, str) else list(key)
    # row-level salt (NOT a hash of the key — that would send every row of
    # a hot key to the same reducer again)
    fact_s = with_salt(fact, salt)
    dim_r = dim.crossJoin(
        F.broadcast(fact.sparkSession.range(salt)
                    .select(F.col("id").cast("long").alias("_salt"))))
    return fact_s.join(dim_r, on=keys + ["_salt"], how=how).drop("_salt")
