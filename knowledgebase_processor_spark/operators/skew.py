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


def skew_report(df: DataFrame, key: str, top_k: int = 5,
                target_rows_per_task: int = 1_000_000) -> DataFrame:
    """Key-distribution skew advisor (beyond-reference planning surface):
    per hot key, its row count, share of the table in ppm, and the salt
    factor that would spread it to ~``target_rows_per_task`` rows per
    reducer — the number `with_salt`/`replicated_join` wants.

    Plan shape: ONE partial-agg groupBy(key) (map-side combine absorbs
    the very skew being measured), a TakeOrdered(top_k) for the head
    keys, and a scalar total via one more partial agg — no window, no
    global sort.  A summary row (key='<TOTAL>') carries the table count
    and the skew ratio max_key/avg_key in ppm, so one frame answers
    "is this join safe, and if not what salt".
    """
    counts = df.groupBy(F.col(key).cast("string").alias("key")) \
               .agg(F.count(F.lit(1)).alias("n"))
    total, n_keys = counts.agg(F.sum("n"), F.count(F.lit(1))).collect()[0]
    head = (counts.orderBy(F.col("n").desc(), F.col("key"))
            .limit(top_k)
            .select("key", "n",
                    F.expr(f"n * 1000000 DIV {total}").alias("share_ppm"),
                    # integer ceil-div, no float round-trip
                    F.expr(f"(n + {target_rows_per_task} - 1) "
                           f"DIV {target_rows_per_task}")
                    .alias("suggested_salt")))
    spark = df.sparkSession
    avg = max(total // max(n_keys, 1), 1)
    summary = spark.createDataFrame(
        [("<TOTAL>", int(total), 1_000_000, 0)],
        "key string, n long, share_ppm long, suggested_salt long") \
        .withColumn("skew_ratio_ppm", F.lit(None).cast("long"))
    head = head.withColumn(
        "skew_ratio_ppm", F.expr(f"n * 1000000 DIV {avg}").cast("long"))
    return head.unionByName(summary.select(*head.columns))
