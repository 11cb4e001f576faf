"""Training-shard layout: deterministic global shuffle + round-robin
shard/position assignment (beyond-reference; SURVEY.md §2 round-2
surface — the write-order planning step between operators/mix.py's
token-budget mixing and the trainer's data loader).

A trained model sees documents in file order, so the LAST pipeline
stage must (a) shuffle the corpus (no source/time runs — a crawl
ingested per-domain would otherwise feed the model a million pages of
one site in a row) and (b) lay documents out into S equal shards with
explicit positions, reproducibly, so a resumed/re-run export writes
byte-identical shards.

Spark-first, cross-engine-exact design: the shuffle key is the salted
md5 of the doc id (deterministic, engine-portable, uniform), the global
order comes from rank.py::global_rank (range repartition + local ranks
+ inlined offsets — NO single-partition window), and the layout is pure
integer arithmetic on the rank: shard = (rank-1) % S (round-robin, so
every shard gets an equal slice of the hash order — and of every
source), position = (rank-1) DIV S.  Any ANSI engine replays the
layout bit-identically from the same md5 ordering (q128).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .rank import global_rank


def shard_layout(docs: DataFrame, n_shards: int,
                 id_col: str = "doc_id", salt: str = "shard") -> DataFrame:
    """docs -> (doc_id, ..., shard, position): round-robin layout over
    the salted-md5 global shuffle order."""
    keyed = docs.withColumn(
        "__k", F.md5(F.concat(F.lit(salt + "|"),
                              F.col(id_col).cast("string"))))
    ranked = global_rank(keyed, ["__k", id_col], rank_col="__r")
    return (ranked
            .withColumn("shard", ((F.col("__r") - 1) % n_shards)
                        .cast("long"))
            .withColumn("position",
                        F.expr(f"(__r - 1) DIV {n_shards}").cast("long"))
            .drop("__k", "__r"))


def shard_summary(docs: DataFrame, n_shards: int,
                  id_col: str = "doc_id", bytes_col: str = "n_chars",
                  salt: str = "shard") -> DataFrame:
    """Per-shard manifest: (shard, n_docs, sum_bytes, max_position,
    head_doc) — ``head_doc`` (the id at position 0) pins the full
    permutation: a layout change moves some shard's head."""
    laid = shard_layout(docs, n_shards, id_col, salt)
    head = F.min(F.when(F.col("position") == 0,
                        F.col(id_col))).alias("head_doc")
    return (laid.groupBy("shard")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum(bytes_col).cast("long").alias("sum_bytes"),
                 F.max("position").cast("long").alias("max_position"),
                 head))


def shard_oracle_sql(docs_sql: str, n_shards: int,
                     salt: str = "shard") -> str:
    """EXACT ANSI replay of :func:`shard_summary` for DuckDB.
    ``docs_sql`` must select (doc_id, n_chars)."""
    return f"""
        WITH d AS ({docs_sql}),
        r AS (
          SELECT doc_id, n_chars,
                 row_number() OVER (
                   ORDER BY md5('{salt}|' || doc_id::VARCHAR), doc_id)
                   AS rk
          FROM d),
        laid AS (
          SELECT doc_id, n_chars,
                 ((rk - 1) % {n_shards})::BIGINT AS shard,
                 ((rk - 1) // {n_shards})::BIGINT AS position
          FROM r)
        SELECT shard, COUNT(*)::BIGINT AS n_docs,
               SUM(n_chars)::BIGINT AS sum_bytes,
               MAX(position)::BIGINT AS max_position,
               MIN(CASE WHEN position = 0 THEN doc_id END) AS head_doc
        FROM laid GROUP BY shard"""
