"""Deterministic dataset splitting (beyond-reference; SURVEY.md §2
round-2 surface).

The last step of a training-data pipeline: assign every document to
train/val/test such that (a) the assignment is a pure function of the
document key — reruns, backfills, and incremental batches land each doc
in the SAME split with no coordination or stored state; (b) membership
is auditable by any engine (portable md5, the same cross-engine idiom
as the packing/line-dedup oracles); (c) changing the salt yields a
fresh independent split without touching data.

Zero shuffles: the split column is one codegen'd expression — hash the
salted key, take the top 60 bits as an integer, compare against integer
thresholds (no float division, so there is no rounding edge for DuckDB
to disagree on).  Fractions are resolved to integer thresholds with
cumulative rounding, so weights like 0.98/0.01/0.01 partition the hash
space exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SPACE = 16 ** 15  # top 15 hex chars of md5 -> uniform in [0, 16^15)


def split_column(key: Column, weights: dict[str, float],
                 salt: str = "split") -> Column:
    """Column expression assigning a split name by salted-md5 bucket."""
    total = sum(weights.values())
    bucket = F.conv(F.substring(
        F.md5(F.concat(F.lit(salt + "|"), key.cast("string"))), 1, 15),
        16, 10).cast("long")
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        thr = int(acc * _SPACE)
        cond = bucket < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = names[-1]
    return (F.lit(last) if expr is None else expr.otherwise(last)
            ).alias("split")


def hash_split(df: DataFrame, key: str = "doc_id",
               weights: dict[str, float] | None = None,
               salt: str = "split") -> DataFrame:
    """Append a ``split`` column.  Default 98/1/1 train/val/test."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    return df.withColumn("split", split_column(F.col(key), weights, salt))


def split_thresholds_sql(weights: dict[str, float],
                         salt: str = "split",
                         key_sql: str = "CAST(doc_id AS VARCHAR)") -> str:
    """The DuckDB replay of :func:`split_column` (same thresholds, same
    md5 prefix), as a CASE expression."""
    total = sum(weights.values())
    bucket = (f"(('0x' || substr(md5('{salt}|' || {key_sql}), 1, 15))"
              f"::BIGINT)")
    parts, acc = [], 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        parts.append(f"WHEN {bucket} < {int(acc * _SPACE)} THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"


def cluster_safe_split(docs: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id",
                       weights: dict[str, float] | None = None,
                       salt: str = "css") -> DataFrame:
    """Leakage-free train/val/test assignment: split on the NEAR-DUP
    CLUSTER, not the document, so two near-duplicate documents can never
    land on opposite sides of a train/test boundary (the classic
    train-test contamination bug that inflates eval numbers).

    ``pairs`` is a near-dup candidate edge list ``(doc_a, doc_b)`` —
    e.g. ``dedup.minhash_lsh_pairs_portable`` output.  Clusters are the
    connected components of that graph (components.connected_components:
    O(log diameter) label propagation + pointer jumping); singleton
    documents are their own cluster.  The split is then the same
    salted-md5 integer-threshold bucket as :func:`hash_split`, keyed on
    the cluster id — a pure function of the edge set, so reruns and
    incremental batches agree, and any ANSI engine can audit membership.

    Scale shape: CC runs only over documents that HAVE a near-dup edge
    (a small fraction of a deduplicated web corpus); everything else is
    one left join + one codegen expression.  Returns ``docs`` plus
    ``cluster`` and ``split`` columns.
    """
    from .components import connected_components

    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    labels = (connected_components(pairs, src="doc_a", dst="doc_b")
              .withColumnRenamed("node", id_col))
    out = (docs.join(labels, id_col, "left")
           .withColumn("cluster",
                       F.coalesce(F.col("component"), F.col(id_col)))
           .drop("component"))
    return out.withColumn(
        "split", split_column(F.col("cluster").cast("string"),
                              weights, salt))
