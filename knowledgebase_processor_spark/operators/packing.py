"""Sequence packing for LLM pretraining batches.

Documents are concatenated into fixed-budget training sequences; packing
them well is the difference between ~60% and ~98% token utilization at
trillion-token scale.  This implements the distributed shape every real
packing pipeline uses: a deterministic hash partitions documents into
independent ``buckets`` (so packing parallelizes and is
partition-count-independent), and within each bucket a greedy NEXT-FIT
pass over id-ordered documents assigns each to a sequence, opening a new
one when the budget would overflow.

Next-fit (not best-fit) is deliberate: it is O(n), one-pass, and its
output is a pure function of (bucket, order) — so the exact assignment
is replayable by any engine (q48 recomputes it in DuckDB with a
recursive CTE) and stable across retries and cluster sizes.  Waste vs
best-fit is small when documents are much shorter than ``seq_len``
(the web-corpus regime); documents LONGER than the budget get a
sequence of their own with ``truncated`` flagged, never silently split.

The per-bucket scan is a grouped Arrow-batched ``applyInPandas`` — the
one place imperative state is genuinely needed (a running fill level is
inherently sequential), confined to bucket grain.
"""

from __future__ import annotations

from typing import Iterator  # noqa: F401  (mirrors sibling operator style)

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BooleanType, IntegerType, LongType,
                               StringType, StructField, StructType)

PACKED = StructType([
    StructField("doc_id", StringType()),
    StructField("bucket", IntegerType()),
    StructField("seq_id", LongType()),
    StructField("offset", LongType()),      # token offset inside the seq
    StructField("n_tokens", LongType()),
    StructField("truncated", BooleanType()),
])


def pack_sequences(docs: DataFrame, seq_len: int = 2048,
                   id_col: str = "doc_id", token_col: str = "n_tokens",
                   buckets: int = 64, portable: bool = False) -> DataFrame:
    """Assign every document a (bucket, seq_id, offset) packing slot.

    Input needs (id, token count); join your tokenizer's counts first
    (``functions.text.token_count`` for the BPE-ish proxy).
    ``portable=True`` buckets by the 60-bit md5 twin instead of xxhash64
    so external engines can replay the exact assignment (q48).
    """
    ids = F.col(id_col).cast("string")
    h = (F.conv(F.substring(F.md5(ids), 1, 15), 16, 10).cast("bigint")
         if portable else F.xxhash64(ids))
    keyed = docs.select(
        ids.alias("doc_id"),
        F.col(token_col).cast("long").alias("n_tokens"),
        F.pmod(h, F.lit(buckets)).cast("int").alias("bucket"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        out = []
        seq, fill = 0, 0
        for rec in pdf.itertuples(index=False):
            # null/NaN token counts (empty crawl rows) pack as 0 tokens;
            # negative counts are corrupt input, clamped
            t = (0 if pd.isna(rec.n_tokens)
                 else max(0, int(rec.n_tokens)))
            trunc = t > seq_len
            take = min(t, seq_len)
            # at-insert check only (an exactly-full sequence closes when
            # the NEXT document arrives) — one state transition, so the
            # DuckDB recursive-CTE oracle replays it with a single CASE
            if fill > 0 and fill + take > seq_len:
                seq += 1
                fill = 0
            out.append({"doc_id": rec.doc_id, "bucket": int(rec.bucket),
                        "seq_id": seq, "offset": fill,
                        "n_tokens": t, "truncated": trunc})
            fill += take
        return pd.DataFrame(out, columns=[f.name for f in PACKED.fields])

    return keyed.groupBy("bucket").applyInPandas(pack, schema=PACKED)


def packing_stats(packed: DataFrame, seq_len: int = 2048) -> DataFrame:
    """Utilization report: one row — sequences, docs, token fill ratio
    (packed tokens / (n_sequences × seq_len), truncation excluded)."""
    per_seq = (packed.groupBy("bucket", "seq_id")
               .agg(F.sum(F.least(F.col("n_tokens"), F.lit(seq_len)))
                    .alias("fill"),
                    F.count("*").alias("n_docs")))
    return per_seq.agg(
        F.count("*").alias("n_sequences"),
        F.sum("n_docs").alias("n_docs"),
        F.round(F.sum("fill")
                / (F.count("*") * F.lit(seq_len)).cast("double"), 6)
         .alias("fill_ratio"))
