"""Exact-substring span deduplication (the ExactSubstr operation of
Lee et al. 2021, "Deduplicating Training Data Makes Language Models
Better") — remove every word span of length >= n that occurs >=
``min_count`` times anywhere in the corpus.

No reference anchor (the reference dedups whole links/tags, never
intra-document spans); this is the strongest-known training-data dedup
and complements the whole/near-doc family in operators/dedup.py.

Architecture (suffix arrays are single-node; this is the distributed
equivalent by hashed fixed-width windows):

1. every n-word window -> 60-bit portable hash, JVM-side
   (``transform`` over the word array + ``posexplode``).  Cost is
   O(words x n) character work, embarrassingly parallel, no shuffle —
   the same asymptotic constant the suffix-array build pays.
2. corpus-wide duplicate window set: one map-side-combinable groupBy on
   the window hash with ``HAVING count >= min_count``.  Overlapping and
   within-document repeats count, exactly like ExactSubstr.
3. flagged positions come from a shuffle join of window rows against
   the duplicate set on the hash (both sides hash-partitioned on the
   join key; AQE's skew split handles boilerplate hashes, and Spark's
   runtime bloom filter prunes the big side before the exchange).
4. per-document sweep: flagged starts are collected per doc (bounded by
   the doc's own length), and an Arrow-batched numpy difference-array
   pass merges the [s, s+n) intervals and rebuilds the cleaned text in
   O(words + starts) — the only Python stage, linear and per-doc.

A length-n duplicated span is removed exactly; a duplicated span longer
than n is covered by its overlapping n-windows and removed exactly;
spans shorter than n survive (the published semantics).

The whole thing is replicated value-level in SQL by the q68 oracle
(window hashes, duplicate set, interval cover, cleaned-text md5).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..functions.text import portable_words


def _words(text) -> "F.Column":
    # single-sourced portable tokenizer, null-text hardened for the
    # posexplode path (null array would drop the row silently)
    return F.coalesce(portable_words(text), F.array().cast("array<string>"))


def _h60(col) -> "F.Column":
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def _window_hashes(ws, n: int) -> "F.Column":
    """Array of h60(join(ws[i:i+n])) per 0-based start; [] if < n words.

    Built by zip_with over shifted copies, NOT transform(indices,
    i -> slice(ws, ...)): interpreted higher-order functions re-evaluate
    captured expression trees per element, so referencing ``ws`` inside
    a lambda makes windowing O(doc^2) on crawl-scale pages (the
    functions/text.py::shingles lesson).  Each zip_with argument is
    evaluated once per ROW; the lambda touches only bound variables."""
    grams = ws
    for k in range(1, n):
        shifted = F.slice(ws, k + 1, F.greatest(F.size(ws), F.lit(1)))
        # concat_ws skips the NULL tail padding; those short entries are
        # sliced off below, so only exact n-word joins survive
        grams = F.zip_with(grams, shifted,
                           lambda a, b: F.concat_ws(" ", a, b))
    return F.when(
        F.size(ws) >= n,
        F.transform(F.slice(grams, 1, F.size(ws) - (n - 1)), _h60)
    ).otherwise(F.array().cast("array<bigint>"))


def duplicate_windows(docs: DataFrame, n: int = 50, min_count: int = 2,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(doc_id, pos, wh) of every window whose hash occurs >= min_count
    times corpus-wide.  pos is the 0-based word index of the span start."""
    wins = (docs.select(F.col(id_col).alias("doc_id"),
                        _window_hashes(_words(F.col(text_col)), n)
                        .alias("whs"))
            .select("doc_id", F.posexplode("whs").alias("pos", "wh")))
    dups = (wins.groupBy("wh").agg(F.count("*").alias("c"))
            .filter(F.col("c") >= min_count)
            .select("wh"))
    return wins.join(dups, "wh").select("doc_id", "pos", "wh")


def remove_duplicate_spans(docs: DataFrame, n: int = 50,
                           min_count: int = 2, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """-> (doc_id, n_words, n_removed, text_clean): every duplicated
    >=n-word span removed, remaining words joined by single spaces."""
    flagged = (duplicate_windows(docs, n, min_count, id_col, text_col)
               .groupBy("doc_id")
               .agg(F.sort_array(F.collect_list("pos")).alias("starts")))
    base = docs.select(F.col(id_col).alias("doc_id"),
                       _words(F.col(text_col)).alias("ws"))
    joined = base.join(flagged, "doc_id", "left")

    def sweep(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, ws, starts in zip(pdf["doc_id"], pdf["ws"],
                                          pdf["starts"]):
                ws = list(ws)
                m = len(ws)
                if starts is None or len(starts) == 0:
                    out.append((doc_id, m, 0, " ".join(ws)))
                    continue
                delta = np.zeros(m + 1, dtype=np.int64)
                s = np.asarray(starts, dtype=np.int64)
                np.add.at(delta, s, 1)
                np.add.at(delta, np.minimum(s + n, m), -1)
                covered = np.cumsum(delta[:m]) > 0
                kept = [w for w, c in zip(ws, covered) if not c]
                out.append((doc_id, m, int(covered.sum()), " ".join(kept)))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_words", "n_removed",
                              "text_clean"])

    id_type = dict(docs.select(F.col(id_col).alias("doc_id")).dtypes)["doc_id"]
    return joined.mapInPandas(
        sweep, f"doc_id {id_type}, n_words int, n_removed int, "
               "text_clean string")
