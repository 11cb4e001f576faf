"""BPE tokenizer: corpus-scale training + distributed encoding.

No reference anchor (the reference counts whitespace tokens only,
cf. reference ``analyzer/entity_recognizer.py`` which defers to spaCy);
this is the training-data-pipeline tokenizer surface: learn a byte-pair
vocabulary FROM the corpus, then tokenize the corpus WITH it.

Scale shape — why this is cheap at 100 TB:

* Training never iterates over the corpus.  The single corpus-scale job
  is the word histogram (explode -> groupBy(word), map-side combinable,
  one shuffle whose key space is the distinct vocabulary).  Web-scale
  English text has ~10^6–10^7 distinct whitespace words — megabytes —
  so the histogram collects to the driver and the classic merge loop
  runs there on (word -> symbols, freq).  This is exactly how
  HuggingFace tokenizers / SentencePiece train: on the aggregated
  histogram, never the raw stream.
* Encoding broadcasts the merge ranks (KBs) and runs one Arrow-batched
  ``mapInPandas`` pass with a per-batch word->tokens memo: Zipf's law
  makes the memo hit rate extreme, so per-batch cost is driven by
  distinct words, not token volume.

Algorithm (the standard one, Sennrich et al. 2016 / GPT-2):

* symbols = characters + a ``</w>`` end-of-word marker;
* each step merges the most frequent adjacent pair; ties break to the
  lexicographically smallest pair so training is fully deterministic;
* encoding replays merges greedily by rank (lowest rank first, all
  occurrences per step) — identical to applying the training sequence.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..functions.text import portable_words as _words_col  # engine-wide
# explicit whitespace class (Java \s vs RE2 \s differ), single-sourced

_EOW = "</w>"


# --------------------------------------------------------------------------
# training (driver-side loop on the collected histogram)

def _apply_merge(syms: tuple[str, ...], pair: tuple[str, str],
                 joined: str) -> tuple[str, ...]:
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_on_histogram(freqs: dict[str, int],
                       num_merges: int) -> list[tuple[str, str]]:
    """The merge loop, pure function of (word -> count)."""
    words: dict[str, tuple[str, ...]] = {
        w: tuple(w) + (_EOW,) for w in freqs if w}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            c = freqs[w]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        top = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == top)
        merges.append(best)
        joined = best[0] + best[1]
        words = {w: _apply_merge(s, best, joined) for w, s in words.items()}
    return merges


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus-scale pass: (w, c) with map-side combine."""
    return (docs.select(F.explode(_words_col(F.col(text_col))).alias("w"))
            .groupBy("w").agg(F.count("*").alias("c")))


def bpe_train(docs: DataFrame, num_merges: int = 100,
              text_col: str = "text", min_count: int = 1,
              max_words: int = 1_000_000) -> list[tuple[str, str]]:
    """Truncation contract: the collected histogram is bounded by
    ``max_words`` rows — words below ``min_count`` are dropped, then the
    top-``max_words`` by (count desc, word asc) survive via a
    TakeOrdered (``orderBy().limit()``), so the driver never holds more
    than ``max_words`` (word, count) rows no matter the corpus size.
    At web scale the distinct-word space is dominated by a long tail of
    URLs/typos/hashes that carries negligible pair mass; training on the
    truncated histogram is the published behavior of HF-tokenizers and
    SentencePiece (both cap/threshold the word table before the merge
    loop).  At the shipped test scales the defaults keep every word, so
    merges are unchanged.
    """
    hist = (word_histogram(docs, text_col)
            .filter(F.col("c") >= int(min_count))
            .orderBy(F.desc("c"), F.asc("w"))
            .limit(int(max_words))
            .collect())
    assert len(hist) <= max_words  # driver-side bound is structural
    return train_on_histogram({r["w"]: r["c"] for r in hist}, num_merges)


# --------------------------------------------------------------------------
# encoding (distributed; merges broadcast by closure)

def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for a, b in zip(syms, syms[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        syms = list(_apply_merge(tuple(syms), best_pair,
                                 best_pair[0] + best_pair[1]))
    return syms


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """-> (doc_id, tokens array<string>, n_tokens).  Empty/None text
    tokenizes to []."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(_words_col(F.col(text_col)),
                   F.array().cast("array<string>")).alias("ws"))

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            for ws in pdf["ws"]:
                out: list[str] = []
                for w in ws:
                    t = memo.get(w)
                    if t is None:
                        t = memo[w] = encode_word(w, ranks)
                    out.extend(t)
                toks.append(out)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "tokens": toks})

    enc = base.mapInPandas(gen, "doc_id string, tokens array<string>") \
        if dict(docs.dtypes)[id_col] == "string" else \
        base.mapInPandas(gen, f"doc_id {dict(docs.dtypes)[id_col]}, "
                              "tokens array<string>")
    return enc.select("doc_id", "tokens",
                      F.size("tokens").alias("n_tokens"))


def merges_df(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """The learned vocabulary as a frame: (rank, m_left, m_right).
    (``left``/``right`` are reserved words in ANSI parsers.)"""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, m_left string, m_right string")
