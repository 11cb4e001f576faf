"""WordPiece greedy longest-match-first subword segmentation (the
inference-side tokenizer the BPE family (q66/q67) trains FOR: BERT-
style vocabularies segment each word by repeatedly taking the longest
vocab prefix, with ``##`` continuation pieces — the exact algorithm of
the reference WordPiece tokenizer in the BERT repo; words with no
valid segmentation become a single UNK.  Fertility (q196) and OOV
coverage (q135) consume precisely these counts for real tokenizers).

Segmentation is inherently sequential within a word, so this is the
documented Python boundary: an Arrow-batched ``mapInPandas`` with the
vocabulary BROADCAST once per executor (the extract_udf.py contract —
columns pruned before the Python stage, no per-row UDF calls, the
pure-Python kernel shared with the test differential).  Everything
after segmentation is plain DataFrame aggregation.

The q206 driver oracle pins expected per-language aggregates computed
by the PURE-PYTHON reference implementation over the sf0.01 parquet —
an independent-implementation check, the q22 precomputed-VALUES
pattern (ORACLE_SF001_PINNED).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Compact demo vocabulary: ascii letters/digits as fallback singles,
# common English pieces + continuations.  Deterministic and literal —
# a production run passes the trained vocab instead.
DEMO_VOCAB = (
    [chr(c) for c in range(ord("a"), ord("z") + 1)]
    + [str(d) for d in range(10)]
    + ["the", "in", "ing", "er", "re", "on", "at", "en", "an", "es",
       "is", "of", "and", "to", "tion", "com", "pre", "pro", "un",
       "ex", "http", "www"]
    + ["##" + p for p in
       ["s", "e", "d", "t", "n", "r", "y", "ing", "ed", "er", "es",
        "tion", "ly", "al", "ment", "ness", "able", "ous", "ive"]]
    # q/x/z have no continuation pieces on purpose: words carrying
    # them mid-word segment to UNK, so the demo vocab exercises the
    # UNK path on real text (a complete ascii vocab never would).
    + ["##" + chr(c) for c in range(ord("a"), ord("z") + 1)
       if chr(c) not in "qxz"]
    + ["##" + str(d) for d in range(10)])

UNK = "[UNK]"
MAX_WORD_CHARS = 64  # BERT's long-word guard: longer words are UNK


def wordpiece_word(word: str, vocab: frozenset[str]) -> list[str]:
    """Pure-Python reference kernel: greedy longest-match-first."""
    if not word or len(word) > MAX_WORD_CHARS:
        return [UNK]
    pieces: list[str] = []
    pos = 0
    while pos < len(word):
        end = len(word)
        piece = None
        while end > pos:
            cand = word[pos:end]
            if pos > 0:
                cand = "##" + cand
            if cand in vocab:
                piece = cand
                break
            end -= 1
        if piece is None:
            return [UNK]
        pieces.append(piece)
        pos = end
    return pieces


def segment_words(text: str, vocab: frozenset[str]) -> tuple[int, int, int]:
    """(n_words, n_subwords, n_unk) for one document under the
    portable whitespace tokenizer (functions/text.py contract)."""
    words = [w for w in (text or "").lower().split() if w]
    n_sub = n_unk = 0
    for w in words:
        ps = wordpiece_word(w, vocab)
        n_sub += len(ps)
        n_unk += sum(1 for p in ps if p == UNK)
    return len(words), n_sub, n_unk


def wordpiece_counts(docs: DataFrame, vocab: list[str] | None = None,
                     id_col: str = "doc_id", text_col: str = "text",
                     lang_col: str | None = None) -> DataFrame:
    """-> per doc (doc_id[, lang], n_words, n_subwords, n_unk) via an
    Arrow-batched mapInPandas over the broadcast vocabulary."""
    import pandas as pd

    vset = frozenset(vocab if vocab is not None else DEMO_VOCAB)
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(vset)
    cols = [id_col, text_col] + ([lang_col] if lang_col else [])
    pruned = docs.select(*cols)

    out_fields = f"{id_col} long" + (f", {lang_col} string"
                                     if lang_col else "")
    out_schema = (out_fields
                  + ", n_words long, n_subwords long, n_unk long")

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        v = bc.value
        for b in batches:
            rows = [segment_words(t, v) for t in b[text_col]]
            res = pd.DataFrame(rows,
                               columns=["n_words", "n_subwords",
                                        "n_unk"])
            res.insert(0, id_col, b[id_col].values)
            if lang_col:
                res.insert(1, lang_col, b[lang_col].values)
            yield res

    return pruned.mapInPandas(gen, out_schema)


def wordpiece_lang_report(docs: DataFrame,
                          vocab: list[str] | None = None) -> DataFrame:
    """-> (lang, n_docs, n_words, n_subwords, n_unk, unk_ppm): the
    per-language tokenizer health report (high unk_ppm = the vocab
    does not cover that language — the multilingual data-card flag)."""
    per_doc = wordpiece_counts(docs, vocab, lang_col="lang")
    return (per_doc.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_words").cast("long").alias("n_words"),
                 F.sum("n_subwords").cast("long").alias("n_subwords"),
                 F.sum("n_unk").cast("long").alias("n_unk"))
            .withColumn("unk_ppm", F.expr(
                "n_unk * 1000000 DIV nullif(n_subwords, 0)")))
