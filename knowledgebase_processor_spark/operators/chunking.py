"""Passage chunking with overlap (RAG / pretraining window preparation).

Beyond-reference (training-data family, next to packing.py — packing
concatenates docs INTO fixed windows, chunking splits docs into
overlapping passages; a retrieval corpus needs the latter).  Every RAG
ingestion pipeline runs this exact operator: fixed-size word windows
with an overlap stride, each chunk carrying provenance (doc id, chunk
index, word offset) so retrieved passages link back to their source —
the same provenance discipline as the reference's position-annotated
elements (document elements carry offsets, cf.
/root/reference/src/knowledgebase_processor/models/content.py positions).

Implementation is pure codegen: the word array materializes once per
row, chunk STARTS are a bounded `sequence(1, n, stride)` (one entry per
chunk, NOT per word), and each chunk is a `slice` + `array_join` over
the materialized column — total work O(total output words), linear in
the document (the transform lambda touches only its bound start index;
the span_dedup.py captured-expression lesson).  posexplode keeps the
chunk index.

Scale shape: no shuffle at all — chunking is a map-only explode, and
the (chunk_words / stride) fan-out factor is explicit and bounded.
Exactly SQL-replicable (q93): DuckDB rebuilds every chunk string,
offset, and word count bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import portable_words


def chunk_documents(docs: DataFrame, chunk_words: int = 64,
                    overlap: int = 16, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """-> (doc_id, chunk_idx, word_offset, n_words, chunk_text): word
    windows of ``chunk_words`` every ``chunk_words - overlap`` words;
    the final window is the (possibly shorter) tail unless it is wholly
    contained in the previous chunk.  Empty/whitespace docs emit no
    chunks."""
    if not 0 <= overlap < chunk_words:
        raise ValueError("need 0 <= overlap < chunk_words")
    stride = chunk_words - overlap
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        portable_words(F.col(text_col)).alias("ws"))
    ws = F.col("ws")
    # starts: 1, 1+stride, ... while start <= n (1-based); drop a tail
    # start whose window adds no new words (start+chunk-1 <= prev cover
    # == start > n - would duplicate): keep starts where start == 1 or
    # start <= n - overlap (the window contributes >= 1 new word)
    n = F.size(ws)
    starts = F.filter(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride)),
        lambda s: (s == 1) | (s + F.lit(overlap) <= n))
    chunks = base.select(
        "doc_id", "ws",
        F.posexplode(F.when(n >= 1, starts)
                     .otherwise(F.array().cast("array<int>")))
        .alias("chunk_idx", "start"))
    piece = F.slice(F.col("ws"), F.col("start"), chunk_words)
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        (F.col("start") - 1).cast("int").alias("word_offset"),
        F.size(piece).cast("int").alias("n_words"),
        F.array_join(piece, " ").alias("chunk_text"))


def dedup_chunks(docs: DataFrame, chunk_words: int = 64,
                 overlap: int = 16, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Chunk-level exact dedup for RAG corpora: chunk every document
    (``chunk_documents``), fingerprint each chunk's normalized text
    (portable md5-prefix), keep ONE canonical copy per fingerprint —
    retrieval indexes otherwise rank N copies of the same boilerplate
    passage above everything else.

    Winner election is the line_dedup shape: one partial-aggregatable
    ``min(struct(doc_id, chunk_idx, ...))`` per fingerprint — map-side
    combine absorbs boilerplate-fingerprint skew, and there is NO
    window over the hot key and NO join-back.  Output: the kept chunk
    rows plus ``n_copies`` (how many chunks shared the fingerprint).

    Chunk text is already whitespace-normalized (``array_join`` of the
    portable word array), so exact-after-normalization equality is the
    right granularity; near-dup chunking would feed these fingerprints
    to the MinHash family instead.
    """
    ch = chunk_documents(docs, chunk_words, overlap, id_col, text_col)
    fp = F.conv(F.substring(F.md5(F.col("chunk_text")), 1, 15), 16, 10) \
          .cast("bigint")
    won = (ch.select(fp.alias("fp"),
                     F.struct("doc_id", "chunk_idx", "word_offset",
                              "n_words", "chunk_text").alias("row"))
           .groupBy("fp")
           .agg(F.min("row").alias("w"),
                F.count(F.lit(1)).alias("n_copies")))
    return won.select(F.col("w.doc_id").alias("doc_id"),
                      F.col("w.chunk_idx").alias("chunk_idx"),
                      F.col("w.word_offset").alias("word_offset"),
                      F.col("w.n_words").alias("n_words"),
                      F.col("w.chunk_text").alias("chunk_text"),
                      "n_copies")
