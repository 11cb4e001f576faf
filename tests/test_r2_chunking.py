"""Passage chunking: python replication, overlap/tail semantics, and
the map-only plan shape."""

import random

from knowledgebase_processor_spark.operators.chunking import chunk_documents

import pytest


def _py_chunks(text, c=64, o=16):
    ws = [w for w in (text or "").lower().split() if w]
    if not ws:
        return []
    s = c - o
    out = []
    idx = 0
    for start in range(0, len(ws), s):
        if start != 0 and start + o >= len(ws):
            break
        piece = ws[start:start + c]
        out.append((idx, start, len(piece), " ".join(piece)))
        idx += 1
    return out


def test_chunking_matches_python_on_random_docs(spark):
    rng = random.Random(41)
    docs = [(i, " ".join(f"w{rng.randrange(99)}"
                         for _ in range(rng.randrange(0, 300))))
            for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in chunk_documents(df, 64, 16).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["word_offset"], r["n_words"],
             r["chunk_text"]))
    exp = {i: _py_chunks(t) for i, t in docs if _py_chunks(t)}
    got = {k: sorted(v) for k, v in got.items()}
    assert got == exp


def test_chunking_tail_and_overlap_semantics(spark):
    mk = lambda n: " ".join(f"t{i}" for i in range(n))
    df = spark.createDataFrame(
        [(64, mk(64)), (65, mk(65)), (70, mk(70)), (1, mk(1)),
         (0, ""), (99, None)],
        "doc_id long, text string")
    out = {}
    for r in chunk_documents(df, 64, 16).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["word_offset"], r["n_words"]))
    # exactly-one-chunk doc: the second start (48) adds no new words
    assert out[64] == [(0, 64)]
    # 65 words: tail chunk contributes exactly 1 new word -> kept
    assert sorted(out[65]) == [(0, 64), (48, 17)]
    assert sorted(out[70]) == [(0, 64), (48, 22)]
    assert out[1] == [(0, 1)]
    assert 0 not in out and 99 not in out  # empty/null emit nothing


def test_chunking_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunking_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_words=16, overlap=16)
