"""Exact-substring span dedup (operators/span_dedup.py): planted
duplicates, overlap merging, within-doc repeats, pure-python oracle."""

import hashlib
import re

from knowledgebase_processor_spark.operators.span_dedup import (
    duplicate_windows, remove_duplicate_spans,
)

SPAN = "alpha beta gamma delta epsilon"           # 5 words, planted twice
DOCS = [
    ("d1", f"intro words here {SPAN} tail one"),
    ("d2", f"other leading text {SPAN} closing remarks"),
    ("d3", "completely unique sentence with no duplicated runs at all"),
    ("d4", "rep rep rep rep rep rep rep rep"),     # within-doc repeat
    ("d5", ""),
]


def _df(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _words(t):
    return [w for w in re.split(r"[ \t\n\r\f]+", t.lower().strip()) if w]


def _py_clean(rows, n, min_count=2):
    """Independent replication of the published semantics."""
    wins = []                                     # (hash, doc, pos)
    for doc_id, t in rows:
        ws = _words(t)
        for i in range(len(ws) - n + 1):
            g = " ".join(ws[i:i + n])
            h = int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
            wins.append((h, doc_id, i))
    counts = {}
    for h, _, _ in wins:
        counts[h] = counts.get(h, 0) + 1
    out = {}
    for doc_id, t in rows:
        ws = _words(t)
        covered = [False] * len(ws)
        for h, d, i in wins:
            if d == doc_id and counts[h] >= min_count:
                for j in range(i, i + n):
                    covered[j] = True
        kept = [w for w, c in zip(ws, covered) if not c]
        out[doc_id] = (len(ws), sum(covered), " ".join(kept))
    return out


def test_planted_cross_doc_span_removed(spark):
    got = {r["doc_id"]: r for r in
           remove_duplicate_spans(_df(spark), n=5).collect()}
    exp = _py_clean(DOCS, 5)
    for doc_id, (nw, nr, clean) in exp.items():
        r = got[doc_id]
        assert (r["n_words"], r["n_removed"], r["text_clean"]) == \
            (nw, nr, clean), doc_id
    # the planted span is gone from both carriers, untouched elsewhere
    assert "gamma" not in got["d1"]["text_clean"]
    assert got["d1"]["text_clean"].startswith("intro words here")
    assert got["d3"]["n_removed"] == 0
    # within-doc repetition dedups too (ExactSubstr semantics)
    assert got["d4"]["n_removed"] == 8 and got["d4"]["text_clean"] == ""
    assert got["d5"]["n_words"] == 0


def test_longer_than_n_span_fully_covered(spark):
    long_span = "one two three four five six seven eight nine"
    rows = [("a", f"x {long_span} y"), ("b", f"p q {long_span} r")]
    got = {r["doc_id"]: r for r in
           remove_duplicate_spans(_df(spark, rows), n=4).collect()}
    # overlapping 4-windows cover the whole 9-word duplicated run
    assert got["a"]["n_removed"] == 9
    assert got["a"]["text_clean"] == "x y"
    assert got["b"]["text_clean"] == "p q r"


def test_min_count_threshold(spark):
    rows = [("a", SPAN), ("b", SPAN), ("c", SPAN)]
    # appears 3x: survives min_count=4, dies at min_count=3
    keep = remove_duplicate_spans(_df(spark, rows), n=5, min_count=4)
    assert all(r["n_removed"] == 0 for r in keep.collect())
    kill = remove_duplicate_spans(_df(spark, rows), n=5, min_count=3)
    assert all(r["text_clean"] == "" for r in kill.collect())


def test_duplicate_windows_positions(spark):
    got = duplicate_windows(_df(spark), n=5).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r["pos"])
    assert by_doc["d1"] == [3]        # SPAN starts at word index 3
    assert by_doc["d2"] == [3]
    assert sorted(by_doc["d4"]) == [0, 1, 2, 3]   # rep x8, n=5 windows
    assert "d3" not in by_doc


def test_crawl_scale_doc_is_linear(spark):
    # regression: transform(indices, i -> slice(ws,...)) re-evaluates the
    # captured split per element -> O(doc^2); a 200k-word doc must pass
    # through windowing + sweep in seconds, not hours
    import time
    d = spark.createDataFrame([(1, "word " * 200_000), (2, None)],
                              "doc_id long, text string")
    t = time.time()
    rows = {r["doc_id"]: r for r in
            remove_duplicate_spans(d, n=8).collect()}
    assert time.time() - t < 90
    assert rows[1]["n_words"] == 200_000
    assert rows[1]["n_removed"] == 200_000        # self-repeating
    assert rows[2]["n_words"] == 0
