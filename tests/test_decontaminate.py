"""Benchmark decontamination + DSIR importance weights (decontaminate.py)."""

import hashlib
import math
import re

from knowledgebase_processor_spark.operators.decontaminate import (
    contamination, dsir_weights,
)

DOCS = [
    ("d1", "the quick brown fox jumps over the lazy dog today"),
    ("d2", "completely unrelated text about spark partitions and shuffles here"),
    ("d3", "the quick brown fox jumps over the lazy dog today and more trailing words"),
    ("d4", "tiny"),
    ("d5", ""),
]
BENCH = [("b1", "eval question: the quick brown fox jumps over the lazy dog today?")]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


# --- pure-python replication of the portable formula (the oracle's view) ----

def _words(t):
    return [w for w in re.split(r"[ \t\n\r\f]+", t.lower().strip()) if w]


def _ngrams(t, n):
    ws = _words(t)
    if len(ws) < n:
        return []
    seen, out = set(), []
    for i in range(len(ws) - n + 1):
        g = " ".join(ws[i:i + n])
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_contamination_counts(spark):
    rows = {r["doc_id"]: r for r in
            contamination(_df(spark, DOCS), _df(spark, BENCH), n=5).collect()}
    bench_set = {_h60(g) for g in _ngrams(BENCH[0][1], 5)}
    for doc_id, text in DOCS:
        grams = _ngrams(text, 5)
        hits = sum(1 for g in grams if _h60(g) in bench_set)
        r = rows[doc_id]
        assert (r["n_grams"], r["n_hits"]) == (len(grams), hits), doc_id
        if grams:
            assert abs(r["frac"] - hits / len(grams)) < 1e-12
        else:
            assert r["frac"] is None
    # the exact-substring doc is flagged, the unrelated one is clean
    assert rows["d1"]["n_hits"] > 0 and rows["d2"]["n_hits"] == 0


def test_contamination_empty_benchmark(spark):
    rows = contamination(_df(spark, DOCS), _df(spark, [("b0", "")]),
                         n=5).collect()
    assert all(r["n_hits"] == 0 for r in rows)
    assert len(rows) == len(DOCS)


def test_dsir_weights_bit_exact(spark):
    """weight_micro replicated exactly in pure python: fixed-point
    micro-nat ratios summed as integers — no float-order dependence."""
    buckets = 64
    got = {r["doc_id"]: r for r in
           dsir_weights(_df(spark, DOCS), _df(spark, BENCH),
                        buckets=buckets).collect()}

    def occ_buckets(rows):
        out = []
        for _id, t in rows:
            ws = _words(t)
            out += [(_id, _h60(f"{a} {b}") % buckets)
                    for a, b in zip(ws, ws[1:])]
        return out

    raw, tgt = occ_buckets(DOCS), occ_buckets(BENCH)
    tr, tt = len(raw), len(tgt)
    c_r, c_t = {}, {}
    for _, b in raw:
        c_r[b] = c_r.get(b, 0) + 1
    for _, b in tgt:
        c_t[b] = c_t.get(b, 0) + 1
    r_micro = {b: int(round((math.log((c_t.get(b, 0) + 1) / (tt + buckets))
                             - math.log((c_r.get(b, 0) + 1) / (tr + buckets)))
                            * 1e6))
               for b in range(buckets)}
    exp = {doc_id: 0 for doc_id, _ in DOCS}
    n_bg = {doc_id: 0 for doc_id, _ in DOCS}
    for doc_id, b in raw:
        exp[doc_id] += r_micro[b]
        n_bg[doc_id] += 1
    for doc_id, _ in DOCS:
        assert got[doc_id]["n_bigrams"] == n_bg[doc_id], doc_id
        assert got[doc_id]["weight_micro"] == exp[doc_id], doc_id
    # target-like doc outranks the unrelated doc per bigram
    per = {d: got[d]["weight_micro"] / max(got[d]["n_bigrams"], 1)
           for d in ("d1", "d2")}
    assert per["d1"] > per["d2"]


def test_dsir_zero_bigram_docs(spark):
    got = {r["doc_id"]: r for r in
           dsir_weights(_df(spark, [("a", "one"), ("b", "")]),
                        _df(spark, BENCH), buckets=16).collect()}
    assert got["a"]["weight_micro"] == 0 and got["a"]["n_bigrams"] == 0
    assert got["b"]["weight_micro"] == 0


def test_crawl_scale_doc_is_linear(spark):
    # regression for the quadratic captured-expression n-gram bug: a
    # 200k-word doc must pass through 8-gram contamination in seconds
    import time
    d = spark.createDataFrame([("big", "word " * 200_000)],
                              "doc_id string, text string")
    t = time.time()
    r = contamination(d, _df(spark, BENCH), n=8).collect()[0]
    assert time.time() - t < 90
    assert (r["n_grams"], r["n_hits"]) == (1, 0)  # one distinct 8-gram
