"""Quantized BM25 and hashed linear-classifier inference vs pure-python
replications."""

import hashlib
import math
import random
from collections import Counter

from knowledgebase_processor_spark.operators.bm25 import bm25_scores
from knowledgebase_processor_spark.operators.classifier import linear_margin

HEX = 15


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:HEX], 16)


# --------------------------------------------------------- classifier ----

def _py_margin(text, dims=1024):
    ws = [w for w in (text or "").lower().split() if w]
    m = 0
    for w in ws:
        idx = _h60(f"f|{w}") % dims
        m += _h60(f"w|{idx}") % 2001 - 1000
    return len(ws), m


def test_linear_margin_bit_exact(spark):
    rng = random.Random(19)
    docs = [(i, " ".join(f"w{rng.randrange(500)}"
                         for _ in range(rng.randrange(0, 80))))
            for i in range(100)] + [(100, ""), (101, None)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["margin"])
           for r in linear_margin(df).collect()}
    assert got == {i: _py_margin(t) for i, t in docs}


def test_linear_margin_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = linear_margin(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --------------------------------------------------------------- bm25 ----

K1M, BM = 1200, 750


def _py_bm25(docs, terms, k=20):
    toks = {i: [w for w in t.lower().split() if w] for i, t in docs}
    dl = {i: len(ws) for i, ws in toks.items()}
    n = len(docs)
    avgdl_milli = sum(dl.values()) * 1000 // n
    qt = [(i, w) for i, ws in toks.items() for w in ws if w in terms]
    tf = Counter(qt)
    df = {t: len({i for i, w in qt if w == t}) for t in set(w for _, w in qt)}
    score = Counter()
    for (i, t), f in tf.items():
        idf_micro = round(1e6 * math.log(1 + (n - df[t] + 0.5)
                                         / (df[t] + 0.5)))
        norm_milli = (1000 - BM) + (BM * dl[i] * 1000) // avgdl_milli
        score[i] += idf_micro * (f * (K1M + 1000)) \
            // (f * 1000 + (K1M * norm_milli) // 1000)
    ranked = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(i, dl[i], s) for i, s in ranked]


def test_bm25_bit_exact_vs_python(spark):
    rng = random.Random(23)
    vocab = ["alpha", "beta", "gamma", "delta"] + [f"x{i}" for i in range(50)]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(5, 120))))
            for i in range(80)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [(r["doc_id"], r["dl"], r["score_micro"])
           for r in bm25_scores(df, ["alpha", "beta"], k=15).collect()]
    assert got == _py_bm25(docs, {"alpha", "beta"}, 15)


def test_bm25_ranking_sanity(spark):
    docs = [(1, "rare common filler filler filler"),
            (2, "common filler filler filler filler"),
            (3, "filler filler filler filler filler"),
            (4, "rare rare common filler filler")]
    # every doc same length; 'rare' (df=2) outweighs 'common' (df=3);
    # doc 4 has rare twice
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [r["doc_id"] for r in bm25_scores(df, ["rare", "common"]).collect()]
    assert got[0] == 4 and got[1] == 1 and 3 not in got