"""Round-2 additions, batch 2: k-core peeling, stratified ES sampling,
stupid-backoff LM scoring, histogram quantiles — each against a pure
python replication plus its defining invariant (core degrees >= k,
per-stratum independence, backoff branch coverage, quantile-vs-exact
bucket containment)."""

import hashlib
import itertools
import math
import random
from collections import Counter

from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.histq import (
    histogram_counts, histogram_quantiles)
from knowledgebase_processor_spark.operators.kcore import kcore
from knowledgebase_processor_spark.operators.lm_score import stupid_backoff
from knowledgebase_processor_spark.operators.wsample import (
    weighted_sample, weighted_sample_per_group)

HEX = 15


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:HEX], 16)


# ----------------------------------------------------------- k-core ----

def _py_kcore(edges, k):
    und = {frozenset((s, d)) for s, d in edges if s != d}
    adj = {}
    for e in und:
        a, b = tuple(e)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items() if nb}


def test_kcore_matches_python_fixpoint(spark):
    rng = random.Random(5)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(120)]
    # plant a clique so the 4-core is non-empty
    edges += list(itertools.combinations([50, 51, 52, 53, 54], 2))
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["degree"]
           for r in kcore(df, k=4, rounds=10).collect()}
    assert got == _py_kcore(edges, 4)
    assert set(got) >= {50, 51, 52, 53, 54}
    assert all(d >= 4 for d in got.values())


def test_kcore_peels_chains_entirely(spark):
    # a pure path has empty 2-core
    edges = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert kcore(df, k=2, rounds=30).count() == 0
    # a cycle IS its own 2-core
    cyc = edges + [(30, 0)]
    got = kcore(spark.createDataFrame(cyc, "src long, dst long"),
                k=2, rounds=5).collect()
    assert len(got) == 31 and all(r["degree"] == 2 for r in got)


# ------------------------------------------------- stratified sample ----

def test_stratified_sample_is_per_group_topk(spark):
    rows = [(g, i, 1 + (i % 5)) for g in ("a", "b", "c")
            for i in range(g.__hash__() % 7 + 20)]
    df = spark.createDataFrame(rows, "g string, id long, w int")
    got = weighted_sample_per_group(df, ["g"], "id", "w", k=4).collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r["g"], []).append(r)
    for g, rs in by_g.items():
        assert [r["rnk"] for r in sorted(rs, key=lambda r: r["rnk"])] \
            == [1, 2, 3, 4]
        # per-stratum result == global ES sample restricted to the stratum
        sub = [(i, w) for (gg, i, w) in rows if gg == g]
        sdf = spark.createDataFrame(sub, "id long, w int")
        solo = [(r["id"], r["weight_used"], r["sample_key"])
                for r in weighted_sample(sdf, "id", "w", k=4).collect()]
        assert sorted((r["id"], r["weight_used"], r["sample_key"])
                      for r in rs) == sorted(solo)


# ----------------------------------------------------- stupid backoff ----

def _py_backoff(target, model, alpha_ppm=400000):
    def toks(t):
        return [w for w in t.lower().split() if w]
    mtoks = [w for _, t in model for w in toks(t)]
    uni = Counter(mtoks)
    big = Counter()
    for _, t in model:
        ws = toks(t)
        for i in range(len(ws) - 1):
            big[f"{ws[i]} {ws[i+1]}"] += 1
    n = len(mtoks)
    out = {}
    for did, t in target:
        ws = toks(t)
        bgs = [f"{ws[i]} {ws[i+1]}" for i in range(len(ws) - 1)]
        s = 0
        for bg in bgs:
            w1, w2 = bg.split(" ")
            if big[bg]:
                s += 1000000 * big[bg] // uni[w1]
            elif uni[w2]:
                s += alpha_ppm * uni[w2] // n
        out[did] = (len(bgs), s, s // len(bgs) if bgs else 0)
    return out


def test_stupid_backoff_bit_exact_and_backoff_fires(spark):
    model = [(0, "the cat sat on the mat"), (2, "the dog sat on the rug"),
             (4, "a cat and a dog")]
    target = [(1, "the cat sat on the rug"),       # all bigrams seen
              (3, "the mat sat on a dog"),         # 'mat sat' unseen -> backoff
              (5, "zz qq"),                        # both words unseen -> 0
              (7, "one")]                          # no bigrams
    mdf = spark.createDataFrame(model, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["sum_score_ppm"],
                         r["avg_score_ppm"])
           for r in stupid_backoff(tdf, mdf).collect()}
    assert got == _py_backoff(target, model)
    assert got[5] == (1, 0, 0)
    assert got[7] == (0, 0, 0)
    # the backoff branch really fired for doc 3 (strictly between the
    # zero of unseen-unigrams and the direct-hit magnitude)
    assert 0 < got[3][1]


def test_stupid_backoff_random_matches_python(spark):
    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(30)]
    mk = lambda: " ".join(rng.choice(vocab) for _ in range(40))
    model = [(i, mk()) for i in range(0, 20, 2)]
    target = [(i, mk()) for i in range(1, 20, 2)]
    got = {r["doc_id"]: (r["n_bigrams"], r["sum_score_ppm"],
                         r["avg_score_ppm"])
           for r in stupid_backoff(
               spark.createDataFrame(target, "doc_id long, text string"),
               spark.createDataFrame(model, "doc_id long, text string"))
           .collect()}
    assert got == _py_backoff(target, model)


# ------------------------------------------------- histogram quantile ----

def test_histogram_counts_merge_and_clamp(spark):
    vals = [(-50,), (0,), (199,), (200,), (5000,), (99999,)]
    df = spark.createDataFrame(vals, "v long")
    got = {(r["bucket"]): r["cnt"]
           for r in histogram_counts(df, [], "v", 0, 20000, 100).collect()}
    assert got == {0: 3, 1: 1, 25: 1, 99: 1}  # clamped both ends


def test_histogram_quantiles_bracket_exact_percentiles(spark):
    rng = random.Random(23)
    rows = [("g", rng.randrange(0, 10000)) for _ in range(5000)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = histogram_quantiles(df, ["g"], "v", 0, 10000,
                              [500000, 900000], 100).collect()[0]
    vals = sorted(v for _, v in rows)
    width = 100
    for q, col in ((0.5, "q500000_lo"), (0.9, "q900000_lo")):
        exact = vals[math.ceil(q * len(vals)) - 1]
        assert out[col] <= exact < out[col] + width
    assert out["n"] == 5000
