"""Round-2 additions: count-min heavy hitters, weighted sampling, label
propagation communities, bloom semi-join, prefix-filter set-sim join.
Each verified against a pure-python replication (bit-exact where the
operator promises it) plus its specific guarantee: CM one-sided error,
ES weighting, LPA determinism, Bloom no-false-negatives, prefix recall.
"""

import hashlib
import itertools
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from knowledgebase_processor_spark.operators.bloom import (
    bloom_build, bloom_member, bloom_semi_join, bloom_words)
from knowledgebase_processor_spark.operators.communities import (
    label_propagation)
from knowledgebase_processor_spark.operators.heavy import (
    cms_counters, cms_estimate, heavy_hitters)
from knowledgebase_processor_spark.operators.setjoin import (
    capped_tokens, prefix_jaccard_join)
from knowledgebase_processor_spark.operators.wsample import weighted_sample

HEX = 15


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:HEX], 16)


# ---------------------------------------------------------------- CMS ----

def _py_cms_grid(values, depth=4, width=64):
    grid = Counter()
    for v in values:
        for r in range(depth):
            grid[(r, _h60(f"cms{r}|{v}") % width)] += 1
    return grid


def test_cms_grid_bit_exact_and_estimate_one_sided(spark):
    rng = random.Random(7)
    vals = [f"k{rng.randrange(40)}" for _ in range(3000)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    grid = {(r["row"], r["pos"]): r["cnt"]
            for r in cms_counters(df, "v", depth=4, width=64).collect()}
    assert grid == dict(_py_cms_grid(vals))

    exact = Counter(vals)
    items = spark.createDataFrame([(k,) for k in exact], "v string")
    est = {r["v"]: r["cms_estimate"]
           for r in cms_estimate(cms_counters(df, "v", 4, 64), items,
                                 "v", 4, 64).collect()}
    # CM guarantee: never underestimates
    for k, c in exact.items():
        assert est[k] >= c
    # python replication of the min-estimate
    pg = _py_cms_grid(vals)
    for k in exact:
        assert est[k] == min(pg[(r, _h60(f"cms{r}|{k}") % 64)]
                             for r in range(4))


def test_cms_absent_key_estimates_from_collisions_only(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(100)], "v string")
    items = spark.createDataFrame([("never-seen",)], "v string")
    est = cms_estimate(cms_counters(df, "v", 4, 4096), items,
                       "v", 4, 4096).collect()[0]["cms_estimate"]
    assert est == 0  # wide grid, 100 keys: all 4 cells almost surely empty


def test_cms_grid_merges_across_slices(spark):
    a = [f"x{i % 9}" for i in range(200)]
    b = [f"x{i % 13}" for i in range(150)]
    da = spark.createDataFrame([(v,) for v in a], "v string")
    db = spark.createDataFrame([(v,) for v in b], "v string")
    merged = (cms_counters(da, "v", 3, 32)
              .unionByName(cms_counters(db, "v", 3, 32))
              .groupBy("row", "pos").agg(F.sum("cnt").alias("cnt")))
    whole = cms_counters(da.unionByName(db), "v", 3, 32)
    assert ({(r["row"], r["pos"], r["cnt"]) for r in merged.collect()}
            == {(r["row"], r["pos"], r["cnt"]) for r in whole.collect()})


def test_heavy_hitters_no_false_negatives(spark):
    vals = ["hot"] * 500 + [f"cold{i}" for i in range(400)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    out = heavy_hitters(df, "v", threshold=100, depth=4, width=64).collect()
    by = {r["v"]: r for r in out}
    assert "hot" in by and by["hot"]["exact_count"] == 500
    # any extra rows are explicit false positives: exact < threshold
    for r in out:
        if r["v"] != "hot":
            assert r["exact_count"] < 100 <= r["cms_estimate"]


# ----------------------------------------------------------- wsample ----

def _py_weighted_sample(items, k, salt="ws", max_weight=16):
    keyed = []
    for sid, w in items:
        wu = min(max(int(w), 1), max_weight)
        key = max(_h60(f"{salt}|{sid}|{r}") for r in range(1, wu + 1))
        keyed.append((key, sid, wu))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    return [(sid, wu, key) for key, sid, wu in keyed[:k]]


def test_weighted_sample_bit_exact_vs_python(spark):
    items = [(i, 1 + (i * 7) % 12) for i in range(200)]
    df = spark.createDataFrame(items, "id long, w int")
    got = [(r["id"], r["weight_used"], r["sample_key"])
           for r in weighted_sample(df, "id", "w", k=20).collect()]
    assert got == _py_weighted_sample(items, 20)


def test_weighted_sample_clamps_and_null_weights(spark):
    df = spark.createDataFrame([(1, None), (2, -5), (3, 999)],
                               "id long, w int")
    out = {r["id"]: r["weight_used"]
           for r in weighted_sample(df, "id", "w", k=3,
                                    max_weight=8).collect()}
    assert out == {1: 1, 2: 1, 3: 8}


def test_weighted_sample_prefers_heavy_items(spark):
    # one weight-16 item vs 63 weight-1 items, k=8: across 40 salts the
    # heavy item must be selected far more often than a fair (8/64) rate.
    items = [(0, 16)] + [(i, 1) for i in range(1, 64)]
    df = spark.createDataFrame(items, "id long, w int")
    hits = sum(1 for s in range(40)
               if any(r["id"] == 0 for r in
                      weighted_sample(df, "id", "w", k=8,
                                      salt=f"s{s}").collect()))
    # P(selected) for ES with weight 16 of total 79 at k=8 is ~0.87;
    # 40 trials at fair rate 0.125 would give ~5.
    assert hits >= 20


# ------------------------------------------------------------- LPA ----

def _py_lpa(edges, iterations=4):
    und = set()
    for s, d in edges:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    nodes = sorted({s for s, _ in und})
    lab = {n: n for n in nodes}
    for _ in range(iterations):
        votes = {n: Counter([lab[n]]) for n in nodes}  # self-vote
        for s, d in und:
            votes[d][lab[s]] += 1
        lab = {n: min(c.keys(), key=lambda l: (-c[l], l))
               for n, c in votes.items()}
    return lab


@pytest.mark.parametrize("iters", [1, 3, 4])
def test_lpa_matches_python_replication(spark, iters):
    rng = random.Random(11)
    # two dense blocks + sparse bridges
    edges = list(itertools.combinations(range(0, 8), 2))
    edges += list(itertools.combinations(range(8, 16), 2))
    edges += [(7, 8), (0, 15)]
    edges += [(rng.randrange(16), rng.randrange(16)) for _ in range(10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["label"]
           for r in label_propagation(df, iterations=iters).collect()}
    assert got == _py_lpa(edges, iters)


def test_lpa_separates_bridged_cliques(spark):
    edges = (list(itertools.combinations([1, 2, 3, 4], 2))
             + list(itertools.combinations([10, 11, 12, 13], 2))
             + [(4, 10)])
    df = spark.createDataFrame(edges, "src long, dst long")
    lab = {r["node"]: r["label"]
           for r in label_propagation(df, iterations=4).collect()}
    assert len({lab[n] for n in (1, 2, 3, 4)}) == 1
    assert len({lab[n] for n in (10, 11, 12, 13)}) == 1
    assert lab[1] != lab[10]  # the bridge must not merge the cliques


# ----------------------------------------------------------- bloom ----

def test_bloom_no_false_negatives_and_exact_semi_join(spark):
    build = spark.createDataFrame([(i * 3,) for i in range(200)], "k long")
    words = bloom_words(bloom_build(build, "k", 4096, 3), 4096)
    # every build key probes true
    probe = build.filter(bloom_member(F.col("k"), words, 4096, 3))
    assert probe.count() == 200
    fact = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    got = sorted(r["k"] for r in
                 bloom_semi_join(fact, "k", build, "k", 4096, 3).collect())
    assert got == [i * 3 for i in range(200)]


def test_bloom_false_positive_rate_bounded(spark):
    build = spark.createDataFrame([(f"b{i}",) for i in range(300)],
                                  "k string")
    words = bloom_words(bloom_build(build, "k", 8192, 3), 8192)
    alien = spark.createDataFrame([(f"a{i}",) for i in range(2000)],
                                  "k string")
    fp = alien.filter(bloom_member(F.col("k"), words, 8192, 3)).count()
    # kn/m = 900/8192 -> theoretical fp ~ 0.1%; allow generous slack
    assert fp <= 40


def test_bloom_build_merges_across_slices(spark):
    a = spark.createDataFrame([(f"x{i}",) for i in range(50)], "k string")
    b = spark.createDataFrame([(f"y{i}",) for i in range(50)], "k string")
    merged = (bloom_build(a, "k", 2048, 3)
              .unionByName(bloom_build(b, "k", 2048, 3))
              .groupBy("word_idx").agg(F.bit_or("word").alias("word")))
    whole = bloom_build(a.unionByName(b), "k", 2048, 3)
    assert (bloom_words(merged, 2048) == bloom_words(whole, 2048))


# ---------------------------------------------------------- setjoin ----

def _py_shingles(text, n=3):
    ws = [w for w in text.lower().split() if w]
    if len(ws) >= n:
        return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}
    return {" ".join(ws)}


def _py_all_pairs(docs, t):
    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        a, b = _py_shingles(ta), _py_shingles(tb)
        inter = len(a & b)
        if inter == 0:
            continue
        j = round(inter / (len(a) + len(b) - inter), 6)
        if j >= t:
            key = (min(ia, ib), max(ia, ib))
            out[key] = (inter, len(a) + len(b) - inter, j)
    return out


def test_prefix_join_equals_naive_all_pairs(spark):
    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(60)]
    docs = []
    for i in range(40):
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(30))))
    # plant near-duplicates: light edits of existing docs
    for i in range(40, 55):
        base = docs[i - 40][1].split()
        j = rng.randrange(len(base))
        base[j] = rng.choice(vocab)
        docs.append((i, " ".join(base)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): (r["inter"], r["union_sz"], r["jaccard"])
           for r in prefix_jaccard_join(df, threshold=0.4).collect()}
    assert got == _py_all_pairs(docs, 0.4)
    assert got  # the planted near-dups must actually surface


def test_prefix_join_capped_bucket_guard_reports(spark):
    # a shingle shared by every doc leaks into prefixes when sets are
    # tiny; with max_bucket=5 it must be dropped AND reported
    docs = [(i, f"common one two uniq{i}a uniq{i}b") for i in range(12)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rep = capped_tokens(df, threshold=0.2, max_bucket=5).collect()
    dropped = {r["tok"] for r in rep}
    assert "common one two" in dropped
    # and the join still runs, bounded, on the surviving buckets
    prefix_jaccard_join(df, threshold=0.2, max_bucket=5).collect()


# ------------------------------------------- adversarial-scale probes ----

def test_doc_token_sets_linear_on_crawl_scale_doc(spark):
    # regression: the transform-over-indices shingler was O(doc^2) —
    # a 200k-word page must shingle in seconds, not hours
    import time
    from knowledgebase_processor_spark.operators.setjoin import (
        doc_token_sets)
    big = " ".join(f"w{i}" for i in range(200_000))
    df = spark.createDataFrame([(1, big)], "doc_id long, text string")
    t0 = time.perf_counter()
    n = doc_token_sets(df, ngram=3).count()
    assert time.perf_counter() - t0 < 60
    assert n > 100_000


def test_new_operators_tolerate_null_and_empty_inputs(spark):
    from pyspark.sql import functions as F
    from knowledgebase_processor_spark.operators.bloom import (
        bloom_build, bloom_member, bloom_words)
    from knowledgebase_processor_spark.operators.heavy import heavy_hitters
    from knowledgebase_processor_spark.operators.setjoin import (
        prefix_jaccard_join)
    from knowledgebase_processor_spark.operators.wsample import (
        weighted_sample)
    # null keys: md5(NULL) is NULL -> bloom membership NULL -> filtered
    # out (not a crash, not a false accept)
    words = bloom_words(bloom_build(
        spark.createDataFrame([("a",)], "k string"), "k", 1024, 3), 1024)
    probe = spark.createDataFrame([("a",), (None,)], "k string")
    got = [r["k"] for r in
           probe.filter(bloom_member(F.col("k"), words, 1024, 3)).collect()]
    assert got == ["a"]
    # empty frames flow through every operator
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert prefix_jaccard_join(empty_docs).count() == 0
    empty_v = spark.createDataFrame([], "v string")
    assert heavy_hitters(empty_v, "v", 1).count() == 0
    empty_w = spark.createDataFrame([], "id long, w int")
    assert weighted_sample(empty_w, "id", "w", 5).count() == 0
    # null/empty text docs shingle to the degenerate single element
    null_docs = spark.createDataFrame([(1, None), (2, "")],
                                      "doc_id long, text string")
    assert prefix_jaccard_join(null_docs, threshold=0.9).count() in (0, 1)
